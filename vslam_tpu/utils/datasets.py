"""Dataset readers: KITTI odometry, EuRoC MAV, and synthetic scenes.

Host-side replacement for the reference drivers' dataset plumbing
(reference src/VIOSlam.cpp:141-316): directory enumeration (KITTI
``image_0/ image_1/``, EuRoC ``cam0/data/`` + ``data.csv``), IMU CSV
parsing, per-frame IMU binning (reference src/VIOSlam.cpp:238-272), and
gravity init from the first accelerometer sample (the reference's axis
permutation ``{a_y, -a_x, a_z}``, src/VIOSlam.cpp:274).

Decoding and rectification feed fixed-shape device buffers. The default
frame path is the NATIVE IO runtime (vslam_tpu.native): multi-threaded PNG
decode + host-side rectification readahead, so the tracking loop never pays
decode latency inline (the reference pays imread+remap on its tracking
thread every frame, src/VIOSlam.cpp:292-306). Without the native library
(no toolchain/libpng) everything degrades to PIL decode with the remap on
device (vslam_tpu.geometry.camera.remap_bilinear).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, Sequence

import numpy as np

from vslam_tpu.utils.config import ConfigFile


def _native():
    """The native IO module, or None when it can't build/load here."""
    try:
        from vslam_tpu import native

        if native.available():
            return native
    except Exception:
        pass
    return None


@dataclasses.dataclass
class ImuSample:
    t: float  # seconds
    gyro: np.ndarray  # (3,) rad/s
    accel: np.ndarray  # (3,) m/s^2


@dataclasses.dataclass
class Frame:
    index: int
    t: float  # seconds
    left: np.ndarray  # (H, W) float32 grayscale in [0, 255]
    right: np.ndarray | None  # (H, W) or None in mono mode
    imu: np.ndarray  # (K, 7) [t, wx, wy, wz, ax, ay, az] samples since previous frame


def _load_gray(path: str) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        return np.asarray(im.convert("L"), dtype=np.float32)


def load_imu_csv(path: str) -> np.ndarray:
    """EuRoC imu0/data.csv -> (N, 7) [t_sec, wx, wy, wz, ax, ay, az].

    Replicates reference getAllIMUData (src/VIOSlam.cpp:23-73): timestamps
    are nanoseconds in column 0, gyro in 1:4, accel in 4:7. Parsed by the
    native C++ runtime when available, Python fallback otherwise.
    """
    nat = _native()
    if nat is not None:
        try:
            return nat.parse_imu_csv(path)
        except Exception:
            pass  # malformed edge the C parser refuses -> Python fallback
    rows = []
    with open(path, "r") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.replace(",", " ").split()
            vals = [float(p) for p in parts[:7]]
            vals[0] *= 1e-9  # ns -> s
            rows.append(vals)
    return np.asarray(rows, dtype=np.float64)


def bin_imu_per_frame(imu: np.ndarray, frame_times: np.ndarray) -> list[np.ndarray]:
    """Assign IMU samples to frames: frame i gets samples with
    t in (t_{i-1}, t_i] (first frame gets everything up to t_0).

    Matches the per-frame binning loop at reference src/VIOSlam.cpp:238-272.
    Returns a list of (K_i, 7) arrays.
    """
    bins: list[np.ndarray] = []
    prev = -np.inf
    for t in frame_times:
        mask = (imu[:, 0] > prev) & (imu[:, 0] <= t)
        bins.append(imu[mask])
        prev = t
    return bins


def gravity_from_first_accel(imu: np.ndarray) -> np.ndarray:
    """Gravity init exactly as the reference (src/VIOSlam.cpp:274): the axis
    permutation {a_y, -a_x, a_z} of the first accel sample. Not a proper
    estimator — reproduced for parity, see SURVEY.md quirks."""
    a = imu[0, 4:7]
    return np.array([a[1], -a[0], a[2]], dtype=np.float64)


def _prefetched_frames(left_paths, right_paths, times, bins, maps):
    """Frames through the native readahead pipeline: worker threads decode
    (and rectify, when `maps` is given) ahead of the consumer; delivery is
    strictly in order. `maps` = (lx, ly, rx, ry) float32 source-coordinate
    maps or None."""
    nat = _native()
    if maps is not None:
        h, w = maps[0].shape
    else:
        h, w = nat.probe_png(left_paths[0])
    pf = nat.Prefetcher(list(left_paths), list(right_paths) if right_paths else None,
                        h, w, maps=maps, threads=3)
    try:
        for idx, left, right in pf:
            yield Frame(
                index=idx,
                t=float(times[idx]),
                left=left,
                right=right,
                imu=bins[idx] if bins is not None else np.zeros((0, 7)),
            )
    finally:
        pf.close()


def _can_prefetch(paths) -> bool:
    return _native() is not None and all(p.endswith(".png") for p in paths[:1])


def _no_native_error() -> str:
    try:
        from vslam_tpu import native

        return native.build_error() or "native runtime unavailable"
    except Exception as e:  # pragma: no cover
        return str(e)


class KittiDataset:
    """KITTI odometry grayscale sequence: image_0/ (left), image_1/ (right),
    times.txt. Layout per reference src/VIOSlam.cpp:187-193."""

    def __init__(self, root: str, extension: str = ".png"):
        self.root = root
        self.left_dir = os.path.join(root, "image_0")
        self.right_dir = os.path.join(root, "image_1")
        self.names = sorted(
            n for n in os.listdir(self.left_dir) if n.endswith(extension)
        )
        times_file = os.path.join(root, "times.txt")
        if os.path.isfile(times_file):
            self.times = np.loadtxt(times_file, dtype=np.float64).reshape(-1)[: len(self.names)]
        else:
            self.times = np.arange(len(self.names), dtype=np.float64) * 0.1
        self.imu = np.zeros((0, 7))

    def __len__(self) -> int:
        return len(self.names)

    def frames(
        self, limit: int | None = None, maps=None, prefetch: bool = True
    ) -> Iterator[Frame]:
        n = len(self.names) if limit is None else min(limit, len(self.names))
        lefts = [os.path.join(self.left_dir, nm) for nm in self.names[:n]]
        rights = [os.path.join(self.right_dir, nm) for nm in self.names[:n]]
        if prefetch and _can_prefetch(lefts):
            yield from _prefetched_frames(lefts, rights, self.times, None, maps)
            return
        if maps is not None:
            raise RuntimeError(
                f"IO-side rectification needs the native runtime: {_no_native_error()}"
            )
        for i in range(n):
            yield Frame(
                index=i,
                t=float(self.times[i]),
                left=_load_gray(lefts[i]),
                right=_load_gray(rights[i]),
                imu=np.zeros((0, 7)),
            )


class EurocDataset:
    """EuRoC MAV: mav0/cam0/data/ + data.csv timestamps, imu0/data.csv.
    Layout per reference src/VIOSlam.cpp:194-205, 222-276."""

    def __init__(self, mav0_root: str, extension: str = ".png", mono: bool = False):
        self.root = mav0_root
        self.mono = mono
        cam0_csv = os.path.join(mav0_root, "cam0", "data.csv")
        names, times = [], []
        with open(cam0_csv, "r") as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                ts, name = line.split(",")[:2]
                names.append(name.strip())
                times.append(float(ts) * 1e-9)
        self.names = names
        self.times = np.asarray(times)
        imu_csv = os.path.join(mav0_root, "imu0", "data.csv")
        self.imu = load_imu_csv(imu_csv) if os.path.isfile(imu_csv) else np.zeros((0, 7))
        self._bins = bin_imu_per_frame(self.imu, self.times) if len(self.imu) else None

    def __len__(self) -> int:
        return len(self.names)

    def frames(
        self, limit: int | None = None, maps=None, prefetch: bool = True
    ) -> Iterator[Frame]:
        n = len(self.names) if limit is None else min(limit, len(self.names))
        lefts = [os.path.join(self.root, "cam0", "data", nm) for nm in self.names[:n]]
        rights = None
        if not self.mono:
            rights = [os.path.join(self.root, "cam1", "data", nm) for nm in self.names[:n]]
        if prefetch and _can_prefetch(lefts):
            yield from _prefetched_frames(lefts, rights, self.times, self._bins, maps)
            return
        if maps is not None:
            raise RuntimeError(
                f"IO-side rectification needs the native runtime: {_no_native_error()}"
            )
        for i in range(n):
            yield Frame(
                index=i,
                t=float(self.times[i]),
                left=_load_gray(lefts[i]),
                right=_load_gray(rights[i]) if rights is not None else None,
                imu=self._bins[i] if self._bins is not None else np.zeros((0, 7)),
            )


def open_dataset(conf: ConfigFile, data_root: str | None = None):
    """Instantiate the dataset named by a config (reference-style dispatch
    on the ``dataset`` key, src/VIOSlam.cpp:187-205)."""
    path = conf.get("imagesPath")
    if data_root is not None and not os.path.isabs(path):
        path = os.path.join(data_root, path)
    ext = str(conf.get("fileExtension", default=".png"))
    if conf.dataset.upper() == "KITTI":
        return KittiDataset(path, ext)
    mono = int(conf.get("slamMode")) == 2
    return EurocDataset(path, ext, mono=mono)
