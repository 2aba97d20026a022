"""Dataset readers: KITTI odometry, EuRoC MAV, and synthetic scenes.

Host-side replacement for the reference drivers' dataset plumbing
(reference src/VIOSlam.cpp:141-316): directory enumeration (KITTI
``image_0/ image_1/``, EuRoC ``cam0/data/`` + ``data.csv``), IMU CSV
parsing, per-frame IMU binning (reference src/VIOSlam.cpp:238-272), and
gravity init from the first accelerometer sample (the reference's axis
permutation ``{a_y, -a_x, a_z}``, src/VIOSlam.cpp:274).

Decoding and rectification feed fixed-shape device buffers; the per-frame
remap runs on device (vslam_tpu.geometry.camera.remap_bilinear).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Iterator, Sequence

import numpy as np

from vslam_tpu.utils.config import ConfigFile


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
    are nanoseconds in column 0, gyro in 1:4, accel in 4:7.
    """
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

    def frames(self, limit: int | None = None) -> Iterator[Frame]:
        n = len(self.names) if limit is None else min(limit, len(self.names))
        for i in range(n):
            yield Frame(
                index=i,
                t=float(self.times[i]),
                left=_load_gray(os.path.join(self.left_dir, self.names[i])),
                right=_load_gray(os.path.join(self.right_dir, self.names[i])),
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

    def frames(self, limit: int | None = None) -> Iterator[Frame]:
        n = len(self.names) if limit is None else min(limit, len(self.names))
        for i in range(n):
            left = _load_gray(os.path.join(self.root, "cam0", "data", self.names[i]))
            right = None
            if not self.mono:
                right = _load_gray(os.path.join(self.root, "cam1", "data", self.names[i]))
            yield Frame(
                index=i,
                t=float(self.times[i]),
                left=left,
                right=right,
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
