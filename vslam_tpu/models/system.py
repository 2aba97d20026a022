"""System facade: configuration -> components -> per-frame API.

Equivalent of reference VSlamSystem (include/System.h:15-57,
src/System.cpp): wires cameras/extraction/tracker/map from one YAML config,
dispatches TrackStereo / TrackStereoIMU / TrackMonoIMU per mode, runs the
local mapper per keyframe (synchronously by default, or on a background
thread like the reference's LocalMapper thread, src/System.cpp:18-19), and
saves trajectories in the reference's KITTI 3x4 format
(src/System.cpp:87-124).
"""

from __future__ import annotations

import queue
import threading

import jax.numpy as jnp
import numpy as np

from vslam_tpu.geometry import camera as cam
from vslam_tpu.models import local_mapper, map_state, tracker
from vslam_tpu.utils.config import ConfigFile, SlamMode
from vslam_tpu.utils import trajectory as traj_io


class VSlamSystem:
    def __init__(
        self,
        conf: ConfigFile,
        mode: SlamMode | None = None,
        async_ba: bool = False,
        lm_capacity: int = 1 << 16,
        kf_capacity: int = 1024,
        tracker_params: tracker.TrackerParams | None = None,
    ):
        self.conf = conf
        self.mode = mode if mode is not None else conf.slam_mode
        self.rig = cam.StereoCamera.from_config(conf)
        K = self.rig.left.intrinsics.astype(np.float32)

        fe_total = int(conf.get("FE", "nFeatures", default=2048))
        params = tracker_params or tracker.TrackerParams(
            n_features=_round_pow2(fe_total),
            n_levels=int(conf.get("FE", "nLevels", default=8)),
            scale=float(conf.get("FE", "imScale", default=1.2)),
            fast_hi=float(conf.get("FE", "maxFastThreshold", default=20)),
            fast_lo=float(conf.get("FE", "minFastThreshold", default=7)),
            edge_margin=int(conf.get("FE", "edgeThreshold", default=19)),
        )
        self.world = map_state.WorldMap(
            lm_capacity=lm_capacity,
            kf_capacity=kf_capacity,
            keys_per_kf=params.n_features,
        )
        self.tracker = tracker.StereoTracker(
            K, self.rig.baseline, self.rig.width, self.rig.height, self.world, params
        )
        self.mapper = local_mapper.LocalMapper(
            self.world,
            K,
            self.rig.baseline,
            local_mapper.LocalMapperConfig(
                n_levels=params.n_levels, scale=params.scale
            ),
        )

        # rectification (EuRoC-style unrectified rigs)
        self._maps = None
        if not conf.rectified and self.rig.left.K is not None:
            ml = cam.init_undistort_rectify_map(
                self.rig.left.K, self.rig.left.D, self.rig.left.R, self.rig.left.P,
                self.rig.width, self.rig.height,
            )
            mr = cam.init_undistort_rectify_map(
                self.rig.right.K, self.rig.right.D, self.rig.right.R, self.rig.right.P,
                self.rig.width, self.rig.height,
            )
            self._maps = (jnp.asarray(ml), jnp.asarray(mr))

        self._async = async_ba
        self._ba_queue: "queue.Queue[int]" = queue.Queue()
        self._ba_results: "queue.Queue[dict]" = queue.Queue()
        self._ba_thread = None
        self._stop = threading.Event()
        if async_ba:
            self._ba_thread = threading.Thread(target=self._ba_loop, daemon=True)
            self._ba_thread.start()

    # ------------------------------------------------------------------
    def _rectify(self, left, right):
        if self._maps is None:
            return left, right
        L = cam.remap_bilinear(jnp.asarray(left, jnp.float32), self._maps[0])
        R = cam.remap_bilinear(jnp.asarray(right, jnp.float32), self._maps[1])
        return np.asarray(L), np.asarray(R)

    def _ba_loop(self):
        while not self._stop.is_set():
            try:
                slot = self._ba_queue.get(timeout=0.02)
            except queue.Empty:
                continue
            # drain to the newest KF (the reference only ever BA's the last)
            while True:
                try:
                    slot = self._ba_queue.get_nowait()
                except queue.Empty:
                    break
            self._ba_results.put(self.mapper.run(slot))

    def _consume_ba_results(self):
        while True:
            try:
                r = self._ba_results.get_nowait()
            except queue.Empty:
                return
            self.tracker.reanchor(r["kf_slot"], r["old_pose"], r["new_pose"])

    # ------------------------------------------------------------------
    def track_stereo(self, left: np.ndarray, right: np.ndarray, imu=None) -> np.ndarray:
        """Process one frame; returns the (4,4) cam-to-world pose
        (reference TrackStereo/TrackStereoIMU, src/System.cpp:72-85)."""
        left, right = self._rectify(left, right)
        if self._async:
            self._consume_ba_results()
        n_kf_before = len(self.tracker.new_kf_slots)
        pose = self.tracker.track(left, right, imu)
        if len(self.tracker.new_kf_slots) > n_kf_before:
            slot = self.tracker.new_kf_slots[-1]
            if slot > 0:  # BA needs at least 2 KFs
                if self._async:
                    self._ba_queue.put(slot)
                else:
                    r = self.mapper.run(slot)
                    self.tracker.reanchor(r["kf_slot"], r["old_pose"], r["new_pose"])
        return pose

    def exit(self):
        """Drain the BA thread (the reference's ExitSystem is an empty stub,
        src/System.cpp:67-70 — here it actually joins)."""
        if self._ba_thread is not None:
            self._stop.set()
            self._ba_thread.join(timeout=10.0)
        if self._async:
            self._consume_ba_results()

    # ------------------------------------------------------------------
    def trajectory(self) -> np.ndarray:
        return self.tracker.trajectory()

    def save_trajectory(self, path: str, times: np.ndarray | None = None):
        poses = self.trajectory()
        traj_io.save_kitti_trajectory(path, poses)
        if times is not None:
            traj_io.save_tum_trajectory(path + ".tum", times[: len(poses)], poses)


def _round_pow2(n: int) -> int:
    """Round feature counts to a power of two for tiling-friendly shapes."""
    p = 1
    while p < n:
        p *= 2
    return p
