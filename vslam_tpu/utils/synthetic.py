"""Synthetic stereo(-inertial) scenes with exact ground truth.

The machine has no KITTI/EuRoC data, and the reference ships no tests
(SURVEY.md §4), so correctness is established on rendered scenes: a cloud
of textured 3D landmarks is splatted into a moving stereo rig; a smooth
analytic trajectory provides exact poses and exact IMU samples. Integration
tests assert ATE ~ 0 against these.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from vslam_tpu.geometry import se3

GRAVITY_W = np.array([0.0, 0.0, -9.81])


def _smooth_trajectory(n_frames: int, dt: float, speed: float = 1.2, yaw_rate: float = 0.05):
    """Analytic c2w poses: forward motion along +z with gentle lateral sine
    and slow yaw. Returns (N,4,4) poses, plus callables p(t), R(t)."""

    def pos(t):
        return np.stack(
            [0.35 * np.sin(0.5 * t), 0.2 * np.sin(0.33 * t), speed * t], axis=-1
        )

    def rotvec(t):
        return np.stack(
            [0.03 * np.sin(0.4 * t), yaw_rate * t, 0.02 * np.sin(0.6 * t)], axis=-1
        )

    ts = np.arange(n_frames) * dt
    import jax.numpy as jnp

    R = np.asarray(se3.so3_expmap(jnp.asarray(np.atleast_2d(rotvec(ts).reshape(-1, 3)), jnp.float64).astype(jnp.float32)))
    poses = np.tile(np.eye(4), (n_frames, 1, 1))
    poses[:, :3, :3] = R
    poses[:, :3, 3] = pos(ts)
    return ts, poses, pos, rotvec


def _make_patch(rng: np.random.Generator, size: int = 13) -> np.ndarray:
    """A high-contrast blob that triggers FAST and has a distinctive BRIEF
    signature: random binary texture with a bright core placed OFF-CENTER,
    so the intensity-centroid orientation is well-defined and stable
    across views (symmetric blobs have degenerate ORB angles)."""
    p = rng.uniform(0.0, 1.0, size=(size, size))
    p = (p > 0.5).astype(np.float32) * 170.0 + 30.0
    c = size // 2
    # off-center bright core: deterministic direction per patch
    oy, ox = rng.integers(-2, 3, size=2)
    p[c - 1 + oy : c + 2 + oy, c - 1 + ox : c + 2 + ox] = 250.0
    p[c, c] = 240.0
    return p


@dataclasses.dataclass
class SyntheticScene:
    width: int
    height: int
    K: np.ndarray  # (3,3)
    baseline: float
    points_w: np.ndarray  # (P, 3)
    patches: np.ndarray  # (P, S, S)
    times: np.ndarray  # (N,)
    poses_c2w: np.ndarray  # (N, 4, 4) left-camera-to-world
    velocities: np.ndarray  # (N, 3) exact world-frame velocity at frame times
    imu: np.ndarray  # (M, 7) [t, gyro, accel] exact body-frame samples
    imu_hz: float

    def render(self, frame: int, right: bool = False) -> np.ndarray:
        """Render one grayscale view by splatting patches at projected
        (sub-pixel rounded) locations. Nearest points drawn last (painter)."""
        T_wc = self.poses_c2w[frame].copy()
        if right:
            T_wc[:3, 3] += T_wc[:3, :3] @ np.array([self.baseline, 0, 0])
        T_cw = np.linalg.inv(T_wc)
        pc = (T_cw[:3, :3] @ self.points_w.T).T + T_cw[:3, 3]
        z = pc[:, 2]
        u = self.K[0, 0] * pc[:, 0] / np.maximum(z, 1e-6) + self.K[0, 2]
        v = self.K[1, 1] * pc[:, 1] / np.maximum(z, 1e-6) + self.K[1, 2]
        img = np.full((self.height, self.width), 15.0, dtype=np.float32)
        S = self.patches.shape[1]
        h = S // 2
        order = np.argsort(-z)  # far first
        for i in order:
            if z[i] < 0.3:
                continue
            ui, vi = int(round(u[i])), int(round(v[i]))
            if not (h <= ui < self.width - h and h <= vi < self.height - h):
                continue
            img[vi - h : vi + h + 1, ui - h : ui + h + 1] = self.patches[i]
        return img

    def project_points(self, frame: int, right: bool = False):
        """Exact (P,2) pixel locations + (P,) validity + depth for oracle checks."""
        T_wc = self.poses_c2w[frame].copy()
        if right:
            T_wc[:3, 3] += T_wc[:3, :3] @ np.array([self.baseline, 0, 0])
        T_cw = np.linalg.inv(T_wc)
        pc = (T_cw[:3, :3] @ self.points_w.T).T + T_cw[:3, 3]
        z = pc[:, 2]
        u = self.K[0, 0] * pc[:, 0] / np.maximum(z, 1e-6) + self.K[0, 2]
        v = self.K[1, 1] * pc[:, 1] / np.maximum(z, 1e-6) + self.K[1, 2]
        S = self.patches.shape[1]
        h = S // 2 + 1
        valid = (z > 0.3) & (u >= h) & (u < self.width - h) & (v >= h) & (v < self.height - h)
        return np.stack([u, v], axis=-1), valid, z


def make_scene(
    n_frames: int = 30,
    n_points: int = 400,
    width: int = 640,
    height: int = 480,
    fps: float = 10.0,
    imu_hz: float = 200.0,
    seed: int = 0,
) -> SyntheticScene:
    rng = np.random.default_rng(seed)
    dt = 1.0 / fps
    ts, poses, pos_fn, rotvec_fn = _smooth_trajectory(n_frames, dt)

    K = np.array([[460.0, 0, width / 2.0], [0, 460.0, height / 2.0], [0, 0, 1.0]])
    baseline = 0.12

    # landmarks in a slab in front of the whole trajectory
    total_len = 1.2 * n_frames * dt
    pts = np.stack(
        [
            rng.uniform(-6.0, 6.0, n_points),
            rng.uniform(-4.0, 4.0, n_points),
            rng.uniform(1.5, total_len + 14.0, n_points),
        ],
        axis=-1,
    )
    patches = np.stack([_make_patch(rng) for _ in range(n_points)])

    # exact IMU: finite-difference the analytic trajectory at high rate
    m = int(n_frames * dt * imu_hz)
    t_imu = (np.arange(m) + 1) * (1.0 / imu_hz)
    eps = 1e-4
    import jax.numpy as jnp

    def R_of(t):
        return np.asarray(
            se3.so3_expmap(jnp.asarray(rotvec_fn(np.atleast_1d(t)).reshape(-1, 3), jnp.float32))
        )

    R_t = R_of(t_imu)
    R_tp = R_of(t_imu + eps)
    dR = np.einsum("nij,nik->njk", R_t, R_tp)  # R^T R+
    gyro = np.asarray(se3.so3_logmap(jnp.asarray(dR, jnp.float32))) / eps
    acc_w = (
        pos_fn(t_imu + eps) - 2.0 * pos_fn(t_imu) + pos_fn(t_imu - eps)
    ) / eps**2
    spec_force_w = acc_w - GRAVITY_W
    accel = np.einsum("nji,nj->ni", R_t, spec_force_w)  # body frame: R^T f_w
    imu = np.concatenate([t_imu[:, None], gyro, accel], axis=1)

    vel = (pos_fn(ts + eps) - pos_fn(ts - eps)) / (2 * eps)

    return SyntheticScene(
        width=width,
        height=height,
        K=K,
        baseline=baseline,
        points_w=pts,
        patches=patches,
        times=ts,
        poses_c2w=poses,
        velocities=vel,
        imu=imu,
        imu_hz=imu_hz,
    )
