"""Does local BA contract perturbations toward ground truth?

Synthetic window: W keyframes on a forward arc, L landmarks, exact
observations + pixel noise. Perturb poses and landmarks; run the production
5+10 LM schedule; report RMSE vs truth before/after (gauge-aligned to the
fixed KF). A healthy solver should shrink both by >5x.
"""

import os
import numpy as np

import jax

cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp

from vslam_tpu.geometry import se3
from vslam_tpu.ops import schur

rng = np.random.default_rng(0)
W, L = 8, 600
K = np.array([[460.0, 0, 376.0], [0, 460.0, 240.0], [0, 0, 1.0]], np.float32)
baseline = 0.12

# GT poses: forward motion, slight yaw
poses_gt = []
for i in range(W):
    xi = np.array([0.0, 0.01 * i, 0.0, 0.02 * i, 0.0, 0.35 * i], np.float32)
    poses_gt.append(np.asarray(se3.se3_expmap(jnp.asarray(xi))))
poses_gt = np.stack(poses_gt)

pts_gt = np.stack(
    [rng.uniform(-6, 6, L), rng.uniform(-4, 4, L), rng.uniform(2.0, 18.0, L)], -1
).astype(np.float32)

# observations: every (kf, lm) pair where the point is in view
obs = []
for w in range(W):
    Tcw = np.linalg.inv(poses_gt[w])
    pc = (Tcw[:3, :3] @ pts_gt.T).T + Tcw[:3, 3]
    z = pc[:, 2]
    u = 460.0 * pc[:, 0] / z + 376.0
    v = 460.0 * pc[:, 1] / z + 240.0
    ur = 460.0 * (pc[:, 0] - baseline) / z + 376.0
    ok = (z > 0.5) & (u > 10) & (u < 742) & (v > 10) & (v < 470)
    for l in np.where(ok)[0]:
        obs.append((w, l, u[l], v[l], ur[l]))
obs = np.array(obs, np.float32)
O = len(obs)
print(f"{O} observations over {W} KFs x {L} landmarks")

noise = rng.normal(0, 0.4, (O, 3)).astype(np.float32)
obs_uv = obs[:, 2:5] + noise

# perturbations
pose_pert = np.concatenate(
    [rng.normal(0, 0.002, (W, 3)), rng.normal(0, 0.01, (W, 3))], -1
).astype(np.float32)
pose_pert[0] = 0  # fixed KF stays at truth
poses0 = np.stack(
    [
        np.asarray(se3.retract(jnp.asarray(poses_gt[i]), jnp.asarray(pose_pert[i])))
        for i in range(W)
    ]
)
pts0 = pts_gt + rng.normal(0, 0.20, (L, 3)).astype(np.float32)

# odometry chain measured from GROUND TRUTH relative poses (what an ideal
# odometry prior would be); production uses current estimates — test both
for odo_mode in ["estimates", "truth", "off"]:
    if odo_mode == "truth":
        src = poses_gt
    else:
        src = poses0
    odo_rel = np.stack(
        [np.linalg.inv(src[i]) @ src[i + 1] for i in range(W - 1)]
    ).astype(np.float32)
    odo_valid = np.ones(W - 1, bool) if odo_mode != "off" else np.zeros(W - 1, bool)

    p = schur.BAProblem(
        poses=jnp.asarray(poses0),
        fixed=jnp.asarray(np.arange(W) == 0),
        pose_valid=jnp.ones(W, bool),
        pts=jnp.asarray(pts0),
        pt_valid=jnp.ones(L, bool),
        obs_kf=jnp.asarray(obs[:, 0].astype(np.int32)),
        obs_lm=jnp.asarray(obs[:, 1].astype(np.int32)),
        obs_uv=jnp.asarray(obs_uv),
        obs_stereo=jnp.ones(O, bool),
        obs_w=jnp.ones(O, jnp.float32),
        obs_valid=jnp.ones(O, bool),
        K=jnp.asarray(K),
        baseline=jnp.float32(baseline),
        odo_rel=jnp.asarray(odo_rel),
        odo_valid=jnp.asarray(odo_valid),
    )
    p1, err1, lam1 = schur.local_ba(p, iters=5)
    chi2 = schur.obs_chi2(p1)
    keep = p1.obs_valid & (chi2 < schur.CHI2_THR)
    p2, err2, lam2 = schur.local_ba(p1._replace(obs_valid=keep), iters=10)

    pe0 = np.linalg.norm(poses0[:, :3, 3] - poses_gt[:, :3, 3], axis=1)
    pe2 = np.linalg.norm(np.asarray(p2.poses)[:, :3, 3] - poses_gt[:, :3, 3], axis=1)
    le0 = np.linalg.norm(pts0 - pts_gt, axis=1)
    le2 = np.linalg.norm(np.asarray(p2.pts) - pts_gt, axis=1)
    print(
        f"odo={odo_mode:9s} pose rmse {pe0.mean():.4f} -> {pe2.mean():.4f} | "
        f"lm rmse {le0.mean():.4f} -> {le2.mean():.4f} | err {float(err1):.1f} -> "
        f"{float(err2):.1f} lam {float(lam2):.2e} kept {int(keep.sum())}/{O}"
    )
