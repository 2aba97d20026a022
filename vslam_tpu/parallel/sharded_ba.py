"""Distributed local/global bundle adjustment over a device mesh.

The Schur-complement reduced camera system is a sum over landmarks of
per-landmark outer products:

    S = Hpp - sum_l Hpl[:, l] Hll[l]^-1 Hpl[:, l]^T

so sharding landmarks (and their observations) over the mesh's `lm` axis
makes each device compute a partial (6W x 6W) reduced system from its own
landmark block; a `psum` over ICI assembles the full S and reduced
gradient; the small dense solve is replicated; and landmark
back-substitution stays local to each shard. This is the TPU-native
replacement for scaling the reference's GTSAM window BA
(SURVEY.md §5 long-context mapping; BASELINE.json >= 1.6x 1->2 host
target — the same shard_map runs over DCN for multi-host meshes).

Observations must be pre-partitioned so each shard's observations
reference only its own landmark rows (local indices); the host-side
partitioner :func:`partition_obs` does this grouping.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
try:  # jax >= 0.8 promotes shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from vslam_tpu.geometry import se3
from vslam_tpu.ops import schur


def partition_obs(
    obs_lm: np.ndarray,  # (O,) global landmark row per observation
    n_shards: int,
    n_landmarks: int,
    obs_valid: np.ndarray | None = None,
):
    """Group observations by the landmark shard that owns them.

    Returns (perm (n_shards, O_per) indices into the original obs arrays,
    local_lm (n_shards, O_per) per-shard-local landmark rows, valid mask).
    n_landmarks must be divisible by n_shards. O_per is the largest
    per-shard count (rounded up to a multiple of 8 for tiling), so no
    observation is ever dropped — uneven shards are padded, not truncated.
    """
    O = len(obs_lm)
    per_shard_lm = n_landmarks // n_shards
    shard_of = np.clip(obs_lm, 0, n_landmarks - 1) // per_shard_lm
    if obs_valid is None:
        obs_valid = np.ones(O, bool)
    counts = np.bincount(shard_of[obs_valid], minlength=n_shards)
    o_per = max(8, int(-(-int(counts.max()) // 8) * 8))
    perm = np.zeros((n_shards, o_per), np.int32)
    local = np.zeros((n_shards, o_per), np.int32)
    valid = np.zeros((n_shards, o_per), bool)
    for s in range(n_shards):
        idx = np.nonzero((shard_of == s) & obs_valid)[0]
        perm[s, : len(idx)] = idx
        local[s, : len(idx)] = obs_lm[idx] - s * per_shard_lm
        valid[s, : len(idx)] = True
    return perm, local, valid


def sharded_ba_iteration(mesh: Mesh):
    """Build a jitted single LM iteration over `mesh` (axis 'lm').

    The returned function takes replicated pose state + landmark/observation
    arrays sharded on their leading axis and returns updated (poses, pts,
    error). Shapes: poses (W,4,4); pts (L,3) with L % n_dev == 0; obs_*
    (O,) with O % n_dev == 0, obs_lm already LOCAL per shard.
    """
    n_dev = mesh.devices.size

    def one_shard_problem(poses, fixed, pose_valid, pts_l, pt_valid_l,
                          obs_kf, obs_lm_local, obs_uv, obs_stereo, obs_w,
                          obs_valid, Kmat, baseline, odo_rel, odo_valid):
        return schur.BAProblem(
            poses=poses, fixed=fixed, pose_valid=pose_valid,
            pts=pts_l, pt_valid=pt_valid_l,
            obs_kf=obs_kf, obs_lm=obs_lm_local, obs_uv=obs_uv,
            obs_stereo=obs_stereo, obs_right=jnp.zeros_like(obs_stereo),
            obs_w=obs_w, obs_valid=obs_valid,
            K=Kmat, baseline=baseline, odo_rel=odo_rel, odo_valid=odo_valid,
        )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(), P(), P(),          # poses, fixed, pose_valid (replicated)
            P("lm"), P("lm"),        # pts, pt_valid (sharded)
            P("lm"), P("lm"), P("lm"), P("lm"), P("lm"), P("lm"),  # obs arrays
            P(), P(), P(), P(),      # K, baseline, odo_rel, odo_valid
            P(),                     # lambda
        ),
        out_specs=(P(), P("lm"), P()),
    )
    def step(poses, fixed, pose_valid, pts, pt_valid,
             obs_kf, obs_lm_local, obs_uv, obs_stereo, obs_w, obs_valid,
             Kmat, baseline, odo_rel, odo_valid, lam):
        my = jax.lax.axis_index("lm")
        # odometry counted once (shard 0 only)
        odo_v = odo_valid & (my == 0)
        p = one_shard_problem(
            poses, fixed, pose_valid, pts, pt_valid,
            obs_kf, obs_lm_local, obs_uv, obs_stereo, obs_w, obs_valid,
            Kmat, baseline, odo_rel, odo_v,
        )
        Hpp, Hll, Hpl, gp, gl = schur._assemble(p)

        eye3 = jnp.eye(3)
        Hll_d = Hll + lam * eye3[None] * jnp.maximum(
            jnp.einsum("lii->l", Hll)[:, None, None] / 3.0, 1e-6
        )
        observed = jnp.einsum("lii->l", Hll) > 1e-12
        Hll_d = jnp.where(observed[:, None, None], Hll_d, eye3[None])
        Hll_inv = jnp.linalg.inv(Hll_d)

        S_part = Hpp - jnp.einsum("alij,ljk,blmk->abim", Hpl, Hll_inv, Hpl)
        b_part = gp - jnp.einsum("alij,ljk,lk->ai", Hpl, Hll_inv, gl)
        # partial error for LM accept/reject
        err_part = schur.ba_error(p)

        S = jax.lax.psum(S_part, "lm")
        b = jax.lax.psum(b_part, "lm")
        err = jax.lax.psum(err_part, "lm")

        # damping + gauge on the replicated reduced system
        W = poses.shape[0]
        eye6 = jnp.eye(6)
        free = (~fixed) & pose_valid
        diagW = jnp.einsum("aaii->a", S)
        S = S + lam * eye6[None, None] * jnp.where(
            jnp.eye(W, dtype=bool)[:, :, None, None],
            jnp.maximum(diagW / 6.0, 1e-6)[:, None, None, None],
            0.0,
        )
        fm = free[:, None] & free[None, :]
        S = jnp.where(fm[:, :, None, None], S, 0.0)
        S = S + jnp.where(
            (jnp.eye(W, dtype=bool) & ~jnp.diag(free))[:, :, None, None], eye6, 0.0
        )
        b = jnp.where(free[:, None], b, 0.0)
        S_dense = S.transpose(0, 2, 1, 3).reshape(6 * W, 6 * W)
        delta_p = jnp.linalg.solve(S_dense, -b.reshape(-1)).reshape(W, 6)

        rhs = -gl - jnp.einsum("alij,ai->lj", Hpl, delta_p)
        delta_l = jnp.einsum("ljk,lk->lj", Hll_inv, rhs)
        delta_l = jnp.where((observed & pt_valid)[:, None], delta_l, 0.0)

        new_poses = jax.vmap(se3.retract)(poses, delta_p)
        new_pts = pts + delta_l

        # new error (for caller's accept/reject)
        p_new = p._replace(poses=new_poses, pts=new_pts)
        new_err = jax.lax.psum(schur.ba_error(p_new), "lm")
        improved = new_err < err
        out_poses = jnp.where(improved, new_poses, poses)
        out_pts = jnp.where(improved, new_pts, pts)
        out_err = jnp.minimum(err, new_err)
        return out_poses, out_pts, out_err

    return jax.jit(step)


def sharded_local_ba(mesh: Mesh, p_args: dict, iters: int = 5, lambda0: float = 1e-4):
    """Host-driven LM loop calling the sharded iteration; returns
    (poses, pts, final error). `p_args` holds the step() inputs minus lam."""
    step = sharded_ba_iteration(mesh)
    lam = jnp.float32(lambda0)
    poses, pts = p_args["poses"], p_args["pts"]
    err_prev = None
    for _ in range(iters):
        poses2, pts2, err = step(
            poses, p_args["fixed"], p_args["pose_valid"], pts, p_args["pt_valid"],
            p_args["obs_kf"], p_args["obs_lm_local"], p_args["obs_uv"],
            p_args["obs_stereo"], p_args["obs_w"], p_args["obs_valid"],
            p_args["K"], p_args["baseline"], p_args["odo_rel"], p_args["odo_valid"],
            lam,
        )
        improved = err_prev is None or float(err) < float(err_prev)
        lam = lam * 0.1 if improved else lam * 10.0
        poses, pts, err_prev = poses2, pts2, err
    return poses, pts, err_prev
