"""Strong-scaling measurement of the sharded local BA.

Times LM iterations/s of the SAME kernel the live mapper dispatches
(schur.local_ba under shard_map, observations sharded + psum assembly +
landmark-slab Schur reduction) at the realistic live problem size
(WTOT=20 pose slots, 4096 landmark slots, ~25k observation rows) on
1/2/4/8 shards of the virtual CPU mesh (BASELINE.md target: >= 1.6x
going 1 -> 2 shards). Run:

    python tools/measure_ba_scaling.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map

from vslam_tpu.geometry import se3
from vslam_tpu.ops import schur
from vslam_tpu.parallel import mesh as mesh_mod, sharded_ba


def build_problem(Wn=20, L=4096, obs_per_lm=6, seed=0):
    rng = np.random.default_rng(seed)
    O = L * obs_per_lm
    poses = []
    for i in range(Wn):
        xi = np.array([0.002 * i, 0.01 * i, 0.001 * i, 0.2 * i, 0.01 * i, 0.0], np.float32)
        poses.append(np.asarray(se3.se3_expmap(jnp.asarray(xi))))
    poses = np.stack(poses)
    pts = np.stack(
        [rng.uniform(-5, 5, L), rng.uniform(-3, 3, L), rng.uniform(6, 30, L)], -1
    ).astype(np.float32)
    obs_lm = np.tile(np.arange(L), obs_per_lm)
    obs_kf = ((obs_lm + np.arange(O) % obs_per_lm) % Wn).astype(np.int32)
    Tcw = np.linalg.inv(poses)
    pc = np.einsum("oij,oj->oi", Tcw[obs_kf][:, :3, :3], pts[obs_lm]) + Tcw[obs_kf][:, :3, 3]
    u = 460.0 * pc[:, 0] / pc[:, 2] + 376.0
    v = 460.0 * pc[:, 1] / pc[:, 2] + 240.0
    ur = 460.0 * (pc[:, 0] - 0.12) / pc[:, 2] + 376.0
    # noise so the LM loop has real work at every iteration
    u += rng.normal(0, 0.5, O)
    v += rng.normal(0, 0.5, O)
    fixed = np.zeros(Wn, bool)
    fixed[0] = True
    fixed[12:] = True
    return schur.BAProblem(
        poses=jnp.asarray(poses),
        fixed=jnp.asarray(fixed),
        pose_valid=jnp.ones(Wn, bool),
        pts=jnp.asarray(pts + rng.normal(0, 0.05, pts.shape).astype(np.float32)),
        pt_valid=jnp.ones(L, bool),
        obs_kf=jnp.asarray(obs_kf),
        obs_lm=jnp.asarray(obs_lm.astype(np.int32)),
        obs_uv=jnp.asarray(np.stack([u, v, ur], -1).astype(np.float32)),
        obs_stereo=jnp.asarray(np.arange(O) % 2 == 0),
        obs_right=jnp.zeros(O, bool),
        obs_w=jnp.ones(O, jnp.float32),
        obs_valid=jnp.asarray(pc[:, 2] > 0.1),
        K=jnp.asarray([[460.0, 0, 376.0], [0, 460.0, 240.0], [0, 0, 1.0]], jnp.float32),
        baseline=jnp.float32(0.12),
        odo_rel=jnp.asarray(
            np.stack([Tcw[i] @ poses[i + 1] for i in range(Wn - 1)]).astype(np.float32)
        ),
        odo_valid=jnp.asarray(np.arange(Wn - 1) < 11),
    )


def make_step(mesh, iters):
    """shard_map'd local_ba with rel_tol=0 (no early exit) for timing."""

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=tuple(P() for _ in range(16)),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def run(poses, fixed, pose_valid, pts, pt_valid,
            obs_kf, obs_lm, obs_uv, obs_stereo, obs_right, obs_w, obs_valid,
            K, baseline, odo_rel, odo_valid):
        p = schur.BAProblem(
            poses=poses, fixed=fixed, pose_valid=pose_valid,
            pts=pts, pt_valid=pt_valid,
            obs_kf=obs_kf, obs_lm=obs_lm, obs_uv=obs_uv,
            obs_stereo=obs_stereo, obs_right=obs_right,
            obs_w=obs_w, obs_valid=obs_valid, K=K, baseline=baseline,
            odo_rel=odo_rel, odo_valid=odo_valid,
        )
        p2, err, _ = schur.local_ba(
            p, iters=iters, rel_tol=0.0, axis_name=sharded_ba.AXIS
        )
        return p2.poses, p2.pts, err

    return jax.jit(run)


def time_step(step, p, n=3):
    args = (
        p.poses, p.fixed, p.pose_valid, p.pts, p.pt_valid,
        p.obs_kf, p.obs_lm, p.obs_uv, p.obs_stereo, p.obs_right,
        p.obs_w, p.obs_valid, p.K, p.baseline, p.odo_rel, p.odo_valid,
    )
    out = step(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = step(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def run_suite(name, p):
    O = p.obs_kf.shape[0]
    print(f"[{name}] W={p.poses.shape[0]} L={p.pts.shape[0]} O={O}")
    results = {}
    for n in (1, 2, 4, 8):
        mesh = mesh_mod.make_mesh(n, axis=sharded_ba.AXIS)
        t_hi = time_step(make_step(mesh, 21), p)
        t_lo = time_step(make_step(mesh, 1), p)
        per_iter = (t_hi - t_lo) / 20.0
        results[n] = 1.0 / per_iter
        print(
            f"  shards={n}: {1000*per_iter:.2f} ms/LM-iter -> "
            f"{results[n]:.1f} iters/s (vs 1-shard: {results[n]/results[1]:.2f}x)"
        )
    print(f"  1->2 scaling: {results[2]/results[1]:.2f}x   1->8: {results[8]/results[1]:.2f}x")
    return results


def run_slab_compute(name, Wn, L_full, obs_per_lm=6):
    """Per-shard COMPUTE scaling: time the unsharded kernel at slab sizes
    L_full/n — the work each shard of an n-device mesh performs. On one
    shared-thread-pool CPU host the end-to-end mesh numbers above cannot
    show strong scaling (the 1-shard baseline already uses every core via
    XLA intra-op threads); the slab series isolates what real separate
    chips would each run."""
    print(f"[{name}] W={Wn} L_full={L_full}")
    base = None
    for n in (1, 2, 4, 8):
        L = L_full // n
        p = build_problem(Wn=Wn, L=L, obs_per_lm=obs_per_lm)
        mesh = mesh_mod.make_mesh(1, axis=sharded_ba.AXIS)
        t_hi = time_step(make_step(mesh, 21), p)
        t_lo = time_step(make_step(mesh, 1), p)
        per_iter = (t_hi - t_lo) / 20.0
        base = base or per_iter
        print(
            f"  slab L/{n}={L}: {1000*per_iter:.2f} ms/LM-iter "
            f"(vs full: {base/per_iter:.2f}x)"
        )


def main():
    # live local-BA shape
    run_suite("local window", build_problem())
    # grown global-BA shape (the long-context scaling story, SURVEY.md §5:
    # a 64-KF window over the full landmark table)
    run_suite("global window", build_problem(Wn=64, L=16384, obs_per_lm=6))
    run_slab_compute("global window slab compute", Wn=64, L_full=16384)


if __name__ == "__main__":
    main()
