"""Distributed BA tests on the virtual 8-device CPU mesh.

SURVEY.md §4's distributed-test strategy: the single-host and N-shard BA
must produce tolerance-identical updates, runnable without TPU pod hardware
via the conftest's 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np

from vslam_tpu.geometry import se3
from vslam_tpu.ops import schur
from vslam_tpu.parallel import mesh as mesh_mod
from vslam_tpu.parallel import sharded_ba

from tests.test_ba import _build_problem

N_DEV = 8


def _shard_problem(p: schur.BAProblem, n_shards: int):
    """Regroup a BAProblem's observations by landmark shard (local indices),
    returning the p_args dict `sharded_local_ba` consumes."""
    L = p.pts.shape[0]
    perm, local, valid = sharded_ba.partition_obs(
        np.asarray(p.obs_lm), n_shards, L, np.asarray(p.obs_valid)
    )
    flat = perm.reshape(-1)
    return dict(
        poses=p.poses,
        fixed=p.fixed,
        pose_valid=p.pose_valid,
        pts=p.pts,
        pt_valid=p.pt_valid,
        obs_kf=jnp.asarray(np.asarray(p.obs_kf)[flat]),
        obs_lm_local=jnp.asarray(local.reshape(-1)),
        obs_uv=jnp.asarray(np.asarray(p.obs_uv)[flat]),
        obs_stereo=jnp.asarray(np.asarray(p.obs_stereo)[flat]),
        obs_w=jnp.asarray(np.asarray(p.obs_w)[flat]),
        obs_valid=jnp.asarray(valid.reshape(-1)),
        K=p.K,
        baseline=p.baseline,
        odo_rel=p.odo_rel,
        odo_valid=p.odo_valid,
    )


def test_partition_obs_groups_by_shard():
    rng = np.random.default_rng(0)
    L, O, S = 64, 200, 8
    obs_lm = rng.integers(0, L, O)
    valid = rng.random(O) > 0.1
    perm, local, ok = sharded_ba.partition_obs(obs_lm, S, L, valid)
    per = L // S
    for s in range(S):
        sel = ok[s]
        # every kept observation maps back to its original row and shard
        assert (obs_lm[perm[s][sel]] // per == s).all()
        assert (local[s][sel] == obs_lm[perm[s][sel]] % per).all()
        assert valid[perm[s][sel]].all()
    # every valid observation appears exactly once (no shard overflow here)
    kept = np.concatenate([perm[s][ok[s]] for s in range(S)])
    assert len(kept) == len(set(kept.tolist()))
    assert len(kept) == valid.sum()


def test_sharded_ba_matches_single_device():
    """The 8-shard psum-assembled BA must land in the same solution as the
    single-device Schur BA (same problem, same ground truth)."""
    p, poses_gt, pts_gt = _build_problem(W=6, L=96, seed=1)
    mesh = mesh_mod.make_mesh(N_DEV, axis="lm")
    p_args = _shard_problem(p, N_DEV)

    poses_s, pts_s, err_s = sharded_ba.sharded_local_ba(mesh, p_args, iters=10)
    p1, err1, _ = schur.local_ba(p, iters=10)

    # both reach the ground-truth basin
    for w in range(len(poses_gt)):
        xi_s = np.asarray(
            se3.se3_logmap(jnp.asarray(np.linalg.inv(poses_gt[w]) @ np.asarray(poses_s)[w]))
        )
        assert np.abs(xi_s).max() < 2e-3, (w, xi_s)
    err_pts = np.linalg.norm(np.asarray(pts_s) - pts_gt, axis=1)
    assert np.median(err_pts) < 0.02

    # and agree with each other (same minimum, modest tolerance: the two
    # LM loops differ only in lambda bookkeeping)
    for w in range(len(poses_gt)):
        rel = np.linalg.inv(np.asarray(p1.poses)[w]) @ np.asarray(poses_s)[w]
        xi = np.asarray(se3.se3_logmap(jnp.asarray(rel)))
        assert np.abs(xi).max() < 2e-3, (w, xi)


def test_sharded_iteration_matches_dense_assembly():
    """One sharded LM step == one dense-assembly LM step (numerically):
    validates that psum over landmark shards assembles the same reduced
    camera system as the single-device einsum."""
    p, _, _ = _build_problem(W=4, L=64, seed=2)
    mesh = mesh_mod.make_mesh(N_DEV, axis="lm")
    p_args = _shard_problem(p, N_DEV)

    step = sharded_ba.sharded_ba_iteration(mesh)
    lam = jnp.float32(1e-4)
    poses_s, pts_s, err_s = step(
        p_args["poses"], p_args["fixed"], p_args["pose_valid"],
        p_args["pts"], p_args["pt_valid"],
        p_args["obs_kf"], p_args["obs_lm_local"], p_args["obs_uv"],
        p_args["obs_stereo"], p_args["obs_w"], p_args["obs_valid"],
        p_args["K"], p_args["baseline"], p_args["odo_rel"], p_args["odo_valid"],
        lam,
    )

    # dense single-device step with the same fixed lambda
    Hpp, Hll, Hpl, gp, gl = schur._assemble(p)
    dp, dl = schur._schur_solve(p, Hpp, Hll, Hpl, gp, gl, lam)
    poses_d = jax.vmap(se3.retract)(p.poses, dp)
    pts_d = p.pts + dl
    err0 = schur.ba_error(p)
    err_d = schur.ba_error(p._replace(poses=poses_d, pts=pts_d))
    if float(err_d) >= float(err0):  # both sides reject then
        poses_d, pts_d = p.poses, p.pts

    np.testing.assert_allclose(
        np.asarray(poses_s), np.asarray(poses_d), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(pts_s), np.asarray(pts_d), rtol=1e-4, atol=1e-4
    )


def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip dry run must compile + execute on the
    virtual mesh."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "__graft_entry__",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(N_DEV)
