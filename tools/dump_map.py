"""Dump map/BA-input checksums at each KF for HEAD-vs-WIP divergence diff."""

import os
import sys

import numpy as np


def main(out_path):
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from vslam_tpu.models import local_mapper, map_state, tracker

    from vslam_tpu.utils import synthetic

    n_frames = 16
    scene = synthetic.make_scene(
        n_frames=40, n_points=900, width=752, height=480, fps=20.0, seed=3
    )
    params = tracker.TrackerParams(n_features=1024, n_levels=8, active_size=4096)
    world = map_state.WorldMap(lm_capacity=1 << 15, kf_capacity=128, keys_per_kf=1024)
    trk = tracker.StereoTracker(
        scene.K.astype(np.float32), scene.baseline, scene.width, scene.height, world, params
    )
    mapper = local_mapper.LocalMapper(world, scene.K.astype(np.float32), scene.baseline)

    dumps = {}

    def snap(tag):
        m = world.arrays
        dumps[f"{tag}.lm_pos"] = np.asarray(m.lm_pos)
        dumps[f"{tag}.lm_valid"] = np.asarray(m.lm_valid)
        dumps[f"{tag}.lm_desc_sum"] = np.asarray(m.lm_desc).astype(np.int64).sum(1)
        dumps[f"{tag}.kf_pose"] = np.asarray(m.kf_pose)
        dumps[f"{tag}.obs_lm"] = np.asarray(m.obs_lm)
        dumps[f"{tag}.obs_uv"] = np.asarray(m.obs_uv)
        dumps[f"{tag}.kf_obs_lm_host"] = world.kf_obs_lm.copy()
        dumps[f"{tag}.active_ids"] = trk.active_ids.copy()
        dumps[f"{tag}.miss_age"] = np.asarray(trk.miss_age).copy()
        dumps[f"{tag}.pose"] = trk.pose.copy()

    for f in range(n_frames):
        n_kf = len(trk.new_kf_slots)
        trk.track(scene.render(f).astype(np.uint8), scene.render(f, right=True).astype(np.uint8))
        if hasattr(trk, "flush"):
            trk.flush()
        if len(trk.new_kf_slots) > n_kf:
            slot = trk.new_kf_slots[-1]
            snap(f"f{f}_kf{slot}_pre")
            if slot > 0:
                ids = mapper.find_new_points(slot)
                snap(f"f{f}_kf{slot}_tri")
                r = mapper.run_ba_only(slot) if hasattr(mapper, "run_ba_only") else None
                if r is None:
                    # emulate: run() does find_new_points again; to keep one
                    # triangulation pass, call internals directly
                    p, kf_slots, kf_valid, lm_ids, lm_valid = mapper._assemble(slot)
                    dumps[f"f{f}_kf{slot}.ba_obs_valid"] = np.asarray(p.obs_valid)
                    dumps[f"f{f}_kf{slot}.ba_obs_uv"] = np.asarray(p.obs_uv)
                    dumps[f"f{f}_kf{slot}.ba_pts"] = np.asarray(p.pts)
                    dumps[f"f{f}_kf{slot}.ba_poses"] = np.asarray(p.poses)
                    dumps[f"f{f}_kf{slot}.ba_kf_slots"] = kf_slots
                    from vslam_tpu.ops import schur

                    p1, err1, _ = schur.local_ba(p, iters=5)
                    chi2 = schur.obs_chi2(p1)
                    keep = p1.obs_valid & (chi2 < schur.CHI2_THR)
                    p2, err2, _ = schur.local_ba(p1._replace(obs_valid=keep), iters=10)
                    dumps[f"f{f}_kf{slot}.ba_err"] = np.array([float(err1), float(err2)])
                    # write back exactly like run() does
                    import jax.numpy as jnp

                    K_keys = world.keys_per_kf
                    obs_kill_kf = jnp.asarray(kf_slots, jnp.int32)[p2.obs_kf]
                    obs_kill_key = jnp.asarray(
                        np.tile(np.arange(K_keys, dtype=np.int32), local_mapper.WINDOW)
                    )
                    chi2f = schur.obs_chi2(p2)
                    kill = p2.obs_valid & (chi2f >= schur.CHI2_THR)
                    old_pose = world.kf_poses_host[slot].copy()
                    world.arrays = map_state.writeback_ba(
                        world.arrays,
                        jnp.asarray(kf_slots, jnp.int32),
                        jnp.asarray(kf_valid),
                        p2.poses,
                        jnp.asarray(lm_ids, jnp.int32),
                        jnp.asarray(lm_valid),
                        p2.pts,
                        obs_kill_kf,
                        obs_kill_key,
                        kill,
                    )
                    new_poses = np.asarray(p2.poses)
                    for i, (s2, v) in enumerate(zip(kf_slots, kf_valid)):
                        if v:
                            world.kf_poses_host[s2] = new_poses[i]
                    kill_host = np.asarray(kill)
                    if kill_host.any():
                        kkf = np.asarray(obs_kill_kf)[kill_host]
                        kkey = np.asarray(obs_kill_key)[kill_host]
                        world.kf_obs_lm[kkf, kkey] = -1
                    trk.reanchor(slot, old_pose, world.kf_poses_host[slot].copy())
                    trk.add_active(ids)
                    snap(f"f{f}_kf{slot}_post")

    np.savez_compressed(out_path, **dumps)
    print("dumped", len(dumps), "arrays to", out_path)


if __name__ == "__main__":
    main(sys.argv[1])
