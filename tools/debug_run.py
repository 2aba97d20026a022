"""Synchronous mini-run with per-frame diagnostics (TPU or CPU)."""

import os
import sys
import time
import traceback

import numpy as np


def main():
    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from vslam_tpu.models import local_mapper, map_state, tracker
    from vslam_tpu.utils import synthetic, trajectory

    n_frames = int(os.environ.get("N_FRAMES", 40))
    scene = synthetic.make_scene(
        n_frames=n_frames, n_points=900, width=752, height=480, fps=20.0, seed=3
    )
    params = tracker.TrackerParams(n_features=1024, n_levels=8, active_size=4096)
    world = map_state.WorldMap(lm_capacity=1 << 15, kf_capacity=128, keys_per_kf=1024)
    trk = tracker.StereoTracker(
        scene.K.astype(np.float32), scene.baseline, scene.width, scene.height, world, params
    )
    mapper = local_mapper.LocalMapper(world, scene.K.astype(np.float32), scene.baseline)

    for f in range(n_frames):
        n_kf = len(trk.new_kf_slots)
        t0 = time.perf_counter()
        trk.track(scene.render(f).astype(np.uint8), scene.render(f, right=True).astype(np.uint8))
        dt = (time.perf_counter() - t0) * 1000
        s = trk.last_stats
        gt = scene.poses_c2w[max(f - 1, 0)]
        err = np.linalg.norm(trk.pose[:3, 3] - gt[:3, 3])
        print(
            f"f={f:3d} {dt:7.1f}ms kf={len(trk.new_kf_slots)} "
            f"m={s.get('n_matched', 0):4d} inl={s.get('n_inliers', 0):4d} "
            f"st={s.get('n_stereo_inliers', 0):4d} keys={s.get('n_keys', 0):4d} "
            f"err={err:7.3f} finite={np.isfinite(trk.pose).all()}"
        )
        if len(trk.new_kf_slots) > n_kf and trk.new_kf_slots[-1] > 0:
            try:
                r = mapper.run(trk.new_kf_slots[-1])
                trk.reanchor(r["kf_slot"], r["old_pose"], r["new_pose"])
                trk.add_active(r["new_lm_ids"])
                print(f"   BA ok: err={r['error']:.1f} new={len(r['new_lm_ids'])} killed={r['n_killed']}")
            except Exception:
                traceback.print_exc()
                sys.exit(1)
    poses = trk.trajectory()
    ate = trajectory.ate_rmse(poses, scene.poses_c2w[: len(poses)], align=False)
    print("ATE:", ate)


if __name__ == "__main__":
    main()
