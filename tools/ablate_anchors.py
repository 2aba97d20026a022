"""Ablation: local-BA anchor count vs synthetic ATE (bench scene).

Usage: python tools/ablate_anchors.py [n_anchors ...]
Runs the bench tracking+mapping loop at each anchor count and prints ATE.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run(n_anchors: int, n_frames: int = 60, ba: bool = True, async_ba: bool = False):
    import jax

    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    import vslam_tpu.models.local_mapper as lm_mod

    lm_mod.ANCHORS = n_anchors
    lm_mod.WTOT = lm_mod.WINDOW + n_anchors

    from vslam_tpu.models import local_mapper, map_state, tracker
    from vslam_tpu.utils import synthetic, trajectory

    scene = synthetic.make_scene(
        n_frames=n_frames, n_points=900, width=752, height=480, fps=20.0, seed=3
    )
    params = tracker.TrackerParams(n_features=1024, n_levels=8, active_size=4096)
    world = map_state.WorldMap(lm_capacity=1 << 15, kf_capacity=128, keys_per_kf=1024)
    trk = tracker.StereoTracker(
        scene.K.astype(np.float32), scene.baseline, scene.width, scene.height, world, params
    )
    mapper = local_mapper.LocalMapper(world, scene.K.astype(np.float32), scene.baseline)
    pending = [None]

    def consume():
        if pending[0] is not None:
            r = mapper.finish(pending[0])
            pending[0] = None
            trk.reanchor(r["kf_slot"], r["old_pose"], r["new_pose"])
            trk.add_active(r["new_lm_ids"])

    for f in range(n_frames):
        if async_ba:
            consume()
        n_kf = len(trk.new_kf_slots)
        trk.track(scene.render(f).astype(np.uint8), scene.render(f, right=True).astype(np.uint8))
        if ba and len(trk.new_kf_slots) > n_kf and trk.new_kf_slots[-1] > 0:
            if async_ba:
                pending[0] = mapper.run_async(trk.new_kf_slots[-1])
            else:
                r = mapper.run(trk.new_kf_slots[-1])
                trk.reanchor(r["kf_slot"], r["old_pose"], r["new_pose"])
                trk.add_active(r["new_lm_ids"])
    trk.flush()
    consume()
    poses = trk.trajectory()
    ate = trajectory.ate_rmse(poses, scene.poses_c2w[: len(poses)], align=False)
    errs = np.linalg.norm(poses[:, :3, 3] - scene.poses_c2w[: len(poses), :3, 3], axis=1)
    print(
        f"anchors={n_anchors} ba={ba}: ate={float(ate):.4f} final_err={errs[-1]:.4f} "
        f"kfs={world.n_keyframes} lms={world.n_landmarks} ba_runs={mapper.ba_count}",
        flush=True,
    )
    return float(ate)


if __name__ == "__main__":
    counts = [int(a) for a in sys.argv[1:]] or [0, 8]
    for c in counts:
        run(c)
