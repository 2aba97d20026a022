"""Run the full SLAM system end-to-end on a synthetic scene and report ATE.

Usage: python examples/run_synthetic.py [n_frames]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time

import numpy as np

from vslam_tpu.models import local_mapper, map_state, tracker
from vslam_tpu.utils import synthetic, trajectory


def main():
    n_frames = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    scene = synthetic.make_scene(
        n_frames=n_frames, n_points=600, width=640, height=480, seed=11
    )
    params = tracker.TrackerParams(n_features=1024, n_levels=8, active_size=4096)
    world = map_state.WorldMap(lm_capacity=1 << 15, kf_capacity=256, keys_per_kf=1024)
    trk = tracker.StereoTracker(
        scene.K.astype(np.float32), scene.baseline, scene.width, scene.height, world, params
    )
    mapper = local_mapper.LocalMapper(world, scene.K.astype(np.float32), scene.baseline)

    t0 = time.time()
    for f in range(n_frames):
        n_kf = len(trk.new_kf_slots)
        pose = trk.track(scene.render(f), scene.render(f, right=True))
        if len(trk.new_kf_slots) > n_kf and trk.new_kf_slots[-1] > 0:
            r = mapper.run(trk.new_kf_slots[-1])
            trk.reanchor(r["kf_slot"], r["old_pose"], r["new_pose"])
            # merge BA-triangulated landmarks into the active set (also
            # re-gathers the device-side copies BA just moved)
            trk.add_active(r["new_lm_ids"])
        err = np.linalg.norm(pose[:3, 3] - scene.poses_c2w[f][:3, 3])
        print(f"frame {f:3d}  t_err {err*100:6.2f} cm  kfs {world.n_keyframes}  lms {world.n_landmarks}")
    wall = time.time() - t0

    est = trk.trajectory()
    ate = trajectory.ate_rmse(est, scene.poses_c2w[: len(est)], align=False)
    ate_aligned = trajectory.ate_rmse(est, scene.poses_c2w[: len(est)], align=True)
    print(f"\nATE RMSE: {ate*100:.2f} cm (unaligned)  {ate_aligned*100:.2f} cm (aligned)")
    print(f"{n_frames} frames in {wall:.1f}s ({n_frames/wall:.1f} fps incl. compile)")


if __name__ == "__main__":
    main()
