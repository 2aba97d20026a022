"""End-to-end tracking on a synthetic scene with exact ground truth
(the integration tier of SURVEY.md §4's designed test strategy)."""

import numpy as np
import pytest

from vslam_tpu.models import local_mapper, map_state, tracker
from vslam_tpu.utils import synthetic, trajectory


@pytest.fixture(scope="module")
def small_params():
    return tracker.TrackerParams(
        n_features=512,
        n_levels=4,
        active_size=1024,
        spawn_per_kf=256,
        kf_min_stereo=60,
    )


@pytest.fixture(scope="module")
def scene():
    return synthetic.make_scene(
        n_frames=12, n_points=400, width=320, height=240, fps=10.0, seed=7
    )


def _run_tracking(scene, params, n_frames, with_ba=False):
    world = map_state.WorldMap(lm_capacity=8192, kf_capacity=64, keys_per_kf=params.n_features)
    trk = tracker.StereoTracker(
        scene.K.astype(np.float32), scene.baseline, scene.width, scene.height, world, params
    )
    mapper = (
        local_mapper.LocalMapper(world, scene.K.astype(np.float32), scene.baseline)
        if with_ba
        else None
    )
    poses = []
    for f in range(n_frames):
        n_kf = len(trk.new_kf_slots)
        pose = trk.track(scene.render(f), scene.render(f, right=True))
        poses.append(pose)
        if mapper is not None and len(trk.new_kf_slots) > n_kf:
            slot = trk.new_kf_slots[-1]
            if slot > 0:
                r = mapper.run(slot)
                trk.reanchor(r["kf_slot"], r["old_pose"], r["new_pose"])
    return trk, np.stack(poses)


def test_stereo_tracking_follows_ground_truth(scene, small_params):
    n = 8
    trk, poses = _run_tracking(scene, small_params, n)
    gt = scene.poses_c2w[:n]
    # no alignment: both start at identity
    ate = trajectory.ate_rmse(poses, gt, align=False)
    assert ate < 0.08, ate
    # per-frame drift stays bounded
    errs = np.linalg.norm(poses[:, :3, 3] - gt[:n, :3, 3], axis=1)
    assert errs[-1] < 0.15, errs
    # the map actually grew and KFs were created
    assert trk.world.n_landmarks > 100
    assert trk.world.n_keyframes >= 1


def test_stereo_tracking_with_local_ba(scene, small_params):
    n = 12
    trk, poses = _run_tracking(scene, small_params, n, with_ba=True)
    gt = scene.poses_c2w[:n]
    ate = trajectory.ate_rmse(poses, gt, align=False)
    assert ate < 0.08, ate
    traj = trk.trajectory()
    assert len(traj) == n
    ate2 = trajectory.ate_rmse(traj, gt, align=False)
    assert ate2 < 0.1, ate2
