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
        local_mapper.LocalMapper(
            world, scene.K.astype(np.float32), scene.baseline,
            local_mapper.LocalMapperConfig(
                n_levels=params.n_levels, scale=params.scale
            ),
        )
        if with_ba
        else None
    )
    for f in range(n_frames):
        n_kf = len(trk.new_kf_slots)
        trk.track(scene.render(f), scene.render(f, right=True))
        if mapper is not None and len(trk.new_kf_slots) > n_kf:
            slot = trk.new_kf_slots[-1]
            if slot > 0:
                r = mapper.run(slot)
                trk.reanchor(r["kf_slot"], r["old_pose"], r["new_pose"])
                trk.add_active(r["new_lm_ids"])
    # trajectory() drains the tracker's depth-1 dispatch pipeline and
    # recomposes per-frame poses (aligned 1:1 with the input frames)
    return trk, trk.trajectory()


def test_stereo_tracking_follows_ground_truth(scene, small_params):
    n = 8
    trk, poses = _run_tracking(scene, small_params, n)
    gt = scene.poses_c2w[:n]
    # no alignment: both start at identity. Principled bound: the renderer
    # is subpixel-consistent, so error comes only from detector/matcher
    # subpixel noise (~0.2 px) through stereo depth (z^2/(f*b) ~ 0.3 m/px
    # at z=4 m) — cm-scale drift over ~1 m of travel. Measured 0.015 ATE /
    # 0.033 final; gates at ~2x for cross-platform float variation.
    ate = trajectory.ate_rmse(poses, gt, align=False)
    assert ate < 0.03, ate
    # per-frame drift stays bounded
    errs = np.linalg.norm(poses[:, :3, 3] - gt[:n, :3, 3], axis=1)
    assert errs[-1] < 0.06, errs
    # the map actually grew and KFs were created
    assert trk.world.n_landmarks > 100
    assert trk.world.n_keyframes >= 1


def test_stereo_tracking_with_local_ba(scene, small_params):
    n = 12
    trk, poses = _run_tracking(scene, small_params, n, with_ba=True)
    gt = scene.poses_c2w[:n]
    # measured 0.013 ATE with BA (BA must not be worse than tracking
    # alone); gates at ~2x margin — see the no-BA test for the error model
    ate = trajectory.ate_rmse(poses, gt, align=False)
    assert ate < 0.03, ate
    traj = trk.trajectory()
    assert len(traj) == n
    ate2 = trajectory.ate_rmse(traj, gt, align=False)
    assert ate2 < 0.03, ate2


def test_stereo_imu_tracking_follows_ground_truth(scene, small_params):
    """Visual-inertial tracking (reference TrackStereoIMU path with
    CombinedImuFactor, src/FeatureTracker.cpp:301-387) on exact synthetic
    IMU: pose follows ground truth and the velocity state converges to the
    true world-frame velocity."""
    from vslam_tpu.utils import datasets, synthetic as syn

    imu_cfg = tracker.ImuConfig(
        gyro_noise=1.7e-4,
        accel_noise=2e-3,
        gyro_walk=1.9e-5,
        accel_walk=3e-3,
        hz=scene.imu_hz,
        T_bc=np.eye(4, dtype=np.float32),  # synthetic body == left camera
        gravity_w=syn.GRAVITY_W.astype(np.float32),
    )
    world = map_state.WorldMap(lm_capacity=8192, kf_capacity=64, keys_per_kf=small_params.n_features)
    trk = tracker.StereoTracker(
        scene.K.astype(np.float32), scene.baseline, scene.width, scene.height,
        world, small_params, imu_cfg=imu_cfg,
    )
    # the synthetic trajectory starts already moving; the reference's VI
    # bootstrap assumes starting at rest (EuRoC MAV on the ground), so seed
    # the true initial velocity — what a rest-start gives for free.
    trk.velocity = scene.velocities[0].astype(np.float32)
    bins = datasets.bin_imu_per_frame(scene.imu, scene.times)
    n = 10
    prev_t = None
    for f in range(n):
        rows = bins[f]
        dt_rows = None
        if len(rows):
            t = rows[:, 0]
            p0 = prev_t if prev_t is not None else t[0] - 1.0 / scene.imu_hz
            dts = np.diff(np.concatenate([[p0], t]))
            prev_t = float(t[-1])
            dt_rows = np.concatenate([dts[:, None], rows[:, 1:7]], axis=1).astype(np.float32)
        trk.track(scene.render(f), scene.render(f, right=True), imu=dt_rows)
    poses = trk.trajectory()  # flushes the pipeline
    gt = scene.poses_c2w[:n]
    ate = trajectory.ate_rmse(poses, gt, align=False)
    assert ate < 0.08, ate
    v_err = np.linalg.norm(trk.velocity - scene.velocities[n - 1])
    assert v_err < 0.5, (trk.velocity, scene.velocities[n - 1])


def test_mono_imu_tracking_follows_ground_truth(scene, small_params):
    """Monocular-inertial pipeline (reference TrackImageMonoIMU +
    VIOSlamMono driver): IMU bootstrap with 3 motion-gated keyframes,
    multi-view mono triangulation for the initial map, then projection+IMU
    tracking. Metric scale comes from the IMU dead-reckoned baselines."""
    from vslam_tpu.utils import datasets, synthetic as syn

    imu_cfg = tracker.ImuConfig(
        gyro_noise=1.7e-4, accel_noise=2e-3, gyro_walk=1.9e-5, accel_walk=3e-3,
        hz=scene.imu_hz, T_bc=np.eye(4, dtype=np.float32),
        gravity_w=syn.GRAVITY_W.astype(np.float32),
    )
    world = map_state.WorldMap(lm_capacity=8192, kf_capacity=64, keys_per_kf=small_params.n_features)
    trk = tracker.MonoTracker(
        scene.K.astype(np.float32), scene.width, scene.height, world,
        small_params, imu_cfg=imu_cfg,
    )
    mapper = local_mapper.LocalMapper(world, scene.K.astype(np.float32), 0.0)
    trk.velocity = scene.velocities[0].astype(np.float32)
    bins = datasets.bin_imu_per_frame(scene.imu, scene.times)
    n = 12
    prev_t = None
    for f in range(n):
        rows = bins[f]
        dt_rows = None
        if len(rows):
            t = rows[:, 0]
            p0 = prev_t if prev_t is not None else t[0] - 1.0 / scene.imu_hz
            dts = np.diff(np.concatenate([[p0], t]))
            prev_t = float(t[-1])
            dt_rows = np.concatenate([dts[:, None], rows[:, 1:7]], axis=1).astype(np.float32)
        trk.track(scene.render(f), imu=dt_rows)
        if trk.needs_init_triangulation:
            # this scene moves >0.1 m/frame, so every frame passes the
            # motion gate and views == gates; the slow-motion breadth
            # case is test_mono_bootstrap_records_intermediate_views
            assert len(trk.bootstrap_slots) >= len(trk.gate_slots) == 3
            ids = mapper.find_new_points(trk.new_kf_slots[-1], mono=True)
            trk.add_active(ids)
            trk.needs_init_triangulation = False
            trk.last_kf_tracked = max(len(ids), 1)
            assert len(ids) > 20, "mono init triangulated too few landmarks"
    assert trk.initialized
    poses = trk.trajectory()  # flushes the pipeline
    gt = scene.poses_c2w[:n]
    ate = trajectory.ate_rmse(poses, gt, align=False)
    # mono + exact IMU: metric-scale tracking should stay within ~15 cm
    assert ate < 0.15, ate


def test_mono_bootstrap_records_intermediate_views(small_params):
    """Under SLOW motion, frames between the 3 motion-gated bootstrap
    keyframes are still recorded as triangulation views (capped at the
    static window) — the reference's one-time mono init triangulates over
    ALL frames accumulated during bootstrap, not just the keyframes
    (addMappointsMono / matchByRadius over allFrames,
    src/FeatureTracker.cpp:1497-1633, src/FeatureMatcher.cpp:458-526)."""
    from vslam_tpu.utils import datasets, synthetic as syn

    # 40 fps -> ~0.03 m/frame: each 0.1 m motion gate needs ~3-4 frames
    slow = synthetic.make_scene(
        n_frames=16, n_points=400, width=320, height=240, fps=40.0, seed=7
    )
    imu_cfg = tracker.ImuConfig(
        gyro_noise=1.7e-4, accel_noise=2e-3, gyro_walk=1.9e-5, accel_walk=3e-3,
        hz=slow.imu_hz, T_bc=np.eye(4, dtype=np.float32),
        gravity_w=syn.GRAVITY_W.astype(np.float32),
    )
    world = map_state.WorldMap(lm_capacity=8192, kf_capacity=64, keys_per_kf=512)
    trk = tracker.MonoTracker(
        slow.K.astype(np.float32), slow.width, slow.height, world,
        small_params, imu_cfg=imu_cfg,
    )
    trk.velocity = slow.velocities[0].astype(np.float32)
    bins = datasets.bin_imu_per_frame(slow.imu, slow.times)
    prev_t = None
    for f in range(16):
        rows = bins[f]
        dt_rows = None
        if len(rows):
            t = rows[:, 0]
            p0 = prev_t if prev_t is not None else t[0] - 1.0 / slow.imu_hz
            dts = np.diff(np.concatenate([[p0], t]))
            prev_t = float(t[-1])
            dt_rows = np.concatenate([dts[:, None], rows[:, 1:7]], axis=1).astype(np.float32)
        trk.track(slow.render(f), imu=dt_rows)
        if trk.initialized:
            break
    assert trk.initialized
    assert len(trk.gate_slots) == 3
    assert len(trk.bootstrap_slots) > 3, trk.bootstrap_slots
    assert len(trk.bootstrap_slots) <= trk.MAX_BOOTSTRAP_VIEWS
    # the intermediate views carry real observations for triangulation
    mapper = local_mapper.LocalMapper(world, slow.K.astype(np.float32), 0.0)
    ids = mapper.find_new_points(trk.new_kf_slots[-1], mono=True)
    assert len(ids) > 20, len(ids)


def test_right_camera_observations_recorded(scene, small_params):
    """The live tracker matches landmarks that left the left image (or its
    left-match failed) against the RIGHT image at pred_r and records them as
    right-camera observations (reference predR path,
    src/FeatureMatcher.cpp:254-389 at 310, src/FeatureTracker.cpp:274-287,
    right branch of local BA src/OptimizationBA.cpp:592-740)."""
    n = 12
    trk, _ = _run_tracking(scene, small_params, n, with_ba=True)
    w = trk.world
    tbl = w.kf_obs_r_lm[: w.n_keyframes]
    n_right = int((tbl >= 0).sum())
    assert n_right > 0, "no right-camera observations were ever recorded"
    # recorded ids reference valid landmarks
    ids = tbl[tbl >= 0]
    valid = np.asarray(w.arrays.lm_valid)
    assert valid[ids].all()
    # and the device right-obs table agrees with the host mirror
    dev = np.asarray(w.arrays.obs_r_lm)[: w.n_keyframes]
    np.testing.assert_array_equal(dev, tbl.astype(np.int32))


def test_multiview_triangulation_creates_accurate_landmarks(scene, small_params):
    """The local mapper's findNewPoints analog must spawn multi-view
    landmarks that land near true scene points (reference
    src/OptimizationBA.cpp:340-391 + triangulatePoint3 validation)."""
    world = map_state.WorldMap(lm_capacity=8192, kf_capacity=64, keys_per_kf=small_params.n_features)
    trk = tracker.StereoTracker(
        scene.K.astype(np.float32), scene.baseline, scene.width, scene.height, world, small_params
    )
    mapper = local_mapper.LocalMapper(world, scene.K.astype(np.float32), scene.baseline)
    new_ids = []
    for f in range(12):
        n_kf = len(trk.new_kf_slots)
        trk.track(scene.render(f), scene.render(f, right=True))
        if len(trk.new_kf_slots) > n_kf and trk.new_kf_slots[-1] > 0:
            r = mapper.run(trk.new_kf_slots[-1])
            trk.reanchor(r["kf_slot"], r["old_pose"], r["new_pose"])
            trk.add_active(r["new_lm_ids"])
            new_ids.extend(r["new_lm_ids"].tolist())
    assert len(new_ids) > 0, "triangulation never fired"
    pos = np.asarray(world.arrays.lm_pos)[np.asarray(new_ids)]
    valid = np.asarray(world.arrays.lm_valid)[np.asarray(new_ids)]
    assert valid.all()
    # each triangulated landmark should be close to SOME true scene point.
    # Bound is depth-uncertainty-limited: the synthetic renderer quantizes
    # observations to ~1 px (320x240), so a far point's along-ray error is
    # ~z^2/(f*b) per pixel — ~1 m at z=15 m. The cross-ray component is
    # what triangulation controls; the 3D bound below reflects both.
    d = np.linalg.norm(pos[:, None, :] - scene.points_w[None, :, :], axis=-1)
    nearest = d.min(axis=1)
    assert np.median(nearest) < 1.0, np.median(nearest)


def test_close_spawn_cap_per_keyframe(scene):
    """Non-init keyframes spawn at most max_spawn_close new close-stereo
    landmarks (reference maxAddedStereo = 100,
    include/FeatureTracker.h:46, src/FeatureTracker.cpp:743-842); the cap
    is applied in scan order (a documented deviation from the reference's
    depth-first ranking — see _prepare_keyframe). Map init is exempt — the
    reference's initializeMap seeds every stereo match
    (src/FeatureTracker.cpp:72-123)."""
    params = tracker.TrackerParams(
        n_features=512, n_levels=4, active_size=1024, spawn_per_kf=256,
        kf_min_stereo=60, max_spawn_close=8,
    )
    world = map_state.WorldMap(
        lm_capacity=8192, kf_capacity=64, keys_per_kf=params.n_features
    )
    trk = tracker.StereoTracker(
        scene.K.astype(np.float32), scene.baseline, scene.width,
        scene.height, world, params,
    )
    deltas = []
    prev_lm = None
    for f in range(12):
        n_kf = len(trk.new_kf_slots)
        trk.track(scene.render(f), scene.render(f, right=True))
        # no mapper runs, so landmark growth between keyframes is exactly
        # the spawn count of the committed KF
        if len(trk.new_kf_slots) > n_kf:
            if prev_lm is not None:
                deltas.append(world.n_landmarks - prev_lm)
            prev_lm = world.n_landmarks
    trk.flush()
    assert len(deltas) >= 1, "no non-init keyframe was ever created"
    assert all(d <= 8 for d in deltas), deltas


def test_blackout_recovery_reseeds_map(small_params):
    """Lost-tracking RECOVERY (VERDICT r2 #3; the reference has nothing
    here, SURVEY.md §5): a mid-sequence blackout (fully dark frames)
    followed by an unrecognizable scene ("teleport" — none of the old
    landmarks exist anymore) must not dead-reckon forever. After
    `reseed_after` consecutive refused solves on frames WITH stereo
    features, the tracker inserts a re-seed keyframe from fresh stereo
    depth at the dead-reckoned pose (spawn cap waived) and tracking
    resumes — consistent relative motion in the new map frame."""
    scene1 = synthetic.make_scene(
        n_frames=8, n_points=400, width=320, height=240, fps=10.0, seed=7
    )
    scene2 = synthetic.make_scene(
        n_frames=12, n_points=400, width=320, height=240, fps=10.0, seed=23
    )
    p = small_params
    world = map_state.WorldMap(
        lm_capacity=8192, kf_capacity=64, keys_per_kf=p.n_features
    )
    trk = tracker.StereoTracker(
        scene1.K.astype(np.float32), scene1.baseline, scene1.width,
        scene1.height, world, p,
    )
    black = np.zeros((scene1.height, scene1.width), np.float32)
    n1, n_black, n2 = 6, 3, 10
    for f in range(n1):
        trk.track(scene1.render(f), scene1.render(f, right=True))
    for _ in range(n_black):
        trk.track(black, black)
    kfs_before = len(trk.new_kf_slots)
    for f in range(n2):
        trk.track(scene2.render(f), scene2.render(f, right=True))
    trk.flush()
    # a re-seed keyframe was inserted in the unrecognizable segment
    assert len(trk.new_kf_slots) > kfs_before, "re-seed keyframe never fired"
    # tracking actually recovered: the last processed frame has real inliers
    assert trk.last_stats["n_inliers"] >= p.min_inliers, trk.last_stats
    assert trk.lost_streak == 0
    # post-recovery motion is consistent with scene2's ground truth up to
    # the (unobservable) rigid offset accumulated during the blackout:
    # compare RELATIVE poses within the recovered segment
    poses = trk.trajectory()
    rec0 = n1 + n_black + (n2 - 4)  # well after the re-seed settled
    est_rel = np.linalg.inv(poses[rec0]) @ poses[-1]
    gt = scene2.poses_c2w
    gt_rel = np.linalg.inv(gt[rec0 - n1 - n_black]) @ gt[n2 - 1]
    t_err = np.linalg.norm(est_rel[:3, 3] - gt_rel[:3, 3])
    assert t_err < 0.15, (t_err, est_rel[:3, 3], gt_rel[:3, 3])


def test_relocalization_recovers_on_old_map(small_params):
    """RELOCALIZATION (models/reloc.py; the reference has none): after a
    blackout the camera REAPPEARS in a previously-mapped area. The
    descriptor retrieval must find the matching keyframe and re-anchor
    tracking on the ORIGINAL map — poses after recovery are correct in
    the ORIGINAL world frame (unaligned), which no re-seed can do."""
    scene = synthetic.make_scene(
        n_frames=16, n_points=400, width=320, height=240, fps=10.0, seed=7
    )
    p = small_params
    world = map_state.WorldMap(
        lm_capacity=8192, kf_capacity=64, keys_per_kf=p.n_features
    )
    trk = tracker.StereoTracker(
        scene.K.astype(np.float32), scene.baseline, scene.width,
        scene.height, world, p,
    )
    black = np.zeros((scene.height, scene.width), np.float32)
    # forward leg 0..7, LONG blackout (dead-reckoned drift carries the
    # prediction far beyond the match-radius retry), then TELEPORT BACK
    # to the start of the mapped area: replay frames 0..7
    replay = list(range(0, 8))
    seq = [(scene.render(f), scene.render(f, right=True)) for f in range(8)]
    seq += [(black, black)] * 6
    seq += [(scene.render(f), scene.render(f, right=True)) for f in replay]
    for l, r in seq:
        trk.track(l, r)
    trk.flush()
    assert trk.counters.get("relocalizations") == 1, trk.counters.summary()
    # tracking re-acquired on the old map
    assert trk.last_stats["n_inliers"] >= p.min_inliers, trk.last_stats
    # the final processed frames sit at the TRUE (original-frame) poses:
    # unaligned error small even though the camera teleported
    poses = trk.trajectory()
    gt_tail = scene.poses_c2w[replay[-3:]]
    errs = np.linalg.norm(poses[-3:, :3, 3] - gt_tail[:, :3, 3], axis=1)
    assert errs.max() < 0.15, errs


def test_mono_relocalization_recovers_on_old_map():
    """Mono-IMU RELOCALIZATION (VERDICT r4 #5: reloc had no mono test):
    the mono tracker maps a lateral sweep, blacks out long enough to
    dead-reckon away, then teleports back to the start of the mapped
    area — retrieval + verified PnP must re-anchor on the ORIGINAL map
    (final poses correct in the original world frame, unaligned)."""
    from vslam_tpu.utils import datasets

    scene = synthetic.make_scene(
        n_frames=20, n_points=500, width=320, height=240, fps=10.0,
        seed=11, texture="distinct", motion="lateral",
    )
    p = tracker.TrackerParams(
        n_features=512, n_levels=4, active_size=1024, spawn_per_kf=256,
    )
    world = map_state.WorldMap(
        lm_capacity=8192, kf_capacity=64, keys_per_kf=p.n_features
    )
    imu_cfg = tracker.ImuConfig(
        gyro_noise=1.7e-4, accel_noise=2e-3, gyro_walk=1.9e-5,
        accel_walk=3e-3, hz=200.0, T_bc=np.eye(4, dtype=np.float32),
        gravity_w=synthetic.GRAVITY_W.astype(np.float32),
    )
    trk = tracker.MonoTracker(
        scene.K.astype(np.float32), scene.width, scene.height, world, p,
        imu_cfg=imu_cfg,
    )
    trk.velocity = scene.velocities[0].astype(np.float32)
    mapper = local_mapper.LocalMapper(
        world, scene.K.astype(np.float32), 0.0,
        local_mapper.LocalMapperConfig(n_levels=4, scale=1.2),
    )
    bins = datasets.bin_imu_per_frame(scene.imu, scene.times)

    def dt_rows(f):
        rows = bins[f]
        if rows is None or len(rows) == 0:
            return None
        t = rows[:, 0]
        dts = np.diff(np.concatenate([[t[0] - 0.005], t]))
        return np.concatenate(
            [np.maximum(dts, 0)[:, None], rows[:, 1:7]], axis=1
        ).astype(np.float32)

    def step(f, img, imu):
        nk = len(trk.new_kf_slots)
        trk.track(img, imu=imu)
        if getattr(trk, "needs_init_triangulation", False):
            ids = mapper.find_new_points(trk.new_kf_slots[-1], mono=True)
            trk.add_active(ids)
            trk.needs_init_triangulation = False
            trk.last_kf_tracked = max(len(ids), 1)
        elif len(trk.new_kf_slots) > nk and trk.new_kf_slots[-1] > 0:
            ids = mapper.find_new_points(trk.new_kf_slots[-1], mono=True)
            trk.add_active(ids)

    black = np.zeros((scene.height, scene.width), np.float32)
    for f in range(10):
        step(f, scene.render(f), dt_rows(f))
    for k in range(6):  # blackout: no features, no IMU hand-holding
        step(10 + k, black, None)
    # teleport back to a mapped pose and HOVER there (a zero-velocity
    # restart is exactly what relocalization promises; a moving replay
    # additionally tests velocity re-estimation, which mono-IMU only
    # recovers with real IMU samples — not available post-teleport)
    hover = scene.render(2)
    for i in range(12):
        step(16 + i, hover, None)
    trk.flush()
    assert trk.counters.get("relocalizations") == 1, (
        trk.counters.rates(), trk.lost_streak
    )
    # tracking re-acquired on the old map after the reloc settled
    assert trk.last_stats["n_inliers"] >= 20, trk.last_stats
    poses = trk.trajectory()
    # final processed frames sit near the TRUE original-frame pose of the
    # hover view — correct in the ORIGINAL world frame (unaligned)
    gt_t = scene.poses_c2w[2][:3, 3]
    errs = np.linalg.norm(poses[-3:, :3, 3] - gt_t[None], axis=1)
    assert errs.max() < 0.25, errs


def test_tracking_survives_hard_scene(small_params):
    """Hard-mode synthetic (VERDICT round-1 #6): photometric sensor noise,
    exposure drift, and moving textureless occluders. Validates that the
    custom FAST/BRIEF pattern and the matching gates survive non-ideal
    imaging with bounded ATE (the clean-scene gate is 0.03)."""
    hard = synthetic.make_scene(
        n_frames=12, n_points=400, width=320, height=240, fps=10.0, seed=7,
        noise_std=4.0, gain_drift=0.15, n_occluders=2,
    )
    n = 12
    trk, poses = _run_tracking(hard, small_params, n, with_ba=True)
    gt = hard.poses_c2w[:n]
    # measured ~0.2 (vs 0.013 clean): bounded degradation, and the
    # tracking-failure gate must prevent wrong-basin pose jumps (without
    # it this scene produced a 7 m single-frame teleport)
    ate = trajectory.ate_rmse(poses, gt, align=False)
    assert ate < 0.3, ate
    errs = np.linalg.norm(poses[:, :3, 3] - gt[:, :3, 3], axis=1)
    assert errs.max() < 0.7, errs
    assert trk.world.n_landmarks > 100
