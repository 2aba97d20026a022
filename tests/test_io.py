import os

import numpy as np

from vslam_tpu.utils import datasets, synthetic, trajectory


def test_kitti_trajectory_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    poses = np.tile(np.eye(4), (10, 1, 1))
    poses[:, :3, 3] = rng.normal(size=(10, 3))
    p = str(tmp_path / "traj.txt")
    trajectory.save_kitti_trajectory(p, poses)
    back = trajectory.load_kitti_trajectory(p)
    np.testing.assert_allclose(back, poses, atol=1e-7)


def test_ate_zero_on_identical():
    poses = np.tile(np.eye(4), (20, 1, 1))
    poses[:, 2, 3] = np.arange(20.0)
    assert trajectory.ate_rmse(poses, poses) < 1e-9
    # a rigidly-transformed copy aligns to zero error
    R = np.array([[0.0, -1, 0], [1, 0, 0], [0, 0, 1.0]])
    moved = poses.copy()
    moved[:, :3, 3] = (R @ poses[:, :3, 3].T).T + np.array([5.0, -2.0, 1.0])
    moved[:, :3, :3] = R @ poses[:, :3, :3]
    assert trajectory.ate_rmse(moved, poses, align=True) < 1e-9
    assert trajectory.ate_rmse(moved, poses, align=False) > 1.0


def test_imu_binning():
    imu = np.zeros((100, 7))
    imu[:, 0] = np.arange(100) * 0.005  # 200 Hz
    frame_times = np.array([0.1, 0.2, 0.3])
    bins = datasets.bin_imu_per_frame(imu, frame_times)
    assert len(bins) == 3
    # frame 1 gets (0.1, 0.2]: samples 21..40 -> 20 samples
    assert len(bins[1]) == 20
    assert bins[1][0, 0] > 0.1 and bins[1][-1, 0] <= 0.2


def test_euroc_reader(tmp_path):
    # build a minimal EuRoC layout
    from PIL import Image

    root = tmp_path / "mav0"
    for cam in ("cam0", "cam1"):
        os.makedirs(root / cam / "data")
    rows = []
    for i in range(3):
        ts = 1403636579763555584 + i * 50000000
        name = f"{ts}.png"
        rows.append(f"{ts},{name}")
        for cam in ("cam0", "cam1"):
            Image.fromarray(np.full((8, 10), i * 10, np.uint8)).save(root / cam / "data" / name)
    (root / "cam0" / "data.csv").write_text("#ts,name\n" + "\n".join(rows) + "\n")
    os.makedirs(root / "imu0")
    t0 = 1403636579763555584
    imu_rows = [
        f"{t0 + int(j * 5e6)},0.01,0.02,0.03,9.8,0.1,0.2" for j in range(30)
    ]
    (root / "imu0" / "data.csv").write_text("#header\n" + "\n".join(imu_rows) + "\n")

    ds = datasets.EurocDataset(str(root))
    assert len(ds) == 3
    frames = list(ds.frames())
    assert frames[0].left.shape == (8, 10)
    assert frames[0].right is not None
    assert abs(frames[1].t - frames[0].t - 0.05) < 1e-6
    assert len(frames[1].imu) == 10  # 50ms at 200Hz
    g = datasets.gravity_from_first_accel(ds.imu)
    np.testing.assert_allclose(g, [0.1, -9.8, 0.2])


def test_synthetic_scene_render_and_gt():
    scene = synthetic.make_scene(n_frames=5, n_points=60, width=320, height=240, seed=1)
    img_l = scene.render(0)
    img_r = scene.render(0, right=True)
    assert img_l.shape == (240, 320)
    assert img_l.max() > 200.0  # patches rendered
    # stereo disparity: the same point is left of its left-image position in the right image
    uv_l, valid_l, z = scene.project_points(0)
    uv_r, valid_r, _ = scene.project_points(0, right=True)
    both = valid_l & valid_r
    disp = uv_l[both, 0] - uv_r[both, 0]
    assert (disp > 0).all()
    expected = scene.K[0, 0] * scene.baseline / z[both]
    np.testing.assert_allclose(disp, expected, rtol=1e-4)
    # IMU first accel magnitude ~ |g| (slow motion)
    a = scene.imu[0, 4:7]
    assert abs(np.linalg.norm(a) - 9.81) < 1.0
