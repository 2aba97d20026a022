import os

import jax.numpy as jnp
import numpy as np

from vslam_tpu.geometry import camera as cam
from vslam_tpu.utils.config import ConfigFile, SlamMode

CONF_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_config_kitti_schema():
    conf = ConfigFile(os.path.join(CONF_DIR, "config_kitti_00.yaml"))
    assert conf.slam_mode == SlamMode.STEREO
    assert conf.rectified
    assert conf.dataset == "KITTI"
    stereo = cam.StereoCamera.from_config(conf)
    assert stereo.width == 1241 and stereo.height == 376
    assert abs(stereo.baseline - 0.53716) < 1e-9
    np.testing.assert_allclose(stereo.extrinsics[0, 3], stereo.baseline)
    K = stereo.left.intrinsics
    assert abs(K[0, 0] - 718.856) < 1e-3


def test_config_euroc_schema():
    conf = ConfigFile(os.path.join(CONF_DIR, "config_MH_01.yaml"))
    assert conf.slam_mode == SlamMode.STEREO_IMU
    assert not conf.rectified
    stereo = cam.StereoCamera.from_config(conf)
    assert stereo.left.K is not None and stereo.left.K.shape == (3, 3)
    assert stereo.left.P is not None and stereo.left.P.shape == (3, 4)
    # rectified intrinsics come from P for unrectified rigs
    np.testing.assert_allclose(stereo.left.intrinsics[0, 0], 435.2046959714599)
    assert stereo.left.T_body_cam is not None
    assert float(conf.get("IMU", "Hz")) == 200.0


def test_rectify_map_identity_when_undistorted():
    # With D=0, R=I and P==[K|0], map must be the identity grid.
    K = np.array([[400.0, 0, 320.0], [0, 400.0, 240.0], [0, 0, 1]])
    D = np.zeros(5)
    R = np.eye(3)
    P = np.hstack([K, np.zeros((3, 1))])
    m = cam.init_undistort_rectify_map(K, D, R, P, 640, 480)
    u, v = np.meshgrid(np.arange(640.0), np.arange(480.0))
    np.testing.assert_allclose(m[..., 0], u, atol=1e-4)
    np.testing.assert_allclose(m[..., 1], v, atol=1e-4)


def test_rectify_map_roundtrip_with_distortion():
    # Forward-distort a rectified pixel by hand and verify the map agrees.
    K = np.array([[458.654, 0.0, 367.215], [0.0, 457.296, 248.375], [0, 0, 1.0]])
    D = np.array([-0.28340811, 0.07395907, 0.00019359, 1.76187114e-05, 0.0])
    R = np.eye(3)
    P = np.array([[435.2, 0, 367.45, 0], [0, 435.2, 252.2, 0], [0, 0, 1, 0]])
    m = cam.init_undistort_rectify_map(K, D, R, P, 752, 480)
    # center pixel of the rectified image back-projects to the P principal ray
    cxp, cyp = int(round(P[0, 2])), int(round(P[1, 2]))
    # at the principal point the normalized ray is ~0 -> distortion is ~0
    np.testing.assert_allclose(m[cyp, cxp, 0], K[0, 2], atol=1.0)
    np.testing.assert_allclose(m[cyp, cxp, 1], K[1, 2], atol=1.0)
    assert np.isfinite(m).all()


def test_remap_bilinear_identity_and_shift():
    img = jnp.arange(20.0 * 30).reshape(20, 30)
    u, v = np.meshgrid(np.arange(30.0), np.arange(20.0))
    ident = jnp.asarray(np.stack([u, v], axis=-1), jnp.float32)
    out = cam.remap_bilinear(img, ident)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), atol=1e-4)
    # half-pixel shift in x averages horizontal neighbors
    shifted = ident.at[..., 0].add(0.5)
    out2 = np.asarray(cam.remap_bilinear(img, shifted))
    expect = (np.asarray(img)[:, :-1] + np.asarray(img)[:, 1:]) / 2.0
    np.testing.assert_allclose(out2[:, :-1], expect, atol=1e-4)


def test_project_backproject_roundtrip():
    K = jnp.asarray([[400.0, 0, 320.0], [0, 420.0, 240.0], [0, 0, 1]])
    rng = np.random.default_rng(0)
    pts = rng.uniform([-5, -5, 1], [5, 5, 50], size=(100, 3)).astype(np.float32)
    uv = cam.project(K, jnp.asarray(pts))
    back = cam.backproject(K, uv, jnp.asarray(pts[:, 2]))
    np.testing.assert_allclose(np.asarray(back), pts, rtol=1e-4, atol=1e-3)
