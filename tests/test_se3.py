import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vslam_tpu.geometry import se3


def random_rotations(n, seed=0):
    rng = np.random.default_rng(seed)
    w = rng.normal(size=(n, 3))
    w = w / np.linalg.norm(w, axis=-1, keepdims=True)
    theta = rng.uniform(0.05, np.pi - 0.05, size=(n, 1))
    return np.asarray(se3.so3_expmap(jnp.asarray(w * theta)))


def test_so3_exp_log_roundtrip():
    rng = np.random.default_rng(1)
    w = rng.normal(size=(64, 3)) * 1.5
    R = se3.so3_expmap(jnp.asarray(w, jnp.float32))
    w2 = se3.so3_logmap(R)
    R2 = se3.so3_expmap(w2)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=2e-5)


def test_so3_small_angle():
    w = jnp.asarray([[1e-9, 0.0, 0.0], [0.0, 0.0, 0.0]])
    R = se3.so3_expmap(w)
    np.testing.assert_allclose(np.asarray(R[1]), np.eye(3), atol=1e-7)
    assert np.isfinite(np.asarray(se3.so3_logmap(R))).all()


def test_rotation_orthonormal():
    R = random_rotations(32)
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (32, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-5)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(2)
    xi = rng.normal(size=(64, 6)).astype(np.float32)
    T = se3.se3_expmap(jnp.asarray(xi))
    xi2 = se3.se3_logmap(T)
    T2 = se3.se3_expmap(xi2)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T2), atol=3e-5)


def test_se3_inverse_compose():
    rng = np.random.default_rng(3)
    xi = rng.normal(size=(16, 6)).astype(np.float32)
    T = se3.se3_expmap(jnp.asarray(xi))
    eye = T @ se3.inverse(T)
    np.testing.assert_allclose(
        np.asarray(eye), np.tile(np.eye(4), (16, 1, 1)), atol=1e-5
    )


def test_transform_points():
    T = se3.se3_expmap(jnp.asarray([0.0, 0.0, jnp.pi / 2, 1.0, 0.0, 0.0]))
    p = jnp.asarray([1.0, 0.0, 0.0])
    out = se3.transform_points(T, p)
    # 90deg about z maps x->y; plus translation through left Jacobian
    full = np.asarray(T) @ np.array([1.0, 0.0, 0.0, 1.0])
    np.testing.assert_allclose(np.asarray(out), full[:3], atol=1e-6)
    # batched points path
    pts = jnp.ones((5, 3))
    outs = se3.transform_points(T, pts)
    ref = (np.asarray(T)[:3, :3] @ np.ones((3, 5))).T + np.asarray(T)[:3, 3]
    np.testing.assert_allclose(np.asarray(outs), ref, atol=1e-6)


def test_quat_roundtrip():
    R = random_rotations(128, seed=7)
    q = se3.rot_to_quat(jnp.asarray(R, jnp.float32))
    R2 = se3.quat_to_rot(q)
    np.testing.assert_allclose(np.asarray(R2), R, atol=1e-5)


def test_retract_matches_gtsam_convention():
    # retract(T, xi) == T @ exp(xi); exp of zero is identity
    T = se3.se3_expmap(jnp.asarray([0.1, -0.2, 0.3, 1.0, 2.0, 3.0]))
    np.testing.assert_allclose(
        np.asarray(se3.retract(T, jnp.zeros(6))), np.asarray(T), atol=1e-6
    )


def test_sufficient_movement_gates():
    T0 = jnp.eye(4)
    T_far = se3.se3_expmap(jnp.asarray([0.0, 0.0, 0.0, 0.2, 0.0, 0.0]))
    T_rot = se3.se3_expmap(jnp.asarray([0.0, 0.2, 0.0, 0.0, 0.0, 0.0]))
    T_near = se3.se3_expmap(jnp.asarray([0.0, 0.0, 0.0, 0.01, 0.0, 0.0]))
    assert bool(se3.sufficient_movement(T0, T_far))
    assert bool(se3.sufficient_movement(T0, T_rot))  # ~11.5 deg > 5 deg
    assert not bool(se3.sufficient_movement(T0, T_near))


def test_jit_and_vmap():
    f = jax.jit(jax.vmap(se3.se3_expmap))
    xi = jnp.zeros((4, 6))
    out = f(xi)
    np.testing.assert_allclose(np.asarray(out), np.tile(np.eye(4), (4, 1, 1)), atol=1e-7)
