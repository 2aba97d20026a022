"""Batched SE(3) / SO(3) / quaternion operations (jit-safe, shape-stable).

Replaces the reference's scalar Eigen/GTSAM pose plumbing
(reference include/Conversions.h:19-146, GTSAM Pose3) with vectorized,
differentiable JAX functions. Poses are 4x4 row-major matrices T such that
``p_world = T @ p_local`` (camera-to-world, matching GTSAM Pose3 semantics
used throughout reference src/FeatureTracker.cpp:166-411).

Tangent convention: xi = [omega (3), v (3)] — rotation first, like GTSAM
Pose3::Expmap. All functions broadcast over leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jax.Array) -> jax.Array:
    """so(3) hat operator. w: (..., 3) -> (..., 3, 3)."""
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy], axis=-1),
            jnp.stack([wz, z, -wx], axis=-1),
            jnp.stack([-wy, wx, z], axis=-1),
        ],
        axis=-2,
    )


def so3_expmap(w: jax.Array) -> jax.Array:
    """Rodrigues: (..., 3) axis-angle -> (..., 3, 3) rotation matrix.

    Taylor-guarded so it is differentiable and stable at ||w|| -> 0.
    """
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(theta2 + _EPS**2)
    W = hat(w)
    W2 = W @ W
    small = theta2 < 1e-8
    A = jnp.where(small, 1.0 - theta2 / 6.0, jnp.sin(theta) / theta)
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + A * W + B * W2


def so3_logmap(R: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation -> (..., 3) axis-angle (theta in [0, pi]).

    Computed via the quaternion (Shepperd's method in :func:`rot_to_quat`)
    which is numerically stable across the whole rotation range, including
    near pi where the direct antisymmetric-part formula blows up.
    """
    q = rot_to_quat(R)
    qv = q[..., :3]
    qw = q[..., 3]
    # enforce qw >= 0 so theta lands in [0, pi]
    sign = jnp.where(qw < 0, -1.0, 1.0)
    qv = qv * sign[..., None]
    qw = qw * sign
    norm_v = jnp.linalg.norm(qv, axis=-1)
    theta = 2.0 * jnp.arctan2(norm_v, qw)
    small = norm_v < 1e-7
    scale = jnp.where(small, 2.0 / jnp.clip(qw, _EPS, None), theta / (norm_v + _EPS))
    return qv * scale[..., None]


def _so3_left_jacobian(w: jax.Array) -> jax.Array:
    """Left Jacobian of SO(3): (..., 3) -> (..., 3, 3)."""
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(theta2 + _EPS**2)
    W = hat(w)
    W2 = W @ W
    small = theta2 < 1e-8
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye + B * W + C * W2


def se3_expmap(xi: jax.Array) -> jax.Array:
    """se(3) exp: xi = (..., 6) [omega, v] -> (..., 4, 4) transform."""
    w, v = xi[..., :3], xi[..., 3:]
    R = so3_expmap(w)
    t = (_so3_left_jacobian(w) @ v[..., None])[..., 0]
    return rt_to_mat(R, t)


def se3_logmap(T: jax.Array) -> jax.Array:
    """(..., 4, 4) -> (..., 6) [omega, v]."""
    w = so3_logmap(T[..., :3, :3])
    Jinv = jnp.linalg.inv(_so3_left_jacobian(w))
    v = (Jinv @ T[..., :3, 3:4])[..., 0]
    return jnp.concatenate([w, v], axis=-1)


def orthonormalize(T: jax.Array) -> jax.Array:
    """Project the rotation block of (..., 4, 4) transforms back onto
    SO(3) via a quaternion round trip (normalize, reconstruct). Repeated
    f32 pose composition drifts the rotation's scale; composing a drifted
    pose with itself (the constant-velocity prediction
    T_pred = T inv(T_prev) T) SQUARES the drift per frame, which turns a
    lost-tracking dead-reckon streak into a doubling-exponent runaway
    (observed: |t| 5 m -> inf in 6 refused frames). One cheap projection
    per frame resets the drift the way every accepted LM retraction
    (expmap) does implicitly."""
    q = rot_to_quat(T[..., :3, :3])
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return rt_to_mat(quat_to_rot(q), T[..., :3, 3])


def rt_to_mat(R: jax.Array, t: jax.Array) -> jax.Array:
    """(..., 3, 3) + (..., 3) -> (..., 4, 4)."""
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (4,)
    )[..., None, :]
    return jnp.concatenate([top, bottom], axis=-2)


def inverse(T: jax.Array) -> jax.Array:
    """Closed-form SE(3) inverse. (..., 4, 4) -> (..., 4, 4)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rt = jnp.swapaxes(R, -1, -2)
    return rt_to_mat(Rt, -(Rt @ t[..., None])[..., 0])


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) to points (..., N, 3) or (..., 3)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    if pts.ndim >= T.ndim:  # (..., N, 3): batched point sets
        return pts @ jnp.swapaxes(R, -1, -2) + t[..., None, :]
    return (R @ pts[..., None])[..., 0] + t


def retract(T: jax.Array, xi: jax.Array) -> jax.Array:
    """Right retraction a la GTSAM: T * exp(xi). Used by all LM solvers."""
    return T @ se3_expmap(xi)


def quat_to_rot(q: jax.Array) -> jax.Array:
    """Quaternion (..., 4) [x, y, z, w] -> rotation matrix (..., 3, 3).

    Matches the reference's Eigen::Quaterniond storage/printing order
    (reference include/Conversions.h:69-90 writes x,y,z,w).
    """
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rot_to_quat(R: jax.Array) -> jax.Array:
    """Rotation matrix (..., 3, 3) -> quaternion (..., 4) [x, y, z, w].

    Branchless Shepperd's method (select the max-denominator case) so it is
    vmap/jit safe.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidate formulations
    qw0 = jnp.sqrt(jnp.clip(1.0 + tr, _EPS, None)) * 0.5
    q0 = jnp.stack([(m21 - m12), (m02 - m20), (m10 - m01), 4.0 * qw0 * qw0], axis=-1) / (
        4.0 * qw0[..., None]
    )
    qx1 = jnp.sqrt(jnp.clip(1.0 + m00 - m11 - m22, _EPS, None)) * 0.5
    q1 = jnp.stack(
        [4.0 * qx1 * qx1, (m01 + m10), (m02 + m20), (m21 - m12)], axis=-1
    ) / (4.0 * qx1[..., None])
    qy2 = jnp.sqrt(jnp.clip(1.0 - m00 + m11 - m22, _EPS, None)) * 0.5
    q2 = jnp.stack(
        [(m01 + m10), 4.0 * qy2 * qy2, (m12 + m21), (m02 - m20)], axis=-1
    ) / (4.0 * qy2[..., None])
    qz3 = jnp.sqrt(jnp.clip(1.0 - m00 - m11 + m22, _EPS, None)) * 0.5
    q3 = jnp.stack(
        [(m02 + m20), (m12 + m21), 4.0 * qz3 * qz3, (m10 - m01)], axis=-1
    ) / (4.0 * qz3[..., None])

    case = jnp.where(
        tr > 0.0,
        0,
        jnp.where(
            (m00 > m11) & (m00 > m22), 1, jnp.where(m11 > m22, 2, 3)
        ),
    )
    q = jnp.choose(case[..., None], [q0, q1, q2, q3], mode="clip")
    return q / jnp.linalg.norm(q, axis=-1, keepdims=True)


def parallax_angle_deg(T_a: jax.Array, T_b: jax.Array) -> jax.Array:
    """Angle between the two camera optical axes, in degrees.

    Semantics of reference include/Conversions.h:92-110 (computeAngle2D uses
    the z-columns of the two rotations).
    """
    za = T_a[..., :3, 2]
    zb = T_b[..., :3, 2]
    cos = jnp.sum(za * zb, axis=-1) / (
        jnp.linalg.norm(za, axis=-1) * jnp.linalg.norm(zb, axis=-1) + _EPS
    )
    return jnp.degrees(jnp.arccos(jnp.clip(cos, -1.0, 1.0)))


def sufficient_movement(
    T_a: jax.Array,
    T_b: jax.Array,
    min_baseline: float = 0.1,
    min_angle_deg: float = 5.0,
) -> jax.Array:
    """Motion gate of reference include/Conversions.h:112-137: enough
    translation OR enough rotation between two poses."""
    baseline = jnp.linalg.norm(T_a[..., :3, 3] - T_b[..., :3, 3], axis=-1)
    ang = parallax_angle_deg(T_a, T_b)
    return (baseline > min_baseline) | (ang > min_angle_deg)
