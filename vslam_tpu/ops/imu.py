"""IMU preintegration on-manifold, with CombinedImuFactor semantics.

Re-implements the GTSAM machinery used by the reference
(PreintegratedCombinedMeasurements + CombinedImuFactor at
src/FeatureTracker.cpp:301-387, 1036-1106): right-increment preintegration
of DeltaR/DeltaV/DeltaP, first-order bias Jacobians, 9x9 covariance
propagation, NavState prediction, and the 15-dim factor residual
(whitened) between consecutive frames.

Conventions:
- body-frame states: T_wb (4,4) body-to-world, v_w (3,) world velocity,
  bias = (accel_bias(3), gyro_bias(3)) concatenated as (6,).
- samples are (K, 7) rows [dt, wx, wy, wz, ax, ay, az]; pad with dt=0 rows
  (no-ops) for fixed shapes; dt computation from timestamps (with the
  reference's first-sample 1/Hz fallback, src/FeatureTracker.cpp:337-350)
  happens host-side in the tracker.
- gravity is a world-frame vector (the reference's measured-gravity init,
  src/VIOSlam.cpp:274).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from vslam_tpu.geometry import se3


class PreintState(NamedTuple):
    dR: jax.Array  # (3,3)
    dv: jax.Array  # (3,)
    dp: jax.Array  # (3,)
    dt: jax.Array  # ()
    # first-order bias Jacobians
    dR_dbg: jax.Array  # (3,3)
    dv_dba: jax.Array  # (3,3)
    dv_dbg: jax.Array  # (3,3)
    dp_dba: jax.Array  # (3,3)
    dp_dbg: jax.Array  # (3,3)
    cov: jax.Array  # (9,9) [theta, v, p]


class ImuParams(NamedTuple):
    gyro_noise: jax.Array  # sigma, rad/s/sqrt(Hz)
    accel_noise: jax.Array  # m/s^2/sqrt(Hz)
    gyro_walk: jax.Array
    accel_walk: jax.Array
    # integration error covariance floor (GTSAM integrationCovariance)
    integration_sigma: jax.Array = jnp.float32(1e-4)


def _so3_right_jacobian(w: jax.Array) -> jax.Array:
    theta2 = jnp.sum(w * w, axis=-1)[..., None, None]
    theta = jnp.sqrt(theta2 + 1e-16)
    W = se3.hat(w)
    W2 = W @ W
    small = theta2 < 1e-8
    B = jnp.where(small, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / theta2)
    C = jnp.where(
        small, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / (theta2 * theta)
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), W.shape)
    return eye - B * W + C * W2


def empty_preint(dtype=jnp.float32) -> PreintState:
    eye = jnp.eye(3, dtype=dtype)
    zero = jnp.zeros((3, 3), dtype=dtype)
    return PreintState(
        dR=eye,
        dv=jnp.zeros(3, dtype),
        dp=jnp.zeros(3, dtype),
        dt=jnp.float32(0.0),
        dR_dbg=zero,
        dv_dba=zero,
        dv_dbg=zero,
        dp_dba=zero,
        dp_dbg=zero,
        cov=jnp.zeros((9, 9), dtype),
    )


def preintegrate(
    samples: jax.Array,  # (K, 7) [dt, gyro, accel]; dt == 0 rows are no-ops
    bias: jax.Array,  # (6,) [ba, bg]
    params: ImuParams,
) -> PreintState:
    """integrateMeasurement over all samples (one lax.scan)."""
    ba, bg = bias[:3], bias[3:]

    def step(st: PreintState, row):
        dt = row[0]
        w = row[1:4] - bg
        a = row[4:7] - ba
        active = dt > 0.0
        dt = jnp.where(active, dt, 0.0)
        dt2 = dt * dt

        Rk = st.dR
        dRi = se3.so3_expmap(w * dt)
        Jr = _so3_right_jacobian(w * dt)
        Ra = Rk @ a
        hat_a = se3.hat(a)

        new = PreintState(
            dR=Rk @ dRi,
            dv=st.dv + Ra * dt,
            dp=st.dp + st.dv * dt + 0.5 * Ra * dt2,
            dt=st.dt + dt,
            dR_dbg=dRi.T @ st.dR_dbg - Jr * dt,
            dv_dba=st.dv_dba - Rk * dt,
            dv_dbg=st.dv_dbg - Rk @ hat_a @ st.dR_dbg * dt,
            dp_dba=st.dp_dba + st.dv_dba * dt - 0.5 * Rk * dt2,
            dp_dbg=st.dp_dbg + st.dv_dbg * dt - 0.5 * Rk @ hat_a @ st.dR_dbg * dt2,
            cov=st.cov,
        )

        # covariance propagation: x = [theta, v, p]
        A = jnp.zeros((9, 9))
        A = A.at[0:3, 0:3].set(dRi.T)
        A = A.at[3:6, 0:3].set(-Rk @ hat_a * dt)
        A = A.at[6:9, 0:3].set(-0.5 * Rk @ hat_a * dt2)
        A = A.at[3:6, 3:6].set(jnp.eye(3))
        A = A.at[6:9, 3:6].set(jnp.eye(3) * dt)
        A = A.at[6:9, 6:9].set(jnp.eye(3))
        # noise input: gyro -> theta rows, accel -> v,p rows
        Bg = jnp.zeros((9, 3)).at[0:3].set(Jr * dt)
        Ba = jnp.zeros((9, 3)).at[3:6].set(Rk * dt).at[6:9].set(0.5 * Rk * dt2)
        inv_dt = jnp.where(dt > 0, 1.0 / jnp.maximum(dt, 1e-9), 0.0)
        cov_g = params.gyro_noise**2 * inv_dt
        cov_a = params.accel_noise**2 * inv_dt
        cov_int = params.integration_sigma**2 * dt
        new_cov = (
            A @ st.cov @ A.T
            + cov_g * (Bg @ Bg.T)
            + cov_a * (Ba @ Ba.T)
            + cov_int * jnp.eye(9)
        )
        new = new._replace(cov=new_cov)
        out = jax.tree.map(
            lambda o, n: jnp.where(active, n, o), st, new
        )
        return out, None

    final, _ = jax.lax.scan(step, empty_preint(), samples)
    return final


def bias_corrected(pre: PreintState, bias_i: jax.Array, bias_bar: jax.Array):
    """First-order corrected (dR, dv, dp) at bias_i around the
    preintegration linearization point bias_bar."""
    dba = bias_i[:3] - bias_bar[:3]
    dbg = bias_i[3:] - bias_bar[3:]
    dR = pre.dR @ se3.so3_expmap(pre.dR_dbg @ dbg)
    dv = pre.dv + pre.dv_dba @ dba + pre.dv_dbg @ dbg
    dp = pre.dp + pre.dp_dba @ dba + pre.dp_dbg @ dbg
    return dR, dv, dp


def predict(
    T_wb_i: jax.Array,
    v_w_i: jax.Array,
    pre: PreintState,
    bias_i: jax.Array,
    bias_bar: jax.Array,
    gravity_w: jax.Array,
):
    """NavState.predict (reference PredictNextPoseIMU,
    src/FeatureTracker.cpp:1036-1106): propagate body pose + velocity."""
    dR, dv, dp = bias_corrected(pre, bias_i, bias_bar)
    Ri = T_wb_i[:3, :3]
    pi = T_wb_i[:3, 3]
    dt = pre.dt
    Rj = Ri @ dR
    vj = v_w_i + gravity_w * dt + Ri @ dv
    pj = pi + v_w_i * dt + 0.5 * gravity_w * dt * dt + Ri @ dp
    return se3.rt_to_mat(Rj, pj), vj


def combined_residual(
    T_wb_i: jax.Array,
    v_w_i: jax.Array,
    bias_i: jax.Array,
    T_wb_j: jax.Array,
    v_w_j: jax.Array,
    bias_j: jax.Array,
    pre: PreintState,
    bias_bar: jax.Array,
    gravity_w: jax.Array,
    params: ImuParams,
) -> jax.Array:
    """Whitened 15-dim CombinedImuFactor residual
    [r_R, r_v, r_p, r_ba, r_bg]. Preintegration terms are whitened with the
    inverse Cholesky of the propagated 9x9 covariance; the bias random-walk
    block with the walk sigmas over the interval."""
    dR, dv, dp = bias_corrected(pre, bias_i, bias_bar)
    Ri, pi = T_wb_i[:3, :3], T_wb_i[:3, 3]
    Rj, pj = T_wb_j[:3, :3], T_wb_j[:3, 3]
    dt = pre.dt

    r_R = se3.so3_logmap(dR.T @ Ri.T @ Rj)
    r_v = Ri.T @ (v_w_j - v_w_i - gravity_w * dt) - dv
    r_p = Ri.T @ (pj - pi - v_w_i * dt - 0.5 * gravity_w * dt * dt) - dp
    r9 = jnp.concatenate([r_R, r_v, r_p])

    cov = pre.cov + 1e-10 * jnp.eye(9)
    L = jnp.linalg.cholesky(cov)
    white9 = jax.scipy.linalg.solve_triangular(L, r9, lower=True)

    # bias random walk over the interval: sigma^2 = walk^2 * dt
    safe_dt = jnp.maximum(dt, 1e-6)
    sig_ba = params.accel_walk * jnp.sqrt(safe_dt)
    sig_bg = params.gyro_walk * jnp.sqrt(safe_dt)
    r_b = bias_j - bias_i
    white_b = jnp.concatenate([r_b[:3] / sig_ba, r_b[3:] / sig_bg])
    return jnp.concatenate([white9, white_b])
