"""Batched Levenberg-Marquardt on manifolds (the GTSAM replacement core).

Generic fixed-iteration LM with GTSAM-compatible semantics
(LevenbergMarquardtOptimizer defaults: lambda up/down factor 10,
relativeErrorTol 1e-5), expressed as a single ``lax.while_loop`` so a whole
solve is one XLA computation. Jacobians come from ``jax.jacfwd`` of the
residual at the zero tangent — exact, and cheap for the small parameter
dimensions used here (6-dof pose, 15-dof pose+vel+bias, 6W-dof windows).

Used by:
- motion-only BA (reference estimatePoseGTSAM,
  src/FeatureTracker.cpp:166-411) via :func:`motion_only_ba`,
- the IMU-fused variant (vslam_tpu/models/tracker.py),
- local bundle adjustment (vslam_tpu/ops/schur.py) for its reduced camera
  system iterations.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from vslam_tpu.geometry import se3

CHI2_2DOF = 5.991
CHI2_3DOF = 7.815  # reference include/FeatureTracker.h:56


class LMResult(NamedTuple):
    state: jax.Array | tuple
    error: jax.Array  # final 0.5 * ||r||^2
    iterations: jax.Array
    lam: jax.Array


def lm_solve(
    residual_fn: Callable,
    state0,
    retract_fn: Callable,
    dim: int,
    max_iters: int = 100,
    lambda0: float = 1e-5,
    lambda_factor: float = 10.0,
    rel_tol: float = 1e-5,
    min_diag: float = 1e-6,
) -> LMResult:
    """Minimize 0.5 * ||residual_fn(state)||^2 over a `dim`-dimensional
    tangent space with retraction `retract_fn(state, delta)`.

    residual_fn must return a flat (R,) vector with invalid rows already
    zeroed (they then contribute nothing to J or g).
    """

    def r_at(state, delta):
        return residual_fn(retract_fn(state, delta))

    zeros = jnp.zeros((dim,), jnp.float32)

    def half_sq(r):
        return 0.5 * jnp.sum(r * r)

    err0 = half_sq(residual_fn(state0))

    def cond(carry):
        _, _, _, it, done = carry
        return (~done) & (it < max_iters)

    def body(carry):
        state, lam, err, it, done = carry
        J = jax.jacfwd(lambda d: r_at(state, d))(zeros)  # (R, dim)
        r = residual_fn(state)
        H = J.T @ J
        g = J.T @ r
        diag = jnp.maximum(jnp.diagonal(H), min_diag)
        A = H + lam * jnp.diag(diag)
        delta = jnp.linalg.solve(A, -g)
        new_state = retract_fn(state, delta)
        new_err = half_sq(residual_fn(new_state))
        improved = new_err < err
        state = jax.tree.map(
            lambda a, b: jnp.where(improved, b, a), state, new_state
        )
        lam = jnp.where(improved, lam / lambda_factor, lam * lambda_factor)
        lam = jnp.clip(lam, 1e-10, 1e8)
        rel = jnp.abs(err - new_err) / jnp.maximum(err, 1e-12)
        # converged on relative decrease — but only when damping is low: a
        # heavily-damped step is tiny by construction, so its small relative
        # improvement says nothing about optimality (declaring convergence
        # there stalls the solve far from the optimum). Separately, exit
        # when lambda blows up after repeated rejections (true stall; no
        # further f32 progress possible).
        done = (improved & (rel < rel_tol) & (lam < 1e-1)) | (lam > 1e6)
        err = jnp.where(improved, new_err, err)
        return (state, lam, err, it + 1, done)

    state, lam, err, its, _ = jax.lax.while_loop(
        cond, body, (state0, jnp.float32(lambda0), err0, jnp.int32(0), jnp.bool_(False))
    )
    return LMResult(state=state, error=err, iterations=its, lam=lam)


# ---------------------------------------------------------------------------
# Motion-only bundle adjustment (pose from frozen landmarks)
# ---------------------------------------------------------------------------


def stereo_residuals(
    T_wc: jax.Array,  # (4,4) camera-to-world (left)
    pts_w: jax.Array,  # (M,3) frozen landmark positions
    obs: jax.Array,  # (M,3) [u_left, v_left, u_right]; u_right ignored if not stereo
    weights: jax.Array,  # (M,) sqrt information (1/sigma per obs; octave-scaled)
    is_stereo: jax.Array,  # (M,) bool: has a valid right-x (close point)
    is_right: jax.Array,  # (M,) bool: observation is in the RIGHT camera only
    valid: jax.Array,  # (M,) bool
    K: jax.Array,  # (3,3) rectified intrinsics
    baseline: jax.Array,
) -> jax.Array:
    """(M, 3) weighted residuals replicating the reference factor mix
    (src/FeatureTracker.cpp:216-298): close points get a GenericStereoFactor
    (u_l, u_r, v rows), far left points a 2-row projection factor, right-cam
    points a 2-row projection through the right camera."""
    T_cw = se3.inverse(T_wc)
    pc = se3.transform_points(T_cw, pts_w)  # (M,3) left-cam frame
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    z = jnp.maximum(pc[..., 2], 0.05)
    u_l = fx * pc[..., 0] / z + cx
    v_l = fy * pc[..., 1] / z + cy
    # right camera: x shifted by -baseline in camera frame
    u_r = fx * (pc[..., 0] - baseline) / z + cx

    # left-cam rows (or right-cam if is_right)
    u_pred = jnp.where(is_right, u_r, u_l)
    r_u = u_pred - obs[:, 0]
    r_v = v_l - obs[:, 1]
    r_ur = jnp.where(is_stereo, u_r - obs[:, 2], 0.0)

    # A behind-camera landmark must COST, not vanish: zero-weighting
    # behind rows created a degenerate global minimum — push the camera
    # past the whole matched cloud and every residual (hence the total
    # cost) becomes exactly zero, so a garbage correspondence set
    # "converges" there with a perfect inlier count (observed: a
    # teleport-scene relocalization verified 84/84). The clamped-z
    # projection already yields a huge pixel residual for behind points;
    # clip it to +-512 px so one such row dominates a good row (~1 px)
    # without overflowing f32 squared sums.
    w = jnp.where(valid, weights, 0.0)
    res = jnp.stack([r_u, r_v, r_ur], axis=-1)
    res = jnp.clip(res, -512.0, 512.0) * w[:, None]
    return res


def reproj_chi2(
    T_wc, pts_w, obs, inv_sigma2, is_stereo, is_right, valid, K, baseline
) -> jax.Array:
    """Per-observation chi^2 as the reference's check2dError / findOutliersR
    (src/FeatureTracker.cpp:147-164, 582-649): squared pixel error scaled by
    the per-octave inverse sigma^2; stereo points add the right-x term."""
    ones = jnp.ones_like(inv_sigma2)
    res = stereo_residuals(
        T_wc, pts_w, obs, ones, is_stereo, is_right, valid, K, baseline
    )
    e2 = jnp.sum(res * res, axis=-1)
    # behind-camera rows can never classify as inliers (their clipped
    # residual could in principle still land under the gate)
    T_cw = se3.inverse(T_wc)
    z = se3.transform_points(T_cw, pts_w)[..., 2]
    e2 = jnp.where(z <= 0.05, 1e12, e2)
    return e2 * inv_sigma2


@functools.partial(jax.jit, static_argnames=("max_iters",))
def motion_only_ba(
    T_init: jax.Array,
    pts_w: jax.Array,
    obs: jax.Array,
    inv_sigma2: jax.Array,
    is_stereo: jax.Array,
    is_right: jax.Array,
    valid: jax.Array,
    K: jax.Array,
    baseline: jax.Array,
    max_iters: int = 100,
):
    """Pose-only LM with frozen landmarks (reference estimatePoseGTSAM,
    no-IMU branch: only x1 is inserted, landmarks are NonlinearEquality-
    frozen, LM maxIterations=100 — src/FeatureTracker.cpp:195-203, 389-392).

    Two passes: solve, classify chi-squared outliers, re-solve with them
    excluded (the reference achieves the same by excluding `outliers` map
    points from the factor graph on subsequent estimatePoseGTSAM calls in
    its retry loop, src/FeatureTracker.cpp:216-220, 1202-1233).

    Stereo->mono demotion (reference findOutliersR,
    src/FeatureTracker.cpp:582-649): a close stereo observation whose
    3-row chi2 fails ONLY because of the right-x term is demoted to a
    mono (2-row) observation instead of discarded — the left projection
    is still good information.

    Returns (T_opt, chi2 (M,), inliers (M,) bool, is_stereo_out (M,) bool,
    lm_result). is_stereo_out is is_stereo minus the demoted observations.
    """
    weights = jnp.sqrt(inv_sigma2)
    huber_delta = jnp.sqrt(CHI2_3DOF)  # Huber kernel at the chi2 gate

    def classify(T, st):
        """(keep, st_kept): chi2 gate with stereo->mono demotion."""
        chi2_3 = reproj_chi2(
            T, pts_w, obs, inv_sigma2, st, is_right, valid, K, baseline
        )
        chi2_2 = reproj_chi2(
            T, pts_w, obs, inv_sigma2, jnp.zeros_like(st), is_right, valid,
            K, baseline,
        )
        demote = st & (chi2_3 >= CHI2_3DOF) & (chi2_2 < CHI2_3DOF)
        keep = valid & ((chi2_3 < CHI2_3DOF) | demote)
        return keep, st & ~demote

    def solve(T0, mask, st, iters, robust):
        def residual(T):
            r = stereo_residuals(
                T, pts_w, obs, weights, st, is_right, mask, K, baseline
            )
            if not robust:
                return r.reshape(-1)
            # Pass-1 Huber reweighting (in whitened units): bounds the
            # influence of gross outliers so the chi2 sweep between passes
            # stays meaningful. IRLS semantics: the weight is frozen at each
            # linearization point (stop_gradient) — differentiating through
            # it corrupts the Gauss-Newton curvature and stalls the solve.
            # eps-smoothed norm: d||r||/dr is NaN at r=0, and padded rows ARE
            # exactly zero — the NaN would poison the whole jacfwd Jacobian.
            n = jnp.sqrt(jnp.sum(r * r, axis=-1) + 1e-18)
            w_h = jax.lax.stop_gradient(
                jnp.sqrt(jnp.minimum(1.0, huber_delta / n))
            )
            return (r * w_h[:, None]).reshape(-1)

        return lm_solve(
            residual,
            T0,
            lambda T, d: se3.retract(T, d),
            dim=6,
            max_iters=iters,
        )

    res1 = solve(T_init, valid, is_stereo, max_iters, robust=True)
    keep, st1 = classify(res1.state, is_stereo)
    # guard: if the sweep kills nearly everything, keep the original set
    enough = jnp.sum(keep) >= jnp.maximum(jnp.sum(valid) // 4, 6)
    keep = jnp.where(enough, keep, valid)
    st1 = jnp.where(enough, st1, is_stereo)
    # pass 2 on the gated set WITHOUT the robust kernel — reference parity
    # (GTSAM graphs at src/FeatureTracker.cpp:216-298 use plain projection
    # factors; outliers are excluded, not reweighted). Pure least squares
    # has a single basin near the optimum, where Huber on a noisy map can
    # hold init-dependent local optima.
    result = solve(res1.state, keep, st1, max_iters, robust=False)
    T_opt = result.state
    inliers, st_out = classify(T_opt, st1)
    chi2 = reproj_chi2(
        T_opt, pts_w, obs, inv_sigma2, st_out, is_right, valid, K, baseline
    )
    return T_opt, chi2, inliers, st_out, result


# ---------------------------------------------------------------------------
# IMU-fused motion-only bundle adjustment (15-dof: pose + velocity + bias)
# ---------------------------------------------------------------------------


def motion_only_ba_imu(
    T_init: jax.Array,  # (4,4) predicted cam-to-world (left camera)
    v_init: jax.Array,  # (3,) predicted world velocity (body)
    bias_prev: jax.Array,  # (6,) [ba, bg] of the previous frame (frozen)
    T_prev_wb: jax.Array,  # (4,4) previous BODY pose (frozen anchor x0)
    v_prev: jax.Array,  # (3,) previous world velocity (frozen v0)
    pre,  # imu.PreintState preintegrated over the inter-frame samples
    gravity_w: jax.Array,  # (3,)
    imu_params,  # imu.ImuParams
    T_bc: jax.Array,  # (4,4) body-to-cam extrinsic (reference T_bc1)
    pts_w: jax.Array,
    obs: jax.Array,
    inv_sigma2: jax.Array,
    is_stereo: jax.Array,
    is_right: jax.Array,
    valid: jax.Array,
    K: jax.Array,
    baseline: jax.Array,
    max_iters: int = 100,
    bias_sigma: float = 1e-3,
):
    """Visual-inertial pose solve replicating the reference's IMU branch of
    estimatePoseGTSAM (src/FeatureTracker.cpp:301-387): x0/v0/b0 frozen by
    NonlinearEquality, CombinedImuFactor(x0,v0,x1,v1,b0,b1), bias
    BetweenFactor sigma=1e-3 (379-381), priors on x1/v1 at the propagated
    state (383-385), plus the projection/stereo factors of the no-IMU path.

    State is (T_wc, v_w, bias) — 6+3+6 = 15 dof, one lax.while_loop LM.
    Returns (T_opt, v_opt, bias_opt, chi2, inliers, is_stereo_out,
    lm_result). Stereo->mono demotion as in :func:`motion_only_ba`.
    """
    from vslam_tpu.ops import imu as imu_mod

    weights = jnp.sqrt(inv_sigma2)
    huber_delta = jnp.sqrt(CHI2_3DOF)
    T_cb = se3.inverse(T_bc)

    def classify(T, st):
        chi2_3 = reproj_chi2(
            T, pts_w, obs, inv_sigma2, st, is_right, valid, K, baseline
        )
        chi2_2 = reproj_chi2(
            T, pts_w, obs, inv_sigma2, jnp.zeros_like(st), is_right, valid,
            K, baseline,
        )
        demote = st & (chi2_3 >= CHI2_3DOF) & (chi2_2 < CHI2_3DOF)
        keep = valid & ((chi2_3 < CHI2_3DOF) | demote)
        return keep, st & ~demote

    # propagated (predicted) state for the x1/v1 priors
    T_pred_wb = T_init @ T_cb
    prior_sigma_pose = 1.0
    prior_sigma_vel = 1.0

    def retract(state, d):
        T, v, b = state
        return (se3.retract(T, d[:6]), v + d[6:9], b + d[9:15])

    def solve(state0, mask, st, iters, robust):
        def residual(state):
            T_wc, v_w, b = state
            r_vis = stereo_residuals(
                T_wc, pts_w, obs, weights, st, is_right, mask, K, baseline
            )
            if robust:
                # IRLS Huber: weight frozen per linearization (see
                # motion_only_ba) — pass 2 runs without the kernel
                n = jnp.sqrt(jnp.sum(r_vis * r_vis, axis=-1) + 1e-18)
                w_h = jax.lax.stop_gradient(
                    jnp.sqrt(jnp.minimum(1.0, huber_delta / n))
                )
                r_vis = r_vis * w_h[:, None]
            r_vis = r_vis.reshape(-1)
            T_wb = T_wc @ T_cb
            r_imu = imu_mod.combined_residual(
                T_prev_wb, v_prev, bias_prev, T_wb, v_w, b,
                pre, bias_prev, gravity_w, imu_params,
            )
            r_bias = (b - bias_prev) / bias_sigma
            r_prior_p = se3.se3_logmap(se3.inverse(T_pred_wb) @ T_wb) / prior_sigma_pose
            r_prior_v = (v_w - v_init) / prior_sigma_vel
            return jnp.concatenate([r_vis, r_imu, r_bias, r_prior_p, r_prior_v])

        return lm_solve(
            residual,
            state0,
            retract,
            dim=15,
            max_iters=iters,
        )

    state0 = (T_init, v_init, bias_prev)
    res1 = solve(state0, valid, is_stereo, max_iters, robust=True)
    T1, v1, b1 = res1.state
    keep, st1 = classify(T1, is_stereo)
    enough = jnp.sum(keep) >= jnp.maximum(jnp.sum(valid) // 4, 6)
    keep = jnp.where(enough, keep, valid)
    st1 = jnp.where(enough, st1, is_stereo)
    result = solve(res1.state, keep, st1, max_iters, robust=False)
    T_opt, v_opt, b_opt = result.state
    inliers, st_out = classify(T_opt, st1)
    chi2 = reproj_chi2(
        T_opt, pts_w, obs, inv_sigma2, st_out, is_right, valid, K, baseline
    )
    return T_opt, v_opt, b_opt, chi2, inliers, st_out, result
