"""Batched multi-view triangulation (DLT) + reprojection validation.

Replaces the reference's per-candidate ``gtsam::triangulatePoint3`` loop
(reference src/OptimizationBA.cpp:127-209) with one batched linear-algebra
program: for C candidates x V views, build the DLT system from masked
observations and take the smallest eigenvector of the 4x4 normal matrix
A^T A per candidate — fully vectorized, no SVD of ragged systems.

Views are camera projection matrices P = K [R|t] (world->pixel). Stereo
observations contribute the right camera as an extra view (the reference's
close-stereo-as-two-monos treatment, src/OptimizationBA.cpp:592-740).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vslam_tpu.geometry import se3


def projection_matrices(T_wc: jax.Array, K: jax.Array, baseline_shift: jax.Array | None = None) -> jax.Array:
    """(V, 3, 4) world->pixel matrices from (V, 4, 4) cam-to-world poses.

    baseline_shift: optional (V,) x-offsets (use +baseline for the right
    camera of a rectified rig)."""
    T_cw = se3.inverse(T_wc)
    Rt = T_cw[..., :3, :4]
    if baseline_shift is not None:
        Rt = Rt.at[..., 0, 3].add(-baseline_shift)
    return jnp.einsum("ij,vjk->vik", K, Rt)


def triangulate_dlt(
    P: jax.Array,  # (V, 3, 4) or (C, V, 3, 4) projection matrices
    uv: jax.Array,  # (C, V, 2) pixel observations
    view_mask: jax.Array,  # (C, V) bool — which views observe which candidate
) -> jax.Array:
    """(C, 3) triangulated world points (garbage where <2 valid views —
    filter with :func:`validate_triangulation`)."""
    if P.ndim == 3:
        P = jnp.broadcast_to(P[None], (uv.shape[0],) + P.shape)
    u = uv[..., 0:1]  # (C, V, 1)
    v = uv[..., 1:2]
    r0 = P[..., 0, :]  # (C, V, 4)
    r1 = P[..., 1, :]
    r2 = P[..., 2, :]
    # rows: u * r2 - r0, v * r2 - r1; normalized for conditioning
    a0 = u * r2 - r0
    a1 = v * r2 - r1
    A = jnp.concatenate([a0, a1], axis=1)  # (C, 2V, 4)
    m = jnp.concatenate([view_mask, view_mask], axis=1)[..., None]
    norm = jnp.linalg.norm(A, axis=-1, keepdims=True)
    A = jnp.where(m, A / jnp.maximum(norm, 1e-9), 0.0)
    AtA = jnp.einsum("cri,crj->cij", A, A)  # (C, 4, 4)
    _, vecs = jnp.linalg.eigh(AtA)
    X = vecs[..., 0]  # smallest eigenvalue's eigenvector
    w = X[..., 3]
    safe_w = jnp.where(jnp.abs(w) < 1e-9, 1e-9, w)
    return X[..., :3] / safe_w[..., None]


def refine_triangulation(
    pts_w: jax.Array,  # (C, 3) DLT initial points
    P: jax.Array,  # (V, 3, 4) or (C, V, 3, 4)
    uv: jax.Array,  # (C, V, 2)
    view_mask: jax.Array,  # (C, V)
    iters: int = 3,
) -> jax.Array:
    """Batched Gauss-Newton polish of triangulated points on reprojection
    error (the nonlinear refinement inside gtsam::triangulatePoint3 used at
    reference src/OptimizationBA.cpp:187). 3x3 normal equations per
    candidate, all candidates solved at once."""
    if P.ndim == 3:
        P = jnp.broadcast_to(P[None], (uv.shape[0],) + P.shape)
    A = P[..., :3]  # (C, V, 3, 3)
    a = P[..., 3]  # (C, V, 3)

    def step(X, _):
        p = jnp.einsum("cvij,cj->cvi", A, X) + a  # (C, V, 3)
        z = p[..., 2]
        safe_z = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
        r = p[..., :2] / safe_z[..., None] - uv  # (C, V, 2)
        # d(u)/dX = (A0 - u_hat * A2) / z, same for v
        uvhat = p[..., :2] / safe_z[..., None]
        J = (A[..., :2, :] - uvhat[..., None] * A[..., 2:3, :]) / safe_z[..., None, None]
        Jm = jnp.where(view_mask[..., None, None], J, 0.0)
        rm = jnp.where(view_mask[..., None], r, 0.0)
        H = jnp.einsum("cvri,cvrj->cij", Jm, Jm) + 1e-6 * jnp.eye(3)
        b = jnp.einsum("cvri,cvr->ci", Jm, rm)
        dX = jnp.linalg.solve(H, -b[..., None])[..., 0]
        # guard: only move if the update is finite
        dX = jnp.where(jnp.isfinite(dX), dX, 0.0)
        return X + dX, None

    X, _ = jax.lax.scan(step, pts_w, None, length=iters)
    return X


def validate_triangulation(
    pts_w: jax.Array,  # (C, 3)
    P: jax.Array,  # (V, 3, 4) or (C, V, 3, 4)
    uv: jax.Array,  # (C, V, 2)
    view_mask: jax.Array,  # (C, V)
    inv_sigma2: jax.Array,  # (C, V) per-observation information
    chi2_thr: float = 7.815,
    min_views: int = 3,
) -> tuple[jax.Array, jax.Array]:
    """Reprojection check per the reference's checkReprojError
    (src/OptimizationBA.cpp:14-88): every observing view must reproject
    within chi2 and have positive depth; at least `min_views` views.

    Returns (ok (C,) bool, chi2 (C, V))."""
    if P.ndim == 3:
        P = jnp.broadcast_to(P[None], (uv.shape[0],) + P.shape)
    Xh = jnp.concatenate([pts_w, jnp.ones_like(pts_w[..., :1])], axis=-1)  # (C,4)
    proj = jnp.einsum("cvij,cj->cvi", P, Xh)  # (C, V, 3)
    z = proj[..., 2]
    uvp = proj[..., :2] / jnp.maximum(jnp.abs(z[..., None]), 1e-9)
    err = uvp - uv
    chi2 = jnp.sum(err * err, axis=-1) * inv_sigma2
    good_view = view_mask & (z > 0.0) & (chi2 < chi2_thr)
    # every observing view must pass, and enough views observe it
    all_pass = jnp.all(~view_mask | good_view, axis=-1)
    n_views = jnp.sum(view_mask, axis=-1)
    ok = all_pass & (n_views >= min_views)
    return ok, chi2
