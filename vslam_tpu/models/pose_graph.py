"""SE(3) pose-graph optimization (loop-closure correction).

Given keyframe poses, a chain of odometry edges (relative poses taken
from the current estimates, like the reference's BetweenFactor chain,
src/OptimizationBA.cpp:750-768) and one or more LOOP edges (relative
poses measured by geometrically-verified relocalization against an old
keyframe), minimize

    sum_e || log( Z_e^-1 * T_i^-1 * T_j ) ||^2 * w_e

over all poses with pose 0 fixed. This distributes the accumulated loop
error along the trajectory BEFORE bundle adjustment — running global BA
directly on a drifted loop fails, because the self-referential odometry
chain holds the drifted shape while the chi-squared sweep kills the
merged landmarks' (large) reprojection residuals.

Fixed shapes: P pose slots + E edge slots, masked; one Gauss-Newton
iteration is a dense (6P x 6P) solve (P <= ~1k keyframes -> <= 6k x 6k,
fine on one chip). The whole loop is a lax.while_loop with accept/reject
damping like ops/schur.

The reference has no pose graph at all — its loop-closure fields are
vestigial (include/Map.h:122-127, never driven; SURVEY.md quirks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from vslam_tpu.geometry import se3


def _edge_residuals(poses, ei, ej, rel, w):
    """(E, 6) weighted log-residuals of relative-pose edges."""

    def one(i, j, Z, wt):
        r = se3.se3_logmap(
            se3.inverse(Z) @ se3.inverse(poses[i]) @ poses[j]
        )
        return r * wt

    return jax.vmap(one)(ei, ej, rel, w)


@functools.partial(jax.jit, static_argnames=("iters",))
def optimize(
    poses: jax.Array,  # (P, 4, 4) cam-to-world
    pose_valid: jax.Array,  # (P,) bool
    edges_i: jax.Array,  # (E,) int32
    edges_j: jax.Array,  # (E,) int32
    edges_rel: jax.Array,  # (E, 4, 4) measured T_i^-1 T_j
    edges_w: jax.Array,  # (E,) sqrt-information (0 = padding)
    iters: int = 20,
    lambda0: float = 1e-6,
):
    """Damped Gauss-Newton over the pose graph; pose 0 stays fixed (world
    gauge). Returns (optimized poses, final error)."""
    P = poses.shape[0]
    free = pose_valid & (jnp.arange(P) > 0)

    def error(ps):
        r = _edge_residuals(ps, edges_i, edges_j, edges_rel, edges_w)
        return 0.5 * jnp.sum(r * r)

    def assemble(ps, lam):
        zeros6 = jnp.zeros(6, jnp.float32)

        def res_of(di, dj, i, j, Z, wt):
            Ti = se3.retract(ps[i], di)
            Tj = se3.retract(ps[j], dj)
            return se3.se3_logmap(se3.inverse(Z) @ se3.inverse(Ti) @ Tj) * wt

        def per_edge(i, j, Z, wt):
            r = res_of(zeros6, zeros6, i, j, Z, wt)
            Ji = jax.jacfwd(lambda d: res_of(d, zeros6, i, j, Z, wt))(zeros6)
            Jj = jax.jacfwd(lambda d: res_of(zeros6, d, i, j, Z, wt))(zeros6)
            return r, Ji, Jj

        r, Ji, Jj = jax.vmap(per_edge)(edges_i, edges_j, edges_rel, edges_w)
        Ji = Ji * free[edges_i][:, None, None]
        Jj = Jj * free[edges_j][:, None, None]
        H = jnp.zeros((P, P, 6, 6))
        H = H.at[edges_i, edges_i].add(jnp.einsum("eik,eil->ekl", Ji, Ji))
        H = H.at[edges_j, edges_j].add(jnp.einsum("eik,eil->ekl", Jj, Jj))
        H = H.at[edges_i, edges_j].add(jnp.einsum("eik,eil->ekl", Ji, Jj))
        H = H.at[edges_j, edges_i].add(jnp.einsum("eik,eil->ekl", Jj, Ji))
        g = jnp.zeros((P, 6)).at[edges_i].add(jnp.einsum("eik,ei->ek", Ji, r))
        g = g.at[edges_j].add(jnp.einsum("eik,ei->ek", Jj, r))

        eye6 = jnp.eye(6)
        diag = jnp.einsum("ppii->p", H.reshape(P, P, 6, 6))
        H = H + lam * eye6[None, None] * jnp.where(
            jnp.eye(P, dtype=bool)[:, :, None, None],
            jnp.maximum(diag / 6.0, 1e-8)[:, None, None, None],
            0.0,
        )
        fm = free[:, None] & free[None, :]
        H = jnp.where(fm[:, :, None, None], H, 0.0)
        H = H + jnp.where(
            (jnp.eye(P, dtype=bool) & ~jnp.diag(free))[:, :, None, None],
            eye6,
            0.0,
        )
        g = jnp.where(free[:, None], g, 0.0)
        Hd = H.transpose(0, 2, 1, 3).reshape(6 * P, 6 * P)
        delta = -jnp.linalg.solve(Hd, g.reshape(-1)).reshape(P, 6)
        return delta

    def cond(c):
        _, _, _, it, done = c
        return (it < iters) & ~done

    def body(c):
        ps, lam, err, it, _ = c
        delta = assemble(ps, lam)
        ps_new = jax.vmap(se3.retract)(ps, delta)
        err_new = error(ps_new)
        improved = err_new < err
        ps = jax.tree.map(lambda a, b: jnp.where(improved, b, a), ps, ps_new)
        lam = jnp.clip(jnp.where(improved, lam * 0.3, lam * 10.0), 1e-9, 1e5)
        done = improved & (err - err_new <= 1e-9 * jnp.maximum(err, 1e-12))
        err = jnp.where(improved, err_new, err)
        return (ps, lam, err, it + 1, done)

    ps, _, err, _, _ = jax.lax.while_loop(
        cond, body,
        (poses, jnp.float32(lambda0), error(poses), jnp.int32(0), jnp.bool_(False)),
    )
    return ps, err
