"""Full multi-level ORB extraction: pyramid -> FAST -> ANMS -> orientation
-> BRIEF, one fused jit per image size.

Equivalent of reference FeatureExtractor::extractKeysNew
(src/FeatureExtractor.cpp:481-533): geometric per-level feature quotas
(648-659), detection per level, keypoints rescaled to level-0 coordinates
(523-524). Output is a fixed-size structure-of-arrays (the TrackedKeys
analog, include/FeatureExtractor.h:18-50) with a validity mask.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from vslam_tpu.ops import fast, orb, pyramid


class Keys(NamedTuple):
    """Fixed-size keypoint SoA (the TrackedKeys analog)."""

    xy: jax.Array  # (N, 2) f32 level-0 pixel coords
    octave: jax.Array  # (N,) int32
    response: jax.Array  # (N,) f32
    valid: jax.Array  # (N,) bool
    desc: jax.Array  # (N, 256) int8 +-1 (MXU form)
    packed: jax.Array  # (N, 8) uint32 (bit-packed form)
    angle: jax.Array  # (N,) f32 radians


def level_quotas(total: int, n_levels: int, scale: float) -> list[int]:
    """Geometric per-level quotas summing to `total` (reference
    src/FeatureExtractor.cpp:648-659)."""
    inv = 1.0 / scale
    first = total * (1.0 - inv) / (1.0 - inv**n_levels)
    quotas = [int(round(first * inv**l)) for l in range(n_levels - 1)]
    quotas.append(max(total - sum(quotas), 0))
    return quotas


def extract_batch(
    imgs: jax.Array,
    n_levels: int = 8,
    scale: float = 1.2,
    total: int = 2048,
    cell: int = 35,
    edge_margin: int = 19,
    fast_hi: float = 20.0,
    fast_lo: float = 7.0,
) -> Keys:
    """Batched extraction over (B, H, W) images (e.g. a stereo pair as one
    program). Detection runs per pyramid level (static shapes differ), but
    description is ONE pass: blurred levels are packed into a padded
    (B, n_levels, H, W) atlas, every keypoint's 31x31 patch is gathered in a
    single op, and orientation + BRIEF are computed from the patches —
    replacing 2 x n_levels separate gather/describe stages per frame. All
    Keys fields carry a leading batch dim."""
    B, H, W = imgs.shape
    shapes = pyramid.level_shapes(H, W, n_levels, scale)
    quotas = level_quotas(total, n_levels, scale)

    atlas = jnp.zeros((B, n_levels, H, W), imgs.dtype)
    cur = imgs
    xs, resps, valids = [], [], []
    slot_level: list[int] = []
    slot_h: list[int] = []
    slot_w: list[int] = []
    for l in range(n_levels):
        h, w = shapes[l]
        if l > 0:
            cur = pyramid.resize_bilinear_batch(cur, h, w)
        blurred = pyramid.gaussian_blur_batch(cur)
        atlas = jax.lax.dynamic_update_slice(
            atlas, blurred[:, None], (0, l, 0, 0)
        )
        quota = quotas[l]
        if quota <= 0:
            continue
        margin = min(edge_margin, min(h, w) // 4)
        xy, resp, valid = jax.vmap(
            lambda im: fast.detect(
                im,
                threshold_hi=fast_hi,
                threshold_lo=fast_lo,
                cell=min(cell, max(h, w)),
                max_keypoints=quota,
                edge_margin=margin,
            )
        )(cur)
        xs.append(xy)
        resps.append(resp)
        valids.append(valid)
        slot_level += [l] * quota
        slot_h += [h] * quota
        slot_w += [w] * quota

    xy_lvl = jnp.concatenate(xs, axis=1)  # (B, N, 2) int32 level coords
    resp = jnp.concatenate(resps, axis=1)
    valid = jnp.concatenate(valids, axis=1)
    N = xy_lvl.shape[1]
    lvl = jnp.asarray(np.array(slot_level, np.int32))
    hb = jnp.asarray(np.array(slot_h, np.int32))
    wb = jnp.asarray(np.array(slot_w, np.int32))

    # one patch gather for ALL keypoints of ALL levels and both images
    P = orb.PATCH
    half = P // 2
    dy = jnp.arange(-half, half + 1, dtype=jnp.int32)
    dx = jnp.arange(-half, half + 1, dtype=jnp.int32)
    ys = jnp.clip(xy_lvl[:, :, 1, None] + dy[None, None], 0, (hb - 1)[None, :, None])
    xs_ = jnp.clip(xy_lvl[:, :, 0, None] + dx[None, None], 0, (wb - 1)[None, :, None])
    flat_idx = (
        lvl[None, :, None, None] * (H * W)
        + ys[:, :, :, None] * W
        + xs_[:, :, None, :]
    ).reshape(B, N * P * P)
    patches = jnp.take_along_axis(
        atlas.reshape(B, n_levels * H * W), flat_idx, axis=1
    ).reshape(B, N, P, P)

    angle = orb.orientation_from_patches(patches)
    packed, signed = orb.brief_from_patches(patches, angle)

    sf = jnp.asarray(np.array([scale**l for l in slot_level], np.float32))
    return Keys(
        xy=xy_lvl.astype(jnp.float32) * sf[None, :, None],
        octave=jnp.broadcast_to(lvl[None], (B, N)),
        response=resp,
        valid=valid,
        desc=signed,
        packed=packed,
        angle=angle,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "n_levels",
        "scale",
        "total",
        "cell",
        "edge_margin",
        "fast_hi",
        "fast_lo",
    ),
)
def extract(
    img: jax.Array,
    n_levels: int = 8,
    scale: float = 1.2,
    total: int = 2048,
    cell: int = 35,
    edge_margin: int = 19,
    fast_hi: float = 20.0,
    fast_lo: float = 7.0,
) -> Keys:
    """Single-image extraction (extract_batch with B=1)."""
    keys = extract_batch(
        img[None],
        n_levels=n_levels,
        scale=scale,
        total=total,
        cell=cell,
        edge_margin=edge_margin,
        fast_hi=fast_hi,
        fast_lo=fast_lo,
    )
    return jax.tree.map(lambda a: a[0], keys)


def scale_factors(n_levels: int = 8, scale: float = 1.2) -> np.ndarray:
    return np.array([scale**l for l in range(n_levels)], np.float32)


def inv_sigma2(octave: jax.Array, n_levels: int = 8, scale: float = 1.2) -> jax.Array:
    """Per-octave information weight 1/sigma^2 with sigma = scale^octave
    (the reference's per-octave isotropic sigmas,
    src/FeatureTracker.cpp:239-240)."""
    sf = jnp.asarray(scale_factors(n_levels, scale))
    s = sf[jnp.clip(octave, 0, n_levels - 1)]
    return 1.0 / (s * s)
