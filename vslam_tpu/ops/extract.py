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
    levels = pyramid.build_pyramid(img, n_levels, scale)
    quotas = level_quotas(total, n_levels, scale)

    xs, octs, resps, valids, descs, packeds, angles = [], [], [], [], [], [], []
    for l, (im_l, quota) in enumerate(zip(levels, quotas)):
        if quota <= 0:
            continue
        h, w = im_l.shape
        margin = min(edge_margin, min(h, w) // 4)
        xy, resp, valid = fast.detect(
            im_l,
            threshold_hi=fast_hi,
            threshold_lo=fast_lo,
            cell=min(cell, max(h, w)),
            max_keypoints=quota,
            edge_margin=margin,
        )
        blurred = pyramid.gaussian_blur(im_l)
        ang = orb.orientations(blurred, xy)
        packed, signed = orb.brief_descriptors(blurred, xy, ang)
        s = scale**l
        xs.append(xy.astype(jnp.float32) * s)
        octs.append(jnp.full((quota,), l, jnp.int32))
        resps.append(resp)
        valids.append(valid)
        descs.append(signed)
        packeds.append(packed)
        angles.append(ang)

    return Keys(
        xy=jnp.concatenate(xs, axis=0),
        octave=jnp.concatenate(octs, axis=0),
        response=jnp.concatenate(resps, axis=0),
        valid=jnp.concatenate(valids, axis=0),
        desc=jnp.concatenate(descs, axis=0),
        packed=jnp.concatenate(packeds, axis=0),
        angle=jnp.concatenate(angles, axis=0),
    )


def scale_factors(n_levels: int = 8, scale: float = 1.2) -> np.ndarray:
    return np.array([scale**l for l in range(n_levels)], np.float32)


def inv_sigma2(octave: jax.Array, n_levels: int = 8, scale: float = 1.2) -> jax.Array:
    """Per-octave information weight 1/sigma^2 with sigma = scale^octave
    (the reference's per-octave isotropic sigmas,
    src/FeatureTracker.cpp:239-240)."""
    sf = jnp.asarray(scale_factors(n_levels, scale))
    s = sf[jnp.clip(octave, 0, n_levels - 1)]
    return 1.0 / (s * s)
