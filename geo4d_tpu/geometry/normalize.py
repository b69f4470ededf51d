"""Geometry-modality normalization (bbox2 scheme) and inverses.

Parity targets: reference utils/geometry.py `normalize_pointcloud_bbox2`
(:1157-1230: z-quantile [2%,98%] bbox -> z in [-1,1], x/y scaled by the same
s with alpha/beta gains, invalid -> 1.05, clamp ±2) and
`normalize_inverse_depth_bbox2` (:1083-1150: disparity quantile-normalized to
[-1,1], invalid -> -1.05, clamp ±1.1); inference inverses
`denormalize_pc_bbox2` (test_geo4d.py:84-89) and the (d+1)/2 disparity map
(test_geo4d.py:462).

The shipped eval uses alpha=beta=2 for point maps.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _quantile_bounds(values: jnp.ndarray, valid: jnp.ndarray,
                     lower_ratio: float, upper_ratio: float):
    """Quantiles over valid entries (sort-based, matching the reference's
    sorted-index scheme on a fixed-size array via masked sort)."""
    big = jnp.where(valid, values, jnp.inf)
    order = jnp.sort(big.ravel())
    n_valid = jnp.sum(valid)
    lo_idx = (n_valid * lower_ratio).astype(jnp.int32)
    hi_idx = (n_valid * upper_ratio).astype(jnp.int32)
    return order[lo_idx], order[jnp.maximum(hi_idx, lo_idx)]


def normalize_pointcloud_bbox2(
    pts: jnp.ndarray,          # (T, H, W, 3) camera/world points
    valid: jnp.ndarray,        # (T, H, W) bool
    alpha: float = 2.0,
    beta: float = 2.0,
    lower_ratio: float = 0.02,
    upper_ratio: float = 0.98,
    clamp: float = 2.0,
    return_st: bool = False,
):
    """z-quantile bbox normalization: z -> [-1,1]; x,y scaled by s then gained."""
    z = pts[..., 2]
    lo, hi = _quantile_bounds(z, valid, lower_ratio, upper_ratio)
    t = lo - 0.01
    s = (hi + 0.01) - t
    out = jnp.stack(
        [
            pts[..., 0] / s * alpha,
            pts[..., 1] / s * beta,
            ((pts[..., 2] - t) / s) * 2.0 - 1.0,
        ],
        axis=-1,
    )
    out = jnp.where(valid[..., None], out, 1.05)
    out = jnp.clip(out, -clamp, clamp)
    if return_st:
        return out, s, t
    return out


def denormalize_pointcloud_bbox2(
    pts: jnp.ndarray, alpha: float = 2.0, beta: float = 2.0
) -> jnp.ndarray:
    """Inference inverse (test_geo4d.py:84-89): x/alpha, y/beta, z=(z+1)/2.

    Note the scale s and shift t are NOT undone — the output lives in the
    normalized frame; absolute scale is recovered later by the aligner.
    """
    return jnp.stack(
        [
            pts[..., 0] / alpha,
            pts[..., 1] / beta,
            (pts[..., 2] + 1.0) / 2.0,
        ],
        axis=-1,
    )


def normalize_inverse_depth_bbox2(
    depth: jnp.ndarray,        # (T, H, W) metric depth
    valid: jnp.ndarray,        # (T, H, W) bool
    lower_ratio: float = 0.02,
    upper_ratio: float = 0.98,
    clamp: float = 1.1,
    return_st: bool = False,
):
    """Disparity quantile-normalized to [-1,1]; invalid -> -1.05."""
    disp = 1.0 / (depth + 1e-8)
    lo, hi = _quantile_bounds(disp, valid, lower_ratio, upper_ratio)
    t = lo - 0.01
    s = (hi + 0.01) - t
    out = ((disp - t) / s) * 2.0 - 1.0
    out = jnp.where(valid, out, -1.05)
    out = jnp.clip(out, -clamp, clamp)
    if return_st:
        return out, s, t
    return out


def denormalize_inverse_depth(norm_disp: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] net output -> [0,1] relative disparity (test_geo4d.py:462)."""
    return (norm_disp + 1.0) / 2.0


def sky_mask(pts: jnp.ndarray, sky_value: float = 1.05, eps: float = 0.35) -> jnp.ndarray:
    """Detect the 'invalid/sky' sentinel in decoded point maps
    (test_geo4d.py:276-281): all 3 channels within sky_value±eps."""
    inside = jnp.abs(pts - sky_value) < eps
    return jnp.all(inside, axis=-1)


def far_mask(pts: jnp.ndarray, far_value: float = 1.99) -> jnp.ndarray:
    """|any channel| beyond the normalized range -> far/garbage point
    (test_geo4d.py:284-287)."""
    return jnp.any(jnp.abs(pts) > far_value, axis=-1)
