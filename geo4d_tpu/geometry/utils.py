"""Basic projective geometry: pixel grids, transforms, unprojection.

Parity targets: reference dust3r/utils/geometry.py (xy_grid :15, geotrf
:40-101, inv :104, depthmap_to_pts3d :114). Implemented batched in JAX.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def xy_grid(width: int, height: int, homogeneous: bool = False) -> jnp.ndarray:
    """Pixel-center integer grid, shape (H, W, 2) with (x, y) ordering."""
    x = jnp.arange(width, dtype=jnp.float32)
    y = jnp.arange(height, dtype=jnp.float32)
    xx, yy = jnp.meshgrid(x, y, indexing="xy")
    grid = jnp.stack([xx, yy], axis=-1)
    if homogeneous:
        grid = jnp.concatenate([grid, jnp.ones_like(grid[..., :1])], axis=-1)
    return grid


def geotrf(T: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply 4x4 (or 3x4) homogeneous transform(s) to 3D points.

    T: (..., 4, 4); pts: (..., N, 3) or (..., H, W, 3) broadcast over leading
    dims. Returns transformed xyz.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    # contract last axis of pts with R rows: out = pts @ R^T + t
    out = jnp.einsum("...ij,...nj->...ni", R, pts.reshape(*pts.shape[:-2], -1, 3) if pts.ndim >= 3 else pts)
    out = out + t[..., None, :]
    return out.reshape(pts.shape)


def inv_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Invert rigid/similarity 4x4 transforms (rotation+scale block invert)."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    Rinv = jnp.linalg.inv(R)
    tinv = -jnp.einsum("...ij,...j->...i", Rinv, t)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0]), T[..., :1, :].shape
    )
    top = jnp.concatenate([Rinv, tinv[..., None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def depthmap_to_pts3d(depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Unproject depth (..., H, W) with intrinsics (..., 3, 3) -> (..., H, W, 3).

    Camera-frame points: (x - cx)/fx * z, (y - cy)/fy * z, z.
    """
    h, w = depth.shape[-2:]
    grid = xy_grid(w, h)  # (H, W, 2)
    fx = K[..., 0, 0][..., None, None]
    fy = K[..., 1, 1][..., None, None]
    cx = K[..., 0, 2][..., None, None]
    cy = K[..., 1, 2][..., None, None]
    x = (grid[..., 0] - cx) / fx * depth
    y = (grid[..., 1] - cy) / fy * depth
    return jnp.stack([x, y, depth], axis=-1)


def make_intrinsics(focal, cx, cy) -> jnp.ndarray:
    """Build (..., 3, 3) pinhole K from scalar focal + principal point."""
    focal = jnp.asarray(focal, jnp.float32)
    z = jnp.zeros_like(focal)
    o = jnp.ones_like(focal)
    cx = jnp.broadcast_to(jnp.asarray(cx, jnp.float32), focal.shape)
    cy = jnp.broadcast_to(jnp.asarray(cy, jnp.float32), focal.shape)
    rows = jnp.stack(
        [focal, z, cx, z, focal, cy, z, z, o], axis=-1
    )
    return rows.reshape(*focal.shape, 3, 3)
