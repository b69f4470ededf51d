"""MoGe-style focal/shift recovery from affine-invariant point maps.

Parity target: reference utils/geometry.py (point_map_to_depth :162-215,
solve_optimal_shift_focal :232-259, image_plane_uv :217-229). The model
predicts point maps up to an unknown z-shift and focal; recovery solves
    min_{shift, f} | f * xy/(z + shift) - uv |²
where focal is closed-form given shift, leaving a 1-D nonlinear problem.

TPU-first redesign: the reference loops scipy Levenberg–Marquardt per frame
on CPU (geometry.py:196-203). Here the solve is a fixed-iteration damped
Gauss–Newton on the 1-D shift, fully batched over frames with vmap — one
jitted call handles a whole window, no host round-trips.
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def image_plane_uv(width: int, height: int) -> jnp.ndarray:
    """(H, W, 2) UV grid spanning ±(w, h)/diagonal at pixel centers
    (geometry.py:217-229)."""
    aspect = width / height
    span_x = aspect / (1 + aspect**2) ** 0.5
    span_y = 1 / (1 + aspect**2) ** 0.5
    u = jnp.linspace(-span_x * (width - 1) / width, span_x * (width - 1) / width, width)
    v = jnp.linspace(
        -span_y * (height - 1) / height, span_y * (height - 1) / height, height
    )
    uu, vv = jnp.meshgrid(u, v, indexing="xy")
    return jnp.stack([uu, vv], axis=-1)


def _residuals(shift, uv, xy, z, w):
    """Residual of f*xy/(z+shift) - uv with closed-form optimal f."""
    denom = z + shift
    safe = jnp.abs(denom) > 1e-6
    denom = jnp.where(safe, denom, 1e-6)
    xy_proj = xy / denom[:, None] * w[:, None]
    uv_w = uv * w[:, None]
    f = jnp.sum(xy_proj * uv_w) / (jnp.sum(xy_proj * xy_proj) + 1e-12)
    return (f * xy_proj - uv_w).ravel(), f


def solve_shift_focal(
    uv: jnp.ndarray,      # (N, 2)
    xyz: jnp.ndarray,     # (N, 3)
    weights: Optional[jnp.ndarray] = None,
    num_iters: int = 30,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Damped Gauss-Newton on the scalar shift. Returns (shift, focal)."""
    xy, z = xyz[..., :2], xyz[..., 2]
    w = jnp.ones_like(z) if weights is None else weights
    res_fn = lambda s: _residuals(s, uv, xy, z, w)[0]

    def body(_, state):
        shift, lm = state
        r = res_fn(shift)
        J = jax.jacfwd(res_fn)(shift)  # (2N,)
        jtj = jnp.sum(J * J)
        jtr = jnp.sum(J * r)
        step = -jtr / (jtj + lm * jtj + 1e-12)
        new_shift = shift + step
        # accept/reject (LM-style damping adaptation)
        better = jnp.sum(res_fn(new_shift) ** 2) < jnp.sum(r**2)
        shift = jnp.where(better, new_shift, shift)
        lm = jnp.where(better, jnp.maximum(lm * 0.5, 1e-6), jnp.minimum(lm * 4.0, 1e4))
        return shift, lm

    shift0 = jnp.asarray(0.0, xyz.dtype)
    shift, _ = jax.lax.fori_loop(0, num_iters, body, (shift0, jnp.asarray(1e-3)))
    _, focal = _residuals(shift, uv, xy, z, w)
    return shift, focal


def point_map_to_depth(
    points: jnp.ndarray,                       # (..., H, W, 3)
    mask: Optional[jnp.ndarray] = None,        # (..., H, W) bool
    downsample_size: Tuple[int, int] = (64, 64),
    image_size: Optional[Tuple[int, int]] = None,
):
    """Recover depth / FoV / z-shift from point maps (geometry.py:162-215).

    Returns (depth (..., H, W), fov_x (...), fov_y (...), shift (...)).
    Batched: all leading dims solve in parallel on device.

    `image_size=(ih, iw)`: original image resolution when `points` was
    ALREADY nearest-downsampled by the caller (with the same
    `(arange(d)*orig)//d` index formula) — the UV grid, aspect ratio and
    FoV must come from the original geometry, not the downsampled shape.
    Callers use this to downsample on HOST so only the small map crosses
    to the device.
    """
    shape = points.shape
    h, w = shape[-3], shape[-2]
    ih, iw = image_size if image_size is not None else (h, w)
    diagonal = (ih**2 + iw**2) ** 0.5
    pts = points.reshape(-1, h, w, 3)
    b = pts.shape[0]

    dh, dw = downsample_size
    # nearest-neighbor downsample (geometry.py:190-193)
    yi = (jnp.arange(dh) * h // dh).astype(jnp.int32)
    xi = (jnp.arange(dw) * w // dw).astype(jnp.int32)
    pts_lr = pts[:, yi][:, :, xi]                       # (B, dh, dw, 3)
    # UV sampled from the ORIGINAL image-plane grid at the pixel positions
    # the (possibly caller-side) downsample selected
    yi_full = (jnp.arange(dh) * ih // dh).astype(jnp.int32)
    xi_full = (jnp.arange(dw) * iw // dw).astype(jnp.int32)
    uv_lr = image_plane_uv(iw, ih)[yi_full][:, xi_full]  # (dh, dw, 2)

    if mask is not None:
        m = mask.reshape(-1, h, w)[:, yi][:, :, xi].astype(pts.dtype)
    else:
        m = jnp.ones_like(pts_lr[..., 0])

    uv_flat = uv_lr.reshape(-1, 2)
    solve = jax.vmap(lambda p, wt: solve_shift_focal(uv_flat, p.reshape(-1, 3),
                                                     wt.reshape(-1)))
    shift, focal = solve(pts_lr, m)                     # (B,), (B,)

    fov_x = 2 * jnp.arctan(iw / diagonal / focal)
    fov_y = 2 * jnp.arctan(ih / diagonal / focal)
    depth = pts[..., 2] + shift[:, None, None]

    lead = shape[:-3]
    return (
        depth.reshape(*lead, h, w),
        fov_x.reshape(lead),
        fov_y.reshape(lead),
        shift.reshape(lead),
    )


def focal_px_from_fov(fov_x: jnp.ndarray, width: int) -> jnp.ndarray:
    """FoV-x -> focal length in pixels for an image of `width`."""
    return 0.5 * width / jnp.tan(fov_x / 2)


def estimate_focal_weiszfeld(
    points: jnp.ndarray, num_iters: int = 10
) -> jnp.ndarray:
    """Robust (L1, Weiszfeld IRLS) focal from a centered point map.

    Parity: reference dust3r/post_process.py:12-60 `estimate_focal_knowing_depth`
    (weiszfeld mode): minimize Σ |f * xy/z - pixel| over f with IRLS.
    points: (H, W, 3) camera-frame; principal point at image center.
    """
    h, w = points.shape[:2]
    grid_x = jnp.arange(w, dtype=jnp.float32) - (w - 1) / 2
    grid_y = jnp.arange(h, dtype=jnp.float32) - (h - 1) / 2
    xx, yy = jnp.meshgrid(grid_x, grid_y, indexing="xy")
    pix = jnp.stack([xx, yy], axis=-1).reshape(-1, 2)
    xy = points[..., :2].reshape(-1, 2)
    z = jnp.maximum(points[..., 2].reshape(-1, 1), 1e-6)
    xy_over_z = xy / z

    # init: median-ratio-free LS estimate
    f = jnp.sum(xy_over_z * pix) / (jnp.sum(xy_over_z**2) + 1e-12)

    def body(_, f):
        dist = jnp.linalg.norm(f * xy_over_z - pix, axis=-1)
        wgt = 1.0 / jnp.maximum(dist, 1e-6)
        return jnp.sum(wgt[:, None] * xy_over_z * pix) / (
            jnp.sum(wgt[:, None] * xy_over_z**2) + 1e-12
        )

    return jax.lax.fori_loop(0, num_iters, body, f)
