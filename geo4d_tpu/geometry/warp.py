"""Depth-based warping, flow, and occlusion masks.

Parity target: reference dust3r/utils/goem_opt.py — `DepthBasedWarping`
(:429: depth + relative pose + intrinsics -> rigid optical flow),
`OccMask` (:575: forward/backward flow consistency -> occlusion mask),
`WarpImage` (:38: bilinear backward warp). These feed the optimizer's
optional flow loss (optimizer_group.py flow_loss_weight — 0.0 in the
shipped config, so inactive at eval, but part of the training surface).

Pure-JAX, batched; bilinear sampling is gather-based (TPU-friendly).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from geo4d_tpu.geometry.utils import depthmap_to_pts3d, inv_se3, xy_grid


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample img (H, W, C) at float pixel coords (..., 2) (x, y)."""
    h, w = img.shape[:2]
    x = jnp.clip(coords[..., 0], 0.0, w - 1.0)
    y = jnp.clip(coords[..., 1], 0.0, h - 1.0)
    x0 = jnp.floor(x).astype(jnp.int32)
    y0 = jnp.floor(y).astype(jnp.int32)
    x1 = jnp.minimum(x0 + 1, w - 1)
    y1 = jnp.minimum(y0 + 1, h - 1)
    fx = (x - x0)[..., None]
    fy = (y - y0)[..., None]
    v00 = img[y0, x0]
    v01 = img[y0, x1]
    v10 = img[y1, x0]
    v11 = img[y1, x1]
    return (
        v00 * (1 - fx) * (1 - fy)
        + v01 * fx * (1 - fy)
        + v10 * (1 - fx) * fy
        + v11 * fx * fy
    )


def warp_image(img_src: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp src (H, W, C) by flow (H, W, 2): out(p)=src(p+flow)."""
    h, w = img_src.shape[:2]
    grid = xy_grid(w, h)
    return bilinear_sample(img_src, grid + flow)


def depth_based_flow(
    depth_src: jnp.ndarray,   # (H, W) depth of the source frame
    pose_src: jnp.ndarray,    # (4, 4) c2w of source
    pose_dst: jnp.ndarray,    # (4, 4) c2w of destination
    K: jnp.ndarray,           # (3, 3) shared intrinsics
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rigid flow src->dst induced by depth + relative camera motion.

    Returns (flow (H, W, 2), valid (H, W) — in front of the dst camera).
    """
    h, w = depth_src.shape
    pts_cam = depthmap_to_pts3d(depth_src, K)                   # (H, W, 3)
    rel = inv_se3(pose_dst) @ pose_src                           # src cam -> dst cam
    pts_dst = (
        jnp.einsum("ij,hwj->hwi", rel[:3, :3], pts_cam) + rel[:3, 3]
    )
    z = pts_dst[..., 2]
    valid = z > 1e-4
    z_safe = jnp.where(valid, z, 1.0)
    u = K[0, 0] * pts_dst[..., 0] / z_safe + K[0, 2]
    v = K[1, 1] * pts_dst[..., 1] / z_safe + K[1, 2]
    grid = xy_grid(w, h)
    flow = jnp.stack([u, v], axis=-1) - grid
    return flow, valid


def occlusion_mask(
    flow_fwd: jnp.ndarray,    # (H, W, 2) src -> dst
    flow_bwd: jnp.ndarray,    # (H, W, 2) dst -> src
    alpha: float = 0.01,
    beta: float = 0.5,
) -> jnp.ndarray:
    """Forward-backward consistency occlusion mask (goem_opt.py OccMask).

    occluded where |f_fwd(p) + f_bwd(p + f_fwd(p))|^2 >
    alpha*(|f_fwd|^2 + |f_bwd_w|^2) + beta. Returns True = NOT occluded.
    """
    h, w = flow_fwd.shape[:2]
    grid = xy_grid(w, h)
    bwd_at_fwd = bilinear_sample(flow_bwd, grid + flow_fwd)
    diff = jnp.sum((flow_fwd + bwd_at_fwd) ** 2, axis=-1)
    bound = alpha * (
        jnp.sum(flow_fwd**2, axis=-1) + jnp.sum(bwd_at_fwd**2, axis=-1)
    ) + beta
    return diff < bound


def flow_loss(
    depths: jnp.ndarray,     # (N, H, W) optimized depths
    poses: jnp.ndarray,      # (N, 4, 4) optimized c2w
    K: jnp.ndarray,          # (3, 3)
    target_flows: jnp.ndarray,  # (N-1, H, W, 2) external flow (e.g. RAFT)
    masks: jnp.ndarray,      # (N-1, H, W) validity/motion masks
    fn: str = "l1",
) -> jnp.ndarray:
    """Consecutive-frame rigid-flow consistency loss (the flow_loss_weight
    term of optimizer_group.py, vmapped over frame pairs)."""

    def pair(d, p_src, p_dst, tgt, m):
        f, valid = depth_based_flow(d, p_src, p_dst, K)
        err = f - tgt
        if fn == "l1":
            e = jnp.sum(jnp.abs(err), axis=-1)
        else:
            e = jnp.sum(err**2, axis=-1)
        wgt = m * valid
        return jnp.sum(e * wgt) / (jnp.sum(wgt) + 1e-8)

    losses = jax.vmap(pair)(
        depths[:-1], poses[:-1], poses[1:], target_flows, masks
    )
    return jnp.mean(losses)
