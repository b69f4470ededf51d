"""Cross-view point-cloud consistency filtering.

Parity target: reference dust3r/cloud_opt/base_opt_group.py
`clean_pointcloud` (:630-666): project every frame's points into every
other camera; a point clearly IN FRONT of that camera's depth map
(proj_depth < (1-tol)*depth) while being less confident gets its
confidence clipped to `bad_conf` — removing floaters that occlude
better-supported geometry.

TPU-first: the reference loops an O(N^2) python double loop of scatter
ops; here each (i -> all j) pass is one vmapped gather/compare on device,
scanned over source frames.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def clean_pointcloud(
    confs: jnp.ndarray,      # (N, H, W)
    K: jnp.ndarray,          # (N, 3, 3)
    cams_w2c: jnp.ndarray,   # (N, 4, 4) world-to-camera
    depthmaps: jnp.ndarray,  # (N, H, W)
    pts3d: jnp.ndarray,      # (N, H, W, 3) world points
    tol: float = 0.001,
    bad_conf: float = 0.0,
) -> jnp.ndarray:
    """Returns filtered confidences (N, H, W)."""
    n, h, w = confs.shape
    pts_flat = pts3d.reshape(n, -1, 3)

    def project_into(j, pts):
        """Project (P, 3) world points into camera j -> (u, v, depth)."""
        cam = cams_w2c[j]
        p = jnp.einsum("ij,nj->ni", cam[:3, :3], pts) + cam[:3, 3]
        z = p[:, 2]
        z_safe = jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
        u = K[j, 0, 0] * p[:, 0] / z_safe + K[j, 0, 2]
        v = K[j, 1, 1] * p[:, 1] / z_safe + K[j, 1, 2]
        return u, v, z

    def check_pair(i, j, conf_i):
        """Lower conf of frame-i points occluding frame j's geometry."""
        u, v, z = project_into(j, pts_flat[i])
        ui = jnp.round(u).astype(jnp.int32)
        vi = jnp.round(v).astype(jnp.int32)
        inside = (z > 0) & (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
        ui = jnp.clip(ui, 0, w - 1)
        vi = jnp.clip(vi, 0, h - 1)
        depth_j = depthmaps[j][vi, ui]
        conf_j = confs[j][vi, ui]
        bad = inside & (z < (1 - tol) * depth_j) & (conf_i < conf_j) & (i != j)
        return jnp.where(bad, jnp.minimum(conf_i, bad_conf), conf_i)

    def per_frame(i):
        conf_i = confs[i].reshape(-1)

        def body(j, c):
            return check_pair(i, j, c)

        return jax.lax.fori_loop(0, n, body, conf_i).reshape(h, w)

    return jax.vmap(per_frame)(jnp.arange(n))
