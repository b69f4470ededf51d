"""Plücker ray maps <-> camera poses.

Parity targets: reference utils/rays.py (Rays container :15-246,
cameras_from_plucker :387-433, rays_to_cameras :301-367,
compute_optimal_rotation_alignment :579) and utils/normalize.py
(intersect_skew_lines_high_dim :25-52). The reference leans on pytorch3d
cameras + per-frame python loops; here everything is closed-form JAX math
vmapped over frames — one jitted call recovers the whole window's cameras.

Recovery pipeline for the shipped pc_ray_cross_depth modality
(test_geo4d.py:540-557 raymap_to_camera_matrix):
  1. center-crop ray-direction + moment maps to square;
  2. normalize directions; origin per pixel o = d x m (Plücker inversion);
  3. camera center c_i = least-squares intersection of the frame's rays;
  4. R_i = Procrustes alignment of frame-0 ray directions onto frame-i's
     (frame 0 defines the reference frame: ref_ray path, rays.py:326-330);
  5. camera-to-world trajectory P_i = [R_i | c_i].
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from geo4d_tpu.geometry.se3 import procrustes_rotation


def plucker_from_pose(
    R_c2w: jnp.ndarray, center: jnp.ndarray, dirs_cam: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Forward model (for training targets / tests): camera pose + camera-frame
    ray directions -> world-frame Plücker (directions, moments)."""
    d_world = jnp.einsum("ij,...j->...i", R_c2w, dirs_cam)
    d_world = d_world / (jnp.linalg.norm(d_world, axis=-1, keepdims=True) + 1e-12)
    o = jnp.broadcast_to(center, d_world.shape)
    m = jnp.cross(o, d_world)
    return d_world, m


def plucker_origins(dirs: jnp.ndarray, moments: jnp.ndarray) -> jnp.ndarray:
    """Closest-to-origin point on each ray: o = d x m, with d normalized and
    moments rescaled by 1/|d_raw| (Rays.to_point_direction, rays.py:135-152)."""
    norm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    d = dirs / (norm + 1e-12)
    m = moments / (norm + 1e-12)
    return jnp.cross(d, m)


def intersect_skew_lines(
    origins: jnp.ndarray, dirs: jnp.ndarray, weights: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Least-squares intersection of N rays (utils/normalize.py:25-52).

    Solve (Σ w (I - d dᵀ)) c = Σ w (I - d dᵀ) o.  origins/dirs: (N, 3).
    """
    d = dirs / (jnp.linalg.norm(dirs, axis=-1, keepdims=True) + 1e-12)
    w = jnp.ones_like(d[..., 0]) if weights is None else weights
    eye = jnp.eye(3, dtype=d.dtype)
    P = eye[None] - d[..., :, None] * d[..., None, :]  # (N, 3, 3)
    P = P * w[..., None, None]
    A = jnp.sum(P, axis=0)
    b = jnp.sum(jnp.einsum("nij,nj->ni", P, origins), axis=0)
    # 3x3 solve with tiny Tikhonov for rank safety (parallel rays)
    return jnp.linalg.solve(A + 1e-8 * eye, b)


def _center_crop_square(x: jnp.ndarray) -> jnp.ndarray:
    """(T, H, W, C) -> (T, S, S, C), S = min(H, W), centered."""
    t, h, w, c = x.shape
    s = min(h, w)
    top = (h - s) // 2
    left = (w - s) // 2
    return x[:, top : top + s, left : left + s, :]


def cameras_from_plucker(
    raydirs: jnp.ndarray,   # (T, H, W, 3) predicted ray-direction map
    moments: jnp.ndarray,   # (T, H, W, 3) predicted cross/moment map
    ref_raydirs: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Recover per-frame c2w trajectory from Plücker maps.

    Returns (poses (T, 4, 4), centers (T, 3)). Frame 0's ray grid is the
    reference (the recovered trajectory is relative up to the frame-0 frame,
    which is what the group aligner consumes — optimizer_group.py trajs).
    """
    raydirs = _center_crop_square(raydirs)
    moments = _center_crop_square(moments)
    t = raydirs.shape[0]
    d = raydirs.reshape(t, -1, 3)
    d = d / (jnp.linalg.norm(d, axis=-1, keepdims=True) + 1e-12)
    m = moments.reshape(t, -1, 3)

    origins = jax.vmap(plucker_origins)(d, m)           # (T, P, 3)
    centers = jax.vmap(intersect_skew_lines)(origins, d)  # (T, 3)

    ref = d[0] if ref_raydirs is None else ref_raydirs.reshape(-1, 3)
    ref = ref / (jnp.linalg.norm(ref, axis=-1, keepdims=True) + 1e-12)
    R = jax.vmap(lambda di: procrustes_rotation(ref, di))(d)  # (T, 3, 3)

    poses = jnp.tile(jnp.eye(4), (t, 1, 1))
    poses = poses.at[:, :3, :3].set(R)
    poses = poses.at[:, :3, 3].set(centers)
    return poses, centers
