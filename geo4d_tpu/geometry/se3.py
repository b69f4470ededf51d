"""SO3/SE3/Sim3 utilities: quaternions, pose codecs, weighted Umeyama.

Replaces the reference's roma dependency (dust3r/cloud_opt/base_opt_group.py
:260-288 quat codecs, init_im_poses.py:797 `roma.rigid_points_registration`)
with pure-JAX closed forms, batched with vmap where useful.

Quaternion convention: xyzw (matching roma/pytorch3d-style storage the
reference optimizer uses for its 7D pose parameters).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """(..., 4) xyzw quaternion -> (..., 3, 3) rotation."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    x, y, z, w = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], axis=-1),
            jnp.stack([r10, r11, r12], axis=-1),
            jnp.stack([r20, r21, r22], axis=-1),
        ],
        axis=-2,
    )


def rotmat_to_quat(R: jnp.ndarray) -> jnp.ndarray:
    """(..., 3, 3) -> (..., 4) xyzw, branchless (Shepperd via 4-candidate max)."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-12))

    qw = 0.5 * safe_sqrt(1.0 + tr)
    qx = 0.5 * safe_sqrt(1.0 + m00 - m11 - m22)
    qy = 0.5 * safe_sqrt(1.0 - m00 + m11 - m22)
    qz = 0.5 * safe_sqrt(1.0 - m00 - m11 + m22)
    # fix signs from off-diagonal sums, choosing the largest component as anchor
    cand = jnp.stack([qx, qy, qz, qw], axis=-1)
    idx = jnp.argmax(cand, axis=-1)

    def build(i):
        if i == 3:  # w anchor
            w = qw
            x = (m21 - m12) / (4 * w)
            y = (m02 - m20) / (4 * w)
            z = (m10 - m01) / (4 * w)
        elif i == 0:
            x = qx
            w = (m21 - m12) / (4 * x)
            y = (m01 + m10) / (4 * x)
            z = (m02 + m20) / (4 * x)
        elif i == 1:
            y = qy
            w = (m02 - m20) / (4 * y)
            x = (m01 + m10) / (4 * y)
            z = (m12 + m21) / (4 * y)
        else:
            z = qz
            w = (m10 - m01) / (4 * z)
            x = (m02 + m20) / (4 * z)
            y = (m12 + m21) / (4 * z)
        return jnp.stack([x, y, z, w], axis=-1)

    options = jnp.stack([build(0), build(1), build(2), build(3)], axis=-2)
    q = jnp.take_along_axis(options, idx[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)


def signed_log1p(x: jnp.ndarray) -> jnp.ndarray:
    """sign(x)*log1p(|x|) — the optimizer's translation codec
    (dust3r/cloud_opt/commons.py:95-102)."""
    return jnp.sign(x) * jnp.log1p(jnp.abs(x))


def signed_expm1(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sign(x) * jnp.expm1(jnp.abs(x))


def pose_to_params(T: jnp.ndarray) -> jnp.ndarray:
    """4x4 pose -> 7D [quat(xyzw) | signed_log1p(t)] (base_opt_group.py:260-288)."""
    q = rotmat_to_quat(T[..., :3, :3])
    t = signed_log1p(T[..., :3, 3])
    return jnp.concatenate([q, t], axis=-1)


def params_to_pose(p: jnp.ndarray) -> jnp.ndarray:
    """7D params -> 4x4 pose."""
    R = quat_to_rotmat(p[..., :4])
    t = signed_expm1(p[..., 4:7])
    top = jnp.concatenate([R, t[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def umeyama_sim3(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    with_scale: bool = True,
):
    """Weighted Umeyama: find (s, R, t) minimizing Σ w |s R src + t - dst|².

    src/dst: (N, 3); weights: (N,). Returns (s, R(3,3), t(3,)).
    Replaces roma.rigid_points_registration (init_im_poses.py:797-800).
    """
    n = src.shape[0]
    w = jnp.ones((n,), src.dtype) if weights is None else weights
    # degenerate weights (all ~0) fall back to uniform
    w = jnp.where(jnp.sum(w) > 1e-8, w, jnp.ones_like(w))
    w = w / (jnp.sum(w) + 1e-12)
    mu_s = jnp.einsum("n,ni->i", w, src)
    mu_d = jnp.einsum("n,ni->i", w, dst)
    xs = src - mu_s
    xd = dst - mu_d
    cov = jnp.einsum("n,ni,nj->ij", w, xd, xs)  # dst x src covariance
    U, D, Vt = jnp.linalg.svd(cov)
    det = jnp.linalg.det(U @ Vt)
    S = jnp.diag(jnp.asarray([1.0, 1.0, 1.0]) * jnp.where(
        jnp.arange(3) == 2, jnp.sign(det), 1.0
    ))
    R = U @ S @ Vt
    if with_scale:
        var_s = jnp.einsum("n,ni->", w, xs**2)
        s = jnp.sum(D * jnp.diag(S)) / (var_s + 1e-12)
        # collapsed/degenerate point sets must not produce s=0 or inf
        s = jnp.clip(jnp.nan_to_num(s, nan=1.0), 1e-6, 1e6)
    else:
        s = jnp.asarray(1.0, src.dtype)
    t = mu_d - s * R @ mu_s
    return s, R, t


def umeyama_sim3_np(src, dst, weights=None, with_scale: bool = True):
    """Host (numpy) weighted Umeyama — same math as `umeyama_sim3`.

    Used by the alignment init chain, which runs on host between device
    phases (like the reference's roma/cv2 CPU calls, init_im_poses.py:
    797-800): the inputs are multi-megapoint overlap tensors, and the math
    is two weighted means + a 3x3 SVD — memory-bandwidth work that numpy
    does in milliseconds, vs multi-second transfer over a remote-device
    link per call.
    """
    import numpy as np

    # keep the megapoint arrays in their native f32 — only ACCUMULATE in
    # f64 (einsum dtype=) so no (N, 3) f64 copies are materialized; the
    # overlap sets here run to millions of points and the f64 copies were
    # half the init chain's runtime
    src = np.asarray(src).reshape(-1, 3)
    dst = np.asarray(dst).reshape(-1, 3)
    n = src.shape[0]
    if weights is None:
        w = np.full((n,), 1.0 / max(n, 1), np.float32)
    else:
        w = np.asarray(weights, np.float32).reshape(-1)
        tot = float(np.einsum("n->", w, dtype=np.float64))
        if tot <= 1e-8:
            w = np.full((n,), 1.0 / max(n, 1), np.float32)
        else:
            w = w / tot
    mu_s = np.einsum("n,ni->i", w, src, dtype=np.float64)
    mu_d = np.einsum("n,ni->i", w, dst, dtype=np.float64)
    xs = src - mu_s.astype(src.dtype)
    xd = dst - mu_d.astype(dst.dtype)
    cov = np.einsum("n,ni,nj->ij", w, xd, xs, dtype=np.float64)
    U, D, Vt = np.linalg.svd(cov)
    sign = np.sign(np.linalg.det(U @ Vt)) or 1.0
    S = np.diag([1.0, 1.0, sign])
    R = U @ S @ Vt
    if with_scale:
        var_s = float(np.einsum("n,ni,ni->", w, xs, xs, dtype=np.float64))
        s = float(np.sum(D * np.diag(S)) / (var_s + 1e-12))
        if not np.isfinite(s):
            s = 1.0
        s = float(np.clip(s, 1e-6, 1e6))
    else:
        s = 1.0
    t = mu_d - s * R @ mu_s
    return s, R, t


def sRT_to_mat4(s, R, t) -> jnp.ndarray:
    """Compose similarity transform 4x4 from scale, rotation, translation."""
    top = jnp.concatenate([s * R, t[..., None]], axis=-1)
    bottom = jnp.zeros_like(top[..., :1, :]).at[..., 0, 3].set(1.0)
    return jnp.concatenate([top, bottom], axis=-2)


def procrustes_rotation(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """R minimizing ||A - B @ R||_F over rotations (utils/rays.py:579-595).

    A, B: (N, 3) row-vector point sets. R = U S' Vh with H = Bᵀ A.
    """
    H = B.T @ A
    U, _, Vh = jnp.linalg.svd(H)
    det = jnp.linalg.det(U @ Vh)
    Sp = jnp.diag(jnp.asarray([1.0, 1.0, 1.0]).at[2].set(1.0) * jnp.where(
        jnp.arange(3) == 2, jnp.sign(det), 1.0
    ))
    return U @ Sp @ Vh
