"""Perspective-n-Point pose recovery (host-side, OpenCV C++ backend).

Parity target: reference dust3r/cloud_opt/init_im_poses.py `fast_pnp`
(:824-865): RANSAC-PnP (SQPNP) with an optional focal sweep — geomspace
(S/2, 3S) x63 when the focal is unknown, or a ±3% jitter triple around a
known focal; best candidate by inlier count; returns (focal, cam-to-world).

This stays on host deliberately: PnP runs once per frame between device
phases on tiny tensors (init_im_poses.py:307-311), exactly like the
reference's cv2.solvePnPRansac C++ call — porting RANSAC to the TPU would
serialize the mesh for microseconds of math. `numpy` in / `numpy` out.
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False


def _pixel_grid(h: int, w: int) -> np.ndarray:
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    return np.stack([x, y], axis=-1).astype(np.float32)


def _pnp_epnp_fallback(pts3d, pixels, K) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """DLT pose fallback when cv2 is unavailable (least-squares P matrix)."""
    n = pts3d.shape[0]
    if n < 6:
        return None
    A = np.zeros((2 * n, 12))
    uv = np.linalg.inv(K) @ np.concatenate(
        [pixels, np.ones((n, 1))], axis=-1
    ).T  # normalized coords
    uv = (uv[:2] / uv[2:]).T
    for i in range(n):
        X = np.append(pts3d[i], 1.0)
        A[2 * i, 0:4] = X
        A[2 * i, 8:12] = -uv[i, 0] * X
        A[2 * i + 1, 4:8] = X
        A[2 * i + 1, 8:12] = -uv[i, 1] * X
    _, _, Vt = np.linalg.svd(A)
    P = Vt[-1].reshape(3, 4)
    R_raw = P[:, :3]
    U, S, Vt2 = np.linalg.svd(R_raw)
    R = U @ Vt2
    if np.linalg.det(R) < 0:
        R, P = -R, -P
    scale = np.mean(S)
    t = P[:, 3] / (scale + 1e-12)
    return R, t


def solve_pnp(
    pts3d: np.ndarray,   # (N, 3) world points
    pixels: np.ndarray,  # (N, 2)
    K: np.ndarray,       # (3, 3)
    niter: int = 10,
    reproj_err: float = 5.0,
) -> Optional[Tuple[np.ndarray, np.ndarray, int]]:
    """Robust PnP. Returns (R_w2c, t_w2c, num_inliers) or None."""
    if pts3d.shape[0] < 4:
        return None
    if _HAS_CV2:
        # SQPNP (the reference's choice) first; it hard-asserts on some
        # degenerate inputs in cv2>=5, so fall back to EPNP on error
        for flag in (cv2.SOLVEPNP_SQPNP, cv2.SOLVEPNP_EPNP):
            try:
                success, rvec, tvec, inliers = cv2.solvePnPRansac(
                    pts3d.astype(np.float32),
                    pixels.astype(np.float32),
                    K.astype(np.float32),
                    None,
                    iterationsCount=niter,
                    reprojectionError=reproj_err,
                    flags=flag,
                )
            except cv2.error:
                continue
            if success and inliers is not None:
                R = cv2.Rodrigues(rvec)[0]
                return R, tvec.ravel(), len(inliers)
        return None
    out = _pnp_epnp_fallback(pts3d, pixels, K)
    if out is None:
        return None
    R, t = out
    return R, t, pts3d.shape[0]


def fast_pnp(
    pts3d: np.ndarray,               # (H, W, 3) per-pixel world points
    mask: np.ndarray,                # (H, W) bool
    focal: Optional[float] = None,
    pp: Optional[Tuple[float, float]] = None,
    niter: int = 10,
    reproj_err: float = 5.0,
    max_points: int = 4096,
) -> Optional[Tuple[float, np.ndarray]]:
    """Frame pose from a masked point map with focal sweep.

    Returns (focal, cam_to_world 4x4) or None. Sweep matches the reference:
    unknown focal -> geomspace(S/2, 3S, 63); known -> {f, f±3%S}.

    Deliberate divergence: the reference feeds every masked pixel (tens of
    thousands) into each RANSAC solve (init_im_poses.py:846-859); here a
    seeded uniform subsample caps correspondences at `max_points` — RANSAC
    pose quality saturates orders of magnitude below that, the focal-sweep
    inlier comparison stays consistent across candidates, and the final
    500-iter optimizer refines poses regardless. On a 1-vCPU host this cuts
    the dominant per-frame init cost several-fold.
    """
    if mask.sum() < 4:
        return None
    h, w, _ = pts3d.shape
    pixels = _pixel_grid(h, w)
    return fast_pnp_points(
        pts3d[mask], pixels[mask], (w, h), focal=focal, pp=pp,
        niter=niter, reproj_err=reproj_err, max_points=max_points,
    )


def fast_pnp_points(
    p3: np.ndarray,                  # (M, 3) world points
    p2: np.ndarray,                  # (M, 2) pixel coords (full-res units)
    size_wh: Tuple[int, int],
    focal: Optional[float] = None,
    pp: Optional[Tuple[float, float]] = None,
    niter: int = 10,
    reproj_err: float = 5.0,
    max_points: int = 4096,
) -> Optional[Tuple[float, np.ndarray]]:
    """`fast_pnp` on explicit correspondences (e.g. a device-side
    subsample of a point map — avoids fetching full-resolution maps just
    to immediately subsample them on host)."""
    w, h = size_wh
    if p3.shape[0] < 4:
        return None
    # degenerate map (all masked points identical — e.g. zero/constant
    # predictions): no focal candidate can succeed; skip the 63-candidate
    # sweep x RANSAC, which costs seconds per frame before failing anyway
    if np.ptp(p3, axis=0).max() < 1e-9:
        return None
    S = max(w, h)
    if focal is None:
        tentative = np.geomspace(S / 2, S * 3, 63)
    else:
        tentative = np.asarray(
            [focal, focal - 0.03 * S, focal + 0.03 * S], dtype=np.float64
        )
    if pp is None:
        pp = (w / 2, h / 2)

    if max_points and p3.shape[0] > max_points:
        sel = np.random.default_rng(0).choice(
            p3.shape[0], max_points, replace=False
        )
        p3, p2 = p3[sel], p2[sel]
    best_score, best = 0, None
    for f in tentative:
        K = np.array([[f, 0, pp[0]], [0, f, pp[1]], [0, 0, 1]], dtype=np.float32)
        out = solve_pnp(p3, p2, K, niter=niter, reproj_err=reproj_err)
        if out is None:
            continue
        R, t, score = out
        if score > best_score:
            best_score, best = score, (R, t, float(f))
    if best is None:
        return None
    R, t, f = best
    c2w = np.eye(4)
    c2w[:3, :3] = R.T
    c2w[:3, 3] = -R.T @ t
    return f, c2w
