"""Geometry solver tests on synthetic cameras: Plücker round-trip, skew-line
intersection, Umeyama, MoGe shift/focal, PnP, normalization inverses."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geo4d_tpu.geometry.moge import (
    image_plane_uv,
    point_map_to_depth,
    estimate_focal_weiszfeld,
    focal_px_from_fov,
)
from geo4d_tpu.geometry.normalize import (
    denormalize_pointcloud_bbox2,
    far_mask,
    normalize_inverse_depth_bbox2,
    normalize_pointcloud_bbox2,
    sky_mask,
)
from geo4d_tpu.geometry.pnp import fast_pnp
from geo4d_tpu.geometry.rays import (
    cameras_from_plucker,
    intersect_skew_lines,
    plucker_from_pose,
    plucker_origins,
)
from geo4d_tpu.geometry.se3 import (
    params_to_pose,
    pose_to_params,
    quat_to_rotmat,
    rotmat_to_quat,
    umeyama_sim3,
)
from geo4d_tpu.geometry.utils import depthmap_to_pts3d, make_intrinsics, geotrf, inv_se3

pytestmark = pytest.mark.smoke  # CPU-light fast tier


def random_rotation(rng):
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Q


def camera_ray_dirs(h, w, focal):
    """Camera-frame ray directions through pixel centers, pp at center."""
    x = (np.arange(w) - (w - 1) / 2) / focal
    y = (np.arange(h) - (h - 1) / 2) / focal
    xx, yy = np.meshgrid(x, y, indexing="xy")
    d = np.stack([xx, yy, np.ones_like(xx)], axis=-1)
    return d / np.linalg.norm(d, axis=-1, keepdims=True)


# ---------------- quaternions / poses ----------------

def test_quat_roundtrip(rng):
    for _ in range(10):
        R = random_rotation(rng)
        q = rotmat_to_quat(jnp.asarray(R, jnp.float32))
        R2 = quat_to_rotmat(q)
        assert np.allclose(np.asarray(R2), R, atol=1e-5)


def test_pose_params_roundtrip(rng):
    R = random_rotation(rng)
    t = rng.normal(size=3) * 5
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    p = pose_to_params(jnp.asarray(T, jnp.float32))
    T2 = params_to_pose(p)
    assert np.allclose(np.asarray(T2), T, atol=1e-4)


def test_umeyama_recovers_sim3(rng):
    src = rng.normal(size=(50, 3)).astype(np.float32)
    R = random_rotation(rng).astype(np.float32)
    s_true, t_true = 2.5, np.array([1.0, -2.0, 0.5], np.float32)
    dst = s_true * src @ R.T + t_true
    s, R_est, t_est = umeyama_sim3(jnp.asarray(src), jnp.asarray(dst))
    # f32 SVD precision: ~1e-3 absolute
    assert s == pytest.approx(s_true, rel=1e-3)
    assert np.allclose(np.asarray(R_est), R, atol=5e-3)
    assert np.allclose(np.asarray(t_est), t_true, atol=5e-3)


def test_se3_utils(rng):
    R = random_rotation(rng)
    T = np.eye(4); T[:3, :3] = R; T[:3, 3] = rng.normal(size=3)
    Ti = inv_se3(jnp.asarray(T, jnp.float32))
    assert np.allclose(np.asarray(Ti) @ T, np.eye(4), atol=1e-5)
    pts = jnp.asarray(rng.normal(size=(7, 3)), jnp.float32)
    out = geotrf(jnp.asarray(T, jnp.float32), pts)
    expected = pts @ R.T + T[:3, 3]
    assert np.allclose(np.asarray(out), np.asarray(expected), atol=1e-5)


# ---------------- rays ----------------

def test_plucker_origin_recovery(rng):
    center = jnp.asarray([1.0, 2.0, -0.5])
    d = jnp.asarray(rng.normal(size=(20, 3)), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    m = jnp.cross(jnp.broadcast_to(center, d.shape), d)
    o = plucker_origins(d, m)
    # recovered origins lie on the ray through `center`: (o - c) x d == 0
    cross = np.cross(np.asarray(o) - np.asarray(center), np.asarray(d))
    assert np.allclose(cross, 0, atol=1e-5)


def test_intersect_skew_lines(rng):
    center = np.array([0.3, -1.2, 2.0], np.float32)
    d = rng.normal(size=(30, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    # origins = points along each ray away from center
    o = center + d * rng.uniform(1, 5, size=(30, 1)).astype(np.float32)
    c = intersect_skew_lines(jnp.asarray(o), jnp.asarray(d))
    assert np.allclose(np.asarray(c), center, atol=1e-4)


def test_cameras_from_plucker_synthetic(rng):
    """Synthetic trajectory -> Plücker maps -> recovered relative cameras."""
    h = w = 16
    focal = 20.0
    dirs_cam = camera_ray_dirs(h, w, focal)
    T = 4
    centers = np.stack([np.array([0.2 * i, 0.05 * i, -0.1 * i]) for i in range(T)])
    Rs = []
    rng_local = np.random.default_rng(3)
    for i in range(T):
        angle = 0.05 * i
        c, s = np.cos(angle), np.sin(angle)
        Rs.append(np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]]))
    dirs_list, mom_list = [], []
    for i in range(T):
        d, m = plucker_from_pose(
            jnp.asarray(Rs[i], jnp.float32),
            jnp.asarray(centers[i], jnp.float32),
            jnp.asarray(dirs_cam, jnp.float32),
        )
        dirs_list.append(d)
        mom_list.append(m)
    raydirs = jnp.stack(dirs_list)
    moments = jnp.stack(mom_list)
    poses, rec_centers = cameras_from_plucker(raydirs, moments)
    assert np.allclose(np.asarray(rec_centers), centers, atol=1e-3)
    # recovered rotation is relative to frame 0's ray grid; check that it
    # maps frame-0 world dirs onto frame-i world dirs (row convention
    # d0 @ R ~ di, utils/rays.py:579 ||A - B R||)
    d0 = np.asarray(raydirs[0]).reshape(-1, 3)
    for i in range(T):
        Ri = np.asarray(poses[i, :3, :3])
        di = np.asarray(raydirs[i]).reshape(-1, 3)
        # A = d0 (ref), B = di: ||d0 - di @ Ri|| minimized (f32 SVD ~1e-3)
        assert np.abs(d0 - di @ Ri).max() < 5e-3


# ---------------- MoGe ----------------

def test_point_map_to_depth_recovers_shift_focal(rng):
    h, w = 32, 48
    uv = np.asarray(image_plane_uv(w, h))  # (H, W, 2)
    focal_true, shift_true = 1.3, 0.8
    depth_true = rng.uniform(1.0, 5.0, size=(h, w)).astype(np.float32)
    # build points: xy = uv * (z+shift)/f ; z = depth - shift
    z = depth_true - shift_true
    xy = uv * (depth_true[..., None]) / focal_true
    pts = np.concatenate([xy, z[..., None]], axis=-1)[None]
    depth, fov_x, fov_y, shift = point_map_to_depth(jnp.asarray(pts, jnp.float32))
    assert float(shift[0]) == pytest.approx(shift_true, abs=1e-2)
    diag = (h**2 + w**2) ** 0.5
    f_rec = w / diag / np.tan(float(fov_x[0]) / 2)
    assert f_rec == pytest.approx(focal_true, rel=1e-2)
    assert np.allclose(np.asarray(depth[0]), depth_true, atol=2e-2)


def test_weiszfeld_focal(rng):
    h, w = 24, 32
    focal_true = 30.0
    dirs = camera_ray_dirs(h, w, focal_true)
    depth = rng.uniform(2, 6, size=(h, w, 1)).astype(np.float32)
    pts = dirs / dirs[..., 2:] * depth  # z = depth
    f = estimate_focal_weiszfeld(jnp.asarray(pts, jnp.float32))
    assert float(f) == pytest.approx(focal_true, rel=1e-3)


# ---------------- PnP ----------------

def test_fast_pnp_synthetic(rng):
    h, w = 24, 32
    focal = 40.0
    R = random_rotation(np.random.default_rng(5))
    t = np.array([0.5, -0.2, 3.0])
    dirs = camera_ray_dirs(h, w, focal)
    depth = rng.uniform(2, 8, size=(h, w, 1)).astype(np.float64)
    pts_cam = dirs / dirs[..., 2:] * depth
    # world points: X_w = R_c2w X_c + c ; pose w2c: (R, t) with X_c = R X_w + t
    R_c2w, c = R.T, -R.T @ t
    pts_world = pts_cam @ R_c2w.T + c
    out = fast_pnp(pts_world, np.ones((h, w), bool), focal=focal,
                   niter=50, reproj_err=1.0)
    assert out is not None
    f_est, c2w = out
    assert f_est == pytest.approx(focal, rel=0.05)
    assert np.allclose(c2w[:3, 3], c, atol=0.05)
    assert np.allclose(c2w[:3, :3], R_c2w, atol=0.05)


def test_fast_pnp_points_subsample(rng):
    """fast_pnp_points on an explicit correspondence subset (the aligner
    init's device-side subsample path) recovers the same pose as the
    full-map API, including the max_points cap."""
    from geo4d_tpu.geometry.pnp import fast_pnp_points

    h, w = 48, 64
    focal = 40.0
    R = random_rotation(np.random.default_rng(7))
    t = np.array([0.2, 0.1, 4.0])
    dirs = camera_ray_dirs(h, w, focal)
    depth = rng.uniform(2, 8, size=(h, w, 1)).astype(np.float64)
    pts_cam = dirs / dirs[..., 2:] * depth
    R_c2w, c = R.T, -R.T @ t
    pts_world = (pts_cam @ R_c2w.T + c).reshape(-1, 3)
    x, y = np.meshgrid(np.arange(w), np.arange(h))
    pixels = np.stack([x.ravel(), y.ravel()], -1).astype(np.float64)
    sel = rng.choice(h * w, 900, replace=False)
    out = fast_pnp_points(
        pts_world[sel].astype(np.float32), pixels[sel], (w, h),
        focal=focal, niter=50, reproj_err=1.0, max_points=512,
    )
    assert out is not None
    f_est, c2w = out
    assert f_est == pytest.approx(focal, rel=0.05)
    assert np.allclose(c2w[:3, 3], c, atol=0.05)
    assert np.allclose(c2w[:3, :3], R_c2w, atol=0.05)


def test_fast_pnp_unknown_focal(rng):
    # wide-FoV image so the focal is well-determined by perspective
    h, w = 48, 64
    focal = 40.0
    dirs = camera_ray_dirs(h, w, focal)
    depth = rng.uniform(2, 8, size=(h, w, 1)).astype(np.float64)
    pts_cam = dirs / dirs[..., 2:] * depth
    out = fast_pnp(pts_cam, np.ones((h, w), bool), focal=None,
                   niter=50, reproj_err=0.5)
    assert out is not None
    f_est, c2w = out
    assert f_est == pytest.approx(focal, rel=0.1)
    assert np.allclose(c2w[:3, 3], 0, atol=0.05)


# ---------------- normalization ----------------

def test_pointcloud_bbox2_roundtrip_shape(rng):
    pts = jnp.asarray(rng.uniform(0.5, 10, size=(2, 8, 8, 3)), jnp.float32)
    valid = jnp.ones((2, 8, 8), bool)
    normed, s, t = normalize_pointcloud_bbox2(pts, valid, return_st=True)
    assert normed.shape == pts.shape
    z = np.asarray(normed[..., 2])
    assert z.min() >= -2.0 and z.max() <= 2.0
    # denormalize then un-bbox: z_norm -> (z+1)/2 = (z_raw - t)/s
    den = denormalize_pointcloud_bbox2(normed, alpha=1.0, beta=1.0)
    z_rec = np.asarray(den[..., 2]) * float(s) + float(t)
    inner = (np.asarray(pts[..., 2]) > np.quantile(np.asarray(pts[..., 2]), 0.05)) & (
        np.asarray(pts[..., 2]) < np.quantile(np.asarray(pts[..., 2]), 0.95)
    )
    assert np.allclose(z_rec[inner], np.asarray(pts[..., 2])[inner], rtol=1e-3)


def test_invalid_points_sentinel():
    pts = jnp.ones((1, 4, 4, 3)) * 3.0
    valid = jnp.zeros((1, 4, 4), bool).at[0, :2].set(True)
    normed = normalize_pointcloud_bbox2(pts, valid)
    assert np.allclose(np.asarray(normed)[0, 2:], 1.05)
    # sky detector catches the sentinel
    assert np.all(np.asarray(sky_mask(normed))[0, 2:])
    assert not np.any(np.asarray(sky_mask(normed))[0, :2] & False)


def test_far_mask():
    pts = jnp.zeros((2, 2, 3)).at[0, 0, 1].set(2.5)
    m = far_mask(pts)
    assert bool(m[0, 0]) and not bool(m[1, 1])


def test_inverse_depth_normalization(rng):
    depth = jnp.asarray(rng.uniform(1, 20, size=(2, 8, 8)), jnp.float32)
    valid = jnp.ones((2, 8, 8), bool)
    nd = normalize_inverse_depth_bbox2(depth, valid)
    arr = np.asarray(nd)
    assert arr.min() >= -1.1 and arr.max() <= 1.1
