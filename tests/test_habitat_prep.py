"""Habitat preprocessing geometry tests (synthetic envmaps — no simulator).

Counterpart checks for datasets_preprocess/habitat/: projections round-trip,
crop extraction against an analytic ray-colored envmap, pointmap/depth
consistency, camera-params serialization, and the metadata driver end to
end with an injected render_fn.
"""

import json
import os

import numpy as np
import pytest

pytest.importorskip("cv2")

from geo4d_tpu.data.habitat_prep import (
    PerspectiveCamera,
    camera_intrinsics_from_hfov,
    colmap_to_opencv_intrinsics,
    envmap_pointmap,
    equirect_project,
    equirect_unproject,
    extract_crop,
    opencv_to_colmap_intrinsics,
    perspective_project,
    perspective_unproject,
    pixel_grid,
    preprocess_metadata,
)

pytestmark = pytest.mark.smoke  # CPU-light fast tier


def _rot_y(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, 0, s], [0, 1.0, 0], [-s, 0, c]])


def test_equirect_roundtrip():
    h, w = 64, 128
    gu, gv = pixel_grid(h, w)
    rays = equirect_unproject(gu, gv, h, w)
    np.testing.assert_allclose(np.linalg.norm(rays, axis=-1), 1.0, atol=1e-12)
    u2, v2 = equirect_project(rays, h, w)
    np.testing.assert_allclose(u2, gu, atol=1e-9)
    np.testing.assert_allclose(v2, gv, atol=1e-9)


def test_perspective_roundtrip_and_intrinsics():
    K = camera_intrinsics_from_hfov(48, 64, 90.0)
    assert K[0, 0] == pytest.approx(32.0)  # f = w/2 / tan(45deg)
    gu, gv = pixel_grid(48, 64)
    rays = perspective_unproject(gu, gv, K)
    u2, v2 = perspective_project(rays, K)
    np.testing.assert_allclose(u2, gu, atol=1e-9)
    np.testing.assert_allclose(v2, gv, atol=1e-9)
    # convention shifts invert each other
    K2 = opencv_to_colmap_intrinsics(colmap_to_opencv_intrinsics(K))
    np.testing.assert_allclose(K2, K)


def _ray_colored_envmap(h, w):
    """Color encodes the (world) ray direction: c = (ray+1)/2 * 255."""
    gu, gv = pixel_grid(h, w)
    rays = equirect_unproject(gu, gv, h, w)
    return ((rays + 1) / 2 * 255).astype(np.uint8)


def test_extract_crop_color_matches_ray_direction():
    env_h, env_w = 512, 1024
    color_env = _ray_colored_envmap(env_h, env_w)
    dist_env = np.full((env_h, env_w), 2.0, np.float32)
    cam = PerspectiveCamera(
        K=camera_intrinsics_from_hfov(64, 64, 60.0),
        R_cam2world=_rot_y(0.8),
        position=np.zeros(3),
        height=64,
        width=64,
    )
    color, depth, _ = extract_crop(cam, color_env, dist_env,
                                   jitter_iterations=0)
    rays_world = cam.rays_cam() @ cam.R_cam2world.T
    rays_world /= np.linalg.norm(rays_world, axis=-1, keepdims=True)
    expected = (rays_world + 1) / 2 * 255
    # bilinear resampling of a smooth function: tight but not exact
    err = np.abs(color.astype(float) - expected)
    assert np.median(err) < 2.0
    assert np.mean(err) < 3.0


def test_crop_depth_and_pointmap_consistency():
    """Constant envmap distance r: crop points lie on the r-sphere around
    the camera position, and depth = r / |cam ray| (z-depth conversion in
    multiview_crop_generator.extract_cropped_camera)."""
    env_h, env_w = 256, 512
    r = 3.0
    pos = np.array([1.0, -2.0, 0.5])
    color_env = _ray_colored_envmap(env_h, env_w)
    dist_env = np.full((env_h, env_w), r, np.float32)
    pointmap_env = envmap_pointmap(dist_env, pos)
    np.testing.assert_allclose(
        np.linalg.norm(pointmap_env - pos, axis=-1), r, atol=1e-6)

    cam = PerspectiveCamera(
        K=camera_intrinsics_from_hfov(32, 48, 75.0),
        R_cam2world=_rot_y(-1.1),
        position=pos,
        height=32,
        width=48,
    )
    _, depth, points = extract_crop(cam, color_env, dist_env, pointmap_env,
                                    jitter_iterations=0)
    ray_norm = np.linalg.norm(cam.rays_cam(), axis=-1)
    np.testing.assert_allclose(depth, r / ray_norm, atol=1e-5)
    np.testing.assert_allclose(
        np.linalg.norm(points - pos, axis=-1), r, atol=1e-4)


def test_camera_params_dict_roundtrip():
    cam = PerspectiveCamera(
        K=camera_intrinsics_from_hfov(240, 320, 58.0),
        R_cam2world=_rot_y(0.3),
        position=np.array([0.1, 0.2, 0.3]),
        height=240,
        width=320,
    )
    d = cam.to_dict()
    # serialized intrinsics are OpenCV-convention (principal point -0.5)
    assert d["camera_intrinsics"][0][2] == pytest.approx(320 / 2 - 0.5)
    cam2 = PerspectiveCamera.from_dict(json.loads(json.dumps(d)))
    np.testing.assert_allclose(cam2.K, cam.K, atol=1e-12)
    np.testing.assert_allclose(cam2.R_cam2world, cam.R_cam2world, atol=1e-12)
    np.testing.assert_allclose(cam2.position, cam.position)
    assert (cam2.height, cam2.width) == (240, 320)


def test_preprocess_metadata_driver(tmp_path):
    env_h, env_w = 128, 256
    color_env = _ray_colored_envmap(env_h, env_w)

    calls = []

    def render_fn(position):
        calls.append(tuple(position))
        return color_env, np.full((env_h, env_w), 2.5, np.float32)

    res = (32, 32)
    views = {}
    for i, ang in enumerate([0.0, 1.0]):
        cam = PerspectiveCamera(
            K=camera_intrinsics_from_hfov(res[1], res[0], 60.0),
            R_cam2world=_rot_y(ang),
            position=np.array([0.0, 0.0, 0.0]),
            height=res[1],
            width=res[0],
        )
        views[f"view{i}"] = {**cam.to_dict(), "size": list(res)}
    meta = {"view_batches": {"batch0": views}}
    mpath = tmp_path / "metadata.json"
    mpath.write_text(json.dumps(meta))

    out = tmp_path / "out"
    n = preprocess_metadata(str(mpath), render_fn, str(out),
                            crop_resolution=res)
    assert n == 2
    # same position -> the envmap renders once (the reference re-renders
    # per view; caching is an improvement, equal output)
    assert len(calls) == 1
    for i in range(2):
        label = f"batch0_view{i}"
        assert (out / f"{label}.jpeg").exists()
        assert (out / f"{label}_depth.exr").exists()
        params = json.loads((out / f"{label}_camera_params.json").read_text())
        assert params["size"] == [32, 32]

    from geo4d_tpu.data.preprocess_train import read_depth_exr

    depth = read_depth_exr(str(out / "batch0_view0_depth.exr"))
    assert depth.shape == (32, 32)
    cam0 = PerspectiveCamera.from_dict(views["view0"])
    ray_norm = np.linalg.norm(cam0.rays_cam(), axis=-1)
    np.testing.assert_allclose(depth, 2.5 / ray_norm, rtol=1e-3)
