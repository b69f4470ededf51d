"""Tests for depth-based warping/occlusion and cross-view cleanup."""

import numpy as np
import pytest
import jax.numpy as jnp

from geo4d_tpu.alignment.cleanup import clean_pointcloud
from geo4d_tpu.geometry.utils import depthmap_to_pts3d, make_intrinsics
from geo4d_tpu.geometry.warp import (
    bilinear_sample,
    depth_based_flow,
    occlusion_mask,
    warp_image,
)

pytestmark = pytest.mark.smoke  # CPU-light fast tier


def test_bilinear_sample_identity():
    img = jnp.asarray(np.random.default_rng(0).normal(size=(8, 10, 3)), jnp.float32)
    from geo4d_tpu.geometry.utils import xy_grid

    out = bilinear_sample(img, xy_grid(10, 8))
    assert np.allclose(np.asarray(out), np.asarray(img), atol=1e-6)


def test_zero_flow_for_identity_pose():
    depth = jnp.ones((8, 10)) * 3.0
    K = make_intrinsics(jnp.asarray(20.0), 5.0, 4.0)
    eye = jnp.eye(4)
    flow, valid = depth_based_flow(depth, eye, eye, K)
    assert np.allclose(np.asarray(flow), 0.0, atol=1e-4)
    assert np.all(np.asarray(valid))


def test_translation_flow_direction():
    """Camera moving +x means the scene appears to move -x in the image."""
    depth = jnp.ones((8, 10)) * 4.0
    K = make_intrinsics(jnp.asarray(20.0), 5.0, 4.0)
    src = jnp.eye(4)
    dst = jnp.eye(4).at[0, 3].set(0.5)  # move right
    flow, valid = depth_based_flow(depth, src, dst, K)
    assert np.all(np.asarray(flow[..., 0]) < 0)
    # magnitude = f * tx / z = 20 * 0.5 / 4 = 2.5 px
    assert np.allclose(np.asarray(flow[..., 0]), -2.5, atol=1e-3)
    assert np.allclose(np.asarray(flow[..., 1]), 0.0, atol=1e-4)


def test_occlusion_mask_consistency():
    h, w = 8, 10
    f = jnp.ones((h, w, 2)) * 1.5
    # perfectly consistent backward flow
    ok = occlusion_mask(f, -f)
    assert np.asarray(ok)[2:-2, 2:-2].all()
    # inconsistent
    bad = occlusion_mask(f, f * 3.0)
    assert not np.asarray(bad)[2:-2, 2:-2].any()


def test_warp_image_shift():
    img = jnp.asarray(np.arange(80, dtype=np.float32).reshape(8, 10, 1))
    flow = jnp.zeros((8, 10, 2)).at[..., 0].set(1.0)  # sample 1px right
    out = warp_image(img, flow)
    assert np.allclose(np.asarray(out[:, :-1, 0]), np.asarray(img[:, 1:, 0]))


def test_clean_pointcloud_removes_floater():
    """A frame-0 point floating in front of frame-1's surface (with lower
    confidence) must get its confidence zeroed."""
    h, w = 8, 10
    f = 20.0
    K = jnp.stack([make_intrinsics(jnp.asarray(f), w / 2, h / 2)] * 2)
    cams = jnp.stack([jnp.eye(4)] * 2)  # both cameras at origin (w2c)
    depth_surface = jnp.ones((h, w)) * 5.0
    depthmaps = jnp.stack([depth_surface, depth_surface])
    pts0 = depthmap_to_pts3d(depth_surface, K[0])
    # plant a floater: frame-0 pixel (4,5) at depth 2 (in front of 5)
    pts0 = pts0.at[4, 5].set(jnp.asarray([0.0, 0.0, 2.0]))
    pts1 = depthmap_to_pts3d(depth_surface, K[1])
    pts3d = jnp.stack([pts0, pts1])
    confs = jnp.stack([jnp.ones((h, w)), jnp.ones((h, w)) * 2.0])
    out = np.asarray(clean_pointcloud(confs, K, cams, depthmaps, pts3d))
    assert out[0, 4, 5] == 0.0           # floater killed
    assert out[0, 0, 0] == 1.0           # surface point untouched
    assert np.all(out[1] == 2.0)         # higher-conf frame untouched
