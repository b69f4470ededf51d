"""CLIP towers + Perceiver resampler structural tests (tiny configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geo4d_tpu.nn.clip import CLIPTextEncoder, CLIPVisionEncoder, clip_preprocess
from geo4d_tpu.nn.resampler import Resampler


def test_text_encoder_shape_and_causality():
    enc = CLIPTextEncoder(vocab_size=100, width=32, heads=4, layers=2,
                          context_length=16, dtype=jnp.float32)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 100, size=(2, 16)))
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), ids)
    out = jax.jit(enc.apply)(params, ids)
    assert out.shape == (2, 16, 32)
    # causality: changing a later token must not affect earlier positions
    ids2 = ids.at[:, 10].set((ids[:, 10] + 1) % 100)
    out2 = jax.jit(enc.apply)(params, ids2)
    assert np.allclose(np.asarray(out[:, :10]), np.asarray(out2[:, :10]), atol=1e-5)
    assert not np.allclose(np.asarray(out[:, 10:]), np.asarray(out2[:, 10:]))


def test_vision_encoder_token_count():
    enc = CLIPVisionEncoder(width=32, heads=4, layers=2, patch_size=14,
                            image_size=224, dtype=jnp.float32)
    x = jnp.zeros((1, 224, 224, 3))
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(enc.apply)(params, x)
    # 16x16 patches + class token = 257 (the reference's [B,257,1280] contract)
    assert out.shape == (1, 257, 32)


def test_clip_preprocess_range():
    frames = jnp.ones((1, 64, 96, 3))  # white in [-1,1]
    out = clip_preprocess(frames)
    assert out.shape == (1, 224, 224, 3)
    expected = (1.0 - 0.48145466) / 0.26862954  # channel-0 white value
    assert np.asarray(out)[0, 0, 0, 0] == pytest.approx(expected, rel=1e-4)


def test_resampler_framewise_shape():
    rs = Resampler(dim=32, depth=2, dim_head=8, heads=4, num_queries=4,
                   embedding_dim=16, output_dim=32, video_length=3,
                   dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 3, 10, 16)), jnp.float32)
    params = jax.jit(rs.init)(jax.random.PRNGKey(0), x)
    out = jax.jit(rs.apply)(params, x)
    assert out.shape == (2, 3 * 4, 32)  # (B, T*num_queries, out)


def test_resampler_frames_independent():
    """Frame-wise path: each frame resampled independently (no temporal mix)."""
    rs = Resampler(dim=16, depth=1, dim_head=4, heads=4, num_queries=2,
                   embedding_dim=8, output_dim=16, video_length=2,
                   dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 2, 5, 8)), jnp.float32)
    params = jax.jit(rs.init)(jax.random.PRNGKey(0), x)
    out1 = jax.jit(rs.apply)(params, x)
    x2 = x.at[:, 1].set(0.0)  # perturb frame 1 only
    out2 = jax.jit(rs.apply)(params, x2)
    assert np.allclose(np.asarray(out1[:, :2]), np.asarray(out2[:, :2]), atol=1e-5)
    assert not np.allclose(np.asarray(out1[:, 2:]), np.asarray(out2[:, 2:]))
