"""Checkpoint converter round-trip tests.

Builds a pseudo-torch state dict FROM the flax tree (via the inverse
transforms and the same key mapping), then converts back and checks exact
recovery — validating that every flax leaf has a rule, the rules are
injective, and the tensor transforms invert."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from geo4d_tpu.models.convert import (
    clip_text_torch_key,
    clip_vision_torch_key,
    convert_state_dict,
    inverse_transform,
    resampler_torch_key,
    strip_prefixes,
    unet_torch_key,
    vae_torch_key,
)

pytestmark = pytest.mark.smoke  # CPU-light fast tier


def pseudo_torch_sd(flax_params, key_fn, rng):
    """Random torch-layout state dict covering every flax leaf."""
    sd = {}

    def fill(path, leaf):
        parts = [str(k.key) for k in path]
        tkey = key_fn(parts)
        assert tkey is not None, f"no mapping rule for {'/'.join(parts)}"
        assert tkey not in sd, f"duplicate torch key {tkey} from {'/'.join(parts)}"
        rand = rng.normal(size=leaf.shape).astype(np.float32)
        sd[tkey] = inverse_transform(parts[-1], rand)
        return rand

    expected = jax.tree_util.tree_map_with_path(fill, flax_params)
    return sd, expected


def check_roundtrip(flax_params, key_fn, rng):
    sd, expected = pseudo_torch_sd(flax_params, key_fn, rng)
    out, missing, used = convert_state_dict(sd, flax_params, key_fn)
    assert not missing, missing[:5]
    assert len(used) == len(sd)
    flat_out = jax.tree_util.tree_leaves(out)
    flat_exp = jax.tree_util.tree_leaves(expected)
    for a, b in zip(flat_out, flat_exp):
        assert np.array_equal(np.asarray(a), np.asarray(b))


def test_unet_mapping_roundtrip(rng):
    from geo4d_tpu.models.unet3d import UNet3D

    unet = UNet3D(
        model_channels=32, num_res_blocks=1, attention_resolutions=(1, 2),
        channel_mult=(1, 2), num_head_channels=16, context_dim=24,
        temporal_length=4, dropout=0.0, dtype=jnp.float32,
    )
    x = jnp.zeros((1, 4, 8, 16, 20))
    params = jax.jit(
        lambda k: unet.init(k, x, jnp.array([0]), jnp.zeros((1, 141, 24)),
                            jnp.array([24]))
    )(jax.random.PRNGKey(0))
    check_roundtrip(params, unet_torch_key, rng)


def test_vae_mapping_roundtrip(rng):
    from geo4d_tpu.models.autoencoder import AutoencoderKL, VAEConfig

    vae = AutoencoderKL(
        cfg=VAEConfig(ch=16, ch_mult=(1, 2), num_res_blocks=1, adaptor_ch=16),
        dtype=jnp.float32,
    )
    x = jnp.zeros((1, 16, 16, 3))
    params = jax.jit(lambda k: vae.init(k, x, method=vae.init_all))(
        jax.random.PRNGKey(0)
    )
    check_roundtrip(params, vae_torch_key, rng)


def test_clip_text_mapping_roundtrip(rng):
    from geo4d_tpu.nn.clip import CLIPTextEncoder

    enc = CLIPTextEncoder(vocab_size=64, width=32, heads=4, layers=2,
                          context_length=16, dtype=jnp.float32)
    params = jax.jit(enc.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 16), jnp.int32)
    )
    check_roundtrip(params, clip_text_torch_key, rng)


def test_clip_vision_mapping_roundtrip(rng):
    from geo4d_tpu.nn.clip import CLIPVisionEncoder

    enc = CLIPVisionEncoder(width=32, heads=4, layers=2, patch_size=14,
                            image_size=28, dtype=jnp.float32)
    params = jax.jit(enc.init)(jax.random.PRNGKey(0), jnp.zeros((1, 28, 28, 3)))
    check_roundtrip(params, clip_vision_torch_key, rng)


def test_resampler_mapping_roundtrip(rng):
    from geo4d_tpu.nn.resampler import Resampler

    rs = Resampler(dim=32, depth=2, dim_head=8, heads=4, num_queries=4,
                   embedding_dim=16, output_dim=32, video_length=2,
                   dtype=jnp.float32)
    params = jax.jit(rs.init)(jax.random.PRNGKey(0), jnp.zeros((1, 2, 5, 16)))
    check_roundtrip(params, resampler_torch_key, rng)


def test_strip_prefixes():
    sd = {"state_dict": {"model.framestride_embed.0.weight": 1, "a": 2}}
    out = strip_prefixes(sd)
    assert "model.fps_embedding.0.weight" in out
    assert out["a"] == 2
