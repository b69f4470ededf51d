"""Autoencoder structural tests: f=8 shapes, conf-adaptor branch, adaptor
residual identity at init."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geo4d_tpu.models.autoencoder import AutoencoderKL, VAEConfig


@pytest.fixture(scope="module")
def vae_setup():
    cfg = VAEConfig(ch=16, ch_mult=(1, 2, 2), num_res_blocks=1, adaptor_ch=16)
    vae = AutoencoderKL(cfg=cfg, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32, 32, 3)), jnp.float32)
    params = jax.jit(lambda k: vae.init(k, x, method=vae.init_all))(jax.random.PRNGKey(0))
    return vae, params, x, cfg


def test_encode_shape(vae_setup):
    vae, params, x, cfg = vae_setup
    mean, logvar = jax.jit(lambda p, x: vae.apply(p, x, method=vae.encode))(params, x)
    # f = 2^(len(ch_mult)-1) = 4 here
    assert mean.shape == (2, 8, 8, cfg.embed_dim)
    assert logvar.shape == mean.shape


def test_decode_shape(vae_setup):
    vae, params, x, cfg = vae_setup
    z = jnp.zeros((2, 8, 8, cfg.embed_dim))
    rgb = jax.jit(lambda p, z: vae.apply(p, z, method=vae.decode))(params, z)
    assert rgb.shape == (2, 32, 32, 3)


def test_decode_with_conf_shape(vae_setup):
    vae, params, x, cfg = vae_setup
    z = jnp.zeros((2, 8, 8, cfg.embed_dim))
    out = jax.jit(lambda p, z: vae.apply(p, z, method=vae.decode_with_conf))(params, z)
    assert out.shape == (2, 32, 32, 4)  # rgb(3) + conf(1)
    # rgb channels of conf-decode match the plain decode (single trunk)
    rgb = jax.jit(lambda p, z: vae.apply(p, z, method=vae.decode))(params, z)
    assert np.allclose(np.asarray(out[..., :3]), np.asarray(rgb), atol=1e-6)


def test_encoder_adaptor_identity_at_init(vae_setup):
    # encoder adaptor tail is zero-init -> adaptor(x) == x at init,
    # so encode_with_adaptor == encode
    vae, params, x, cfg = vae_setup
    m1, _ = jax.jit(lambda p, x: vae.apply(p, x, method=vae.encode))(params, x)
    m2, _ = jax.jit(lambda p, x: vae.apply(p, x, method=vae.encode_with_adaptor))(params, x)
    assert np.allclose(np.asarray(m1), np.asarray(m2), atol=1e-5)


def test_roundtrip_runs(vae_setup):
    vae, params, x, _ = vae_setup
    recon, mean, logvar = jax.jit(vae.apply)(params, x)
    assert recon.shape == x.shape
