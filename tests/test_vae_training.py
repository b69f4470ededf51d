"""VAE fine-tuning loss tests (generator/discriminator alternation)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from geo4d_tpu.models.autoencoder import AutoencoderKL, VAEConfig
from geo4d_tpu.training.vae import (
    PatchDiscriminator,
    VAETrainConfig,
    hinge_d_loss,
    make_vae_train_steps,
)


def test_hinge_loss_orders():
    good = hinge_d_loss(jnp.asarray([2.0]), jnp.asarray([-2.0]))
    bad = hinge_d_loss(jnp.asarray([-2.0]), jnp.asarray([2.0]))
    assert float(good) < float(bad)


def test_vae_training_steps_run_and_descend():
    cfg_v = VAEConfig(ch=8, ch_mult=(1, 2), num_res_blocks=1, adaptor_ch=8)
    vae = AutoencoderKL(cfg=cfg_v, with_adaptor=False, dtype=jnp.float32)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16, 16, 3)) * 0.3,
                    jnp.float32)
    params = jax.jit(lambda k: vae.init(k, x))(jax.random.PRNGKey(0))
    disc = PatchDiscriminator(base_ch=8, n_layers=2, dtype=jnp.float32)
    disc_params = jax.jit(disc.init)(jax.random.PRNGKey(1), x)

    def vae_apply(p, x, key):
        return vae.apply(p, x, rng=key, sample=True)

    cfg = VAETrainConfig(learning_rate=1e-3, disc_start=0)
    g_step, d_step, init_state = make_vae_train_steps(vae_apply, disc, cfg)
    state = init_state(params, disc_params)
    g_step = jax.jit(g_step)
    d_step = jax.jit(d_step)

    g_losses, d_losses = [], []
    for i in range(6):
        state, gm = g_step(state, x, jax.random.PRNGKey(10 + i))
        state, dm = d_step(state, x, jax.random.PRNGKey(20 + i))
        g_losses.append(float(gm["rec"]))
        d_losses.append(float(dm["d_loss"]))
    assert np.isfinite(g_losses).all() and np.isfinite(d_losses).all()
    assert g_losses[-1] < g_losses[0]  # reconstruction improves
    assert int(state.step) == 6
