"""Shared NN primitives for the diffusion stack.

Layout convention: **channels-last everywhere** ((B, H, W, C) for frames,
(B, N, C) for tokens). This is the XLA:TPU-native conv layout — the
reference's NCHW (lvdm/basics.py, PyTorch) would force transposes around
every convolution on TPU.

f32 GroupNorm mirrors the reference's GroupNormSpecific (lvdm/basics.py:76-81).
Zero-initialized output convs mirror `zero_module` (lvdm/basics.py:19).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def timestep_embedding(
    timesteps: jax.Array, dim: int, max_period: float = 10000.0
) -> jax.Array:
    """Sinusoidal timestep embedding, [cos | sin] ordering.

    Matches reference lvdm/models/utils_diffusion.py:8-28 (cos first).
    timesteps: (N,) possibly-fractional. Returns (N, dim) float32.
    """
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class GroupNorm32(nn.Module):
    """GroupNorm computed in float32 regardless of input dtype."""

    num_groups: int = 32
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        # largest group count <= num_groups dividing C (real configs are
        # always divisible by 32; tiny test configs may not be)
        groups = min(self.num_groups, x.shape[-1])
        while x.shape[-1] % groups:
            groups -= 1
        y = nn.GroupNorm(
            num_groups=groups,
            epsilon=self.epsilon,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )(x.astype(jnp.float32))
        return y.astype(orig_dtype)


class Conv(nn.Module):
    """Channels-last 2D conv with optional zero init (for residual tails)."""

    features: int
    kernel: int = 3
    stride: int = 1
    zero_init: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        pad = self.kernel // 2
        return nn.Conv(
            self.features,
            kernel_size=(self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            kernel_init=init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class Dense(nn.Module):
    features: int
    use_bias: bool = True
    zero_init: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        init = nn.initializers.zeros if self.zero_init else nn.initializers.lecun_normal()
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=init,
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class TimeEmbedMLP(nn.Module):
    """linear -> SiLU -> linear over a sinusoidal embedding.

    `zero_out` zero-inits the second linear (reference zero-inits the
    fps/task embedding tails, openaimodel3d.py:383-392).
    """

    out_dim: int
    zero_out: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, emb):
        h = Dense(self.out_dim, dtype=self.dtype, name="fc1")(emb)
        h = nn.silu(h)
        h = Dense(self.out_dim, zero_init=self.zero_out, dtype=self.dtype, name="fc2")(h)
        return h


def nearest_upsample_2x(x: jax.Array) -> jax.Array:
    """(B, H, W, C) -> (B, 2H, 2W, C) nearest-neighbor."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def avg_pool_2x(x: jax.Array) -> jax.Array:
    """(B, H, W, C) 2x2 average pool, stride 2."""
    return nn.avg_pool(x, window_shape=(2, 2), strides=(2, 2))
