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


class _FusedGroupNorm(nn.Module):
    """f32-statistics GroupNorm that reads the bf16 activation in place.

    `nn.GroupNorm(dtype=f32)` requires the input pre-cast to f32, which
    materializes a 2x-sized copy that both the stats pass and the
    normalize pass then re-read — on the VAE decoder the GroupNorm chain
    measured 83% of total decode time (device trace). Here:
      * both moments are PER-CHANNEL spatial reductions directly over the
        bf16 buffer with f32 accumulation — the channel (lane) axis stays
        minor, so the two reduces fuse into one full-speed read;
      * the group combine runs on the tiny (N, C) moment tensors;
      * normalization folds algebraically into one per-channel affine
        (y = x * a + b) applied in a single elementwise pass.
    Param names/shapes match nn.GroupNorm (scale/bias, (C,)), so converted
    reference checkpoints load identically.
    """

    num_groups: int
    epsilon: float
    silu: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        g = self.num_groups
        cg = c // g
        gamma = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)

        # TPU hot path: one-read-one-write Pallas kernel with the SiLU
        # folded in (ops/group_norm.py) — the XLA stats reduces below
        # measured only ~310 GB/s on the UNet bench trace
        from geo4d_tpu.ops.group_norm import fused_group_norm

        out = fused_group_norm(x, gamma, beta, groups=g, eps=self.epsilon,
                               silu=self.silu)
        if out is not None:
            return out

        spatial = tuple(range(1, x.ndim - 1))
        mean_c = jnp.mean(x, axis=spatial, dtype=jnp.float32)      # (N, C)
        # second moment from x*x in the INPUT dtype (f32-accumulated):
        # squaring via x.astype(f32) would share the f32-convert expression
        # with the normalize pass below, and XLA materializes the shared
        # conversion as a full-size f32 copy (seen in device traces as
        # f32-sized bytes_accessed on every stats reduce)
        mean2_c = jnp.mean(x * x, axis=spatial, dtype=jnp.float32)
        mean_g = jnp.mean(mean_c.reshape(-1, g, cg), axis=-1)      # (N, g)
        mean2_g = jnp.mean(mean2_c.reshape(-1, g, cg), axis=-1)
        var_g = jnp.maximum(mean2_g - jnp.square(mean_g), 0.0)
        rstd_g = jax.lax.rsqrt(var_g + self.epsilon)               # (N, g)
        rstd_c = jnp.repeat(rstd_g, cg, axis=-1)                   # (N, C)
        shift_g = jnp.repeat(mean_g * rstd_g, cg, axis=-1)
        a = rstd_c * gamma[None]
        b = beta[None] - shift_g * gamma[None]
        shape = (x.shape[0],) + (1,) * (x.ndim - 2) + (c,)
        y = x.astype(jnp.float32) * a.reshape(shape) + b.reshape(shape)
        if self.silu:
            y = y * jax.nn.sigmoid(y)
        return y


class GroupNorm32(nn.Module):
    """GroupNorm computed in float32 regardless of input dtype.

    `silu=True` folds the SiLU/swish that always follows the norm in the
    UNet/VAE conv blocks into the same kernel pass (ops/group_norm.py) —
    parameter paths are unchanged.
    """

    num_groups: int = 32
    epsilon: float = 1e-5
    silu: bool = False

    @nn.compact
    def __call__(self, x):
        orig_dtype = x.dtype
        # largest group count <= num_groups dividing C (real configs are
        # always divisible by 32; tiny test configs may not be)
        groups = min(self.num_groups, x.shape[-1])
        while x.shape[-1] % groups:
            groups -= 1
        # module name kept at nn.GroupNorm's default scope so parameter
        # paths (…/GroupNorm_0/scale|bias) — and therefore the torch
        # checkpoint converter — are unchanged
        y = _FusedGroupNorm(
            num_groups=groups, epsilon=self.epsilon, silu=self.silu,
            name="GroupNorm_0"
        )(x)
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
