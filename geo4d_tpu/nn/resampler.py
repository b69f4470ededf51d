"""Perceiver Resampler: CLIP image tokens -> per-frame conditioning tokens.

Parity target: reference lvdm/modules/encoders/resampler.py (Resampler :96,
PerceiverAttention :48). Shipped config (configs/inference_geo4d.yaml:144-155):
dim 1024, depth 4, 12 heads x 64, 16 learned queries *per frame* (video_length
16 -> a (1, 256, 1024) query bank), embedding_dim 1280 (ViT-H tokens),
output 1024. Frame-wise path: each frame's 257 CLIP tokens are resampled by
that frame's 16 queries -> output (B, T*16, 1024).

TPU notes: queries attend over [image tokens | latents] jointly (K/V on the
concatenation, as the reference does at resampler.py:78); all frames batch
through the MXU as one (B*T) batch; softmax in f32.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from geo4d_tpu.nn.basics import Dense


class PerceiverAttention(nn.Module):
    heads: int = 12
    dim_head: int = 64
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, latents):
        """x: (B, N1, D) image features; latents: (B, N2, D) queries."""
        b, l, d = latents.shape
        h, dh = self.heads, self.dim_head
        inner = h * dh
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name=name)
        x = ln("norm1")(x).astype(self.dtype)
        latents = ln("norm2")(latents).astype(self.dtype)

        q = Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(latents)
        kv_in = jnp.concatenate([x, latents], axis=-2)
        kv = Dense(inner * 2, use_bias=False, dtype=self.dtype, name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_first(t):
            return t.reshape(b, t.shape[1], h, dh).transpose(0, 2, 1, 3)

        q, k, v = heads_first(q), heads_first(k), heads_first(v)
        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
        w = jax.nn.softmax(logits * (dh**-0.5), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bhkd->bhqd", w, v, preferred_element_type=jnp.float32)
        out = out.astype(self.dtype).transpose(0, 2, 1, 3).reshape(b, l, inner)
        return Dense(d, use_bias=False, dtype=self.dtype, name="to_out")(out)


class ResamplerFeedForward(nn.Module):
    mult: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="norm")(x)
        h = Dense(d * self.mult, use_bias=False, dtype=self.dtype, name="fc1")(h.astype(self.dtype))
        h = nn.gelu(h, approximate=False)  # torch nn.GELU is exact erf
        return Dense(d, use_bias=False, dtype=self.dtype, name="fc2")(h)


class Resampler(nn.Module):
    dim: int = 1024
    depth: int = 4
    dim_head: int = 64
    heads: int = 12
    num_queries: int = 16
    embedding_dim: int = 1280
    output_dim: int = 1024
    ff_mult: int = 4
    video_length: Optional[int] = 16
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        """x: (B, T, L, C) per-frame CLIP tokens, or (B, L, C) single image.

        Returns (B, T*num_queries, output_dim) / (B, num_queries, output_dim).
        """
        total_q = self.num_queries * (self.video_length or 1)
        latents0 = self.param(
            "latents",
            lambda key, shape: jax.random.normal(key, shape) / self.dim**0.5,
            (1, total_q, self.dim),
        ).astype(self.dtype)

        framewise = x.ndim == 4
        if framewise:
            b, t, l, c = x.shape
            x = x.reshape(b * t, l, c)
            latents = jnp.broadcast_to(latents0, (b, total_q, self.dim)).reshape(
                b * t, self.num_queries, self.dim
            )
        else:
            b = x.shape[0]
            latents = jnp.broadcast_to(latents0, (b, total_q, self.dim))

        x = Dense(self.dim, dtype=self.dtype, name="proj_in")(x.astype(self.dtype))
        for i in range(self.depth):
            latents = latents + PerceiverAttention(
                heads=self.heads, dim_head=self.dim_head, dtype=self.dtype,
                name=f"layers_{i}_attn",
            )(x, latents)
            latents = latents + ResamplerFeedForward(
                mult=self.ff_mult, dtype=self.dtype, name=f"layers_{i}_ff"
            )(latents)

        latents = Dense(self.output_dim, dtype=self.dtype, name="proj_out")(latents)
        latents = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="norm_out")(latents)
        if framewise:
            latents = latents.reshape(b, t * self.num_queries, self.output_dim)
        return latents.astype(jnp.float32)
