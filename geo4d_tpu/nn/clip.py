"""OpenCLIP ViT-H-14 text + vision towers (frozen conditioners).

Parity targets: reference lvdm/modules/encoders/condition.py —
FrozenOpenCLIPEmbedder (:174-234): text tower, penultimate layer (23 of 24
blocks) + final LayerNorm, 77 tokens x width 1024;
FrozenOpenCLIPImageEmbedderV2 (:300-372): vision tower, full token sequence
(B, 257, 1280) after the transformer, no ln_post / projection / pooling;
input is bicubic-resized to 224^2 and CLIP-normalized (:322-330).

ViT-H-14 dims: text(width 1024, 16 heads, 24 layers, vocab 49408);
vision(width 1280, 16 heads, 32 layers, patch 14, grid 16 -> 257 tokens).

These run once per window (text once per run) — not a hot path — so they
are plain XLA transformer blocks in bf16 with f32 LayerNorms.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from geo4d_tpu.nn.basics import Dense

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


class MHA(nn.Module):
    """Standard pre-norm multi-head self-attention with qkv bias."""

    heads: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, causal: bool = False):
        b, n, d = x.shape
        h = self.heads
        dh = d // h
        qkv = Dense(3 * d, dtype=self.dtype, name="in_proj")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def split(t):
            return t.reshape(b, n, h, dh)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
        logits = logits * (dh**-0.5)
        if causal:
            mask = jnp.tril(jnp.ones((n, n), dtype=bool))
            logits = jnp.where(mask[None, None], logits, jnp.finfo(logits.dtype).min)
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v, preferred_element_type=jnp.float32)
        out = out.astype(self.dtype).reshape(b, n, d)
        return Dense(d, dtype=self.dtype, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, causal: bool = False):
        d = x.shape[-1]
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name=name)
        x = x + MHA(self.heads, dtype=self.dtype, name="attn")(
            ln("ln_1")(x).astype(self.dtype), causal=causal
        )
        h = ln("ln_2")(x).astype(self.dtype)
        h = Dense(int(d * self.mlp_ratio), dtype=self.dtype, name="mlp_fc")(h)
        h = nn.gelu(h, approximate=False)
        h = Dense(d, dtype=self.dtype, name="mlp_proj")(h)
        return x + h


class CLIPTextEncoder(nn.Module):
    """Causal text transformer; returns penultimate-layer features + ln_final.

    Output: (B, 77, width) — the 77-token text context consumed by
    cross-attention (lvdm cross-attn splits context at 77 tokens).
    """

    vocab_size: int = 49408
    width: int = 1024
    heads: int = 16
    layers: int = 24
    context_length: int = 77
    penultimate: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, token_ids: jax.Array) -> jax.Array:
        tok = nn.Embed(
            self.vocab_size, self.width, dtype=self.dtype,
            param_dtype=jnp.float32, name="token_embedding",
        )(token_ids)
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.01),
            (self.context_length, self.width),
        )
        x = tok + pos[None].astype(tok.dtype)
        n_layers = self.layers - 1 if self.penultimate else self.layers
        for i in range(n_layers):
            x = ResidualAttentionBlock(
                self.heads, dtype=self.dtype, name=f"resblocks_{i}"
            )(x, causal=True)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="ln_final")(x)
        return x.astype(jnp.float32)


class CLIPVisionEncoder(nn.Module):
    """ViT tower; returns the full token sequence (B, 1+grid^2, width).

    Matches FrozenOpenCLIPImageEmbedderV2 (:342-372): conv patch embed,
    class token, positional embedding, ln_pre, transformer — no ln_post,
    no projection, no pooling.
    """

    width: int = 1280
    heads: int = 16
    layers: int = 32
    patch_size: int = 14
    image_size: int = 224
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, images: jax.Array) -> jax.Array:
        """images: (B, H, W, 3) already resized to 224 and CLIP-normalized."""
        b = images.shape[0]
        x = nn.Conv(
            self.width,
            kernel_size=(self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="conv1",
        )(images.astype(self.dtype))
        grid = self.image_size // self.patch_size
        x = x.reshape(b, grid * grid, self.width)
        cls = self.param(
            "class_embedding", nn.initializers.normal(0.02), (self.width,)
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(x.dtype), (b, 1, self.width)), x], axis=1
        )
        pos = self.param(
            "positional_embedding",
            nn.initializers.normal(0.02),
            (grid * grid + 1, self.width),
        )
        x = x + pos[None].astype(x.dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name="ln_pre")(x)
        x = x.astype(self.dtype)
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.heads, dtype=self.dtype, name=f"resblocks_{i}"
            )(x, causal=False)
        return x.astype(jnp.float32)


def clip_preprocess(frames: jax.Array) -> jax.Array:
    """[-1,1] frames (B, H, W, 3) -> 224^2 CLIP-normalized.

    Reference path (condition.py:322-330): kornia bicubic resize (antialias)
    then (x+1)/2 and mean/std normalize. jax.image 'cubic' matches within
    interpolation tolerance; parity is defined at the metric level.
    """
    b = frames.shape[0]
    x = jax.image.resize(frames, (b, 224, 224, 3), method="cubic")
    x = (x + 1.0) / 2.0
    mean = jnp.asarray(CLIP_MEAN, dtype=x.dtype)
    std = jnp.asarray(CLIP_STD, dtype=x.dtype)
    return (x - mean) / std
