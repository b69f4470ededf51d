"""Attention stack: cross/self attention, spatial & temporal transformers.

Re-design of the reference attention layer (lvdm/modules/attention.py) for
TPU: channels-last token layout (B, N, C), bf16 QKV matmuls on the MXU with
f32 softmax, and a Pallas flash-attention kernel for the spatial path
(replacing xformers.ops.memory_efficient_attention, attention.py:175).
Image cross-attention splits the context at `text_context_len` tokens into
text K/V and per-frame image K/V streams and sums the two attention outputs
(attention.py:89-94,129-142).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from geo4d_tpu.nn.basics import Dense, GroupNorm32

TEXT_CONTEXT_LEN = 77


def dot_product_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array] = None,
    use_flash: bool = True,
) -> jax.Array:
    """Multi-head attention over (B, N, H, D) tensors.

    Softmax statistics in f32; matmuls in the input dtype (bf16 on TPU).
    Default path on TPU is the Pallas fused kernel
    (ops/flash_attention.py): chained-execution timing on v5e at the
    UNet's spatial shapes measured 45 TFLOP/s vs 18.8 for the XLA
    einsum+softmax path (the kernel returns None off-TPU / for masked or
    small-N cases, which fall through to XLA below).
    """
    if use_flash and mask is None and q.shape[1] >= 512:
        from geo4d_tpu.ops.flash_attention import flash_attention

        out = flash_attention(q, k, v)
        if out is not None:
            return out

    if use_flash and mask is None and q.shape[1] <= 32 and k.shape == q.shape:
        # tiny-seq self-attention (temporal path, seq = 16): 16x16 batched
        # matmuls keep 1/64 of the MXU busy — merge pixels into dense
        # block-diagonal-masked 128-wide attention instead (bit-exact;
        # ops/small_seq_attention.py)
        from geo4d_tpu.ops.small_seq_attention import small_seq_attention

        out = small_seq_attention(q, k, v, max(1, 128 // q.shape[1]))
        if out is not None:
            return out

    scale = q.shape[-1] ** -0.5
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits * scale
    if mask is not None:
        neg = jnp.finfo(logits.dtype).min
        logits = jnp.where(mask, logits, neg)
    weights = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bhqk,bkhd->bqhd", weights.astype(v.dtype), v,
        preferred_element_type=jnp.float32,
    )
    return out.astype(v.dtype)


class RelativePositionBias(nn.Module):
    """Learned relative-position K/V embeddings for temporal attention.

    Mirrors reference RelativePosition (attention.py:20-39): a
    (2*max_rel+1, d_head) table indexed by clipped key-query distance.
    Off by default in the shipped config (use_relative_position: false).
    """

    num_units: int
    max_relative_position: int

    @nn.compact
    def __call__(self, length_q: int, length_k: int) -> jax.Array:
        table = self.param(
            "embeddings_table",
            nn.initializers.xavier_uniform(),
            (self.max_relative_position * 2 + 1, self.num_units),
        )
        rq = jnp.arange(length_q)
        rk = jnp.arange(length_k)
        dist = jnp.clip(
            rk[None, :] - rq[:, None],
            -self.max_relative_position,
            self.max_relative_position,
        )
        return table[dist + self.max_relative_position]


class CrossAttention(nn.Module):
    """Self/cross attention with optional dual-stream image cross-attention.

    context=None   -> self attention over x.
    context given  -> cross attention; if `image_cross_attention`, context is
    [text(77) | image tokens] and the image stream gets its own K/V
    projections, with out = out_text + scale * out_image.
    """

    heads: int
    dim_head: int
    context_dim: Optional[int] = None  # None => self-attention dims
    image_cross_attention: bool = False
    image_cross_attention_scale: float = 1.0
    relative_position: bool = False
    temporal_length: Optional[int] = None
    causal: bool = False
    text_context_len: int = TEXT_CONTEXT_LEN
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jax.Array, context: Optional[jax.Array] = None) -> jax.Array:
        b, n, _ = x.shape
        h, d = self.heads, self.dim_head
        inner = h * d
        is_self_attn = context is None

        q = Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)

        ctx_img = None
        if is_self_attn:
            ctx = x
        elif self.image_cross_attention:
            ctx = context[:, : self.text_context_len, :]
            ctx_img = context[:, self.text_context_len :, :]
        else:
            ctx = context[:, : self.text_context_len, :]

        k = Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        if (
            is_self_attn
            and n <= 32
            and not self.causal
            and not self.relative_position
        ):
            # temporal hot path: fused Pallas kernel on the heads-packed
            # (P, N, C) layout straight off the projections — one HBM pass,
            # no head-split/fold transposes (ops/temporal_attention.py)
            from geo4d_tpu.ops.temporal_attention import temporal_attention

            out = temporal_attention(q, k, v, h)
            if out is not None:
                return Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)

        def split_heads(t):
            return t.reshape(t.shape[0], t.shape[1], h, d)

        qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)

        mask = None
        if self.causal:
            mask = jnp.tril(jnp.ones((n, n), dtype=bool))[None, None]

        if self.relative_position:
            # dense path with relative K/V bias (temporal attention only;
            # seq is tiny so the extra einsums are cheap)
            scale = d**-0.5
            qf = qh.transpose(0, 2, 1, 3).reshape(b * h, n, d)
            kf = kh.transpose(0, 2, 1, 3).reshape(b * h, -1, d)
            vf = vh.transpose(0, 2, 1, 3).reshape(b * h, -1, d)
            len_k = kf.shape[1]
            sim = jnp.einsum("bid,bjd->bij", qf, kf, preferred_element_type=jnp.float32) * scale
            k2 = RelativePositionBias(d, self.temporal_length, name="relative_position_k")(n, len_k)
            sim = sim + jnp.einsum("btd,tsd->bts", qf, k2.astype(qf.dtype), preferred_element_type=jnp.float32) * scale
            if mask is not None:
                sim = jnp.where(mask[0], sim, jnp.finfo(sim.dtype).min)
            attn = jax.nn.softmax(sim, axis=-1)
            out = jnp.einsum("bij,bjd->bid", attn.astype(vf.dtype), vf, preferred_element_type=jnp.float32)
            v2 = RelativePositionBias(d, self.temporal_length, name="relative_position_v")(n, len_k)
            out = out + jnp.einsum("bts,tsd->btd", attn.astype(v2.dtype), v2, preferred_element_type=jnp.float32)
            out = out.astype(self.dtype).reshape(b, h, n, d).transpose(0, 2, 1, 3)
        else:
            out = dot_product_attention(qh, kh, vh, mask=mask)

        out = out.reshape(b, n, inner)

        if ctx_img is not None and ctx_img.shape[1] > 0:
            k_ip = Dense(inner, use_bias=False, dtype=self.dtype, name="to_k_ip")(ctx_img)
            v_ip = Dense(inner, use_bias=False, dtype=self.dtype, name="to_v_ip")(ctx_img)
            out_ip = dot_product_attention(qh, split_heads(k_ip), split_heads(v_ip))
            out = out + self.image_cross_attention_scale * out_ip.reshape(b, n, inner)

        return Dense(x.shape[-1], dtype=self.dtype, name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    """GEGLU MLP (reference attention.py:415-442), fused gate projection."""

    mult: int = 4
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        inner = dim * self.mult
        proj = Dense(inner * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(proj, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)  # torch F.gelu is exact erf
        return Dense(dim, dtype=self.dtype, name="out")(h)


class BasicTransformerBlock(nn.Module):
    """pre-LN: self-attn -> cross-attn -> GEGLU FF (attention.py:212-246)."""

    heads: int
    dim_head: int
    context_dim: Optional[int] = None
    image_cross_attention: bool = False
    relative_position: bool = False
    temporal_length: Optional[int] = None
    causal: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context=None):
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32, name=name)
        attn_kw = dict(
            heads=self.heads,
            dim_head=self.dim_head,
            relative_position=self.relative_position,
            temporal_length=self.temporal_length,
            causal=self.causal,
            dtype=self.dtype,
        )
        x = x + CrossAttention(name="attn1", **attn_kw)(
            ln("norm1")(x).astype(self.dtype)
        )
        # attn2: cross-attention when context given; self-attention otherwise
        # (temporal blocks pass context=None -> self-attn, attention.py:388).
        x = x + CrossAttention(
            name="attn2",
            context_dim=self.context_dim,
            image_cross_attention=self.image_cross_attention,
            **attn_kw,
        )(ln("norm2")(x).astype(self.dtype), context=context)
        x = x + GEGLUFeedForward(dtype=self.dtype, name="ff")(
            ln("norm3")(x).astype(self.dtype)
        )
        return x


class SpatialTransformer(nn.Module):
    """Per-frame spatial attention over h*w tokens (attention.py:249-310).

    Input (B, H, W, C) channels-last; linear in/out projections
    (use_linear=True in shipped config), zero-init out, residual.
    """

    heads: int
    dim_head: int
    depth: int = 1
    context_dim: Optional[int] = None
    image_cross_attention: bool = False
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context=None):
        b, hgt, wid, c = x.shape
        inner = self.heads * self.dim_head
        h = GroupNorm32(epsilon=1e-6, name="norm")(x)
        h = h.reshape(b, hgt * wid, c)
        h = Dense(inner, dtype=self.dtype, name="proj_in")(h)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                heads=self.heads,
                dim_head=self.dim_head,
                context_dim=self.context_dim,
                image_cross_attention=self.image_cross_attention,
                dtype=self.dtype,
                name=f"block_{i}",
            )(h, context=context)
        h = Dense(c, zero_init=True, dtype=self.dtype, name="proj_out")(h)
        return x + h.reshape(b, hgt, wid, c)


class TemporalTransformer(nn.Module):
    """Per-pixel temporal attention over t tokens (attention.py:313-412).

    Input (B, T, H, W, C); tokens are the T axis for each (b, h, w) pixel.
    Self-attention only in the shipped config (temporal_selfatt_only).
    """

    heads: int
    dim_head: int
    depth: int = 1
    relative_position: bool = False
    causal: bool = False
    temporal_length: Optional[int] = None
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x, context=None):
        del context  # only_self_att=True in all shipped configs
        b, t, hgt, wid, c = x.shape
        inner = self.heads * self.dim_head
        h = GroupNorm32(epsilon=1e-6, name="norm")(x)
        # (B, T, H, W, C) -> (B*H*W, T, C)
        h = h.transpose(0, 2, 3, 1, 4).reshape(b * hgt * wid, t, c)
        h = Dense(inner, dtype=self.dtype, name="proj_in")(h)
        for i in range(self.depth):
            h = BasicTransformerBlock(
                heads=self.heads,
                dim_head=self.dim_head,
                relative_position=self.relative_position,
                temporal_length=self.temporal_length,
                causal=self.causal,
                dtype=self.dtype,
                name=f"block_{i}",
            )(h)
        h = Dense(c, zero_init=True, dtype=self.dtype, name="proj_out")(h)
        h = h.reshape(b, hgt, wid, t, c).transpose(0, 3, 1, 2, 4)
        return x + h
