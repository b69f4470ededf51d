"""Block-diagonal batched attention for tiny sequence lengths (TPU).

The UNet's temporal attention is seq-16 self-attention per pixel-head:
57,600 independent (16, 64) @ (64, 16) matmuls at the ds1 shapes. The MXU
is a 128x128 systolic array — a 16x16 logits tile keeps 1/64 of it busy,
and the bare XLA einsum pair measured ~8 ms on v5e where the FLOP floor is
microseconds (scripts/exp_tiny_attn.py).

TPU-idiomatic fix: MERGE `px` consecutive pixels into one dense
(px*n, px*n) attention with an additive block-diagonal mask. The matmuls
become MXU-shaped (128x64x128 for px=8, n=16), the masked softmax zeroes
every cross-pixel weight EXACTLY (-inf -> exp 0), so the result equals the
per-pixel attention bit-for-bit up to f32 summation of zeros. 8x redundant
FLOPs on an engine that was 64x underutilized = ~6 ms saved per call.

Replaces nothing in the reference — the reference runs temporal attention
as eager torch batched matmuls (lvdm/modules/attention.py:104-124); this
is the TPU redesign of that path.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _block_mask(px: int, n: int, dtype=jnp.float32) -> jax.Array:
    """(px*n, px*n) additive mask: 0 inside each pixel's diagonal (n, n)
    block, a large negative value elsewhere."""
    idx = jnp.arange(px * n) // n
    same = idx[:, None] == idx[None, :]
    neg = jnp.asarray(jnp.finfo(dtype).min / 2, dtype)
    return jnp.where(same, jnp.asarray(0.0, dtype), neg)


def small_seq_attention(
    q: jax.Array,            # (B, N, H, D) — B independent pixels
    k: jax.Array,
    v: jax.Array,
    px_per_block: int = 8,
) -> Optional[jax.Array]:
    """Exact per-(B, H) self-attention over tiny N via block-diagonal
    batching. Returns None when shapes don't fit (caller falls back)."""
    b, n, h, d = q.shape
    if k.shape != q.shape or v.shape != q.shape:
        return None
    if n > 32 or px_per_block * n > 512:
        return None

    def fold(t):  # (B, N, H, D) -> (B*H, N, D)
        return t.transpose(0, 2, 1, 3).reshape(b * h, n, d)

    qf, kf, vf = fold(q), fold(k), fold(v)
    bh = b * h
    blk = px_per_block
    pad = (-bh) % blk
    if pad:
        zeros = jnp.zeros((pad, n, d), qf.dtype)
        qf = jnp.concatenate([qf, zeros])
        # padded keys get uniform softmax (all-zero logits) — harmless,
        # rows are dropped below
        kf = jnp.concatenate([kf, zeros])
        vf = jnp.concatenate([vf, zeros])
    nb = (bh + pad) // blk
    qb = qf.reshape(nb, blk * n, d)
    kb = kf.reshape(nb, blk * n, d)
    vb = vf.reshape(nb, blk * n, d)

    scale = d**-0.5
    logits = jnp.einsum(
        "bqd,bkd->bqk", qb, kb, preferred_element_type=jnp.float32
    ) * scale
    logits = logits + _block_mask(blk, n)[None]
    w = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum(
        "bqk,bkd->bqd", w.astype(vb.dtype), vb,
        preferred_element_type=jnp.float32,
    ).astype(q.dtype)
    out = out.reshape(nb * blk, n, d)[:bh]
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
