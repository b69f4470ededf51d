"""Pallas TPU kernel for tiny-sequence (temporal) self-attention.

The UNet's temporal attention is seq-16 self-attention per pixel: at the
ds1 bench shapes that is 57,600 independent (16, 64) @ (64, 16) matmuls.
The predecessor path (ops/small_seq_attention.py) made the matmuls
MXU-shaped by merging 8 pixels into one block-diagonal-masked 128-wide
attention, but as separate XLA ops it still paid five HBM round trips
(fold transpose, logits, softmax, PV, unfold) and traced at ~10 TFLOP/s —
~94 ms of a 748 ms UNet step for ~0.6 real TFLOP of work.

This kernel fuses the whole thing into ONE pass over HBM and removes the
head-split/fold transposes entirely by taking q/k/v in their natural
packed layout (P, N, heads*dim) straight off the QKV projections:

  * grid over row-tiles of the (P*N, C) view; each 128-row sub-block holds
    128/N whole pixels, so attention is block-diagonal inside it.
  * per (sub-block, head): one (128, d) x (d, 128) MXU matmul, additive
    block-diagonal mask (built from iota in-register, exact -> exp == 0
    for cross-pixel pairs), f32 row softmax, one (128, 128) x (128, d)
    MXU matmul. 8x redundant FLOPs on a memory-bound op = free.
  * one HBM read of q/k/v, one write of out: the memory floor is
    4 * P*N*C bytes (~0.6 ms/layer at ds1 on v5e vs ~6 ms for the XLA
    block-diag path).

Replaces nothing in the reference — the reference runs temporal attention
as eager torch batched matmuls (lvdm/modules/attention.py:104-124); this
is the TPU redesign of that path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

try:  # pallas is TPU/CPU-interpret only; guard for exotic backends
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    _PALLAS_OK = True
except Exception:  # pragma: no cover
    _PALLAS_OK = False

_SUB = 128  # rows per block-diagonal attention sub-block (MXU width)


def _kernel(q_ref, k_ref, v_ref, o_ref, *, n: int, n_heads: int, d: int,
            scale: float):
    rows = q_ref.shape[0]
    # additive block-diagonal mask: row i may attend col j iff same pixel
    pix_r = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _SUB), 0) // n
    pix_c = jax.lax.broadcasted_iota(jnp.int32, (_SUB, _SUB), 1) // n
    mask = jnp.where(pix_r == pix_c, 0.0, -1e30).astype(jnp.float32)

    for s in range(rows // _SUB):
        r0 = s * _SUB
        for h in range(n_heads):
            c0 = h * d
            qs = q_ref[r0:r0 + _SUB, c0:c0 + d]
            ks = k_ref[r0:r0 + _SUB, c0:c0 + d]
            vs = v_ref[r0:r0 + _SUB, c0:c0 + d]
            logits = jax.lax.dot_general(
                qs, ks, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            ) * scale + mask
            m = jnp.max(logits, axis=-1, keepdims=True)
            unnorm = jnp.exp(logits - m)
            w = (unnorm / jnp.sum(unnorm, axis=-1, keepdims=True)).astype(
                vs.dtype)
            out = jnp.dot(w, vs, preferred_element_type=jnp.float32,
                          precision=jax.lax.Precision.DEFAULT)
            o_ref[r0:r0 + _SUB, c0:c0 + d] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("n", "n_heads", "rows_tile"))
def _packed(qkv_q, qkv_k, qkv_v, n: int, n_heads: int, rows_tile: int):
    total_rows, c = qkv_q.shape
    d = c // n_heads
    grid = (total_rows // rows_tile,)
    spec = pl.BlockSpec((rows_tile, c), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, n=n, n_heads=n_heads, d=d,
                          scale=d ** -0.5),
        out_shape=jax.ShapeDtypeStruct((total_rows, c), qkv_q.dtype),
        grid=grid,
        in_specs=[spec, spec, spec],
        out_specs=spec,
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * total_rows * _SUB * c,
            bytes_accessed=4 * total_rows * c * qkv_q.dtype.itemsize,
            transcendentals=total_rows * _SUB * n_heads,
        ),
    )(qkv_q, qkv_k, qkv_v)


def temporal_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                       n_heads: int) -> Optional[jax.Array]:
    """Fused per-pixel tiny-seq self-attention, heads-packed layout.

    q/k/v: (P, N, C) with C = n_heads * d — i.e. the raw outputs of the
    QKV projections, NO head split. Each of the P rows-of-N is an
    independent attention problem. Returns (P, N, C), or None when the
    shapes don't meet the kernel's constraints (caller falls back).

    Constraints: TPU backend, 128 % N == 0, d = C/n_heads a multiple of 8
    (lane-sublane friendly after padding), N*P >= one tile.
    """
    from geo4d_tpu.ops.dispatch import pallas_tpu_available

    if not _PALLAS_OK or not pallas_tpu_available():
        return None
    p, n, c = q.shape
    if k.shape != q.shape or v.shape != q.shape:
        return None
    if n <= 0 or _SUB % n != 0 or c % n_heads != 0:
        return None
    d = c // n_heads
    if d % 8 != 0:
        return None

    # rows tile: as large as fits VMEM comfortably (4 tiles double-buffered
    # ~= 16*rows*c bytes <= ~10 MB), multiple of _SUB
    rows_budget = max(_SUB, min(1024, (10 * 2 ** 20) // (16 * c) // _SUB * _SUB))
    total = p * n
    qf = q.reshape(total, c)
    kf = k.reshape(total, c)
    vf = v.reshape(total, c)
    pad = (-total) % rows_budget
    if pad:
        # zero-padded rows form their own all-zero pixels: uniform softmax
        # over zero V = zeros out; rows are dropped below
        qf = jnp.pad(qf, ((0, pad), (0, 0)))
        kf = jnp.pad(kf, ((0, pad), (0, 0)))
        vf = jnp.pad(vf, ((0, pad), (0, 0)))
    try:
        out = _packed(qf, kf, vf, n, n_heads, rows_budget)
    except Exception:
        return None
    if pad:
        out = out[:total]
    return out.reshape(p, n, c)
