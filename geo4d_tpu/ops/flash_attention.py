"""Pallas TPU fused attention kernel for the spatial-attention hot path.

Replaces the reference's xformers.ops.memory_efficient_attention CUDA path
(lvdm/modules/attention.py:175). Geometry of the problem: self-attention
over N = h*w latent tokens per frame (N <= 2048 at 32x64 latents), head dim
64. At these sizes the full K/V for one (batch, head) fits comfortably in
VMEM, so rather than an online-softmax flash loop we tile only the query
axis and do one exact softmax per q-tile over the full key length — fewer
passes over HBM than a streaming flash kernel and no rescaling traffic.

Returns None from `flash_attention` when shapes don't meet the kernel's
constraints; callers fall back to the XLA einsum path.
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


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]                      # (qb, d) bf16 — keep MXU inputs bf16:
    k = k_ref[0]                      # casting to f32 first would force the
    v = v_ref[0]                      # 8x-slower f32 MXU path

    # precision pinned to DEFAULT: a global jax_default_matmul_precision of
    # 'highest' requests multi-pass bf16 emulation that Mosaic rejects
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ) * scale                                          # (qb, n) f32 accum
    m = jnp.max(logits, axis=-1, keepdims=True)
    unnorm = jnp.exp(logits - m)
    denom = jnp.sum(unnorm, axis=-1, keepdims=True)
    weights = (unnorm / denom).astype(v.dtype)
    out = jnp.dot(weights, v, preferred_element_type=jnp.float32,
                  precision=jax.lax.Precision.DEFAULT)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_block",))
def _flash_bhnd(q, k, v, q_block: int):
    """q: (BH, Nq, D), k/v: (BH, Nk, D).

    Grid over (bh, q-blocks); Mosaic double-buffers the (redundant) per-
    q-block K/V streams well — a variant keeping K/V resident and looping
    q-blocks in-kernel with dynamic slices measured 15x slower (dynamic-
    slice stores defeat the pipeliner). Chained-execution timing on v5e at
    the spatial shapes: 45 TFLOP/s (q_block 1024) vs 18.8 for the XLA
    einsum path — this kernel is the default (nn/attention.py).
    """
    bh, nq, d = q.shape
    nk = k.shape[1]
    scale = d**-0.5
    # grid order (bh, q-blocks): consecutive q-blocks of one (b, h) hit the
    # same K/V block index, so Mosaic skips the re-fetch; q_block as large
    # as divides N (1024 best: 45 TF/s vs 22 at 256 on v5e, chained timing)
    grid = (bh, nq // q_block)
    return pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, q_block, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nk, d), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, q_block, d), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * bh * nq * nk * d,
            bytes_accessed=(q.size + k.size + v.size) * q.dtype.itemsize * 2,
            transcendentals=bh * nq * nk,
        ),
    )(q, k, v)


def flash_attention(q, k, v) -> Optional[jax.Array]:
    """Fused attention over (B, N, H, D) tensors, or None if unsupported.

    Constraints: TPU backend only, no mask, D a multiple of 64, Nk <= 4096
    (full K/V per (b, h) must fit VMEM), Nq divisible by a power-of-two
    q-block >= 128. Largest q-block wins: chained-execution measurement on
    v5e at the UNet's spatial shapes (B*H=80, N=2048, D=64) gives
    45 TFLOP/s at q_block 1024 vs 18.8 for XLA's einsum+softmax path —
    hence this kernel is the default spatial-attention path.
    """
    from geo4d_tpu.ops.dispatch import pallas_tpu_available

    if not _PALLAS_OK or not pallas_tpu_available():
        return None  # Mosaic lowering is TPU-only; CPU tests take XLA path
    b, nq, h, d = q.shape
    nk = k.shape[1]
    if d % 64 != 0 or nk > 4096 or nk % 16 != 0:
        # nk is a second-minor dim in the (1, nk, d) K/V tiles: Mosaic needs
        # a multiple of 16 (bf16 sublanes), not 128 — 128 would wrongly
        # exclude the ds2 spatial shapes (nq = nk = 576)
        return None
    q_block = 0
    # multiples of 16 (bf16 sublane tile on the second-minor axis);
    # non-power-of-two candidates matter: 576x256 latents give nq = 2304 =
    # 3*768 (power-of-two-only would tile at 256, 3x more grid steps) and
    # the ds2 spatial shapes give nq = 576
    for cand in (1024, 768, 576, 512, 384, 288, 256, 192, 128):
        if nq % cand == 0:
            q_block = cand
            break
    if q_block == 0:
        return None

    # (B, N, H, D) -> (B*H, N, D)
    def fold(t):
        return t.transpose(0, 2, 1, 3).reshape(t.shape[0] * t.shape[2], t.shape[1], d)

    try:
        out = _flash_bhnd(fold(q), fold(k), fold(v), q_block)
    except Exception:
        return None
    return out.reshape(b, h, nq, d).transpose(0, 2, 1, 3)
