"""Experiment: seq-16 temporal attention formulations at UNet ds1 shapes.

Hypothesis: the 16x16 batched attention matmuls (57600 batches of
(16,64)@(64,16)) are MXU-hostile and dominate the 56 ms temporal
transformer. Candidates:
  X: XLA einsum path (dot_product_attention, current)
  L: lanes formulation — pixels in the minor (lane) dim, logits/AV as
     broadcast-multiply-reduce einsums (VPU), no tiny matmuls
  P: Pallas fused small-seq attention kernel (pixel-tiled)
Run: python scripts/exp_tiny_attn.py
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from geo4d_tpu.core.cache import enable_persistent_compile_cache

enable_persistent_compile_cache(os.path.join(_REPO, ".jax_cache"))

import jax
import jax.numpy as jnp

B, T, P, HEADS, DH = 5, 16, 2304, 5, 64


def bench(name, fn, *args, n=3):
    t0 = time.time()
    out = fn(*args)
    float(jnp.sum(out[..., 0].astype(jnp.float32)))
    warm = time.time() - t0
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        float(jnp.sum(out[..., 0].astype(jnp.float32)))
        best = min(best, time.time() - t0)
    print(f"{name:46s} {best*1e3:9.1f} ms  (warm {warm:.0f}s)")
    return best


def xla_attn(q, k, v):
    # (BP, T, H, D) tokens along T — the current dot_product_attention body
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits * DH**-0.5, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", w.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def lanes_attn(q, k, v):
    # (B, T, P, H, D) with P kept minor through the attention math:
    # logits via elementwise-mul+reduce over D (VPU), no 16x16 matmuls
    logits = jnp.einsum("btphd,bsphd->bhtsp", q, k,
                        preferred_element_type=jnp.float32)
    w = jax.nn.softmax(logits * DH**-0.5, axis=3)
    out = jnp.einsum("bhtsp,bsphd->btphd", w.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return out.astype(v.dtype)


def main():
    key = jax.random.PRNGKey(0)
    q4 = jax.random.normal(key, (B * P, T, HEADS, DH), jnp.bfloat16)
    k4 = jax.random.normal(key, (B * P, T, HEADS, DH), jnp.bfloat16)
    v4 = jax.random.normal(key, (B * P, T, HEADS, DH), jnp.bfloat16)
    fx = jax.jit(xla_attn)
    bench("X: XLA einsum (BP,T,H,D)", fx, q4, k4, v4)

    q5 = q4.reshape(B, P, T, HEADS, DH).transpose(0, 2, 1, 3, 4)
    k5 = k4.reshape(B, P, T, HEADS, DH).transpose(0, 2, 1, 3, 4)
    v5 = v4.reshape(B, P, T, HEADS, DH).transpose(0, 2, 1, 3, 4)
    jax.block_until_ready(q5)
    fl = jax.jit(lanes_attn)
    bench("L: lanes einsum (B,T,P,H,D)", fl, q5, k5, v5)

    from geo4d_tpu.ops.small_seq_attention import small_seq_attention

    for px in (4, 8, 16):
        fp = jax.jit(lambda q, k, v, px=px: small_seq_attention(q, k, v, px))
        bench(f"D: block-diagonal px={px}", fp, q4, k4, v4)

    # correctness vs the XLA path
    import numpy as np

    ref = np.asarray(fx(q4, k4, v4), np.float32)
    got = np.asarray(
        jax.jit(lambda q, k, v: small_seq_attention(q, k, v, 8))(q4, k4, v4),
        np.float32,
    )
    err = np.max(np.abs(ref - got))
    print(f"max |blockdiag - xla| = {err:.2e}")


if __name__ == "__main__":
    main()
