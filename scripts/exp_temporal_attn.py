"""Experiment: temporal-transformer layout variants at UNet ds1 shapes.

The temporal towers cost 316 ms of the 807 ms UNet step (microbench).
Candidate причины: physical (B,T,H,W,C)->(B*H*W,T,C) transposes of
~118 MB tensors, and 16x16 batched attention matmuls. Variants:
  A: current TemporalTransformer (transpose to pixel-major)
  B: layout-preserving — tokens stay (B, T, P, C); attention via einsum
     with (B, P, H) batch dims; no physical transpose.
  C: like A but attention computed with merged q/k heads as one einsum.
Run: python scripts/exp_temporal_attn.py
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
from flax import linen as nn

from geo4d_tpu.nn.attention import TemporalTransformer
from geo4d_tpu.nn.basics import Dense, GroupNorm32

B, T, HH, WW, C = 5, 16, 32, 72, 320
HEADS, DH = 5, 64


def bench(name, fn, *args, n=3):
    t0 = time.time()
    out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., 0].astype(jnp.float32)))
    warm = time.time() - t0
    best = float("inf")
    for _ in range(n):
        t0 = time.time()
        out = fn(*args)
        float(jnp.sum(jax.tree_util.tree_leaves(out)[0][..., 0].astype(jnp.float32)))
        best = min(best, time.time() - t0)
    print(f"{name:44s} {best*1e3:9.1f} ms  (warm {warm:.0f}s)")
    return best


class TemporalNoTranspose(nn.Module):
    """Variant B: (B, T, H, W, C) -> (B, T, P, C); attention over T with
    (B, P, heads) as einsum batch dims; no full-tensor transpose."""

    heads: int = HEADS
    dim_head: int = DH
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        b, t, hh, ww, c = x.shape
        inner = self.heads * self.dim_head
        h = GroupNorm32(epsilon=1e-6, name="norm")(x)
        h = h.reshape(b, t, hh * ww, c)
        h = Dense(inner, dtype=self.dtype, name="proj_in")(h)

        ln = lambda name: nn.LayerNorm(
            epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
            name=name)

        def attn(y, name):
            q = Dense(inner, use_bias=False, dtype=self.dtype,
                      name=f"{name}_q")(y)
            k = Dense(inner, use_bias=False, dtype=self.dtype,
                      name=f"{name}_k")(y)
            v = Dense(inner, use_bias=False, dtype=self.dtype,
                      name=f"{name}_v")(y)
            hp = self.heads
            q = q.reshape(b, t, -1, hp, self.dim_head)
            k = k.reshape(b, t, -1, hp, self.dim_head)
            v = v.reshape(b, t, -1, hp, self.dim_head)
            logits = jnp.einsum("btphd,bsphd->bphts", q, k,
                                preferred_element_type=jnp.float32)
            w = jax.nn.softmax(logits * self.dim_head**-0.5, axis=-1)
            o = jnp.einsum("bphts,bsphd->btphd", w.astype(v.dtype), v,
                           preferred_element_type=jnp.float32)
            o = o.astype(self.dtype).reshape(b, t, -1, inner)
            return Dense(inner, dtype=self.dtype, name=f"{name}_out")(o)

        h = h + attn(ln("norm1")(h).astype(self.dtype), "attn1")
        h = h + attn(ln("norm2")(h).astype(self.dtype), "attn2")
        y = ln("norm3")(h).astype(self.dtype)
        proj = Dense(inner * 8, dtype=self.dtype, name="ff_proj")(y)
        a, gate = jnp.split(proj, 2, axis=-1)
        h = h + Dense(inner, dtype=self.dtype, name="ff_out")(
            a * nn.gelu(gate, approximate=False))
        h = Dense(c, zero_init=True, dtype=self.dtype, name="proj_out")(h)
        return x + h.reshape(b, t, hh, ww, c)


def main():
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (B, T, HH, WW, C), jnp.bfloat16) * 0.1

    cur = TemporalTransformer(heads=HEADS, dim_head=DH)
    pc = cur.init(k, x.astype(jnp.float32))
    f_cur = jax.jit(lambda p, x: cur.apply(p, x))
    bench("A: current (transpose to (B*P,T,C))", f_cur, pc, x)

    nt = TemporalNoTranspose()
    pn = nt.init(k, x.astype(jnp.float32))
    f_nt = jax.jit(lambda p, x: nt.apply(p, x))
    bench("B: layout-preserving (B,T,P,C)", f_nt, pn, x)


if __name__ == "__main__":
    main()
