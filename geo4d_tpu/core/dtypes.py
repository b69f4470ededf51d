"""Dtype policy: bf16 compute on the MXU, f32 where precision matters.

Matching the reference's mixed-precision discipline: GroupNorm runs in f32
(lvdm/basics.py:76-81 GroupNormSpecific casts to float), schedule math is
f32 (ddpm3d.py:186 buffers), while matmuls/convs ride bf16 on the MXU.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    compute: jnp.dtype = jnp.bfloat16  # matmuls/convs (MXU-native)
    norm: jnp.dtype = jnp.float32      # group/layer norms
    param: jnp.dtype = jnp.float32     # master weights
    output: jnp.dtype = jnp.float32    # model outputs / schedule math


DEFAULT = Policy()
FP32 = Policy(compute=jnp.float32)


def cast_floating(tree, dtype):
    import jax

    def _cast(x):
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x

    return jax.tree_util.tree_map(_cast, tree)
