"""Pallas attention kernel: correctness vs the XLA path + dispatch gating."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from geo4d_tpu.nn.attention import dot_product_attention
from geo4d_tpu.ops.flash_attention import flash_attention


def _qkv(b, n, h, d, dtype=jnp.bfloat16):
    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    return tuple(jax.random.normal(k, (b, n, h, d), dtype) for k in ks)


@pytest.mark.parametrize("n", [512, 1024, 2304])
def test_kernel_matches_xla(n):
    q, k, v = _qkv(2, n, 4, 64)
    out = flash_attention(q, k, v)
    if out is None:
        pytest.skip("pallas unsupported on this backend")
    ref = dot_product_attention(q, k, v, use_flash=False)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    assert err < 2e-3


def test_kernel_rejects_unsupported_shapes():
    # head dim not a multiple of 64
    q, k, v = _qkv(1, 512, 4, 48)
    assert flash_attention(q, k, v) is None
    # seq not divisible by 128
    q, k, v = _qkv(1, 520, 4, 64)
    assert flash_attention(q, k, v) is None


def test_dispatch_gating():
    # short sequences use the einsum path even with use_flash=True
    q, k, v = _qkv(1, 16, 4, 64)
    out = dot_product_attention(q, k, v, use_flash=True)
    ref = dot_product_attention(q, k, v, use_flash=False)
    assert np.allclose(np.asarray(out, np.float32), np.asarray(ref, np.float32),
                       atol=2e-3)
