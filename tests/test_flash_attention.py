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


def test_small_seq_block_diagonal_exact():
    """The block-diagonal tiny-seq path (ops/small_seq_attention.py)
    matches the per-pixel einsum attention to one bf16 output ulp: the
    masked logits exp to exactly zero, so cross-pixel weights vanish —
    only the final rounding can differ (and measured 0.00e+00 on TPU at
    the UNet shapes, scripts/exp_tiny_attn.py)."""
    from geo4d_tpu.ops.small_seq_attention import small_seq_attention

    for b, n, h, d, px in [(24, 16, 5, 64, 8), (7, 16, 2, 32, 8),
                           (5, 12, 3, 64, 4), (3, 32, 1, 16, 4)]:
        q, k, v = _qkv(b, n, h, d)
        out = small_seq_attention(q, k, v, px)
        ref = dot_product_attention(q, k, v, use_flash=False)
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=4.1e-3, rtol=1e-2,
            err_msg=f"b={b} n={n} h={h} d={d} px={px}",
        )


def test_small_seq_dispatch():
    """dot_product_attention routes tiny self-attention through the
    block-diagonal path; cross-attention (k seq != q seq) does not."""
    q, k, v = _qkv(6, 16, 4, 64)
    out = dot_product_attention(q, k, v, use_flash=True)
    ref = dot_product_attention(q, k, v, use_flash=False)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-3)
    # cross-attn shape (k longer than q) falls through to the einsum path
    kc, vc = _qkv(6, 24, 4, 64)[0], _qkv(6, 24, 4, 64)[1]
    out2 = dot_product_attention(q, kc, vc, use_flash=True)
    ref2 = dot_product_attention(q, kc, vc, use_flash=False)
    np.testing.assert_allclose(np.asarray(out2, np.float32),
                               np.asarray(ref2, np.float32), atol=2e-3)
