"""Pallas TPU fused GroupNorm (+ optional SiLU) for channels-last tensors.

The UNet/VAE normalization pattern is `silu(group_norm(x))` before every
conv. The pure-XLA implementation (nn/basics.py::_FusedGroupNorm) already
reduced it to per-channel moment reduces + one affine pass, but the device
trace of the bench UNet step still attributed ~144 ms/step to the stats
reduces at only ~310 GB/s (convert+reduce fusions don't stream well) plus
a share of the ~88 ms elementwise-fusion bucket for the normalize+silu.

This kernel does the whole thing in ONE read + ONE write of the activation
at streaming bandwidth:

  * x is viewed as (N, S, C): stats are per (sample n, group) over S and
    the group's C/G channels — exactly nn.GroupNorm semantics.
  * small rows (S*C bf16 <= ~2 MB — every UNet norm): grid over n, each
    step loads (S, C) into VMEM, computes both f32 moments, combines
    groups via a tiny (C, G) 0/1 segment matmul (no lane-misaligned
    C/G-wide slicing), applies y = x*a + b (+ silu) and writes out.
  * large rows (VAE full-resolution decoder: S = H*W up to 147k): a
    two-pass tiled variant — pass 1 streams (St, C) tiles emitting
    per-tile channel moments, the (N, T, 2, C) combine + group fold runs
    as ordinary (tiny) XLA ops, pass 2 streams the tiles again applying
    the per-(n, channel) affine (+ silu). 2 reads + 1 write total, all
    at streaming bandwidth.

The reference runs this as eager torch GroupNorm in f32
(lvdm/basics.py:76-81 GroupNormSpecific); this is the TPU redesign.
Returns None for unsupported shapes/backends — callers fall back to the
XLA path (which is also the CPU test path).
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

# max bf16 bytes for a (S, C) row block resident in VMEM (input + output +
# f32 temporaries + double buffering stay well under the ~16 MB window)
_SINGLE_MAX_BYTES = 2 * 2 ** 20


def _seg_matrices(c: int, groups: int):
    """0/1 segment matrix (C, G) mapping channels to their group, and its
    transpose — built from iota so no transpose op is needed in-kernel."""
    cg = c // groups
    row = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    seg = (row // cg == col).astype(jnp.float32)
    rowt = jax.lax.broadcasted_iota(jnp.int32, (groups, c), 0)
    colt = jax.lax.broadcasted_iota(jnp.int32, (groups, c), 1)
    segt = (colt // cg == rowt).astype(jnp.float32)
    return seg, segt


def _gn_kernel(x_ref, g_ref, b_ref, o_ref, *, groups: int, eps: float,
               silu: bool, inv_count: float):
    x = x_ref[0]                                   # (S, C)
    xf = x.astype(jnp.float32)
    s1 = jnp.sum(xf, axis=0, keepdims=True)        # (1, C)
    s2 = jnp.sum(xf * xf, axis=0, keepdims=True)
    c = x.shape[1]
    seg, segt = _seg_matrices(c, groups)
    dot = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    mean_g = dot(s1, seg) * inv_count              # (1, G)
    var_g = jnp.maximum(dot(s2, seg) * inv_count - mean_g * mean_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)
    rstd_c = dot(rstd_g, segt)                     # (1, C)
    shift_c = dot(mean_g * rstd_g, segt)
    a = rstd_c * g_ref[...]
    b = b_ref[...] - shift_c * g_ref[...]
    y = xf * a + b
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps", "silu"))
def _gn_single(x, gamma, beta, groups: int, eps: float, silu: bool):
    n, s, c = x.shape
    inv_count = 1.0 / (s * (c // groups))
    row_spec = pl.BlockSpec((1, s, c), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    par_spec = pl.BlockSpec((1, c), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_gn_kernel, groups=groups, eps=eps, silu=silu,
                          inv_count=inv_count),
        out_shape=jax.ShapeDtypeStruct((n, s, c), x.dtype),
        grid=(n,),
        in_specs=[row_spec, par_spec, par_spec],
        out_specs=row_spec,
        cost_estimate=pl.CostEstimate(
            flops=10 * n * s * c,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=(n * s * c) if silu else 0,
        ),
    )(x, gamma, beta)


def _gn_stats_kernel(x_ref, o1_ref, o2_ref):
    xf = x_ref[0, 0].astype(jnp.float32)           # (St, C)
    o1_ref[0] = jnp.sum(xf, axis=0, keepdims=True)
    o2_ref[0] = jnp.sum(xf * xf, axis=0, keepdims=True)


def _gn_apply_kernel(x_ref, a_ref, b_ref, o_ref, *, silu: bool):
    y = x_ref[0, 0].astype(jnp.float32) * a_ref[...] + b_ref[...]
    if silu:
        y = y * jax.nn.sigmoid(y)
    o_ref[0, 0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("groups", "eps", "silu", "s_tile"))
def _gn_tiled(x, gamma, beta, groups: int, eps: float, silu: bool,
              s_tile: int):
    n, s, c = x.shape
    t = s // s_tile
    x4 = x.reshape(n, t, s_tile, c)
    tile_spec = pl.BlockSpec((1, 1, s_tile, c), lambda i, j: (i, j, 0, 0),
                             memory_space=pltpu.VMEM)
    mom_spec = pl.BlockSpec((1, 1, c), lambda i, j: (i, j, 0),
                            memory_space=pltpu.VMEM)
    s1, s2 = pl.pallas_call(
        _gn_stats_kernel,
        out_shape=(jax.ShapeDtypeStruct((n, t, c), jnp.float32),
                   jax.ShapeDtypeStruct((n, t, c), jnp.float32)),
        grid=(n, t),
        in_specs=[tile_spec],
        out_specs=(mom_spec, mom_spec),
        cost_estimate=pl.CostEstimate(
            flops=3 * n * s * c,
            bytes_accessed=x.size * x.dtype.itemsize,
            transcendentals=0,
        ),
    )(x4)

    # group combine on the tiny (N, C) moments — plain XLA
    cg = c // groups
    inv_count = 1.0 / (s * cg)
    m_g = jnp.sum(s1, axis=1).reshape(n, groups, cg).sum(-1) * inv_count
    m2_g = jnp.sum(s2, axis=1).reshape(n, groups, cg).sum(-1) * inv_count
    var_g = jnp.maximum(m2_g - m_g * m_g, 0.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)                     # (N, G)
    rstd_c = jnp.repeat(rstd_g, cg, axis=-1)                # (N, C)
    shift_c = jnp.repeat(m_g * rstd_g, cg, axis=-1)
    a = rstd_c * gamma                                      # (N, C) f32
    b = beta - shift_c * gamma

    ab_spec = pl.BlockSpec((1, c), lambda i, j: (i, 0),
                           memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_gn_apply_kernel, silu=silu),
        out_shape=jax.ShapeDtypeStruct((n, t, s_tile, c), x.dtype),
        grid=(n, t),
        in_specs=[tile_spec, ab_spec, ab_spec],
        out_specs=tile_spec,
        cost_estimate=pl.CostEstimate(
            flops=(4 if silu else 2) * n * s * c,
            bytes_accessed=2 * x.size * x.dtype.itemsize,
            transcendentals=(n * s * c) if silu else 0,
        ),
    )(x4, a, b)
    return out.reshape(n, s, c)


def _pick_s_tile(s: int, c: int, itemsize: int) -> int:
    budget = _SINGLE_MAX_BYTES // (c * itemsize)
    best = 0
    for st in range(16, s + 1, 16):
        if s % st == 0 and st <= budget:
            best = st
    return best


def fused_group_norm(x: jax.Array, gamma: jax.Array, beta: jax.Array, *,
                     groups: int, eps: float,
                     silu: bool = False) -> Optional[jax.Array]:
    """GroupNorm over the last axis of channels-last `x` (+ optional SiLU).

    Stats are per (x.shape[0], group) over all middle axes — the same
    semantics as flax nn.GroupNorm / the XLA fallback in nn/basics.py.
    gamma/beta: (C,) float32. Returns x.dtype, or None when the kernel
    doesn't support the shape/backend (caller falls back to XLA).
    """
    from geo4d_tpu.ops.dispatch import pallas_tpu_available

    if not _PALLAS_OK or not pallas_tpu_available():
        return None
    c = x.shape[-1]
    # c need not be lane-aligned (Mosaic masks the last 128-lane tile —
    # the UNet's 320/640 channel widths are 2.5x/5x lanes), just sane:
    if x.ndim < 2 or c % groups != 0 or c % 8 != 0 or c < 128:
        return None
    n = x.shape[0]
    s = 1
    for dim in x.shape[1:-1]:
        s *= dim
    if s % 16 != 0:
        return None
    g2 = gamma.astype(jnp.float32).reshape(1, c)
    b2 = beta.astype(jnp.float32).reshape(1, c)
    x3 = x.reshape(n, s, c)
    try:
        if s * c * x.dtype.itemsize <= _SINGLE_MAX_BYTES:
            out = _gn_single(x3, g2, b2, groups, float(eps), silu)
        else:
            st = _pick_s_tile(s, c, x.dtype.itemsize)
            if st == 0:
                return None
            out = _gn_tiled(x3, jnp.broadcast_to(g2, (n, c)),
                            jnp.broadcast_to(b2, (n, c)),
                            groups, float(eps), silu, st)
    except Exception:
        return None
    return out.reshape(x.shape)
