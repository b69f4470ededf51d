"""Dispatch gate for the Pallas TPU kernels.

The kernels key off `jax.default_backend() == "tpu"`, which is right for
normal runs but wrong for computations explicitly placed on the virtual
CPU mesh while a TPU backend is also registered (the multichip dryruns and
the CPU-mesh sharding tests): tracing happens with the TPU default backend
but execution lands on CPU devices, where Mosaic can't lower. Those call
sites wrap themselves in `xla_fallback()` so every kernel returns None and
the callers take their XLA paths (which run on any backend).
"""

from __future__ import annotations

import contextlib

import jax

_FORCE_XLA = [False]


@contextlib.contextmanager
def xla_fallback():
    """Within this context all Pallas kernels decline and callers fall
    back to XLA. Use around jit/trace calls that target non-TPU devices
    while a TPU backend is registered (e.g. virtual-CPU-mesh dryruns)."""
    prev = _FORCE_XLA[0]
    _FORCE_XLA[0] = True
    try:
        yield
    finally:
        _FORCE_XLA[0] = prev


def pallas_tpu_available() -> bool:
    """True when it is safe to emit a Mosaic (TPU Pallas) kernel."""
    return not _FORCE_XLA[0] and jax.default_backend() == "tpu"
