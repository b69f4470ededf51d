"""Device mesh + sharding layouts.

Replaces the reference's NCCL/DDP scaffolding (utils/utils.py:70-77
`init_process_group('nccl')`, lvdm/common.py:8-14 `dist.all_gather`,
rank-sharded BatchedRandomSampler lvdm/data/batched_sampler.py:21-69) with
single-controller JAX: one `jax.sharding.Mesh`, `NamedSharding` layouts, and
XLA-inserted collectives over ICI.

Parallel axes used by the framework:
  data     — training data parallel AND inference *window* parallel: the
             sliding windows of a long video are embarrassingly parallel
             (infer_geo4d.py:412-418 processes them sequentially on one
             GPU; here they shard across chips as one batched window axis).
The UNet (~1.4B params, bf16) fits one chip, so params stay replicated;
optimizer-state sharding (ZeRO-like) falls out of `shard_params_fsdp` when
memory demands it.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first n available devices (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension."""
    return NamedSharding(mesh, P(axis))


def shard_windows(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard a stacked-window tensor (W, T, H, W, C) over windows."""
    return NamedSharding(mesh, P(axis))


def shard_params_fsdp(mesh: Mesh, params, axis: str = "data", min_size: int = 2**18):
    """FSDP-style layout: shard each large parameter's biggest divisible
    axis across `axis`; small params stay replicated. Returns shardings
    pytree suitable for jit in_shardings."""
    n = mesh.shape[axis]

    def spec_for(p):
        if p.ndim == 0 or p.size < min_size:
            return NamedSharding(mesh, P())
        # choose the largest dim divisible by the axis size
        dims = sorted(range(p.ndim), key=lambda d: -p.shape[d])
        for d in dims:
            if p.shape[d] % n == 0:
                parts = [None] * p.ndim
                parts[d] = axis
                return NamedSharding(mesh, P(*parts))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_for, params)
