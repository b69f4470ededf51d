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
    devices: Optional[Sequence[jax.Device]] = None,
    platform: Optional[str] = None,
) -> Mesh:
    """Build a mesh over the first n available devices (default: all).

    `devices` pins an explicit device list (e.g. the virtual CPU devices of
    a multi-chip dryrun); `platform` selects a backend by name ("cpu",
    "tpu"). Asking for more devices than exist is an error — a silently
    smaller mesh would fake multi-chip semantics (the round-1 dryrun bug).
    """
    if devices is None:
        devices = jax.devices(platform) if platform else jax.devices()
    devices = list(devices)
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(
                f"requested a {n_devices}-device mesh but only "
                f"{len(devices)} device(s) are available "
                f"({[d.platform for d in devices[:4]]}…); create virtual "
                "CPU devices (jax_num_cpu_devices / "
                "--xla_force_host_platform_device_count) or pass devices="
            )
        devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names)


def ensure_cpu_devices(n: int) -> list:
    """Guarantee >= n virtual XLA:CPU devices exist, creating them if the
    backends are not yet initialized (jax_num_cpu_devices) or force-clearing
    the backend registry if they are (driver hosts initialize the TPU plugin
    first — see MULTICHIP_r01). Returns the first n CPU devices.

    TPU-native replacement for the reference's NCCL world bootstrap
    (utils/utils.py:70-77): the dryrun validates multi-chip SPMD semantics
    on virtual CPU devices, identical XLA partitioning to a real slice.
    """
    import jax._src.xla_bridge as xb

    def cpus():
        try:
            return jax.devices("cpu")
        except RuntimeError:
            return []

    if len(cpus()) < n:
        try:
            jax.config.update("jax_num_cpu_devices", n)
        except RuntimeError:
            # backends already initialized — clear both the backend registry
            # and get_backend's memo cache, then re-init with the flag
            xb._clear_backends()
            xb.get_backend.cache_clear()
            jax.config.update("jax_num_cpu_devices", n)
    got = cpus()
    if len(got) < n:
        raise RuntimeError(
            f"could not create {n} virtual CPU devices (have {len(got)})"
        )
    return got[:n]


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
