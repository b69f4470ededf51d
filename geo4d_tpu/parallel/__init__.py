from geo4d_tpu.parallel.mesh import (
    ensure_cpu_devices,
    make_mesh,
    replicated,
    shard_batch,
    shard_params_fsdp,
    shard_windows,
)
