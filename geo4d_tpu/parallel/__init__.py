from geo4d_tpu.parallel.mesh import (
    make_mesh,
    replicated,
    shard_batch,
    shard_windows,
)
