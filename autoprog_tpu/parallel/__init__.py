from autoprog_tpu.parallel.mesh import (  # noqa: F401
    DATA_AXIS,
    make_mesh,
    shard_batch,
    replicate,
    batch_sharding,
    replicated_sharding,
)
