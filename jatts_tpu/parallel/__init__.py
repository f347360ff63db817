"""Device mesh / sharding layer (replaces the reference's DDP/NCCL stack)."""

from jatts_tpu.parallel.mesh import (
    batch_sharding,
    get_mesh,
    replicated,
    shard_batch,
)
