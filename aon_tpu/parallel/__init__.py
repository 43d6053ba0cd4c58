from aon_tpu.parallel.mesh import (
    get_mesh,
    replicated_sharding,
    ray_sharding,
    shard_ray_batch,
    stack_step_batches,
    pad_to_multiple,
)

__all__ = [
    "get_mesh",
    "replicated_sharding",
    "ray_sharding",
    "shard_ray_batch",
    "stack_step_batches",
    "pad_to_multiple",
]
