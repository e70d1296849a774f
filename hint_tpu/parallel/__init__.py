from hint_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    mesh_size,
    pad_rows,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "mesh_size",
    "pad_rows",
    "shard_batch",
]
