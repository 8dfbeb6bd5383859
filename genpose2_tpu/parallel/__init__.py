from genpose2_tpu.parallel.mesh import (
    make_mesh,
    replicate,
    shard_batch,
    shard_candidates,
)

__all__ = ["make_mesh", "replicate", "shard_batch", "shard_candidates"]
