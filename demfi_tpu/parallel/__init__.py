from demfi_tpu.parallel.mesh import make_mesh, shard_batch
from demfi_tpu.parallel.distributed import (
    global_batch_from_local,
    init_distributed,
    make_global_mesh,
)

__all__ = ["make_mesh", "shard_batch", "init_distributed",
           "make_global_mesh", "global_batch_from_local"]
