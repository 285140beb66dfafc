"""Device-mesh construction and sharding helpers.

The reference is strictly single-GPU (/root/reference/main.py:157-159; the
torch.nn.parallel import at main.py:10 is unused). The TPU-native scaling
model: a 2-axis mesh ('data', 'spatial').

  - 'data': batch / eval-window data parallelism. The 7.41M-parameter
    model is replicated; the only training collective is the gradient
    all-reduce XLA inserts over ICI.
  - 'spatial': the TPU analogue of the reference's serial tile loop
    (utils.py:1389-1450): big-frame inference shards tiles (or H inside
    the conv stack — XLA SPMD inserts halo exchanges for spatially
    partitioned convolutions automatically).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(data: int = 0, spatial: int = 1,
              devices=None) -> Optional[Mesh]:
    """Build a ('data', 'spatial') mesh. data=0 -> use all devices for
    data. Returns None for the trivial 1x1 mesh on a single device."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == 0:
        data = max(1, n // spatial)
    need = data * spatial
    if need > n:
        raise ValueError(f"mesh {data}x{spatial} needs {need} devices, "
                         f"have {n}")
    if need == 1:
        return None
    arr = np.asarray(devices[:need]).reshape(data, spatial)
    return Mesh(arr, ("data", "spatial"))


def shard_batch(mesh: Optional[Mesh], batch, specs=None):
    """Place a host batch on the mesh (default: dim 0 over 'data';
    ``specs`` = per-leaf PartitionSpecs for anything else).

    Multi-process: ``batch`` is this process's local shard; the returned
    arrays are global (assembled via make_array_from_process_local_data).
    """
    if mesh is None:
        return jax.device_put(batch)
    from demfi_tpu.parallel.distributed import global_batch_from_local
    return global_batch_from_local(mesh, batch, specs)
