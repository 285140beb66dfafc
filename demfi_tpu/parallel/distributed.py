"""Multi-host / multi-slice initialization and DCN-aware mesh layout.

The reference is strictly single-GPU (/root/reference/main.py:157-159);
this module is the TPU-native scaling path beyond one host: N processes
each driving their local chips, joined by ``jax.distributed.initialize``
into one global device set, with the 'data' axis of the mesh laid out so
that inter-slice traffic (gradient all-reduce) rides DCN while everything
inside a slice stays on ICI.

Launch recipe (documented in docs/SCALING.md):

  # per host (TPU pods auto-detect all three args from the metadata server)
  python -m demfi_tpu.main --phase train ... \
      --coordinator_address <host0>:8476 \
      --num_processes <P> --process_id <p>

On CPU (CI / tests) the same wiring works with
``--xla_force_host_platform_device_count=K`` per process and gloo
collectives (tests/test_multihost.py runs a real 2-process train step).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Tuple[int, int]:
    """Join the global JAX process group; returns (process_id, count).

    With no arguments this is a no-op for single-process runs unless the
    environment (TPU pod metadata, SLURM, ...) provides the settings —
    in that case ``jax.distributed.initialize()`` auto-detects them.
    """
    # NOTE: must run before anything that initializes the XLA backend
    # (jax.devices(), device_put, any computation).
    if not jax.distributed.is_initialized() and (coordinator_address
                                                 or num_processes):
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id)
    return jax.process_index(), jax.process_count()


def _slice_index(d) -> int:
    return getattr(d, "slice_index", 0) or 0


def _mesh_device_array(devices, data: int, spatial: int) -> np.ndarray:
    """[data, spatial] device layout (the testable core of
    make_global_mesh; see that docstring for the DCN/ICI rationale)."""
    n = len(devices)
    need = data * spatial
    slices = sorted({_slice_index(d) for d in devices})
    if len(slices) > 1 and need == n:
        per = n // len(slices)
        if (data % len(slices) == 0 and per % spatial == 0
                and per * len(slices) == n):
            # hybrid layout: [n_slices (DCN), per_slice_data, spatial]
            from jax.experimental import mesh_utils
            arr = mesh_utils.create_hybrid_device_mesh(
                (data // len(slices), spatial), (len(slices), 1),
                devices=devices)
            # collapse the DCN axis into 'data' (outermost stride)
            return arr.reshape(data, spatial)

    # single slice / CPU: plain row-major over process-then-local order,
    # which already puts the process boundary on the outer (data) stride
    return np.asarray(devices[:need]).reshape(data, spatial)


def make_global_mesh(data: int = 0, spatial: int = 1):
    """('data', 'spatial') mesh over ALL processes' devices.

    Multi-slice layout: the data axis is ordered so neighbouring mesh
    coordinates within a slice are ICI neighbours and the slice boundary
    (DCN) is crossed only by the outermost stride of the data axis —
    replicated-param DP only all-reduces gradients, which is exactly the
    traffic DCN can absorb. 'spatial' (conv halo exchanges every layer)
    is always kept inside a slice.
    """
    from jax.sharding import Mesh

    devices = jax.devices()
    n = len(devices)
    if data == 0:
        data = max(1, n // spatial)
    need = data * spatial
    if need > n:
        raise ValueError(f"mesh {data}x{spatial} needs {need} devices, "
                         f"have {n}")
    if need == 1:
        return None

    return Mesh(_mesh_device_array(devices, data, spatial),
                ("data", "spatial"))


def global_batch_from_local(mesh, batch, specs=None):
    """Assemble per-process host batches into global jax.Arrays.

    ``specs``: pytree of PartitionSpecs matching ``batch`` (default:
    every leaf sharded P('data') on dim 0). Committed shardings must
    match the train step's in_shardings exactly in multi-process mode,
    so pass the same specs the step was built with.
    Single-process: a plain sharded device_put."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if specs is None:
        specs = jax.tree_util.tree_map(lambda _: P("data"), batch)
    multi = jax.process_count() > 1

    def put(x, spec):
        sh = NamedSharding(mesh, spec)
        if multi:
            return jax.make_array_from_process_local_data(sh, np.asarray(x))
        return jax.device_put(x, sh)

    return jax.tree_util.tree_map(put, batch, specs)
