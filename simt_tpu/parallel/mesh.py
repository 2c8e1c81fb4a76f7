"""Device mesh + sharding helpers — the distribution layer the reference never had.

SURVEY.md §2.5: the reference is one-process/one-GPU; here parallelism is first-class via
``jax.sharding`` over a 2-D mesh:

  - ``data``: batch-dim data parallelism. Gradients sync through the ``psum`` XLA inserts
    under pjit; BN batch statistics become *global* (a cross-device mean) — strictly
    better than per-replica stats.
  - ``spatial``: image-height sharding — the sequence/context-parallel analog for CNNs
    (SURVEY.md §5 long-context row). GSPMD partitions every conv spatially and inserts
    halo exchanges (``collective-permute`` over ICI) sized by the receptive field of the
    dilated 3x3 convs automatically; the align-corners upsample matmuls shard over H too.

All collectives ride ICI within a slice; multi-host DCN via ``jax.distributed.initialize``
composes with the same mesh (see ``initialize_multihost``).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
SPATIAL_AXIS = "spatial"


def make_mesh(
    data: Optional[int] = None,
    spatial: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, spatial) mesh. ``data`` defaults to n_devices // spatial."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data is None:
        if n % spatial:
            raise ValueError(f"{n} devices not divisible by spatial={spatial}")
        data = n // spatial
    if data * spatial > n:
        raise ValueError(f"mesh {data}x{spatial} needs {data * spatial} devices, have {n}")
    grid = np.asarray(devices[: data * spatial]).reshape(data, spatial)
    return Mesh(grid, (DATA_AXIS, SPATIAL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batch dim over ``data``, height (dim 1) over ``spatial`` — for NHWC images and
    NHW label maps alike (rank-adaptive via PartitionSpec prefix semantics)."""
    return NamedSharding(mesh, P(DATA_AXIS, SPATIAL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(x, sharding: NamedSharding):
    """Place host data with ``sharding``, across processes if needed.

    Single-process (fully-addressable) shardings use plain ``jax.device_put``. On a
    multi-process mesh the sharding contains non-addressable devices, where
    ``device_put`` of host numpy raises — there the global array is assembled from
    this process's local block via ``jax.make_array_from_process_local_data`` (each
    process feeds the rows its devices own; replicated shardings feed the full
    array from every process). This is the multi-host input/state placement path
    the reference never had (SURVEY.md §2.5)."""
    if sharding.is_fully_addressable:
        return jax.device_put(x, sharding)
    return jax.make_array_from_process_local_data(sharding, np.asarray(x))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the mesh: arrays -> (data, spatial) sharded. On a
    multi-process mesh each process passes its process-local block of the global
    batch (see ``put_global``)."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 2:
            out[k] = put_global(v, sh)
        else:
            out[k] = v
    return out


def replicate_state(state, mesh: Mesh):
    """Replicate a train state pytree across the mesh (params fit on one chip here;
    a ``model`` TP axis is unnecessary at DeepLab scale — SURVEY.md §2.5). Works on
    multi-process meshes: every process holds the full state, so each feeds the
    whole array (``put_global`` replicated placement)."""
    sh = replicated(mesh)
    return jax.tree.map(lambda a: put_global(a, sh), state)


def initialize_multihost(coordinator: str, num_processes: int, process_id: int) -> None:
    """Multi-host (DCN) bring-up; compose the same mesh over jax.devices() afterwards."""
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
