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


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the mesh: arrays -> (data, spatial) sharded."""
    sh = batch_sharding(mesh)
    out = {}
    for k, v in batch.items():
        if hasattr(v, "ndim") and v.ndim >= 2:
            out[k] = jax.device_put(v, sh)
        else:
            out[k] = v
    return out


def replicate_state(state, mesh: Mesh):
    """Replicate a train state pytree across the mesh (params fit on one chip here;
    a ``model`` TP axis is unnecessary at DeepLab scale — SURVEY.md §2.5)."""
    sh = replicated(mesh)
    return jax.tree.map(lambda a: jax.device_put(a, sh), state)


def initialize_multihost(coordinator: str, num_processes: int, process_id: int) -> None:
    """Multi-host (DCN) bring-up; compose the same mesh over jax.devices() afterwards."""
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
