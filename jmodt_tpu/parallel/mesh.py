"""Data-parallel device mesh.

The reference's only multi-device mode is single-process
`torch.nn.DataParallel` (reference tools/train.py:86-87), which scatters the
batch and gathers outputs through host staging.  The TPU-native equivalent is
a 1-D `jax.sharding.Mesh` over a `data` axis: the batch is sharded across
devices, parameters are replicated, and XLA inserts the gradient all-reduce
over ICI inside the single compiled train step — no host round-trips, no
explicit collectives in user code (SURVEY.md §2.3).

Multi-host (DCN) data parallelism works through the same API: initialize
`jax.distributed` before calling `make_mesh()` and the mesh spans all
processes' devices.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'


def make_mesh(devices: Optional[Sequence[Any]] = None,
              axis: str = DATA_AXIS) -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis,))


def data_parallel_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, scalars)."""
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Place every array in `batch` with its leading dim sharded over `axis`.

    Leading dims must be divisible by the mesh size; the data pipeline pads
    batches to a multiple of the device count (fixed shapes are already the
    design rule, SURVEY.md §7).
    """
    sharding = data_parallel_sharding(mesh, axis)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch)
