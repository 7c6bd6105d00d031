"""Device meshes: data-parallel and data x points.

The reference's only multi-device mode is single-process
`torch.nn.DataParallel` (reference tools/train.py:86-87), which scatters the
batch and gathers outputs through host staging.  The TPU-native equivalents:

  * 1-D `data` mesh: the batch is sharded across devices, parameters are
    replicated, and XLA inserts the gradient all-reduce over ICI inside the
    single compiled train step — no host round-trips, no explicit
    collectives in user code (SURVEY.md §2.3).
  * 2-D `(data, points)` mesh: within each data shard, the POINT dimension
    of the cloud (and the image width for the CNN branch) is additionally
    sharded over the `points` axis — the sequence-parallel analog for point
    clouds.  Only the INPUTS are annotated (`batch_sharding`); GSPMD
    propagates the point sharding through the pointwise MLPs and inserts
    the collectives (all-gathers around FPS/ball-query gathers and top-k,
    halo exchanges for the strided convs) on its own.  This scales
    per-frame activation memory (the 16384-point levels dominate) and
    keeps batch size per chip constant when dp alone runs out of batch.

Multi-host (DCN) data parallelism works through the same API: initialize
`jax.distributed` before calling `make_mesh()` and the mesh spans all
processes' devices.  Lay the `points` axis along ICI (the inner mesh dim)
— its collectives are per-layer; `data` only all-reduces grads once.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = 'data'
POINTS_AXIS = 'points'

# batch fields with a point (or image-width) dimension to split over the
# `points` axis, and which dim it is
_POINT_DIMS = {
    'pts_input': 1,      # (B, N, 3+C)
    'pts_xy': 1,         # (B, N, 2)
    'rpn_cls_label': 1,  # (B, N)
    'rpn_reg_label': 1,  # (B, N, 7)
    'img': 2,            # (B, H, W, 3) -> width
}


def make_mesh(devices: Optional[Sequence[Any]] = None,
              axis: str = DATA_AXIS) -> Mesh:
    """A 1-D mesh over all (or the given) devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    return Mesh(devices, (axis,))


def make_mesh_2d(devices: Optional[Sequence[Any]] = None,
                 sp: int = 2, dp: Optional[int] = None) -> Mesh:
    """A (data, points) mesh: dp x sp devices (dp inferred when omitted)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if dp is None:
        assert n % sp == 0, f'{n} devices not divisible by sp={sp}'
        dp = n // sp
    assert dp * sp == n, f'dp*sp = {dp}*{sp} != {n} devices'
    return Mesh(devices.reshape(dp, sp), (DATA_AXIS, POINTS_AXIS))


def data_parallel_sharding(mesh: Mesh, axis: str = DATA_AXIS) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated (parameters, scalars)."""
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, key: Optional[str] = None,
                   axis: str = DATA_AXIS) -> NamedSharding:
    """Sharding for one batch field: batch dim over `axis` (default
    `data`), plus — on a 2-D mesh — the field's point/width dim over
    `points`."""
    if POINTS_AXIS not in mesh.axis_names or key not in _POINT_DIMS:
        return NamedSharding(mesh, P(axis))
    dim = _POINT_DIMS[key]
    spec = [axis] + [None] * (dim - 1) + [POINTS_AXIS]
    return NamedSharding(mesh, P(*spec))


def _put(v: Any, sharding: NamedSharding) -> Any:
    """device_put in-process; in a multi-process (multi-host) run the
    local array is this process's SHARD of the global batch, assembled via
    make_array_from_process_local_data (device_put cannot target other
    hosts' devices)."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(v))
    return jax.device_put(v, sharding)


def put_replicated(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (parameters, optimizer state) onto every device
    of the mesh — including across processes, where each process supplies
    an identical host copy (e.g. same-seed init or a loaded checkpoint)."""
    repl = replicated_sharding(mesh)
    if jax.process_count() <= 1:
        return jax.device_put(tree, repl)
    return jax.tree_util.tree_map(
        lambda x: jax.make_array_from_process_local_data(
            repl, np.asarray(x)), tree)


def shard_batch(batch: Any, mesh: Mesh, axis: str = DATA_AXIS) -> Any:
    """Place every array in `batch` on the mesh: leading dim over `axis`,
    and (2-D mesh, known point fields) the point dim over `points`.

    Sharded dims must be divisible by their mesh-axis size; the data
    pipeline pads batches to a multiple of the device count (fixed shapes
    are already the design rule, SURVEY.md §7).  In a multi-process run
    each process passes its LOCAL batch rows; the global batch is their
    concatenation along the data axis.
    """
    if isinstance(batch, dict):
        return {k: _put(v, batch_sharding(mesh, k, axis))
                for k, v in batch.items()}
    sharding = data_parallel_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: _put(x, sharding), batch)
