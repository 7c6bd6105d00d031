"""Greedy NMS for rotated / axis-aligned BEV boxes, jit-native.

TPU rewrite of the CUDA bitmask NMS (/root/reference/jmodt/ops/iou3d/src/
iou3d_kernel.cu:250-387 plus the sequential host scan in iou3d.cpp:100-161 and
the sort-by-score wrappers in iou3d_utils.py:444-475).

Design change for XLA: instead of an N x N suppression bitmask followed by a
host-side scan producing a variable-length keep list, we run `max_keep` rounds
of "pick the best unsuppressed box, suppress its overlaps".  Each round costs
one O(N) IoU row (computed on the fly — the N^2 matrix is never materialized)
so total work is O(max_keep * N), and the output is a fixed-size index buffer
plus a validity mask — the shape never depends on the data, so one compiled
program serves every frame.

Greedy NMS visits kept boxes in descending-score order, which is exactly the
order this loop discovers them in, so the first `max_keep` entries equal the
reference's `keep[:max_keep]` (the callers always truncate:
proposal_layer.py:114, tools/eval.py:190).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jmodt_tpu.ops.rotated_iou import iou_bev_one_to_many, iou_normal_one_to_many


@functools.partial(jax.jit, static_argnames=('max_keep', 'rotated'))
def nms_bev(boxes: jnp.ndarray,
            scores: jnp.ndarray,
            thresh: float,
            max_keep: int,
            valid: jnp.ndarray | None = None,
            rotated: bool = True):
    """Greedy BEV NMS with a fixed-size keep buffer.

    :param boxes: (N, 5) [x1, y1, x2, y2, ry]
    :param scores: (N,) raw scores (any monotone order key)
    :param thresh: IoU suppression threshold (strictly-greater suppresses,
        matching `> nms_overlap_thresh` at iou3d_kernel.cu:285,341)
    :param max_keep: number of NMS rounds / size of the keep buffer
    :param valid: optional (N,) bool mask of live candidates (padding = False)
    :param rotated: True -> exact rotated IoU (nms_gpu); False -> axis-aligned
        (nms_normal_gpu)
    :return: (keep_idx (max_keep,) int32, keep_mask (max_keep,) bool) — indices
        into `boxes` in descending-score order; slots past the number of
        survivors have keep_mask False (and index 0).
    """
    n = boxes.shape[0]
    if valid is None:
        valid = jnp.ones((n,), dtype=bool)
    iou_row = iou_bev_one_to_many if rotated else iou_normal_one_to_many

    neg_inf = jnp.asarray(-jnp.inf, scores.dtype)

    def body(carry, _):
        alive, = carry
        masked = jnp.where(alive, scores, neg_inf)
        best = jnp.argmax(masked)
        best_ok = alive[best]
        row = iou_row(boxes[best], boxes)
        # suppress overlaps of the kept box; always retire the kept box itself
        new_alive = alive & (row <= thresh)
        new_alive = new_alive.at[best].set(False)
        alive = jnp.where(best_ok, new_alive, alive)
        return (alive,), (best.astype(jnp.int32), best_ok)

    (_,), (keep_idx, keep_mask) = jax.lax.scan(
        body, (valid,), None, length=max_keep)
    keep_idx = jnp.where(keep_mask, keep_idx, 0)
    return keep_idx, keep_mask
