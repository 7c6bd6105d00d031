"""RoI-aware point pooling.

TPU rewrite of /root/reference/jmodt/ops/roipool3d (roipool3d_kernel.cu:97-237,
roipool3d_utils.py:8-29).  Semantics reproduced exactly:

  * each RoI is enlarged by `pool_extra_width` (roipool3d_utils.py:20),
  * points inside the rotated box are found with the pt_in_box3d test
    (roipool3d_kernel.cu:14-28, incl. the 10 m coarse rejection),
  * the *first* `sampled_pt_num` hits in point order are taken
    (get_pooled_idx, roipool3d_kernel.cu:139-147),
  * fewer hits are duplicate-padded modulo the hit count (lines 152-159),
  * zero hits set an empty flag and leave the features zero (lines 149-151,
    roipool3d_forward early-out at 180-182).

The first-k selection uses the same key/top-k trick as ball query; everything
is fixed-shape, so the op is jit/vmap-friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from jmodt_tpu.ops.geometry import enlarge_box3d, points_in_boxes3d


@functools.partial(jax.jit, static_argnames=('sampled_pt_num',))
def roipool3d(pts: jnp.ndarray, pts_feature: jnp.ndarray, boxes3d: jnp.ndarray,
              pool_extra_width: float, sampled_pt_num: int = 512):
    """Pool per-RoI point features.

    :param pts: (B, N, 3) rect-camera points
    :param pts_feature: (B, N, C)
    :param boxes3d: (B, M, 7) RoIs [x, y, z, h, w, l, ry]
    :return: (pooled (B, M, sampled_pt_num, 3 + C), empty_flag (B, M) int32)
    """
    b, n = pts.shape[0], pts.shape[1]
    m = boxes3d.shape[1]

    # explicit batched form, NOT vmap/lax.map over frames: lax.map
    # serializes independent frames, and vmap lifts the first-K top_k to a
    # 3-D batched call that hits a pathologically slow TPU path (measured
    # 8.1 ms vs 1.6 ms at the 100x16384 eval shape) — so the in-box test
    # vmaps (elementwise math) while top_k runs on a flat 2-D (B*M, N) view
    enlarged = jax.vmap(enlarge_box3d, in_axes=(0, None))(
        boxes3d, pool_extra_width)
    mask = jax.vmap(points_in_boxes3d)(pts, enlarged)       # (B, M, N)
    key = jnp.where(mask, jnp.arange(n, dtype=jnp.int32)[None, None, :], n)
    neg_top, _ = jax.lax.top_k(-key.reshape(b * m, n), sampled_pt_num)
    idx = (-neg_top).reshape(b, m, sampled_pt_num)  # first-K hits ascending
    cnt = jnp.sum(mask, axis=2)  # (B, M)
    # duplicate-pad: slot k >= cnt reads slot k % cnt
    k = jnp.arange(sampled_pt_num, dtype=jnp.int32)[None, None, :]
    safe_cnt = jnp.maximum(cnt, 1)[:, :, None]
    slot = jnp.where(k < safe_cnt, k, k % safe_cnt)
    idx = jnp.take_along_axis(idx, slot, axis=2)
    idx = jnp.where(cnt[:, :, None] > 0, idx, 0)

    feat = jnp.concatenate([pts, pts_feature], axis=2)  # (B, N, 3 + C)
    pooled = jnp.take_along_axis(
        feat, idx.reshape(b, m * sampled_pt_num, 1),
        axis=1).reshape(b, m, sampled_pt_num, feat.shape[-1])
    empty = (cnt == 0)
    pooled = jnp.where(empty[:, :, None, None], 0.0, pooled)
    return pooled, empty.astype(jnp.int32)
