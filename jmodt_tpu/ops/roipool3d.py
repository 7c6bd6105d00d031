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
    n = pts.shape[1]

    def per_batch(args):
        p, f, boxes = args  # (N, 3), (N, C), (M, 7)
        enlarged = enlarge_box3d(boxes, pool_extra_width)
        mask = points_in_boxes3d(p, enlarged)  # (M, N)
        key = jnp.where(mask, jnp.arange(n, dtype=jnp.int32)[None, :], n)
        neg_top, _ = jax.lax.top_k(-key, sampled_pt_num)
        idx = -neg_top  # (M, K) first-K hit indices ascending, n = miss
        cnt = jnp.sum(mask, axis=1)  # (M,)
        # duplicate-pad: slot k >= cnt reads slot k % cnt
        k = jnp.arange(sampled_pt_num, dtype=jnp.int32)[None, :]
        safe_cnt = jnp.maximum(cnt, 1)[:, None]
        slot = jnp.where(k < safe_cnt, k, k % safe_cnt)
        idx = jnp.take_along_axis(idx, slot, axis=1)
        idx = jnp.where(cnt[:, None] > 0, idx, 0)

        feat = jnp.concatenate([p, f], axis=1)  # (N, 3 + C)
        pooled = feat[idx]  # (M, K, 3 + C)
        empty = (cnt == 0)
        pooled = jnp.where(empty[:, None, None], 0.0, pooled)
        return pooled, empty.astype(jnp.int32)

    # vmap, not lax.map: frames are independent and the body is fully
    # batched, so sequential per-frame iteration would only add latency
    # (at train batch 8 the mask/top_k work is 8x parallel this way)
    return jax.vmap(per_batch)((pts, pts_feature, boxes3d))
