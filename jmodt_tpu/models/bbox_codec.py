"""Bin-based 3D bounding box decoding.

TPU rewrite of /root/reference/jmodt/utils/bbox_transform.py:27-260
(`decode_bbox_target`).  The regression vector layout (PointRCNN-style,
arXiv:1812.04244) is, per row:

  [x_bin (K) | z_bin (K) | x_res (K) | z_res (K) | y_offset (1)
   | ry_bin (H) | ry_res (H) | size_res (3)]

with K = 2 * loc_scope / loc_bin_size and H = num_head_bin.  Two decode modes
are supported, selected statically:

  * avg_by_bin=False: hard argmax bin + gathered residual
    (bbox_transform.py:195-217, 275-289)
  * avg_by_bin=True (default in every reference mode, config.py:197,207,216):
    softmax-expectation over bins (bbox_transform.py:218-251)

and similarly ry_with_bin for the heading (bbox_transform.py:290-385).  All
branches are static Python conditionals — under jit each configuration is its
own fully-fused program.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from jmodt_tpu.ops.geometry import rotate_points_along_y


def decode_bbox_target(roi_box3d: jnp.ndarray,
                       pred_reg: jnp.ndarray,
                       anchor_size: jnp.ndarray,
                       loc_scope: float,
                       loc_bin_size: float,
                       num_head_bin: int,
                       get_xz_fine: bool = True,
                       get_y_by_bin: bool = False,
                       loc_y_scope: float = 0.5,
                       loc_y_bin_size: float = 0.25,
                       get_ry_fine: bool = False,
                       avg_by_bin: bool = True,
                       ry_with_bin: bool = False) -> jnp.ndarray:
    """Decode bin regressions into boxes (reference bbox_transform.py:171-404).

    :param roi_box3d: (N, 3) anchor points or (N, 7) RoI boxes; a 7-dim RoI
        adds the canonical->global un-rotation (bbox_transform.py:398-402).
    :param pred_reg: (N, C) regression output
    :param anchor_size: (3,) mean (h, w, l)
    :return: (N, 7) [x, y, z, h, w, l, ry]
    """
    per_loc_bin_num = int(loc_scope / loc_bin_size) * 2
    loc_y_bin_num = int(loc_y_scope / loc_y_bin_size) * 2

    x_bin_l, x_bin_r = 0, per_loc_bin_num
    z_bin_l, z_bin_r = per_loc_bin_num, per_loc_bin_num * 2
    start_offset = z_bin_r

    if not avg_by_bin:
        x_bin = jnp.argmax(pred_reg[:, x_bin_l:x_bin_r], axis=1)
        z_bin = jnp.argmax(pred_reg[:, z_bin_l:z_bin_r], axis=1)
        pos_x = x_bin.astype(pred_reg.dtype) * loc_bin_size + loc_bin_size / 2 - loc_scope
        pos_z = z_bin.astype(pred_reg.dtype) * loc_bin_size + loc_bin_size / 2 - loc_scope
        if get_xz_fine:
            x_res_l, x_res_r = per_loc_bin_num * 2, per_loc_bin_num * 3
            z_res_l, z_res_r = per_loc_bin_num * 3, per_loc_bin_num * 4
            start_offset = z_res_r
            x_res = jnp.take_along_axis(pred_reg[:, x_res_l:x_res_r],
                                        x_bin[:, None], axis=1)[:, 0] * loc_bin_size
            z_res = jnp.take_along_axis(pred_reg[:, z_res_l:z_res_r],
                                        z_bin[:, None], axis=1)[:, 0] * loc_bin_size
            pos_x = pos_x + x_res
            pos_z = pos_z + z_res
    else:
        assert get_xz_fine, 'avg_by_bin decode requires fine xz residuals'
        x_res_l, x_res_r = per_loc_bin_num * 2, per_loc_bin_num * 3
        z_res_l, z_res_r = per_loc_bin_num * 3, per_loc_bin_num * 4
        start_offset = z_res_r
        pred_x_bin = jax.nn.softmax(pred_reg[:, x_bin_l:x_bin_r], axis=1)
        pred_z_bin = jax.nn.softmax(pred_reg[:, z_bin_l:z_bin_r], axis=1)
        bin_center = (jnp.arange(per_loc_bin_num, dtype=pred_reg.dtype)
                      * loc_bin_size + loc_bin_size / 2 - loc_scope)
        pred_x_abs = bin_center[None, :] + pred_reg[:, x_res_l:x_res_r] * loc_bin_size
        pred_z_abs = bin_center[None, :] + pred_reg[:, z_res_l:z_res_r] * loc_bin_size
        pos_x = jnp.sum(pred_x_abs * pred_x_bin, axis=1)
        pos_z = jnp.sum(pred_z_abs * pred_z_bin, axis=1)

    # y localization (bbox_transform.py:253-268)
    if get_y_by_bin:
        y_bin_l, y_bin_r = start_offset, start_offset + loc_y_bin_num
        y_res_l, y_res_r = y_bin_r, y_bin_r + loc_y_bin_num
        start_offset = y_res_r
        y_bin = jnp.argmax(pred_reg[:, y_bin_l:y_bin_r], axis=1)
        y_res = jnp.take_along_axis(pred_reg[:, y_res_l:y_res_r],
                                    y_bin[:, None], axis=1)[:, 0] * loc_y_bin_size
        pos_y = (y_bin.astype(pred_reg.dtype) * loc_y_bin_size + loc_y_bin_size / 2
                 - loc_y_scope + y_res) + roi_box3d[:, 1]
    else:
        y_offset_l = start_offset
        start_offset = y_offset_l + 1
        pos_y = roi_box3d[:, 1] + pred_reg[:, y_offset_l]

    # heading (bbox_transform.py:270-385)
    ry_bin_l, ry_bin_r = start_offset, start_offset + num_head_bin
    ry_res_l, ry_res_r = ry_bin_r, ry_bin_r + num_head_bin

    if not ry_with_bin:
        ry_bin = jnp.argmax(pred_reg[:, ry_bin_l:ry_bin_r], axis=1)
        ry_res_norm = jnp.take_along_axis(pred_reg[:, ry_res_l:ry_res_r],
                                          ry_bin[:, None], axis=1)[:, 0]
        if get_ry_fine:
            angle_per_class = (math.pi / 2) / num_head_bin
            ry_res = ry_res_norm * (angle_per_class / 2)
            ry = (ry_bin.astype(pred_reg.dtype) * angle_per_class
                  + angle_per_class / 2) + ry_res - math.pi / 4
        else:
            angle_per_class = (2 * math.pi) / num_head_bin
            ry_res = ry_res_norm * (angle_per_class / 2)
            ry = (ry_bin.astype(pred_reg.dtype) * angle_per_class + ry_res) % (2 * math.pi)
            ry = jnp.where(ry > math.pi, ry - 2 * math.pi, ry)
    else:
        # soft two-sided decode (bbox_transform.py:292-385, the "way2" path)
        ry_bin_p = jax.nn.softmax(pred_reg[:, ry_bin_l:ry_bin_r], axis=1)
        ry_res_norm = pred_reg[:, ry_res_l:ry_res_r]
        bin_ind = jnp.arange(num_head_bin, dtype=pred_reg.dtype)
        if get_ry_fine:
            angle_per_class = (math.pi / 2) / num_head_bin
            ry_res = ry_res_norm * (angle_per_class / 2)
            ry_all = (bin_ind[None, :] * angle_per_class + angle_per_class / 2
                      ) + ry_res - math.pi / 4
            right = ry_all >= 0  # [0, pi/4] side
            p_r = jnp.sum(jnp.where(right, ry_bin_p, 0.0), axis=1, keepdims=True) + 1e-7
            p_l = jnp.sum(jnp.where(~right, ry_bin_p, 0.0), axis=1, keepdims=True) + 1e-7
            ry_r = jnp.sum(jnp.where(right, ry_all * ry_bin_p, 0.0), axis=1) / p_r[:, 0]
            ry_l = jnp.sum(jnp.where(~right, ry_all * ry_bin_p, 0.0), axis=1) / p_l[:, 0]
            ry = jnp.where(p_r[:, 0] >= p_l[:, 0], ry_r, ry_l)
        else:
            angle_per_class = (2 * math.pi) / num_head_bin
            ry_res = ry_res_norm * (angle_per_class / 2)
            ry_all = (bin_ind[None, :] * angle_per_class + ry_res) % (2 * math.pi)
            right = ry_all <= math.pi  # [0, pi] side
            p_r = jnp.sum(jnp.where(right, ry_bin_p, 0.0), axis=1, keepdims=True) + 1e-7
            p_l = jnp.sum(jnp.where(~right, ry_bin_p, 0.0), axis=1, keepdims=True) + 1e-7
            ry_r = jnp.sum(jnp.where(right, ry_all * ry_bin_p, 0.0), axis=1) / p_r[:, 0]
            ry_l = jnp.sum(jnp.where(~right, ry_all * ry_bin_p, 0.0), axis=1) / p_l[:, 0]
            ry = jnp.where(p_r[:, 0] >= p_l[:, 0], ry_r, ry_l)
            ry = jnp.where(ry > math.pi, ry - 2 * math.pi, ry)

    # size (bbox_transform.py:387-392)
    size_res_l, size_res_r = ry_res_r, ry_res_r + 3
    assert size_res_r == pred_reg.shape[1], \
        f'regression channels {pred_reg.shape[1]} != expected {size_res_r}'
    hwl = pred_reg[:, size_res_l:size_res_r] * anchor_size[None, :] + anchor_size[None, :]

    # shift to original coords (bbox_transform.py:394-402)
    shifted = jnp.concatenate(
        [pos_x[:, None], pos_y[:, None], pos_z[:, None], hwl, ry[:, None]], axis=1)
    if roi_box3d.shape[1] == 7:
        roi_ry = roi_box3d[:, 6]
        shifted = rotate_points_along_y(shifted, -roi_ry)
        shifted = shifted.at[:, 6].add(roi_ry)
    return shifted.at[:, 0].add(roi_box3d[:, 0]).at[:, 2].add(roi_box3d[:, 2])
