"""Loss library.

TPU rewrite of /root/reference/jmodt/utils/loss_utils.py.  Every reduction is
mask-weighted over fixed-shape tensors instead of boolean indexing, so the
whole loss is one jit-compiled program: the reference's `pred_reg[fg_mask]`
(train_functions.py:144-146) becomes a weighted mean with `fg_mask` weights,
which is numerically identical for the mean-reduced losses used here.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp


def sigmoid_cross_entropy_with_logits(logits, labels):
    """Reference _sigmoid_cross_entropy_with_logits (loss_utils.py:80-88)."""
    return jnp.clip(logits, 0, None) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(logits, targets, weights, alpha=0.25, gamma=2.0):
    """SigmoidFocalClassificationLoss (loss_utils.py:27-77): per-element focal
    CE scaled by `weights`; caller sums."""
    ce = sigmoid_cross_entropy_with_logits(logits, targets)
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1 - targets) * (1 - p)
    modulating = jnp.power(1.0 - p_t, gamma) if gamma else 1.0
    alpha_w = targets * alpha + (1 - targets) * (1 - alpha)
    return modulating * alpha_w * ce * weights


def dice_loss(logits, target, ignore_target=-1):
    """DiceLoss (loss_utils.py:9-24)."""
    x = jax.nn.sigmoid(logits.reshape(-1))
    t = target.reshape(-1).astype(x.dtype)
    mask = (t != ignore_target).astype(x.dtype)
    num = jnp.sum(jnp.minimum(x, t) * mask)
    den = jnp.clip(jnp.sum(jnp.maximum(x, t) * mask), 1.0, None)
    return 1.0 - num / den


def smooth_l1(pred, target):
    """Elementwise Huber with beta=1 (torch F.smooth_l1_loss default)."""
    d = jnp.abs(pred - target)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def masked_mean(values, mask):
    """Mean over mask-selected elements; 0 when the mask is empty."""
    mask = mask.astype(values.dtype)
    return jnp.sum(values * mask) / jnp.clip(jnp.sum(mask), 1.0, None)


def cross_entropy_int_labels(logits, labels, mask):
    """Mask-weighted mean CE with integer labels (torch F.cross_entropy)."""
    logp = jax.nn.log_softmax(logits, axis=1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    return masked_mean(nll, mask)


class RegLossOut(NamedTuple):
    loc_loss: jnp.ndarray
    angle_loss: jnp.ndarray
    size_loss: jnp.ndarray
    iou_loss: jnp.ndarray


def get_reg_loss(cls_score: jnp.ndarray,
                 pred_reg: jnp.ndarray,
                 reg_label: jnp.ndarray,
                 fg_mask: jnp.ndarray,
                 loc_scope: float,
                 loc_bin_size: float,
                 num_head_bin: int,
                 anchor_size: jnp.ndarray,
                 get_xz_fine: bool = True,
                 get_y_by_bin: bool = False,
                 loc_y_scope: float = 0.5,
                 loc_y_bin_size: float = 0.25,
                 get_ry_fine: bool = False,
                 use_cls_score: bool = False,
                 iou_loss_type: str = 'raw') -> RegLossOut:
    """Bin-based regression loss (reference get_reg_loss, loss_utils.py:91-355).

    Differences from the reference, all jit-motivated and value-preserving:
      * foreground selection is a weight mask (`fg_mask`) instead of fancy
        indexing — the reference computes plain means over the selected rows,
        reproduced here by `masked_mean`;
      * both IOU_LOSS_TYPE branches ('raw', loss_utils.py:253-279 and
        'cls_mask_with_bin', loss_utils.py:281-347) are static options.

    :param cls_score: (N,) sigmoid scores (for use_cls_score)
    :param pred_reg: (N, C)
    :param reg_label: (N, 7) [dx, dy, dz, h, w, l, ry]
    :param fg_mask: (N,) bool — rows that contribute
    :param anchor_size: (3,) class mean size, or (N, 3) per-row RoI sizes
        (cfg.RCNN.SIZE_RES_ON_ROI)
    """
    per_loc_bin_num = int(loc_scope / loc_bin_size) * 2
    loc_y_bin_num = int(loc_y_scope / loc_y_bin_size) * 2
    dtype = pred_reg.dtype

    x_off, y_off, z_off = reg_label[:, 0], reg_label[:, 1], reg_label[:, 2]
    x_shift = jnp.clip(x_off + loc_scope, 0, loc_scope * 2 - 1e-3)
    z_shift = jnp.clip(z_off + loc_scope, 0, loc_scope * 2 - 1e-3)
    x_bin_label = jnp.floor(x_shift / loc_bin_size).astype(jnp.int32)
    z_bin_label = jnp.floor(z_shift / loc_bin_size).astype(jnp.int32)

    x_bin_l, x_bin_r = 0, per_loc_bin_num
    z_bin_l, z_bin_r = per_loc_bin_num, per_loc_bin_num * 2
    start_offset = z_bin_r

    loss_x_bin = cross_entropy_int_labels(pred_reg[:, x_bin_l:x_bin_r], x_bin_label, fg_mask)
    loss_z_bin = cross_entropy_int_labels(pred_reg[:, z_bin_l:z_bin_r], z_bin_label, fg_mask)
    loc_loss = loss_x_bin + loss_z_bin

    assert get_xz_fine, 'reference always uses fine xz for RPN/RCNN'
    x_res_l, x_res_r = per_loc_bin_num * 2, per_loc_bin_num * 3
    z_res_l, z_res_r = per_loc_bin_num * 3, per_loc_bin_num * 4
    start_offset = z_res_r

    x_res_label = x_shift - (x_bin_label.astype(dtype) * loc_bin_size + loc_bin_size / 2)
    z_res_label = z_shift - (z_bin_label.astype(dtype) * loc_bin_size + loc_bin_size / 2)
    x_res_norm_label = x_res_label / loc_bin_size
    z_res_norm_label = z_res_label / loc_bin_size

    x_onehot = jax.nn.one_hot(x_bin_label, per_loc_bin_num, dtype=dtype)
    z_onehot = jax.nn.one_hot(z_bin_label, per_loc_bin_num, dtype=dtype)
    pred_x_res = jnp.sum(pred_reg[:, x_res_l:x_res_r] * x_onehot, axis=1)
    pred_z_res = jnp.sum(pred_reg[:, z_res_l:z_res_r] * z_onehot, axis=1)
    loss_x_res = masked_mean(smooth_l1(pred_x_res, x_res_norm_label), fg_mask)
    loss_z_res = masked_mean(smooth_l1(pred_z_res, z_res_norm_label), fg_mask)
    loc_loss = loc_loss + loss_x_res + loss_z_res

    # y localization (loss_utils.py:157-184)
    if get_y_by_bin:
        y_bin_l, y_bin_r = start_offset, start_offset + loc_y_bin_num
        y_res_l, y_res_r = y_bin_r, y_bin_r + loc_y_bin_num
        start_offset = y_res_r
        y_shift = jnp.clip(y_off + loc_y_scope, 0, loc_y_scope * 2 - 1e-3)
        y_bin_label = jnp.floor(y_shift / loc_y_bin_size).astype(jnp.int32)
        y_res_label = y_shift - (y_bin_label.astype(dtype) * loc_y_bin_size + loc_y_bin_size / 2)
        y_res_norm_label = y_res_label / loc_y_bin_size
        y_onehot = jax.nn.one_hot(y_bin_label, loc_y_bin_num, dtype=dtype)
        loss_y_bin = cross_entropy_int_labels(pred_reg[:, y_bin_l:y_bin_r], y_bin_label, fg_mask)
        pred_y_res = jnp.sum(pred_reg[:, y_res_l:y_res_r] * y_onehot, axis=1)
        loss_y = loss_y_bin + masked_mean(smooth_l1(pred_y_res, y_res_norm_label), fg_mask)
        loc_loss = loc_loss + loss_y
        pred_y = pred_y_res  # for the iou term below
        y_offset_l = None
    else:
        y_offset_l = start_offset
        start_offset = y_offset_l + 1
        pred_y = pred_reg[:, y_offset_l]
        loss_y_offset = masked_mean(smooth_l1(pred_y, y_off), fg_mask)
        loc_loss = loc_loss + loss_y_offset

    # angle (loss_utils.py:186-225)
    ry_bin_l, ry_bin_r = start_offset, start_offset + num_head_bin
    ry_res_l, ry_res_r = ry_bin_r, ry_bin_r + num_head_bin
    ry_label = reg_label[:, 6]

    if get_ry_fine:
        angle_per_class = (math.pi / 2) / num_head_bin
        ry_label_mod = ry_label % (2 * math.pi)
        opposite = (ry_label_mod > math.pi * 0.5) & (ry_label_mod < math.pi * 1.5)
        ry_label_mod = jnp.where(opposite, (ry_label_mod + math.pi) % (2 * math.pi), ry_label_mod)
        shift_angle = (ry_label_mod + math.pi * 0.5) % (2 * math.pi)
        shift_angle = jnp.clip(shift_angle - math.pi * 0.25, 1e-3, math.pi * 0.5 - 1e-3)
        ry_bin_label = jnp.floor(shift_angle / angle_per_class).astype(jnp.int32)
        ry_res_label = shift_angle - (ry_bin_label.astype(dtype) * angle_per_class
                                      + angle_per_class / 2)
        ry_res_norm_label = ry_res_label / (angle_per_class / 2)
    else:
        angle_per_class = (2 * math.pi) / num_head_bin
        heading = ry_label % (2 * math.pi)
        shift_angle = (heading + angle_per_class / 2) % (2 * math.pi)
        ry_bin_label = jnp.floor(shift_angle / angle_per_class).astype(jnp.int32)
        ry_res_label = shift_angle - (ry_bin_label.astype(dtype) * angle_per_class
                                      + angle_per_class / 2)
        ry_res_norm_label = ry_res_label / (angle_per_class / 2)

    ry_onehot = jax.nn.one_hot(ry_bin_label, num_head_bin, dtype=dtype)
    loss_ry_bin = cross_entropy_int_labels(pred_reg[:, ry_bin_l:ry_bin_r], ry_bin_label, fg_mask)
    pred_ry_res = jnp.sum(pred_reg[:, ry_res_l:ry_res_r] * ry_onehot, axis=1)
    loss_ry_res = masked_mean(smooth_l1(pred_ry_res, ry_res_norm_label), fg_mask)
    angle_loss = loss_ry_bin + loss_ry_res

    # size (loss_utils.py:227-233).  anchor_size may be (3,) — the class
    # mean box — or (N, 3) per-row RoI sizes (SIZE_RES_ON_ROI,
    # train_functions.py:245-246)
    size_res_l, size_res_r = ry_res_r, ry_res_r + 3
    assert pred_reg.shape[1] == size_res_r, f'{pred_reg.shape[1]} vs {size_res_r}'
    anchor = jnp.broadcast_to(anchor_size, reg_label[:, 3:6].shape)
    size_norm_label = (reg_label[:, 3:6] - anchor) / anchor
    size_res_norm = pred_reg[:, size_res_l:size_res_r]
    size_loss = masked_mean(jnp.mean(smooth_l1(size_res_norm, size_norm_label), axis=1), fg_mask)

    # soft-IoU loss (loss_utils.py:235-347)
    pred_size = size_res_norm * anchor + anchor  # hwl
    tar_size = reg_label[:, 3:6]

    if iou_loss_type == 'raw':
        px = pred_x_res * loc_bin_size
        pz = pred_z_res * loc_bin_size
        tx, ty, tz = x_res_label, y_off, z_res_label
    elif iou_loss_type == 'cls_mask_with_bin':
        bin_center = (jnp.arange(per_loc_bin_num, dtype=dtype) * loc_bin_size
                      + loc_bin_size / 2 - loc_scope)
        pxb = jax.nn.softmax(pred_reg[:, x_bin_l:x_bin_r], axis=1)
        pzb = jax.nn.softmax(pred_reg[:, z_bin_l:z_bin_r], axis=1)
        px = jnp.sum((bin_center[None, :] + pred_reg[:, x_res_l:x_res_r] * loc_bin_size)
                     * pxb, axis=1)
        pz = jnp.sum((bin_center[None, :] + pred_reg[:, z_res_l:z_res_r] * loc_bin_size)
                     * pzb, axis=1)
        tx = bin_center[x_bin_label] + x_res_label
        tz = bin_center[z_bin_label] + z_res_label
        ty = y_off
    else:
        raise NotImplementedError(iou_loss_type)
    py = pred_y

    def axis_insect(pc, ps, tc, ts):
        return jnp.clip(jnp.minimum(pc + ps / 2, tc + ts / 2)
                        - jnp.maximum(pc - ps / 2, tc - ts / 2), 1e-3, None)

    # axis pairing follows loss_utils.py:243-251: x<->size l, y<->size h, z<->size w
    ins_x = axis_insect(px, pred_size[:, 2], tx, tar_size[:, 2])
    ins_y = axis_insect(py, pred_size[:, 0], ty, tar_size[:, 0])
    ins_z = axis_insect(pz, pred_size[:, 1], tz, tar_size[:, 1])
    insect_area = ins_x * ins_y * ins_z
    pred_area = jnp.clip(pred_size[:, 0] * pred_size[:, 1] * pred_size[:, 2], 1e-3, None)
    tar_area = tar_size[:, 0] * tar_size[:, 1] * tar_size[:, 2]
    iou_tmp = insect_area / (pred_area + tar_area - insect_area)
    if use_cls_score:
        iou_tmp = cls_score * iou_tmp
    iou_tmp = jnp.clip(iou_tmp, 1e-4, None)
    iou_loss = masked_mean(-jnp.log(iou_tmp), fg_mask)

    return RegLossOut(loc_loss, angle_loss, size_loss, iou_loss)
