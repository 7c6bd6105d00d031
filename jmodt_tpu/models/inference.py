"""Joint-detection inference: one jitted program per frame.

The per-sample post-processing of the reference eval loop
(/root/reference/tools/eval.py:93-200) — RCNN box decode, sigmoid scoring,
score threshold, rotated NMS — fused with the model forward into a single
fixed-shape compiled step.  Variable-length selection happens on host from
the returned masks.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from jmodt_tpu.config import Config
from jmodt_tpu.models.bbox_codec import decode_bbox_target
from jmodt_tpu.models.point_rcnn import PointRCNN
from jmodt_tpu.ops.geometry import boxes3d_to_bev
from jmodt_tpu.ops.nms import nms_bev
from jmodt_tpu.ops.rotated_iou import boxes_iou3d


# ImageNet stats (reference kitti_dataset.py:40-41); applied on device when
# the step receives a raw uint8 image — shipping uint8 over PCIe/ICI is 4x
# less host->device traffic than pre-normalized f32, and the normalize fuses
# into the first conv.
_IMG_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_IMG_STD = np.array([0.229, 0.224, 0.225], np.float32)


def make_detection_step(cfg: Config, model: PointRCNN, jit: bool = True):
    """Returns jitted `step(variables, pts, img, xy) -> dict` with fixed
    shapes: boxes (B, M, 7), scores (B, M), feats (B, M, 512), keep (B, M)
    bool — survivors of score threshold + rotated NMS, descending-score
    order (reference tools/eval.py:109-190).

    `img` may be float32 (already ImageNet-normalized) or raw uint8
    (normalized on device; preferred for transfer bandwidth)."""
    mc = cfg.mode_cfg(model.mode)
    m = mc.RPN_POST_NMS_TOP_N

    def step(variables, pts, img, xy):
        if img is not None and img.dtype == jnp.uint8:
            img = (img.astype(jnp.float32) / 255.0
                   - _IMG_MEAN) / _IMG_STD
        out = model.apply(variables, pts, img, xy, train=False)
        b = pts.shape[0]
        rois = out['rois']                                  # (B, M, 7)
        rcnn_cls = out['rcnn_cls'].reshape(b, m)
        rcnn_reg = out['rcnn_reg'].reshape(b, m, -1)
        rcnn_feat = out['rcnn_feat'].reshape(b, m, -1)
        if cfg.USE_IOU_BRANCH:
            iou_branch = out['rcnn_iou_branch'].reshape(b, m)
            rcnn_cls = jnp.clip(iou_branch, 1e-4, None) * rcnn_cls

        pred_boxes = decode_bbox_target(
            rois.reshape(-1, 7), rcnn_reg.reshape(b * m, -1),
            anchor_size=jnp.asarray(cfg.mean_size),
            loc_scope=cfg.RCNN.LOC_SCOPE,
            loc_bin_size=cfg.RCNN.LOC_BIN_SIZE,
            num_head_bin=cfg.RCNN.NUM_HEAD_BIN,
            get_xz_fine=True, get_y_by_bin=cfg.RCNN.LOC_Y_BY_BIN,
            loc_y_scope=cfg.RCNN.LOC_Y_SCOPE,
            loc_y_bin_size=cfg.RCNN.LOC_Y_BIN_SIZE,
            get_ry_fine=True, avg_by_bin=mc.BBOX_AVG_BY_BIN,
            ry_with_bin=mc.RY_WITH_BIN).reshape(b, m, 7)

        raw_scores = rcnn_cls
        norm_scores = jax.nn.sigmoid(raw_scores)
        inds = (norm_scores > cfg.RCNN.SCORE_THRESH) & out['roi_mask']

        def per_frame(boxes, raw, norm, feats, mask):
            bev = boxes3d_to_bev(boxes)
            keep_idx, keep_mask = nms_bev(
                bev, raw, cfg.RCNN.NMS_THRESH, max_keep=m, valid=mask,
                rotated=True)
            return (boxes[keep_idx], norm[keep_idx], feats[keep_idx],
                    keep_mask)

        boxes, scores, feats, keep = jax.vmap(per_frame)(
            pred_boxes, raw_scores, norm_scores, rcnn_feat, inds)
        # 'packed' concatenates everything a consumer needs per detection
        # into ONE buffer — on hosts where each device->host fetch has
        # high fixed latency, reading one array instead of four is the
        # difference between ~40 ms and ~150+ ms per frame
        packed = jnp.concatenate([
            boxes, scores[..., None], keep.astype(boxes.dtype)[..., None],
            feats], axis=-1)
        return {'boxes': boxes, 'scores': scores, 'feats': feats,
                'keep': keep, 'rois': rois, 'roi_mask': out['roi_mask'],
                # ALL decoded boxes, pre-score-threshold/pre-NMS: the
                # reference computes bbox recall from these
                # (tools/eval.py:149-155), not from the NMS survivors
                'pred_boxes_all': pred_boxes,
                'seg_result': out['seg_result'], 'packed': packed}

    # jit only at the API boundary: a nested pjit inside an outer scan/jit
    # becomes a separate XLA computation call, which this relay executes
    # with a full program-switch penalty per iteration
    return jax.jit(step) if jit else step


def make_recall_fn(max_gt: int = 32, max_det: int = 128):
    """Jitted recall bookkeeping (reference tools/eval.py:129-168): counts of
    gt boxes recalled at IoU3D thresholds [0.1, 0.3, 0.5, 0.7, 0.9] by the
    refined boxes and by the raw RoIs."""
    thresh = jnp.array([0.1, 0.3, 0.5, 0.7, 0.9])

    def recall(pred_boxes, pred_mask, roi_boxes, roi_mask, gt_boxes,
               gt_mask):
        iou = boxes_iou3d(pred_boxes, gt_boxes)
        iou = jnp.where(pred_mask[:, None] & gt_mask[None, :], iou, 0.0)
        gt_max = jnp.max(iou, axis=0)
        recalled = jnp.sum((gt_max[None, :] > thresh[:, None])
                           & gt_mask[None, :], axis=1)
        iou_roi = boxes_iou3d(roi_boxes, gt_boxes)
        iou_roi = jnp.where(roi_mask[:, None] & gt_mask[None, :], iou_roi,
                            0.0)
        gt_max_roi = jnp.max(iou_roi, axis=0)
        roi_recalled = jnp.sum((gt_max_roi[None, :] > thresh[:, None])
                               & gt_mask[None, :], axis=1)
        return recalled, roi_recalled, jnp.sum(gt_mask)

    recall = jax.jit(recall)

    @jax.jit
    def accumulate(acc, det_out, gt_boxes):
        """Device-side accumulator: acc (11,) int32 carries
        [recalled(5), roi_recalled(5), n_gt] across frames with NO host
        round trip (fetch once after the loop).  Consumes the detection
        step's device outputs directly (batch row 0)."""
        gt_mask = jnp.sum(jnp.abs(gt_boxes), axis=1) > 0
        # pred_boxes_all + roi_mask, NOT the NMS survivors: the reference's
        # recall counts a gt as recalled if ANY decoded box covers it,
        # before the score threshold and NMS (tools/eval.py:149-155)
        r, rr, ng = recall(det_out['pred_boxes_all'][0],
                           det_out['roi_mask'][0],
                           det_out['rois'][0], det_out['roi_mask'][0],
                           gt_boxes, gt_mask)
        return acc + jnp.concatenate(
            [r, rr, ng[None]]).astype(jnp.int32)

    def host_recall(pred_boxes, roi_boxes, roi_mask, gt_boxes):
        """numpy wrapper padding to fixed shapes."""
        def pad(a, n):
            out = np.zeros((n,) + a.shape[1:], np.float32)
            k = min(len(a), n)
            out[:k] = a[:k]
            return out, np.arange(n) < k

        pb, pm = pad(np.asarray(pred_boxes), max_det)
        gb, gm = pad(np.asarray(gt_boxes), max_gt)
        rb, _ = pad(np.asarray(roi_boxes), max_det)
        rm = np.zeros(max_det, bool)
        k = min(len(roi_mask), max_det)
        rm[:k] = np.asarray(roi_mask)[:k]
        r, rr, ng = recall(pb, pm, rb, rm, gb, gm)
        return np.asarray(r), np.asarray(rr), int(ng)

    host_recall.accumulate = accumulate
    return host_recall
