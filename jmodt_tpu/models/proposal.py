"""Proposal generation and RoI target sampling, fixed-shape and jit-native.

TPU rewrite of:
  * /root/reference/jmodt/detection/layers/proposal_layer.py (decode + two-zone
    distance-based NMS), and
  * /root/reference/jmodt/detection/layers/proposal_target_layer.py (train-time
    RoI sampling + pooling + canonical transform).

Everything returns fixed-size buffers with validity masks instead of
variable-length tensors; invalid rows are zeroed, matching the reference's own
zero-padding of the proposal buffer (proposal_layer.py:39-40) — downstream
consumers already treat zero boxes as background.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from jmodt_tpu.config import Config
from jmodt_tpu.models.bbox_codec import decode_bbox_target
from jmodt_tpu.ops.geometry import boxes3d_to_bev, rotate_points_along_y
from jmodt_tpu.ops.nms import nms_bev
from jmodt_tpu.ops.roipool3d import roipool3d
from jmodt_tpu.ops.rotated_iou import boxes_iou3d


def first_k_indices(mask: jnp.ndarray, k: int):
    """First k true positions of `mask`, in order; (idx (k,), valid (k,))."""
    n = mask.shape[0]
    key = jnp.where(mask, jnp.arange(n, dtype=jnp.int32), n)
    neg, _ = jax.lax.top_k(-key, k)
    idx = -neg
    valid = idx < n
    return jnp.where(valid, idx, 0), valid


class Proposals(NamedTuple):
    boxes: jnp.ndarray   # (B, POST_N, 7), invalid rows zero
    scores: jnp.ndarray  # (B, POST_N) raw rpn scores, invalid rows zero
    mask: jnp.ndarray    # (B, POST_N) bool


def _distance_zone_proposal(scores, proposals, pre_n, post_n, thresh, rotated):
    """Two-zone distance-based proposal (reference distance_based_proposal,
    proposal_layer.py:59-121).  Single frame: scores (N,), proposals (N, 7)."""
    order = jnp.argsort(-scores)
    s = scores[order]
    p = proposals[order]
    dist = p[:, 2]
    m1 = (dist > 0.0) & (dist <= 40.0)
    m2 = (dist > 40.0) & (dist <= 80.0)

    n = scores.shape[0]
    pre1 = min(int(pre_n * 0.7), n)
    pre2 = min(pre_n - int(pre_n * 0.7), n)
    post1 = int(post_n * 0.7)
    post2 = post_n - post1

    idx1, v1 = first_k_indices(m1, pre1)
    # zone 2, or — when empty — zone 1's ranks [pre1 : pre1+pre2]
    # (proposal_layer.py:93-102)
    idx2a, v2a = first_k_indices(m2, pre2)
    k_f = min(pre1 + pre2, n)
    idx_f, v_f = first_k_indices(m1, k_f)
    idx2b = jnp.zeros((pre2,), jnp.int32).at[:k_f - pre1].set(idx_f[pre1:])
    v2b = jnp.zeros((pre2,), bool).at[:k_f - pre1].set(v_f[pre1:])
    has2 = jnp.any(m2)
    idx2 = jnp.where(has2, idx2a, idx2b)
    v2 = jnp.where(has2, v2a, v2b)

    outs = []
    for idx, v, post in ((idx1, v1, post1), (idx2, v2, post2)):
        cand_boxes = p[idx]
        cand_scores = jnp.where(v, s[idx], -jnp.inf)
        bev = boxes3d_to_bev(cand_boxes)
        keep, kmask = nms_bev(bev, cand_scores, thresh, max_keep=post,
                              valid=v, rotated=rotated)
        kept_boxes = jnp.where(kmask[:, None], cand_boxes[keep], 0.0)
        kept_scores = jnp.where(kmask, cand_scores[keep], 0.0)
        outs.append((kept_boxes, kept_scores, kmask))

    boxes = jnp.concatenate([o[0] for o in outs], axis=0)
    sc = jnp.concatenate([o[1] for o in outs], axis=0)
    mask = jnp.concatenate([o[2] for o in outs], axis=0)
    return boxes, sc, mask


def _score_zone_proposal(scores, proposals, pre_n, post_n, thresh, rotated):
    """Plain score-ranked proposal (reference score_based_proposal,
    proposal_layer.py:123-144; always rotated NMS there)."""
    order = jnp.argsort(-scores)
    n = scores.shape[0]
    top = min(pre_n, n)
    idx = order[:top]
    cand_boxes = proposals[idx]
    cand_scores = scores[idx]
    bev = boxes3d_to_bev(cand_boxes)
    keep, kmask = nms_bev(bev, cand_scores, thresh, max_keep=post_n,
                          rotated=rotated)
    return (jnp.where(kmask[:, None], cand_boxes[keep], 0.0),
            jnp.where(kmask, cand_scores[keep], 0.0), kmask)


@functools.partial(jax.jit, static_argnames=('cfg', 'mode'))
def proposal_layer(cfg: Config, mode: str, rpn_scores: jnp.ndarray,
                   rpn_reg: jnp.ndarray, xyz: jnp.ndarray) -> Proposals:
    """Decode per-point bin regressions into boxes and select RoIs
    (reference ProposalLayer.forward, proposal_layer.py:16-57).

    :param rpn_scores: (B, N) raw logits
    :param rpn_reg: (B, N, C)
    :param xyz: (B, N, 3)
    """
    mc = cfg.mode_cfg(mode)
    b, n = rpn_scores.shape
    anchor = jnp.asarray(cfg.mean_size)
    props = decode_bbox_target(
        xyz.reshape(-1, 3), rpn_reg.reshape(-1, rpn_reg.shape[-1]),
        anchor_size=anchor,
        loc_scope=cfg.RPN.LOC_SCOPE, loc_bin_size=cfg.RPN.LOC_BIN_SIZE,
        num_head_bin=cfg.RPN.NUM_HEAD_BIN, get_xz_fine=cfg.RPN.LOC_XZ_FINE,
        get_y_by_bin=False, get_ry_fine=False,
        avg_by_bin=mc.BBOX_AVG_BY_BIN, ry_with_bin=mc.RY_WITH_BIN)
    # y becomes the center of the bottom face (proposal_layer.py:32)
    props = props.at[:, 1].add(props[:, 3] / 2).reshape(b, n, 7)

    rotated = cfg.RPN.NMS_TYPE == 'rotate'
    if mc.RPN_DISTANCE_BASED_PROPOSE:
        fn = functools.partial(_distance_zone_proposal,
                               pre_n=mc.RPN_PRE_NMS_TOP_N,
                               post_n=mc.RPN_POST_NMS_TOP_N,
                               thresh=mc.RPN_NMS_THRESH, rotated=rotated)
    else:
        fn = functools.partial(_score_zone_proposal,
                               pre_n=mc.RPN_PRE_NMS_TOP_N,
                               post_n=mc.RPN_POST_NMS_TOP_N,
                               thresh=mc.RPN_NMS_THRESH, rotated=True)
    boxes, sc, mask = jax.vmap(fn)(rpn_scores, props)
    return Proposals(boxes, sc, mask)


# --------------------------------------------------------------------------
# Proposal target layer (train-time RoI sampling)
# --------------------------------------------------------------------------

class RoiTargets(NamedTuple):
    """Per-RoI training targets (reference output_dict,
    proposal_target_layer.py:84-97), flattened over (B * ROI_PER_IMAGE)."""
    pts_input: jnp.ndarray       # (R, NUM_POINTS, 3 + C) canonical xyz + feats
    roi_boxes3d: jnp.ndarray     # (R, 7)
    cls_label: jnp.ndarray       # (R,) {1, 0, -1}
    mask_score: jnp.ndarray      # (R,)
    reg_valid_mask: jnp.ndarray  # (R,) {0, 1}
    gt_of_rois: jnp.ndarray      # (R, 7) canonical gt
    gt_iou: jnp.ndarray          # (R,)
    gt_tids: jnp.ndarray         # (B, ROI_PER_IMAGE) reid labels (0 = bg)
    max_iou: jnp.ndarray         # scalar, training-health display


def _random_rank(key, mask, k):
    """k indices of `mask` in uniformly-random order (valid[i] False past the
    population size) — replaces np.random.permutation-based picks
    (proposal_target_layer.py:173, 246-263)."""
    n = mask.shape[0]
    r = jax.random.uniform(key, (n,))
    keyed = jnp.where(mask, r, 2.0)
    _, idx = jax.lax.top_k(-keyed, k)
    valid = mask[idx]
    return idx.astype(jnp.int32), valid


_AUG_RANGE_CONFIG = (
    # pos_range, hwl_range, angle_range (mean_iou column unused), reference
    # proposal_target_layer.py:313-318
    (0.2, 0.1, math.pi / 12),
    (0.3, 0.15, math.pi / 12),
    (0.5, 0.15, math.pi / 9),
    (0.8, 0.15, math.pi / 6),
    (1.0, 0.15, math.pi / 3),
)


def random_aug_box3d(key, box3d, method: str):
    """One jittered candidate of a (7,) box (reference random_aug_box3d,
    proposal_target_layer.py:299-339): random shift / size scale / heading
    rotation, magnitude either fixed ('single'), drawn from a 5-level range
    table ('multiple', the default), or gaussian ('normal')."""
    k_idx, k_pos, k_hwl, k_ang = jax.random.split(key, 4)
    if method == 'single':
        pos_shift = jax.random.uniform(k_pos, (3,), minval=-0.5, maxval=0.5)
        hwl_scale = jax.random.uniform(
            k_hwl, (3,), minval=-0.5, maxval=0.5) * 0.3 + 1.0
        angle_rot = jax.random.uniform(
            k_ang, (1,), minval=-0.5, maxval=0.5) * (math.pi / 6)
    elif method == 'multiple':
        tbl = jnp.asarray(_AUG_RANGE_CONFIG)
        row = tbl[jax.random.randint(k_idx, (), 0, len(_AUG_RANGE_CONFIG))]
        pos_shift = jax.random.uniform(k_pos, (3,), minval=-1.0,
                                       maxval=1.0) * row[0]
        hwl_scale = jax.random.uniform(k_hwl, (3,), minval=-1.0,
                                       maxval=1.0) * row[1] + 1.0
        angle_rot = jax.random.uniform(k_ang, (1,), minval=-1.0,
                                       maxval=1.0) * row[2]
    elif method == 'normal':
        pos_shift = jax.random.normal(k_pos, (3,)) * jnp.asarray([0.3, 0.2, 0.3])
        hwl_scale = 1.0 + (jax.random.normal(k_hwl, (3,))
                           * jnp.asarray([0.25, 0.15, 0.5])
                           / jnp.clip(box3d[3:6], 1e-3, None))
        angle_rot = jax.random.uniform(
            k_ang, (1,), minval=-1.0, maxval=1.0) * (math.pi / 12)
    else:
        raise NotImplementedError(f'REG_AUG_METHOD {method}')
    return jnp.concatenate([box3d[0:3] + pos_shift, box3d[3:6] * hwl_scale,
                            box3d[6:7] + angle_rot])


def _aug_rois_by_noise(key, rois, gt_of, src_iou, max_trials, cfg: Config):
    """Fixed-shape RoI jitter (reference aug_roi_by_noise_torch,
    proposal_target_layer.py:269-297).  Per RoI: up to `max_trials[i]` trials,
    each keeping the ORIGINAL box with p=0.2 or drawing a fresh jitter of it;
    stop once IoU(candidate, gt) >= pos_thresh.  The box becomes the last
    attempted candidate (threshold met or not); the reported IoU falls back
    to the pre-aug value when no trial ran or the final candidate was the
    kept original.

    :param rois: (R, 7) chosen RoIs; gt_of (R, 7) their assigned gts
    :param src_iou: (R,) pre-aug IoUs; max_trials (R,) int per-row budget
    """
    rc = cfg.RCNN
    n = rois.shape[0]
    pos_thresh = min(rc.REG_FG_THRESH, rc.CLS_FG_THRESH)
    pair_iou = jax.vmap(lambda a, b: boxes_iou3d(a[None], b[None])[0, 0])
    n_trials = int(rc.ROI_FG_AUG_TIMES)

    def trial(t, carry):
        box, iou, kept_orig, done = carry
        tk = jax.random.fold_in(key, t)
        keep_draw = jax.random.uniform(
            jax.random.fold_in(tk, 0), (n,)) < 0.2
        cand = jax.vmap(
            lambda i, r: random_aug_box3d(jax.random.fold_in(tk, 1 + i), r,
                                          rc.REG_AUG_METHOD)
        )(jnp.arange(n), rois)
        cand = jnp.where(keep_draw[:, None], rois, cand)
        cand_iou = pair_iou(cand, gt_of)
        active = (~done) & (t < max_trials)
        box = jnp.where(active[:, None], cand, box)
        iou = jnp.where(active, cand_iou, iou)
        kept_orig = jnp.where(active, keep_draw, kept_orig)
        done = done | (active & (cand_iou >= pos_thresh))
        return box, iou, kept_orig, done

    init = (rois, src_iou, jnp.ones(n, bool), jnp.zeros(n, bool))
    box, iou, kept_orig, _ = jax.lax.fori_loop(0, n_trials, trial, init)
    out_iou = jnp.where((max_trials == 0) | kept_orig, src_iou, iou)
    return box, out_iou


def _sample_rois_one(key, rois, gt_boxes, gt_tids, cfg: Config):
    """RoI sampling for one frame (reference sample_rois_for_rcnn,
    proposal_target_layer.py:119-238).  Fixed output size ROI_PER_IMAGE.

    Randomness uses the JAX PRNG instead of the reference's global numpy
    seed — distribution-equivalent, not bit-identical.  The all-foreground
    corner case (bg_num == 0, proposal_target_layer.py:180-186) fills
    replacement slots only after the distinct foregrounds, a slight
    distributional deviation from the reference's fully-with-replacement
    pick; metric-neutral.
    """
    rc = cfg.RCNN
    n_roi = rc.ROI_PER_IMAGE
    fg_per_image = int(round(rc.FG_RATIO * n_roi))

    gt_valid = jnp.sum(jnp.abs(gt_boxes), axis=1) > 0
    iou = boxes_iou3d(rois, gt_boxes)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    max_ov = jnp.max(iou, axis=1)
    assign = jnp.argmax(iou, axis=1)

    fg_thresh = min(rc.REG_FG_THRESH, rc.CLS_FG_THRESH)
    fg_mask = max_ov >= fg_thresh
    easy_bg = max_ov < rc.CLS_BG_THRESH_LO
    hard_bg = (max_ov < rc.CLS_BG_THRESH) & (max_ov >= rc.CLS_BG_THRESH_LO)

    fgn = jnp.sum(fg_mask)
    hbn = jnp.sum(hard_bg)
    ebn = jnp.sum(easy_bg)
    bgn = hbn + ebn

    k_fg, k_hard, k_easy, k_r1, k_r2, k_aug = jax.random.split(key, 6)
    fg_rank, _ = _random_rank(k_fg, fg_mask, n_roi)
    hard_rank, _ = _random_rank(k_hard, hard_bg, n_roi)
    easy_rank, _ = _random_rank(k_easy, easy_bg, n_roi)

    nf = jnp.where(fgn > 0, jnp.where(bgn > 0,
                                      jnp.minimum(fg_per_image, fgn), n_roi), 0)
    nb = n_roi - nf
    hard_n = jnp.where((hbn > 0) & (ebn > 0),
                       (nb.astype(jnp.float32) * rc.HARD_BG_RATIO).astype(jnp.int32),
                       jnp.where(hbn > 0, nb, 0))

    j = jnp.arange(n_roi, dtype=jnp.int32)
    rint1 = jax.random.randint(k_r1, (n_roi,), 0, 1 << 30)
    rint2 = jax.random.randint(k_r2, (n_roi,), 0, 1 << 30)

    fg_slot = jnp.where(j < fgn, j, rint1 % jnp.maximum(fgn, 1))
    fg_choice = fg_rank[fg_slot]

    jb = j - nf  # bg slot index
    hard_choice = hard_rank[rint2 % jnp.maximum(hbn, 1)]
    easy_choice = easy_rank[rint2 % jnp.maximum(ebn, 1)]
    bg_choice = jnp.where(jb < hard_n, hard_choice, easy_choice)

    chosen = jnp.where(j < nf, fg_choice, bg_choice)
    sel_rois = rois[chosen]
    sel_gt = gt_boxes[assign[chosen]]
    sel_iou = max_ov[chosen]
    if rc.ROI_FG_AUG_TIMES > 0:
        # fg rows get the full trial budget; bg rows exactly one
        # (proposal_target_layer.py:208-222)
        max_trials = jnp.where(j < nf, rc.ROI_FG_AUG_TIMES, 1)
        sel_rois, sel_iou = _aug_rois_by_noise(
            k_aug, sel_rois, sel_gt, sel_iou, max_trials, cfg)
    return sel_rois, sel_gt, sel_iou, gt_tids[assign[chosen]]


@functools.partial(jax.jit, static_argnames=('cfg',))
def proposal_target_layer(cfg: Config, key, rpn_xyz, rpn_features, seg_mask,
                          pts_depth, roi_boxes3d, gt_boxes3d, gt_tids
                          ) -> RoiTargets:
    """Train-time RoI sampling + pooling + canonical transform (reference
    ProposalTargetLayer.forward TRAIN branch, proposal_target_layer.py:16-97).

    :param rpn_xyz: (B, N, 3); rpn_features (B, N, 128); seg_mask (B, N)
    :param pts_depth: (B, N); roi_boxes3d (B, M, 7)
    :param gt_boxes3d: (B, G, 7) zero-padded; gt_tids (B, G)
    """
    rc = cfg.RCNN
    b = rpn_xyz.shape[0]
    extra = [seg_mask[..., None]]
    if rc.USE_DEPTH:
        extra.append((pts_depth / 70.0 - 0.5)[..., None])
    pts_feature = jnp.concatenate(extra + [rpn_features], axis=2)

    keys = jax.random.split(key, b)
    rois, gt_of, roi_iou, tids = jax.vmap(
        lambda k, r, g, t: _sample_rois_one(k, r, g, t, cfg)
    )(keys, roi_boxes3d, gt_boxes3d, gt_tids)

    pooled, empty_flag = roipool3d(rpn_xyz, pts_feature, rois,
                                   rc.POOL_EXTRA_WIDTH,
                                   sampled_pt_num=rc.NUM_POINTS)
    sampled_pts = pooled[..., 0:3]
    sampled_feats = pooled[..., 3:]
    mask_score = jnp.sum(pooled[..., 3], axis=-1) / rc.NUM_POINTS

    # canonical transform (proposal_target_layer.py:58-69)
    roi_ry = rois[..., 6] % (2 * math.pi)
    roi_center = rois[..., 0:3]
    sampled_pts = sampled_pts - roi_center[:, :, None, :]
    gt_ct = gt_of.at[..., 0:3].add(-roi_center).at[..., 6].add(-roi_ry)

    def canon(pts, g, angles, ry):
        pts = rotate_points_along_y(pts, angles)
        g = rotate_points_along_y(g[:, None, :], ry)[:, 0]
        return pts, g

    sampled_pts, gt_ct = jax.vmap(canon)(sampled_pts, gt_ct, rois[..., 6],
                                         roi_ry)

    valid = empty_flag == 0
    reg_valid_mask = ((roi_iou > rc.REG_FG_THRESH) & valid).astype(jnp.int32)
    cls_label = (roi_iou > rc.CLS_FG_THRESH).astype(jnp.int32)
    invalid = (roi_iou > rc.CLS_BG_THRESH) & (roi_iou < rc.CLS_FG_THRESH)
    cls_label = jnp.where(~valid | invalid, -1, cls_label)
    tids = jnp.where(roi_iou < cfg.REID.FG_THRESH, 0.0, tids)

    n_pts = rc.NUM_POINTS
    pts_input = jnp.concatenate([
        sampled_pts.reshape(-1, n_pts, 3),
        sampled_feats.reshape(-1, n_pts, sampled_feats.shape[-1])], axis=2)
    return RoiTargets(
        pts_input=pts_input,
        roi_boxes3d=rois.reshape(-1, 7),
        cls_label=cls_label.reshape(-1),
        mask_score=mask_score.reshape(-1),
        reg_valid_mask=reg_valid_mask.reshape(-1),
        gt_of_rois=gt_ct.reshape(-1, 7),
        gt_iou=roi_iou.reshape(-1),
        gt_tids=tids,
        max_iou=jnp.max(roi_iou))


@functools.partial(jax.jit, static_argnames=('cfg',))
def pool_rois_for_eval(cfg: Config, rpn_xyz, rpn_features, seg_mask,
                       pts_depth, roi_boxes3d):
    """Eval-time pooling + canonical transform only (reference
    ProposalTargetLayer.forward eval branch, proposal_target_layer.py:99-115).

    :return: pts_input (B * M, NUM_POINTS, 3 + C)
    """
    rc = cfg.RCNN
    extra = [seg_mask[..., None]]
    if rc.USE_DEPTH:
        extra.append((pts_depth / 70.0 - 0.5)[..., None])
    pts_feature = jnp.concatenate(extra + [rpn_features], axis=2)
    pooled, _ = roipool3d(rpn_xyz, pts_feature, roi_boxes3d,
                          rc.POOL_EXTRA_WIDTH, sampled_pt_num=rc.NUM_POINTS)
    centered = pooled[..., 0:3] - roi_boxes3d[:, :, None, 0:3]

    centered = jax.vmap(rotate_points_along_y)(centered, roi_boxes3d[..., 6])
    pooled = jnp.concatenate([centered, pooled[..., 3:]], axis=-1)
    return pooled.reshape(-1, rc.NUM_POINTS, pooled.shape[-1])
