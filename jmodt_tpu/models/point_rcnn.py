"""PointRCNN composite: RPN -> proposals -> RoI pooling -> RCNN (+ ReID).

TPU rewrite of /root/reference/jmodt/detection/modeling/point_rcnn.py.  The
reference wires torch modules with `torch.no_grad()` regions; here the same
boundaries are `jax.lax.stop_gradient` and — for the frozen-RPN finetune mode
(cfg.RPN.FIXED, point_rcnn.py:28-31) — the RPN runs with `train=False` so its
BatchNorm uses running statistics, and its parameters are excluded from the
optimizer by the trainable mask in jmodt_tpu/train/train_step.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from jmodt_tpu.config import Config
from jmodt_tpu.models.proposal import (
    pool_rois_for_eval, proposal_layer, proposal_target_layer)
from jmodt_tpu.models.rcnn import RCNN
from jmodt_tpu.models.rpn import RPN


class PointRCNN(nn.Module):
    """forward (reference point_rcnn.py:23-72):

    inputs: pts_input (B, N, 3 + C); img (B, H, W, 3) | None;
    pts_xy (B, N, 2) | None; train mode additionally gt_boxes3d (B, G, 7),
    gt_tids (B, G), and a `sample_key` PRNG for RoI sampling.

    returns a dict with the RPN outputs, proposals ('rois', 'roi_scores_raw',
    'roi_mask', 'seg_result'), RCNN outputs, and — in train mode — the RoI
    targets and ReID scores.
    """
    cfg: Config
    mode: str = 'EVAL'  # TRAIN | EVAL | TEST
    use_xyz: bool = True

    @nn.compact
    def __call__(self, pts_input, img=None, pts_xy=None, gt_boxes3d=None,
                 gt_tids=None, sample_key: Optional[jax.Array] = None,
                 train: bool = False):
        cfg = self.cfg
        assert cfg.RPN.ENABLED and cfg.RCNN.ENABLED, \
            'composite model expects both stages enabled'

        rpn_train = train and not cfg.RPN.FIXED
        # under_grad=train: with cfg.RPN.FIXED the RPN runs eval-mode inside
        # a differentiated apply — jax.grad computes tangents for ALL params
        # (the optimizer mask zeroes the frozen ones afterwards), so every
        # op on the RPN path still needs a JVP; the fused-SA Pallas kernel
        # has none (ladder stage-3 'Linearization failed' crash, round 4)
        rpn_out = RPN(cfg, use_xyz=self.use_xyz, name='rpn')(
            pts_input, img, pts_xy, train=rpn_train, under_grad=train)
        output = dict(rpn_out)

        backbone_xyz = rpn_out['backbone_xyz']
        backbone_features = rpn_out['backbone_features']
        if cfg.RPN.FIXED:
            backbone_xyz = jax.lax.stop_gradient(backbone_xyz)
            backbone_features = jax.lax.stop_gradient(backbone_features)

        # proposal generation runs without gradients (point_rcnn.py:24-48)
        rpn_scores_raw = jax.lax.stop_gradient(rpn_out['rpn_cls'][:, :, 0])
        rpn_reg = jax.lax.stop_gradient(rpn_out['rpn_reg'])
        rpn_scores_norm = jax.nn.sigmoid(rpn_scores_raw)
        seg_mask = (rpn_scores_norm > cfg.RPN.SCORE_THRESH).astype(jnp.float32)
        pts_depth = jnp.linalg.norm(backbone_xyz, axis=2)

        props = proposal_layer(cfg, self.mode, rpn_scores_raw, rpn_reg,
                               jax.lax.stop_gradient(backbone_xyz))
        output['rois'] = props.boxes
        output['roi_scores_raw'] = props.scores
        output['roi_mask'] = props.mask
        output['seg_result'] = seg_mask

        if self.mode == 'TRAIN':
            assert gt_boxes3d is not None and sample_key is not None
            targets = proposal_target_layer(
                cfg, sample_key,
                jax.lax.stop_gradient(backbone_xyz),
                backbone_features, seg_mask, pts_depth,
                props.boxes, gt_boxes3d,
                gt_tids if gt_tids is not None
                else jnp.zeros(gt_boxes3d.shape[:2], jnp.float32))
            pts_input_rcnn = (targets.pts_input if not cfg.RPN.FIXED
                              else jax.lax.stop_gradient(targets.pts_input))
            rcnn_out = RCNN(cfg, use_xyz=self.use_xyz, name='rcnn')(
                pts_input_rcnn, gt_tids=targets.gt_tids, train=train)
            output.update(rcnn_out)
            output['targets'] = targets
        else:
            pts_input_rcnn = pool_rois_for_eval(
                cfg, backbone_xyz, backbone_features, seg_mask, pts_depth,
                props.boxes)
            rcnn_out = RCNN(cfg, use_xyz=self.use_xyz, name='rcnn')(
                pts_input_rcnn, gt_tids=None, train=False)
            output.update(rcnn_out)
        return output
