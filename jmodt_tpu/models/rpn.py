"""Region proposal network head.

TPU rewrite of /root/reference/jmodt/detection/modeling/rpn.py: the fused
backbone plus per-point classification (128 -> 1) and bin-based regression
(128 -> 76) heads.  Heads are pointwise Dense stacks over the (B, N, 128)
feature-last backbone output.
"""

from __future__ import annotations

import math

from flax import linen as nn

from jmodt_tpu.config import Config
from jmodt_tpu.models.backbone import PointNet2MSG
from jmodt_tpu.models.layers import (HeadMLP, compute_dtype, constant_init,
                                     normal_init)


def rpn_reg_channels(cfg: Config) -> int:
    """Regression width (reference rpn.py:229-234): xz bins + residuals,
    heading bins + residuals, 3 sizes, 1 y offset."""
    per_loc_bin = int(cfg.RPN.LOC_SCOPE / cfg.RPN.LOC_BIN_SIZE) * 2
    base = (per_loc_bin * 4 if cfg.RPN.LOC_XZ_FINE else per_loc_bin * 2)
    return base + cfg.RPN.NUM_HEAD_BIN * 2 + 3 + 1


class RPN(nn.Module):
    """forward: pts_input (B, N, 3 + C), img (B, H, W, 3) | None,
    pts_xy (B, N, 2) | None -> dict with rpn_cls (B, N, 1), rpn_reg (B, N, C),
    backbone_xyz (B, N, 3), backbone_features (B, N, 128)
    (reference rpn.py:266-285)."""
    cfg: Config
    use_xyz: bool = True

    @nn.compact
    def __call__(self, pts_input, img=None, pts_xy=None, train: bool = False,
                 under_grad: bool = False):
        cfg = self.cfg
        input_channels = int(cfg.RPN.USE_INTENSITY) + 3 * int(cfg.RPN.USE_RGB)
        xyz, feats = PointNet2MSG(
            cfg, input_channels=input_channels, use_xyz=self.use_xyz,
            name='backbone')(pts_input, img, pts_xy, train=train,
                             under_grad=under_grad)

        # focal-loss prior init of the cls bias (rpn.py:259-262)
        pi = 0.01
        cls_bias = (constant_init(-math.log((1 - pi) / pi))
                    if cfg.RPN.LOSS_CLS == 'SigmoidFocalLoss'
                    else nn.initializers.zeros)
        dtype = compute_dtype(cfg)
        rpn_cls = HeadMLP(cfg.RPN.CLS_FC, 1, use_bn=cfg.RPN.USE_BN,
                          dp_ratio=cfg.RPN.DP_RATIO, out_bias_init=cls_bias,
                          dtype=dtype, name='cls_head')(feats, train=train)
        rpn_reg = HeadMLP(cfg.RPN.REG_FC, rpn_reg_channels(cfg),
                          use_bn=cfg.RPN.USE_BN, dp_ratio=cfg.RPN.DP_RATIO,
                          out_kernel_init=normal_init(0.001),
                          dtype=dtype, name='reg_head')(feats, train=train)
        return {'rpn_cls': rpn_cls, 'rpn_reg': rpn_reg,
                'backbone_xyz': xyz, 'backbone_features': feats}
