"""PointNet++-MSG backbone with EPNet-style LI-Fusion.

TPU rewrite of /root/reference/jmodt/detection/modeling/backbone.py:92-198
(PointNet2MSG): 4 SA levels with per-level image-feature fusion, 4 FP levels,
and a final full-resolution image fusion.  Feature-last layouts throughout.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from jmodt_tpu.config import Config
from jmodt_tpu.models.image_backbone import (
    BasicBlock, ImagePyramidFusion, feature_gather)
from jmodt_tpu.models.layers import PointwiseLayer, compute_dtype
from jmodt_tpu.models.pointnet2 import FPModule, SAModuleMSG


class IALayer(nn.Module):
    """Image-attention gate (reference IALayer, backbone.py:33-58):
    att = sigmoid(fc3(tanh(fc1(img) + fc2(point)))); the image feature is
    lifted to point-channel width (conv1 + BN + ReLU, always batch-normed)
    and scaled by att.

    Inputs feature-last: img_feas (B, N, IC), point_feas (B, N, PC)."""
    point_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, img_feas, point_feas, train: bool = False):
        rc = self.point_channels // 4
        ri = nn.Dense(rc, dtype=self.dtype)(img_feas)
        rp = nn.Dense(rc, dtype=self.dtype)(point_feas)
        att = nn.sigmoid(nn.Dense(1, dtype=self.dtype)(nn.tanh(ri + rp)))
        img_new = PointwiseLayer(self.point_channels, use_bn=True,
                                 dtype=self.dtype)(img_feas, train=train)
        return img_new * att


class AttentionFusion(nn.Module):
    """concat(point, gated image) -> 1x1 conv + BN + ReLU (reference
    AttentionFusion, backbone.py:61-76)."""
    point_channels: int
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, point_features, img_features, train: bool = False):
        gated = IALayer(self.point_channels, dtype=self.dtype)(
            img_features, point_features, train=train)
        fused = jnp.concatenate(
            [point_features.astype(gated.dtype), gated], axis=-1)
        return PointwiseLayer(self.out_channels, use_bn=True,
                              dtype=self.dtype)(fused, train=train)


class PointNet2MSG(nn.Module):
    """The full fused backbone (reference backbone.py:92-198).

    __call__: pc (B, N, 3 + C_in), image (B, H, W, 3) | None,
    xy (B, N, 2) in [-1, 1] | None -> (xyz (B, N, 3), features (B, N, 128)).
    """
    cfg: Config
    input_channels: int = 0
    use_xyz: bool = True

    @nn.compact
    def __call__(self, pc, image=None, xy=None, train: bool = False,
                 under_grad: bool = False):
        cfg = self.cfg
        sa_cfg = cfg.RPN.SA_CONFIG
        li = cfg.LI_FUSION
        use_fusion = li.ENABLED and image is not None
        dtype = compute_dtype(cfg)

        xyz = pc[..., 0:3]
        features = pc[..., 3:] if pc.shape[-1] > 3 else None

        # channel bookkeeping mirrors backbone.py:98-117
        channel_in = self.input_channels
        skip_channels = [self.input_channels]
        sa_specs = []
        for k in range(len(sa_cfg.NPOINTS)):
            mlps = [list(m) for m in sa_cfg.MLPS[k]]
            channel_out = 0
            for idx in range(len(mlps)):
                mlps[idx] = [channel_in] + mlps[idx]
                channel_out += mlps[idx][-1]
            # use_xyz adds 3 input channels; flax infers input width, we only
            # need the *output* widths of each MLP layer
            sa_specs.append(tuple(tuple(m[1:]) for m in mlps))
            skip_channels.append(channel_out)
            channel_in = channel_out

        l_xyz, l_features = [xyz], [features]
        l_xy = [xy]
        img_levels = []
        img = image

        # remat: recompute SA internals (ball-query masks, grouped
        # neighborhoods) in the backward pass instead of saving them
        sa_cls = (nn.remat(SAModuleMSG, static_argnums=(3, 4))
                  if cfg.RPN.REMAT else SAModuleMSG)
        fp_cls = (nn.remat(FPModule, static_argnums=(5,))
                  if cfg.RPN.REMAT else FPModule)

        for k in range(len(sa_cfg.NPOINTS)):
            # fused eval path only where the one-hot gather is cheap: the
            # contraction is O(M*S*N*C1), so level 0 (N=16384) stays on
            # the plain path while levels 1-3 (N<=4096) fuse
            fused_k = (cfg.RPN.FUSED_SA and self.use_xyz
                       and l_xyz[k].shape[1] <= 8192)
            li_xyz, li_feat, li_idx = sa_cls(
                npoint=sa_cfg.NPOINTS[k],
                radii=sa_cfg.RADIUS[k],
                nsamples=sa_cfg.NSAMPLE[k],
                mlps=sa_specs[k],
                use_xyz=self.use_xyz,
                use_bn=cfg.RPN.USE_BN,
                dtype=dtype,
                use_pallas_fps=cfg.RPN.USE_PALLAS_FPS,
                fused_eval=fused_k,
                mega_eval=(getattr(cfg.RPN, 'MEGA_SA', False)
                           and self.use_xyz
                           and l_xyz[k].shape[1] <= 8192),
                name=f'sa_{k}')(l_xyz[k], l_features[k], train, under_grad)

            if use_fusion:
                li_xy = jnp.take_along_axis(
                    l_xy[k], li_idx[:, :, None].astype(jnp.int32), axis=1)
                img = BasicBlock(li.IMG_CHANNELS[k + 1], dtype=dtype,
                                 name=f'img_block_{k}')(img, train=train)
                img_pts = feature_gather(img, li_xy)
                li_feat = AttentionFusion(
                    point_channels=li.POINT_CHANNELS[k],
                    out_channels=li.POINT_CHANNELS[k],
                    dtype=dtype,
                    name=f'fusion_{k}')(li_feat, img_pts, train=train)
                l_xy.append(li_xy)
                img_levels.append(img)

            l_xyz.append(li_xyz)
            l_features.append(li_feat)

        # FP stack, finest-last iteration order (backbone.py:182-185)
        n_fp = len(cfg.RPN.FP_MLPS)
        fp_modules = [fp_cls(mlp=tuple(cfg.RPN.FP_MLPS[k]),
                             use_bn=cfg.RPN.USE_BN, dtype=dtype,
                             name=f'fp_{k}')
                      for k in range(n_fp)]
        for i in range(-1, -(n_fp + 1), -1):
            l_features[i - 1] = fp_modules[i](
                l_xyz[i - 1], l_xyz[i], l_features[i - 1], l_features[i],
                train)

        if use_fusion:
            pyramid = ImagePyramidFusion(
                reduce_channels=li.DeConv_Reduce,
                kernels=li.DeConv_Kernels,
                out_channels=li.IMG_FEATURES_CHANNEL // 4,
                dtype=dtype,
                name='img_pyramid')
            # `not under_grad`: keep the formulation choice stable under
            # jax.grad (cfg.RPN.FIXED finetune runs this with train=False
            # inside a differentiated apply — same hazard class as the
            # fused-SA Pallas gate, ADVICE r4 medium)
            if li.FUSED_PYRAMID and not train and not under_grad:
                # eval: sample the pyramid at the points directly — the
                # full-res fused map is never materialized (config.py
                # LIFusionConfig.FUSED_PYRAMID)
                img_pts_full = pyramid(img_levels, train=False, xy=xy)
            else:
                img_full = pyramid(img_levels, train=train)
                img_pts_full = feature_gather(img_full, xy)
            l_features[0] = AttentionFusion(
                point_channels=li.IMG_FEATURES_CHANNEL,
                out_channels=li.IMG_FEATURES_CHANNEL,
                dtype=dtype,
                name='final_fusion')(l_features[0], img_pts_full, train=train)

        return l_xyz[0], l_features[0]
