"""PointNet++ set-abstraction and feature-propagation modules in flax.

TPU rewrite of /root/reference/jmodt/ops/pointnet2/pointnet2_modules.py.
Feature layout is (B, N, C) (feature-last) throughout — the grouped-MLP
becomes a batched Dense over (B*M*S, C) rows, which XLA tiles directly onto
the MXU; the reference's (B, C, M, S) Conv2d-1x1 layout would force transposes
on TPU.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from jmodt_tpu.models.layers import PointwiseMLP
from jmodt_tpu.ops.fused_sa import fold_pointwise_mlp, fused_sa_eval
from jmodt_tpu.ops.grouping import (ball_query, ball_query_multi,
                                    group_points_fl, group_xyz)
from jmodt_tpu.ops.interpolate import three_interpolate_fl, three_nn
from jmodt_tpu.ops.sampling import farthest_point_sample, gather_xyz


class SAModuleMSG(nn.Module):
    """Multi-scale-grouping set abstraction (reference PointnetSAModuleMSG,
    pointnet2_modules.py:356-390).

    forward: xyz (B, N, 3), features (B, N, C) | None ->
        new_xyz (B, npoint, 3), new_features (B, npoint, sum(mlps[-1])),
        idx (B, npoint) FPS indices (consumed by LI-Fusion to gather the
        image-projection coordinates, backbone.py:169-171).
    """
    npoint: Optional[int]
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    use_bn: bool = True
    dtype: Any = None
    use_pallas_fps: bool = False
    fused_eval: bool = False
    mega_eval: bool = False

    @nn.compact
    def __call__(self, xyz, features=None, train: bool = False,
                 under_grad: bool = False):
        assert len(self.radii) == len(self.nsamples) == len(self.mlps)

        # Whole-level Pallas megakernel (ops/pallas/sa_level.py): FPS +
        # ball query + gather + MLP + max in ONE program.  Eval-only
        # (folded BN running stats), never under AD (no JVP — same
        # hazard class as the fused-SA gate below), TPU-only, and only
        # where the shape gate passes (backbone levels 1-3).  Selection
        # is index-exact vs the plain path; MLP values differ by float
        # reassociation only (test-pinned).
        if (self.mega_eval and not self.is_initializing()
                and not train and not under_grad
                and self.npoint is not None and self.use_xyz
                and jax.default_backend() == 'tpu'):
            from jmodt_tpu.ops.pallas.sa_level import (sa_level_fused,
                                                       sa_level_supported)
            fc = 0 if features is None else features.shape[-1]
            if sa_level_supported(xyz.shape[1], self.npoint, fc):
                folded = [
                    fold_pointwise_mlp(
                        self.variables['params'][f'mlp_{i}'],
                        self.variables['batch_stats'][f'mlp_{i}']
                        if self.use_bn else None)
                    for i in range(len(self.radii))]
                return sa_level_fused(xyz, features, self.npoint,
                                      tuple(self.radii),
                                      tuple(self.nsamples), folded)
        # geometry (FPS, ball query) always runs on f32 coordinates; only the
        # grouped-feature MLP compute drops to self.dtype
        if self.npoint is not None:
            idx = farthest_point_sample(xyz, self.npoint,
                                        use_pallas=self.use_pallas_fps)
            new_xyz = gather_xyz(xyz, idx)
        else:
            idx = None
            new_xyz = None

        cdt = self.dtype or xyz.dtype

        # one shared distance computation for all MSG scales (the scales
        # query identical centroids against the identical cloud); at the
        # level-0 shape this saves a full 268 MB d2 materialization per
        # extra scale.  Selection semantics per scale == ball_query.
        nbrs = None
        if self.npoint is not None:
            if len(self.radii) > 1:
                nbrs = ball_query_multi(tuple(self.radii),
                                        tuple(self.nsamples), xyz, new_xyz)
            else:
                nbrs = (ball_query(self.radii[0], self.nsamples[0], xyz,
                                   new_xyz),)

        # Fused fast path: BN-folded gather->MLP->max (ops/fused_sa.py,
        # Pallas VMEM kernel on TPU), one fused kernel per MSG scale.
        # Used by the RCNN head (single-scale, where B=num_rois makes the
        # unfused grouped intermediates cost ~30x their FLOPs in HBM
        # traffic) and by the RPN backbone's multi-scale levels 1-3 (small
        # N, so the one-hot MXU gather is a few GFLOP while the unfused
        # chain of tiny grouped ops is latency-bound — measured 2-4 ms per
        # level standalone on the v5e).  Init runs the plain path below so
        # the param tree is identical.  Train is eligible only without BN
        # (no batch statistics to update); there the XLA form runs — same
        # math, differentiable by autodiff — since the Pallas kernel
        # defines no VJP.  `under_grad` marks a call whose surrounding
        # apply is differentiated even though this module runs eval-mode
        # (the frozen-RPN finetune: cfg.RPN.FIXED makes rpn_train=False
        # while jax.grad still linearizes the whole forward and the RPN
        # params carry tangents into this block — the round-4 ladder
        # stage-3 crash) — it forces the XLA form too.  The fused path
        # always computes f32 even under
        # cfg.DTYPE=bfloat16: its win is HBM traffic, not dtype (bf16
        # measured a wash end-to-end, CLAUDE.md), and the one-hot MXU
        # gather must stay exact.
        if (self.fused_eval and not self.is_initializing()
                and (not train or not self.use_bn)
                and self.npoint is not None and self.use_xyz):
            outs = []
            for i, (radius, nsample) in enumerate(
                    zip(self.radii, self.nsamples)):
                nbr = nbrs[i]
                folded = fold_pointwise_mlp(
                    self.variables['params'][f'mlp_{i}'],
                    self.variables['batch_stats'][f'mlp_{i}']
                    if self.use_bn else None)
                outs.append(fused_sa_eval(
                    xyz, features, new_xyz, nbr, folded,
                    use_pallas=False if (train or under_grad) else None))
            out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, -1)
            return new_xyz, out, idx
        outs = []
        for i, (radius, nsample, mlp) in enumerate(
                zip(self.radii, self.nsamples, self.mlps)):
            if self.npoint is not None:
                nbr = nbrs[i]                                    # (B, M, S)
                grouped_xyz = (group_xyz(xyz, nbr)
                               - new_xyz[:, :, None, :]).astype(cdt)
                if features is not None:
                    grouped = group_points_fl(features, nbr).astype(cdt)
                    g = (jnp.concatenate([grouped_xyz, grouped], axis=-1)
                         if self.use_xyz else grouped)
                else:
                    assert self.use_xyz
                    g = grouped_xyz
            else:
                # GroupAll (pointnet2_utils.py::GroupAll): one group of all pts
                grouped_xyz = xyz[:, None, :, :].astype(cdt)  # (B, 1, N, 3)
                if features is not None:
                    g = (jnp.concatenate(
                            [grouped_xyz, features[:, None].astype(cdt)],
                            axis=-1)
                         if self.use_xyz else features[:, None].astype(cdt))
                else:
                    g = grouped_xyz
            g = PointwiseMLP(tuple(mlp), use_bn=self.use_bn, dtype=self.dtype,
                             name=f'mlp_{i}')(g, train=train)
            outs.append(jnp.max(g, axis=2))  # max-pool over the sample dim
        return new_xyz, jnp.concatenate(outs, axis=-1), idx


class SAModule(SAModuleMSG):
    """Single-scale wrapper (reference PointnetSAModule,
    pointnet2_modules.py:393-411). Construct via `make_sa_module`."""


def make_sa_module(mlp, npoint=None, radius=None, nsample=None,
                   use_xyz=True, use_bn=True, name=None):
    return SAModuleMSG(npoint=npoint, radii=(radius,), nsamples=(nsample,),
                       mlps=(tuple(mlp),), use_xyz=use_xyz, use_bn=use_bn,
                       name=name)


class FPModule(nn.Module):
    """Feature propagation (reference PointnetFPModule,
    pointnet2_modules.py:414-453): inverse-distance-weighted 3-NN
    interpolation + skip concat + shared MLP."""
    mlp: Sequence[int]
    use_bn: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats,
                 train: bool = False):
        """unknown (B, n, 3); known (B, m, 3) | None;
        unknown_feats (B, n, C1) | None; known_feats (B, m, C2) ->
        (B, n, mlp[-1])."""
        cdt = self.dtype or known_feats.dtype
        if known is not None:
            # 3-NN distances/weights on f32 coordinates; gather in cdt
            dist, idx = three_nn(unknown, known)
            recip = 1.0 / (dist + 1e-8)
            weight = (recip / jnp.sum(recip, axis=2, keepdims=True))
            interp = three_interpolate_fl(known_feats.astype(cdt), idx,
                                          weight.astype(cdt))  # (B, n, C2)
        else:
            interp = jnp.broadcast_to(
                known_feats, (known_feats.shape[0], unknown.shape[1],
                              known_feats.shape[2])).astype(cdt)
        if unknown_feats is not None:
            new = jnp.concatenate([interp, unknown_feats.astype(cdt)], axis=-1)
        else:
            new = interp
        return PointwiseMLP(tuple(self.mlp), use_bn=self.use_bn,
                            dtype=self.dtype)(new, train=train)
