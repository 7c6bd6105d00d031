"""RCNN refinement head with re-identification (link / start-end) branches.

TPU rewrite of /root/reference/jmodt/detection/modeling/rcnn.py.  The per-RoI
point encoder (xyz-up MLP + merge + 3-level SA) runs batched over all RoIs of
all frames at once; the ReID correlation runs over fixed-size unique-track-id
buffers with validity masks instead of the reference's dynamic `torch.unique`
tensors (rcnn.py:145-156, 226-258) — every shape is static so the whole train
step is one compiled program.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from jmodt_tpu.config import Config
from jmodt_tpu.models.layers import (HeadMLP, PointwiseMLP, compute_dtype,
                                     normal_init)
from jmodt_tpu.models.pointnet2 import SAModuleMSG
from jmodt_tpu.models.proposal import first_k_indices


def rcnn_reg_channels(cfg: Config) -> int:
    """Regression width (reference rcnn.py:76-79)."""
    per_loc_bin = int(cfg.RCNN.LOC_SCOPE / cfg.RCNN.LOC_BIN_SIZE) * 2
    loc_y_bin = int(cfg.RCNN.LOC_Y_SCOPE / cfg.RCNN.LOC_Y_BIN_SIZE) * 2
    ch = per_loc_bin * 4 + cfg.RCNN.NUM_HEAD_BIN * 2 + 3
    return ch + (loc_y_bin * 2 if cfg.RCNN.LOC_Y_BY_BIN else 1)


class CorrelationHead(nn.Module):
    """The link / start-end 512->512->512->1 stack (reference rcnn.py:91-111),
    applied pointwise to |prev - next| correlation features.  Standalone so the
    tracker can run it on its own affinity features (tracker.py:86-110)."""
    hidden: tuple
    use_bn: bool = False
    dp_ratio: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        return HeadMLP(self.hidden, 1, use_bn=self.use_bn,
                       dp_ratio=self.dp_ratio, dtype=self.dtype,
                       name='mlp')(x, train=train)


def unique_tid_mean_features(tids: jnp.ndarray, feats: jnp.ndarray):
    """Fixed-shape equivalent of get_unique_tid_feature (rcnn.py:145-156):
    mean feature per unique positive track id.

    :param tids: (R,) track ids, 0 or negative = background
    :param feats: (R, C)
    :return: (utids (R,), uvalid (R,), ufeats (R, C)) — at most R uniques,
        compacted to the front, invalid slots zero.
    """
    r = tids.shape[0]
    sorted_t = jnp.sort(tids)
    prev = jnp.concatenate([jnp.full((1,), -jnp.inf, sorted_t.dtype), sorted_t[:-1]])
    is_new = (sorted_t != prev) & (sorted_t > 0)
    pos, valid = first_k_indices(is_new, r)
    utids = jnp.where(valid, sorted_t[pos], 0.0)
    match = (utids[:, None] == tids[None, :]) & (tids[None, :] > 0) & valid[:, None]
    w = match.astype(feats.dtype)
    w = w / jnp.clip(jnp.sum(w, axis=1, keepdims=True), 1.0, None)
    return utids, valid, w @ feats


def masked_bidirectional_softmax(scores, row_valid, col_valid):
    """(softmax over valid cols + softmax over valid rows) / 2 — the
    link-score normalization (rcnn.py:246-248, tracker.py:87-89), restricted
    to the valid sub-matrix. scores (P, D)."""
    # -1e9 instead of -inf: an all-invalid row must stay NaN-free (its softmax
    # output is discarded by the final where, but NaN would poison gradients)
    neg = jnp.asarray(-1e9, scores.dtype)
    masked = jnp.where(row_valid[:, None] & col_valid[None, :], scores, neg)
    sm_row = jax.nn.softmax(masked, axis=1)  # over detections
    sm_col = jax.nn.softmax(masked, axis=0)  # over tracks
    out = (sm_row + sm_col) / 2
    return jnp.where(row_valid[:, None] & col_valid[None, :], out, 0.0)


class RCNN(nn.Module):
    """forward: pts_input (R, NUM_POINTS, 5 + 128) with channels
    [canonical xyz, seg mask, depth, rpn features] (reference rcnn.py:176-196).

    Returns rcnn_cls (R, 1), rcnn_reg (R, C), rcnn_feat (R, 512), and — when
    `gt_tids` (B, ROI_PER_IMAGE) is given — the ReID link/start/end scores and
    labels over fixed-size unique-tid buffers (reference rcnn.py:204-287).
    """
    cfg: Config
    use_xyz: bool = True

    @nn.compact
    def __call__(self, pts_input, gt_tids: Optional[jnp.ndarray] = None,
                 train: bool = False):
        cfg = self.cfg
        rc = cfg.RCNN
        rcnn_input_channel = 3 + int(rc.USE_INTENSITY) + int(rc.USE_MASK) \
            + int(rc.USE_DEPTH)

        dtype = compute_dtype(cfg)
        xyz = pts_input[..., 0:3]
        if rc.USE_RPN_FEATURES:
            xyz_feature = PointwiseMLP(rc.XYZ_UP_LAYER, use_bn=rc.USE_BN,
                                       dtype=dtype, name='xyz_up')(
                pts_input[..., :rcnn_input_channel], train=train)
            rpn_feature = pts_input[..., rcnn_input_channel:]
            merged = jnp.concatenate(
                [xyz_feature, rpn_feature.astype(xyz_feature.dtype)], axis=-1)
            feats = PointwiseMLP((rc.XYZ_UP_LAYER[-1],), use_bn=rc.USE_BN,
                                 dtype=dtype, name='merge_down')(
                merged, train=train)
        else:
            feats = pts_input[..., 3:]

        l_xyz, l_feats = xyz, feats
        sa_cls = (nn.remat(SAModuleMSG, static_argnums=(3,))
                  if cfg.RPN.REMAT else SAModuleMSG)
        for k in range(len(rc.SA_CONFIG.NPOINTS)):
            npoint = rc.SA_CONFIG.NPOINTS[k]
            l_xyz, l_feats, _ = sa_cls(
                npoint=npoint if npoint != -1 else None,
                radii=(rc.SA_CONFIG.RADIUS[k],),
                nsamples=(rc.SA_CONFIG.NSAMPLE[k],),
                mlps=(tuple(rc.SA_CONFIG.MLPS[k]),),
                use_xyz=self.use_xyz, use_bn=rc.USE_BN, dtype=dtype,
                use_pallas_fps=cfg.RPN.USE_PALLAS_FPS,
                fused_eval=rc.FUSED_SA,
                name=f'sa_{k}')(l_xyz, l_feats, train)
        # (R, 512): GroupAll leaves one group; f32 from here on — the feature
        # feeds the ReID correlation + tracker affinities
        feat_vec = l_feats[:, 0, :].astype(jnp.float32)

        rcnn_cls = HeadMLP(rc.CLS_FC, 1, use_bn=rc.USE_BN,
                           dp_ratio=rc.DP_RATIO,
                           kernel_init=nn.initializers.xavier_normal(),
                           dtype=dtype, name='cls_head')(feat_vec, train=train)
        rcnn_reg = HeadMLP(rc.REG_FC, rcnn_reg_channels(cfg), use_bn=rc.USE_BN,
                           dp_ratio=rc.DP_RATIO,
                           kernel_init=nn.initializers.xavier_normal(),
                           out_kernel_init=normal_init(0.001),
                           dtype=dtype, name='reg_head')(feat_vec, train=train)
        out = {'rcnn_cls': rcnn_cls, 'rcnn_reg': rcnn_reg,
               'rcnn_feat': feat_vec}
        if cfg.USE_IOU_BRANCH:
            out['rcnn_iou_branch'] = HeadMLP(
                rc.REG_FC, 1, use_bn=rc.USE_BN, dp_ratio=rc.DP_RATIO,
                kernel_init=nn.initializers.xavier_normal(),
                dtype=dtype, name='iou_branch')(feat_vec, train=train)

        link_head = CorrelationHead(cfg.REID.LINK_FC, use_bn=cfg.REID.USE_BN,
                                    dp_ratio=rc.DP_RATIO, dtype=dtype,
                                    name='link_layer')
        se_head = CorrelationHead(cfg.REID.SE_FC, use_bn=cfg.REID.USE_BN,
                                  dp_ratio=rc.DP_RATIO, dtype=dtype,
                                  name='se_layer')

        if gt_tids is not None and cfg.REID.ENABLED:
            out.update(self._reid(feat_vec, gt_tids, link_head, se_head, train))
        else:
            # materialize the head params even on paths that skip ReID so the
            # checkpoint always has them (needed by the tracker)
            _ = link_head(jnp.zeros((1, feat_vec.shape[-1])), train=False)
            _ = se_head(jnp.zeros((1, feat_vec.shape[-1])), train=False)
        return out

    def _reid(self, feat_vec, gt_tids, link_head, se_head, train):
        """Train-time correlation branches (reference rcnn.py:204-287) over
        (prev, next) frame pairs interleaved as even/odd batch rows
        (kitti_dataset.py:419-456)."""
        num_frames, n_roi = gt_tids.shape
        assert num_frames % 2 == 0, 'pair training needs even frame count'
        feats = feat_vec.reshape(num_frames, n_roi, -1)
        prev_tids, next_tids = gt_tids[0::2], gt_tids[1::2]
        prev_feats, next_feats = feats[0::2], feats[1::2]

        def per_pair(pt, nt, pf, nf, link_fn, se_fn):
            put, pvalid, pfeat = unique_tid_mean_features(pt, pf)
            nut, nvalid, nfeat = unique_tid_mean_features(nt, nf)
            pair_ok = jnp.any(pvalid) & jnp.any(nvalid)
            pvalid = pvalid & pair_ok
            nvalid = nvalid & pair_ok
            entry_ok = pvalid[:, None] & nvalid[None, :]

            cor = jnp.abs(pfeat[:, None, :] - nfeat[None, :, :])  # (U, U, C)
            link_raw = link_fn(cor)[..., 0]
            link = masked_bidirectional_softmax(link_raw, pvalid, nvalid)
            gt_link = ((put[:, None] == nut[None, :]) & entry_ok).astype(cor.dtype)

            gt_start = jnp.where(nvalid, 1.0 - jnp.sum(gt_link, axis=0), 0.0)
            gt_end = jnp.where(pvalid, 1.0 - jnp.sum(gt_link, axis=1), 0.0)
            pw = pvalid.astype(cor.dtype)
            nw = nvalid.astype(cor.dtype)
            start_feat = (jnp.sum(cor * pw[:, None, None], axis=0)
                          / jnp.clip(jnp.sum(pw), 1.0, None))  # (U, C)
            end_feat = (jnp.sum(cor * nw[None, :, None], axis=1)
                        / jnp.clip(jnp.sum(nw), 1.0, None))
            start = se_fn(start_feat)[..., 0]
            end = se_fn(end_feat)[..., 0]
            return dict(link=link, gt_link=gt_link, link_mask=entry_ok,
                        start=start, gt_start=gt_start, start_mask=nvalid,
                        end=end, gt_end=gt_end, end_mask=pvalid)

        pairs = [per_pair(prev_tids[i], next_tids[i], prev_feats[i],
                          next_feats[i],
                          lambda x: link_head(x, train=train),
                          lambda x: se_head(x, train=train))
                 for i in range(num_frames // 2)]
        stacked = {k: jnp.stack([p[k] for p in pairs]) for k in pairs[0]}
        return {f'reid_{k}': v for k, v in stacked.items()}
