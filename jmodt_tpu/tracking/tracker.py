"""Online per-sequence multi-object tracker.

Port of /root/reference/jmodt/tracking/tracker.py with a TPU-native split:

  * device (one jitted program per shape bucket): |pred - det| correlation,
    link head + bidirectional softmax, rotated IoU3D, normalized center
    distance, start/end scores — everything matrix-shaped
    (tracker.py:81-124 in the reference, where it runs op-by-op on CUDA);
  * host: Kalman predict/update, the discrete assignment solver, and track
    lifecycle (same split as the reference, whose solver also runs on host,
    data_association.py:45).

Track/detection counts vary per frame, so device calls are padded to fixed
shape buckets — each bucket compiles once and a whole KITTI sequence streams
through compiled programs only (SURVEY.md §5 long-context note).
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from jmodt_tpu.models.rcnn import masked_bidirectional_softmax
from jmodt_tpu.ops.geometry import boxes_center_dist_affinity
from jmodt_tpu.ops.rotated_iou import boxes_iou3d
from jmodt_tpu.tracking.data_association import hungarian_match, mip_solve
from jmodt_tpu.tracking.track import Track

_BUCKETS = (8, 16, 32, 64, 128, 256)


def _bucket(n: int) -> int:
    for b in _BUCKETS:
        if n <= b:
            return b
    return ((n + 255) // 256) * 256


def _pad2(x: np.ndarray, n: int) -> np.ndarray:
    out = np.zeros((n,) + x.shape[1:], x.dtype)
    out[:x.shape[0]] = x
    return out


def make_affinity_fn(link_apply: Callable, se_apply: Callable,
                     w_app: float, w_iou: float, w_dis: float) -> Callable:
    """The per-frame device program.  `link_apply(link_params, x)` /
    `se_apply(se_params, x)` map (..., C) correlation features to (..., 1)
    scores (the trained link/se heads, reference tracker.py:86-110).

    Params are runtime ARGUMENTS, never closure captures: a captured weight
    becomes a hoisted executable constant, which this relay's executable
    cache handles poorly when other large programs run in the same process
    (CLAUDE.md program-poison rule #2).  Same convention as the performance
    path (device_tracker.py)."""

    @jax.jit
    def affinity(link_params, se_params, pred_feats, det_feats,
                 pred_boxes, det_boxes, pred_mask, det_mask):
        cor = jnp.abs(pred_feats[:, None, :] - det_feats[None, :, :])
        link_raw = link_apply(link_params, cor)[..., 0]
        link = masked_bidirectional_softmax(link_raw, pred_mask, det_mask)
        iou = boxes_iou3d(pred_boxes, det_boxes)
        dis = boxes_center_dist_affinity(pred_boxes, det_boxes)
        pair_ok = (pred_mask[:, None] & det_mask[None, :])
        combined = jnp.where(
            pair_ok, link * w_app + iou * w_iou + dis * w_dis, 0.0)

        pw = pred_mask.astype(cor.dtype)
        dw = det_mask.astype(cor.dtype)
        start_feat = (jnp.sum(cor * pw[:, None, None], axis=0)
                      / jnp.clip(jnp.sum(pw), 1.0, None))   # (D, C)
        end_feat = (jnp.sum(cor * dw[None, :, None], axis=1)
                    / jnp.clip(jnp.sum(dw), 1.0, None))     # (P, C)
        start = jax.nn.sigmoid(se_apply(se_params, start_feat)[..., 0])
        end = jax.nn.sigmoid(se_apply(se_params, end_feat)[..., 0])
        return combined, start, end

    return affinity


class Tracker:
    """Reference Tracker (tracker.py:8-143).  `link_apply(link_params, x)` /
    `se_apply(se_params, x)` take (..., C) features and return (..., 1) raw
    scores; params are threaded through every device call as arguments."""

    def __init__(self, link_apply: Callable, se_apply: Callable,
                 link_params=None, se_params=None,
                 t_miss: int = 2, t_hit: int = 0, w_cls: float = 100.0,
                 w_app: float = 2.0, w_iou: float = 10.0, w_dis: float = 10.0,
                 w_se: float = 1.0, hungarian: bool = False,
                 score_thresh: float = 0.0, match_thresh: float = 0.0):
        self.link_params = link_params
        self.se_params = se_params
        self.t_miss = t_miss
        self.t_hit = t_hit
        self.w_cls = w_cls
        self.w_se = w_se
        self.hungarian = hungarian
        self.score_thresh = score_thresh
        self.match_thresh = match_thresh
        self._affinity = make_affinity_fn(link_apply, se_apply,
                                          w_app, w_iou, w_dis)
        self.tracks: List[Track] = []
        self.frame_count = 0
        self.last_frame_idx = 0

    def reset(self):
        self.tracks = []
        self.frame_count = 0
        self.last_frame_idx = 0
        Track.new_id = 1

    def track_management(self):
        """Emit confirmed live tracks and prune dead ones (tracker.py:35-46)."""
        results = []
        for idx in reversed(range(len(self.tracks))):
            trk = self.tracks[idx]
            if trk.hits >= self.t_hit or self.frame_count <= self.t_hit:
                if trk.misses == 0:
                    results.append(trk.get_data())
            if trk.misses >= self.t_miss:
                self.tracks.pop(idx)
        return results

    def update(self, frame_id: int, boxes_3d: np.ndarray,
               det_scores: np.ndarray, det_features: np.ndarray,
               frame_detections: Sequence) -> List:
        """One frame (reference tracker.py:48-143).  boxes_3d (D, 7),
        det_scores (D,), det_features (D, C); frame_detections is the
        per-detection payload carried into the output rows."""
        num_det = len(det_scores)
        num_pred = len(self.tracks)
        if num_det == 0:
            return []

        passed = frame_id - self.last_frame_idx
        self.frame_count += passed
        self.last_frame_idx = frame_id

        if num_pred == 0:
            for d in range(num_det):
                self.tracks.append(Track(
                    bbox=boxes_3d[d], score=det_scores[d],
                    feature=det_features[d], info=frame_detections[d]))
            return self.track_management()

        pred_boxes, pred_scores, pred_feats = [], [], []
        for trk in self.tracks:
            box, score, feat = trk.predict(passed)
            pred_boxes.append(box)
            pred_scores.append(score)
            pred_feats.append(np.asarray(feat))
        pred_boxes = np.stack(pred_boxes).astype(np.float32)
        pred_scores = np.asarray(pred_scores, np.float32)
        pred_feats = np.stack(pred_feats).astype(np.float32)
        det_features = np.asarray(det_features, np.float32)
        boxes_3d = np.asarray(boxes_3d, np.float32)

        p_pad, d_pad = _bucket(num_pred), _bucket(num_det)
        pred_mask = np.arange(p_pad) < num_pred
        det_mask = np.arange(d_pad) < num_det
        combined, start, end = self._affinity(
            self.link_params, self.se_params,
            _pad2(pred_feats, p_pad), _pad2(det_features, d_pad),
            _pad2(pred_boxes, p_pad), _pad2(boxes_3d.astype(np.float32), d_pad),
            pred_mask, det_mask)
        link_matrix = np.asarray(combined)[:num_pred, :num_det]

        if self.hungarian:
            matched, unmatched, tentative = hungarian_match(
                link_matrix, det_scores,
                score_threshold=self.score_thresh,
                match_threshold=self.match_thresh)
        else:
            cls_scores = self.w_cls * (
                np.concatenate([pred_scores, det_scores]) - 1.0)
            start_scores = np.concatenate([
                np.zeros(num_pred),
                self.w_se * np.asarray(start)[:num_det]])
            end_scores = np.concatenate([
                self.w_se * np.asarray(end)[:num_pred],
                np.zeros(num_det)])
            matched, unmatched, tentative = mip_solve(
                cls_scores, link_matrix, start_scores, end_scores)

        for t, d in matched:
            self.tracks[t].update_with_feature(
                boxes_3d[d], det_features[d], det_scores[d],
                info=frame_detections[d])
        for i in unmatched:
            self.tracks.append(Track(
                bbox=boxes_3d[i], feature=det_features[i],
                score=det_scores[i], info=frame_detections[i]))
        for i in tentative:
            trk = Track(bbox=boxes_3d[i], feature=det_features[i],
                        score=det_scores[i], info=frame_detections[i])
            trk.misses += 1
            self.tracks.append(trk)
        return self.track_management()
