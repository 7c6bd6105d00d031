"""Synthetic KITTI-shaped scenes.

Produces batches with the exact contract of the real pipeline
(reference jmodt/detection/datasets/kitti_dataset.py:260-301 and the
pair-interleaving collate at :419-456) without needing the KITTI dataset on
disk: plausible car-shaped point clusters on a ground plane, a pinhole
projection for pts_xy, per-point RPN labels, and (prev, next) frame pairs
with persistent track ids and small motion.

Used by tests, bench.py, __graft_entry__.py, and the tools/ CLIs when no
--data_root is given (this image carries no real KITTI data).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from jmodt_tpu.config import Config

# KITTI image size after padding (kitti_dataset.py:13,105-106)
IMG_H, IMG_W = 384, 1280
# a KITTI-like P2 focal/center (unused scale realism only)
_FU, _FV, _CU, _CV = 720.0, 720.0, 620.0, 190.0


def _rotate_y(pts: np.ndarray, ry: float) -> np.ndarray:
    c, s = np.cos(ry), np.sin(ry)
    rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
    return pts @ rot.T


def _car_surface_points(box: np.ndarray, n: int,
                        rng: np.random.RandomState) -> np.ndarray:
    """Points on the visible faces of a box [x, y, z, h, w, l, ry]
    (y = bottom center, KITTI rect convention)."""
    x, y, z, h, w, l, ry = box
    face = rng.randint(0, 3, n)
    u = rng.uniform(-0.5, 0.5, n).astype(np.float32)
    v = rng.uniform(-0.5, 0.5, n).astype(np.float32)
    local = np.zeros((n, 3), np.float32)
    # side face (x = +-w/2), rear face (z = +-l/2), roof (y = -h)
    side = face == 0
    rear = face == 1
    roof = face == 2
    local[side] = np.stack([np.sign(u[side]) * w / 2, -(v[side] + 0.5) * h,
                            u[side] * l], axis=1)
    local[rear] = np.stack([u[rear] * w, -(v[rear] + 0.5) * h,
                            np.sign(v[rear]) * l / 2], axis=1)
    local[roof] = np.stack([u[roof] * w, -h * np.ones(roof.sum(), np.float32),
                            v[roof] * l], axis=1)
    return _rotate_y(local, ry) + np.array([x, y, z], np.float32)


def _in_box_mask(pts: np.ndarray, box: np.ndarray, extra: float = 0.0
                 ) -> np.ndarray:
    x, y, z, h, w, l, ry = box
    local = _rotate_y(pts - np.array([x, y, z], np.float32), -ry)
    return ((np.abs(local[:, 0]) <= w / 2 + extra)
            & (np.abs(local[:, 2]) <= l / 2 + extra)
            & (local[:, 1] <= extra) & (local[:, 1] >= -h - extra))


def rpn_labels(pts: np.ndarray, gt_boxes: np.ndarray, gt_valid: np.ndarray):
    """Per-point cls/reg labels (reference generate_rpn_training_labels,
    kitti_dataset.py:304-334): 1 inside a gt box, -1 in the 0.2 m enlarged
    fringe, 0 elsewhere; reg target is the offset to the box *center*
    (y shifted up by h/2) plus size and ry."""
    n = pts.shape[0]
    cls_label = np.zeros(n, np.int32)
    reg_label = np.zeros((n, 7), np.float32)
    for k in range(gt_boxes.shape[0]):
        if not gt_valid[k]:
            continue
        box = gt_boxes[k]
        fg = _in_box_mask(pts, box)
        enlarged = _in_box_mask(pts, box, extra=0.2)
        cls_label[np.logical_xor(fg, enlarged)] = -1
        cls_label[fg] = 1
        center = box[0:3].copy()
        center[1] -= box[3] / 2
        reg_label[fg, 0:3] = center - pts[fg]
        reg_label[fg, 3:6] = box[3:6]
        reg_label[fg, 6] = box[6]
    return cls_label, reg_label


def make_scene(rng: np.random.RandomState, cfg: Config,
               npoints: Optional[int] = None, max_gt: int = 8,
               num_cars: Optional[int] = None,
               base_boxes: Optional[np.ndarray] = None,
               img_hw=(IMG_H, IMG_W)) -> Dict[str, np.ndarray]:
    """One frame: points (N, 3), img (H, W, 3), pts_xy (N, 2 in [-1, 1]),
    gt_boxes3d (max_gt, 7) zero-padded, gt_valid (max_gt,)."""
    n = npoints or cfg.RPN.NUM_POINTS
    ncars = num_cars if num_cars is not None else rng.randint(2, 6)
    mean = np.asarray(cfg.mean_size)

    if base_boxes is None:
        boxes = np.zeros((ncars, 7), np.float32)
        boxes[:, 0] = rng.uniform(-15, 15, ncars)       # x
        boxes[:, 1] = rng.uniform(1.4, 1.8, ncars)      # y (bottom)
        boxes[:, 2] = rng.uniform(8, 60, ncars)         # z
        boxes[:, 3:6] = mean * rng.uniform(0.9, 1.1, (ncars, 3))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, ncars)
    else:
        boxes = base_boxes.copy()
        ncars = boxes.shape[0]

    per_car = max(32, int(n * 0.35) // max(ncars, 1))
    chunks = [_car_surface_points(boxes[k], per_car, rng)
              for k in range(ncars)]
    n_bg = n - per_car * ncars
    ground = np.stack([rng.uniform(-30, 30, n_bg),
                       rng.uniform(1.55, 1.75, n_bg),
                       rng.uniform(2, 70, n_bg)], axis=1).astype(np.float32)
    clutter_sel = rng.rand(n_bg) < 0.3
    ground[clutter_sel, 1] = rng.uniform(-1.5, 1.5, clutter_sel.sum())
    pts = np.concatenate(chunks + [ground], axis=0)[:n].astype(np.float32)
    pts += rng.normal(0, 0.01, pts.shape).astype(np.float32)

    # pinhole projection -> normalized [-1, 1] image coords
    # (kitti_dataset.py:253-255 normalizes pts_xy by img size)
    z = np.clip(pts[:, 2], 1.0, None)
    u = _FU * pts[:, 0] / z + _CU
    v = _FV * pts[:, 1] / z + _CV
    h, w = img_hw
    xy = np.stack([np.clip(u / w, 0, 1) * 2 - 1,
                   np.clip(v / h, 0, 1) * 2 - 1], axis=1).astype(np.float32)

    img = (rng.rand(h, w, 3).astype(np.float32) - 0.5) * 0.5

    gt_boxes = np.zeros((max_gt, 7), np.float32)
    gt_valid = np.zeros(max_gt, bool)
    keep = min(ncars, max_gt)
    gt_boxes[:keep] = boxes[:keep]
    gt_valid[:keep] = True
    return dict(pts=pts, img=img, pts_xy=xy, gt_boxes3d=gt_boxes,
                gt_valid=gt_valid)


def make_pair_batch(seed: int, cfg: Config, num_pairs: int = 1,
                    npoints: Optional[int] = None, max_gt: int = 8,
                    img_hw=(IMG_H, IMG_W)) -> Dict[str, np.ndarray]:
    """A training batch of (prev, next) frame pairs interleaved as rows
    (2i, 2i+1) — the reference collate layout (kitti_dataset.py:419-456).

    Returns the full train-step input dict: pts_input, img, pts_xy,
    gt_boxes3d, gt_tids, rpn_cls_label, rpn_reg_label.
    """
    rng = np.random.RandomState(seed)
    frames = []
    tid_base = 1
    for _ in range(num_pairs):
        prev = make_scene(rng, cfg, npoints, max_gt, img_hw=img_hw)
        ncars = int(prev['gt_valid'].sum())
        # next frame: same cars, small constant-velocity motion
        moved = prev['gt_boxes3d'][:ncars].copy()
        moved[:, 0] += rng.uniform(-0.5, 0.5, ncars)
        moved[:, 2] += rng.uniform(-1.5, 0.5, ncars)
        nxt = make_scene(rng, cfg, npoints, max_gt, base_boxes=moved,
                         img_hw=img_hw)
        tids = np.zeros(max_gt, np.float32)
        tids[:ncars] = np.arange(tid_base, tid_base + ncars)
        tid_base += ncars
        for fr in (prev, nxt):
            fr['gt_tids'] = tids
            frames.append(fr)

    batch: Dict[str, np.ndarray] = {}
    batch['pts_input'] = np.stack([f['pts'] for f in frames])
    batch['img'] = np.stack([f['img'] for f in frames])
    batch['pts_xy'] = np.stack([f['pts_xy'] for f in frames])
    batch['gt_boxes3d'] = np.stack([f['gt_boxes3d'] for f in frames])
    batch['gt_tids'] = np.stack([f['gt_tids'] for f in frames])
    labels = [rpn_labels(f['pts'], f['gt_boxes3d'], f['gt_valid'])
              for f in frames]
    batch['rpn_cls_label'] = np.stack([l[0] for l in labels])
    batch['rpn_reg_label'] = np.stack([l[1] for l in labels])
    return batch


def make_eval_frame(seed: int, cfg: Config, npoints: Optional[int] = None,
                    img_hw=(IMG_H, IMG_W),
                    raw_u8: bool = False) -> Dict[str, np.ndarray]:
    """One inference input (batch size 1).  With raw_u8 the image is raw
    uint8 (device-side normalization path of make_detection_step)."""
    rng = np.random.RandomState(seed)
    scene = make_scene(rng, cfg, npoints, img_hw=img_hw)
    img = scene['img']
    if raw_u8:
        img = (np.clip(img + 0.5, 0, 1) * 255).astype(np.uint8)
    return dict(pts_input=scene['pts'][None],
                img=img[None],
                pts_xy=scene['pts_xy'][None],
                gt_boxes3d=scene['gt_boxes3d'][None],
                gt_valid=scene['gt_valid'][None])
