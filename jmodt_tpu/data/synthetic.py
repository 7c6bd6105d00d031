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

import os
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
               img_hw=(IMG_H, IMG_W),
               x_range=(-15.0, 15.0), z_range=(8.0, 60.0),
               bg_x=(-30.0, 30.0), bg_z=(2.0, 70.0)) -> Dict[str, np.ndarray]:
    """One frame: points (N, 3), img (H, W, 3), pts_xy (N, 2 in [-1, 1]),
    gt_boxes3d (max_gt, 7) zero-padded, gt_valid (max_gt,).

    x_range/z_range bound car placement, bg_x/bg_z the ground clutter —
    the tree writer narrows them to its camera FoV so the dataset's
    projection filter keeps the points."""
    n = npoints or cfg.RPN.NUM_POINTS
    ncars = num_cars if num_cars is not None else rng.randint(2, 6)
    mean = np.asarray(cfg.mean_size)

    if base_boxes is None:
        boxes = np.zeros((ncars, 7), np.float32)
        boxes[:, 0] = rng.uniform(*x_range, ncars)      # x
        boxes[:, 1] = rng.uniform(1.4, 1.8, ncars)      # y (bottom)
        boxes[:, 2] = rng.uniform(*z_range, ncars)      # z
        boxes[:, 3:6] = mean * rng.uniform(0.9, 1.1, (ncars, 3))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, ncars)
    else:
        boxes = base_boxes.copy()
        ncars = boxes.shape[0]

    per_car = max(32, int(n * 0.35) // max(ncars, 1))
    chunks = [_car_surface_points(boxes[k], per_car, rng)
              for k in range(ncars)]
    n_bg = n - per_car * ncars
    ground = np.stack([rng.uniform(*bg_x, n_bg),
                       rng.uniform(1.55, 1.75, n_bg),
                       rng.uniform(*bg_z, n_bg)], axis=1).astype(np.float32)
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


# ---------------------------------------------------------------------------
# on-disk synthetic KITTI tracking tree (the learning-ladder data source)
# ---------------------------------------------------------------------------

def write_synthetic_kitti_tree(root: str, cfg: Config, n_seqs: int = 2,
                               n_frames: int = 16, img_hw=(64, 128),
                               npoints: Optional[int] = None,
                               seed: int = 0) -> None:
    """Write a KITTI *tracking* tree whose frames come from `make_scene`:
    cars on constant-velocity trajectories with dense surface points, so a
    detector trained through the REAL file pipeline (converter ->
    KittiDataset -> tools/train.py) can actually learn, and tools/eval.py's
    AP / CLEAR-MOT close the loop (VERDICT r2 next-step #7).

    Layout written: <root>/training/{calib,image_02,velodyne,label_02}.
    The calibration is a synthetic pinhole consistent with `img_hw`
    (velodyne x-fwd/y-left/z-up -> rect x-right/y-down/z-fwd), so the
    dataset's own projection filter keeps the generated points.
    """
    from PIL import Image
    h, w = img_hw
    # Camera design: the official AP difficulty gates require projected
    # 2D box heights >= 40 px (easy) / 25 px (moderate+hard)
    # (eval.py MIN_HEIGHT).  With f = 2 h a 1.5 m car passes moderate
    # out to z = 2 h * 1.5 / 25 (= 15.4 m at h=128) and easy inside
    # z = 9.6 m, so the close-range scene below produces gt that the
    # REAL protocol actually scores (the old wide-FoV 0.9 h focal put
    # the median car at 5 px -> every difficulty ignored it -> AP = 0
    # no matter the detector).
    fu = fv = 2.0 * h
    cu, cv = w / 2.0, 0.45 * h
    calib_txt = (
        f'P0: {fu} 0 {cu} 0 0 {fv} {cv} 0 0 0 1 0\n'
        f'P1: {fu} 0 {cu} 0 0 {fv} {cv} 0 0 0 1 0\n'
        f'P2: {fu} 0 {cu} 0 0 {fv} {cv} 0 0 0 1 0\n'
        f'P3: {fu} 0 {cu} 0 0 {fv} {cv} 0 0 0 1 0\n'
        'R0_rect: 1 0 0 0 1 0 0 0 1\n'
        'Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0\n')

    rng = np.random.RandomState(seed)
    n = npoints or cfg.RPN.NUM_POINTS
    for si in range(n_seqs):
        seq = '%04d' % si
        for sub in ('image_02', 'velodyne'):
            os.makedirs(os.path.join(root, 'training', sub, seq),
                        exist_ok=True)
        os.makedirs(os.path.join(root, 'training', 'calib'), exist_ok=True)
        os.makedirs(os.path.join(root, 'training', 'label_02'),
                    exist_ok=True)
        with open(os.path.join(root, 'training', 'calib', f'{seq}.txt'),
                  'w') as f:
            f.write(calib_txt)

        ncars = rng.randint(2, 5)
        mean = np.asarray(cfg.mean_size)
        boxes = np.zeros((ncars, 7), np.float32)
        # close-range so projected heights pass the AP difficulty gates
        # (see the focal-length note above); drift bounded + clamped so
        # cars stay inside the narrow FoV for the whole sequence (the
        # old +-0.6 m/frame walked z negative over 48 frames)
        boxes[:, 0] = rng.uniform(-2.0, 2.0, ncars)
        boxes[:, 1] = rng.uniform(1.5, 1.7, ncars)
        boxes[:, 2] = rng.uniform(6, 14, ncars)
        boxes[:, 3:6] = mean * rng.uniform(0.95, 1.05, (ncars, 3))
        boxes[:, 6] = rng.uniform(-np.pi, np.pi, ncars)
        vel = np.zeros((ncars, 2), np.float32)
        vel[:, 0] = rng.uniform(-0.04, 0.04, ncars)   # dx per frame
        vel[:, 1] = rng.uniform(-0.12, 0.12, ncars)   # dz per frame

        label_rows = []
        for fr in range(n_frames):
            cur = boxes.copy()
            cur[:, 0] = np.clip(cur[:, 0] + vel[:, 0] * fr, -2.5, 2.5)
            cur[:, 2] = np.clip(cur[:, 2] + vel[:, 1] * fr, 5.5, 18.0)
            scene = make_scene(rng, cfg, npoints=n, base_boxes=cur,
                               img_hw=img_hw,
                               bg_x=(-7.0, 7.0), bg_z=(3.0, 20.0))
            pts_rect = scene['pts']
            # rect -> velodyne: v = (z, -x, -y); intensity random
            pts_v = np.stack([pts_rect[:, 2], -pts_rect[:, 0],
                              -pts_rect[:, 1],
                              rng.rand(len(pts_rect)).astype(np.float32)],
                             axis=1).astype(np.float32)
            pts_v.tofile(os.path.join(root, 'training', 'velodyne', seq,
                                      f'{fr:06d}.bin'))
            img = ((scene['img'] + 0.5) * 255).clip(0, 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(
                root, 'training', 'image_02', seq, f'{fr:06d}.png'))
            for k in range(ncars):
                x, y, z, bh, bw, bl, ry = cur[k]
                # project the 8 corners for the 2D box
                cx = np.array([bl / 2, bl / 2, -bl / 2, -bl / 2] * 2)
                cz = np.array([bw / 2, -bw / 2, -bw / 2, bw / 2] * 2)
                cy = np.array([0.0] * 4 + [-bh] * 4)
                c, s = np.cos(ry), np.sin(ry)
                wx = x + cx * c + cz * s
                wz = z - cx * s + cz * c
                wy = y + cy
                zc = np.clip(wz, 1.0, None)
                us = np.clip(fu * wx / zc + cu, 0, w - 1)
                vs = np.clip(fv * wy / zc + cv, 0, h - 1)
                alpha = float(-np.arctan2(x, z) + ry)
                label_rows.append(
                    f'{fr} {k + 1} Car 0 0 {alpha:.2f} '
                    f'{us.min():.2f} {vs.min():.2f} {us.max():.2f} '
                    f'{vs.max():.2f} {bh:.2f} {bw:.2f} {bl:.2f} '
                    f'{x:.2f} {y:.2f} {z:.2f} {ry:.2f}\n')
        with open(os.path.join(root, 'training', 'label_02',
                               f'{seq}.txt'), 'w') as f:
            f.writelines(label_rows)
