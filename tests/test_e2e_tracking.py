"""End-to-end tracking integration: synthetic detection files -> the eval
CLI's stage-2 flow (Object3d parse, score mask, Tracker, KITTI writer) ->
CLEAR-MOT evaluator.  Perfect synthetic detections must yield MOTA == 1.0
with zero id switches — the full-pipeline analog of the reference's
metric-based validation (SURVEY.md §4)."""

import logging
import os

import numpy as np
import pytest

logger = logging.getLogger('e2e')
logger.addHandler(logging.NullHandler())

N_FRAMES = 10


def gt_box(frame, obj):
    """Two cars driving forward.  Motion is KITTI-like (~0.4 m/frame) —
    the MIP's det unaries (w_cls * (score - 1) = -5 at score 0.95) demand
    combined affinity > 10 for a link to be profitable, which needs
    frame-to-frame IoU ~> 0.7 like real 10 Hz data."""
    return np.array([obj * 8.0 - 4.0, 1.6, 8.0 + 0.4 * frame + 4.0 * obj,
                     1.5, 1.6, 3.9, 0.1 * obj], np.float32)


def box2d(frame, obj):
    # distinct, slowly-moving 2D boxes (CLEAR-MOT associates in 2D)
    x1 = 100.0 + obj * 400.0 + 5.0 * frame
    return x1, 100.0, x1 + 100.0, 200.0


def det_row(box, b2d, score):
    x, y, z, h, w, l, ry = box
    beta = np.arctan2(z, x)
    alpha = -np.sign(beta) * np.pi / 2 + beta + ry
    return ('Car -1 -1 %.4f %.1f %.1f %.1f %.1f '
            '%.4f %.4f %.4f %.4f %.4f %.4f %.4f %.4f\n'
            % (alpha, *b2d, h, w, l, x, y, z, ry, score))


@pytest.fixture
def det_files(tmp_path):
    """Stage-1-format outputs: per-sample txt + feature npy, plus the
    converter's seq maps and tracking-format gt."""
    txt = tmp_path / 'det' / 'txt'
    feat = tmp_path / 'det' / 'feat'
    os.makedirs(txt)
    os.makedirs(feat)
    rng = np.random.RandomState(0)
    obj_feats = rng.randn(2, 64).astype(np.float32)
    gt_rows = []
    for f in range(N_FRAMES):
        rows = []
        feats = []
        for obj in range(2):
            box = gt_box(f, obj)
            b2d = box2d(f, obj)
            rows.append(det_row(box, b2d, 0.95))
            feats.append(obj_feats[obj] + 0.01 * rng.randn(64))
            gt_rows.append(
                '%d %d Car 0 0 -1.5 %.1f %.1f %.1f %.1f '
                '%.2f %.2f %.2f %.2f %.2f %.2f %.2f\n'
                % (f, obj + 1, *b2d, box[3], box[4], box[5],
                   box[0], box[1], box[2], box[6]))
        with open(txt / ('%06d.txt' % f), 'w') as fh:
            fh.writelines(rows)
        np.save(feat / ('%06d.npy' % f), np.stack(feats))
    gt_dir = tmp_path / 'gt' / 'label_02'
    os.makedirs(gt_dir)
    with open(gt_dir / '0000.txt', 'w') as fh:
        fh.writelines(gt_rows)
    return tmp_path


def run_tracking_stage(base, hungarian):
    """The eval CLI's stage-2 loop distilled (tools/eval.py::eval_tracking)."""
    import jax
    from jmodt_tpu.models.rcnn import CorrelationHead
    from jmodt_tpu.tracking import Track, Tracker
    from jmodt_tpu.utils.kitti_io import save_kitti_tracking_format
    from jmodt_tpu.utils.object3d import Object3d

    Track.new_id = 1
    head = CorrelationHead(hidden=(32, 32))
    p1 = head.init(jax.random.PRNGKey(0), np.zeros((1, 64), np.float32))
    p2 = head.init(jax.random.PRNGKey(1), np.zeros((1, 64), np.float32))
    tracker = Tracker(head.apply, head.apply, p1, p2,
                      t_miss=2, t_hit=0, hungarian=hungarian,
                      score_thresh=0.85)
    out_dir = base / 'results' / 'sha' / 'val'
    os.makedirs(out_dir, exist_ok=True)
    with open(out_dir / '0000.txt', 'w') as out_file:
        for f in range(N_FRAMES):
            with open(base / 'det' / 'txt' / ('%06d.txt' % f)) as fh:
                objs = np.array([Object3d(line) for line in fh])
            feats = np.load(base / 'det' / 'feat' / ('%06d.npy' % f))
            boxes = np.stack([o.box3d for o in objs])
            scores = np.array([o.score for o in objs], np.float32)
            mask = scores > 0.85
            results = tracker.update(f, boxes[mask], scores[mask],
                                     feats[mask], objs[mask])
            save_kitti_tracking_format(results, f, out_file)
    return base / 'results'


@pytest.mark.parametrize('hungarian', [False, True])
def test_perfect_detections_give_mota_1(det_files, hungarian):
    from jmodt_tpu.eval.clear_mot import TrackingEvaluation
    result_root = run_tracking_stage(det_files, hungarian)
    e = TrackingEvaluation(
        t_sha='sha', result_root=str(result_root), part='val',
        gt_path=str(det_files / 'gt'), seqmap={'0000': N_FRAMES})
    assert e.load_tracker(logger)
    assert e.load_groundtruth(logger)
    assert e.compute_metrics(logger)
    assert e.id_switches == 0
    assert e.fragments == 0
    assert e.MOTA == pytest.approx(1.0)
    assert e.MOTP == pytest.approx(1.0)
    assert e.MT == pytest.approx(1.0)
