"""Differential test: the REFERENCE's own CLEAR-MOT evaluator vs ours.

Loads /root/reference/jmodt/tracking/kitti_evaluate.py with a ``munkres``
shim over ``scipy.optimize.linear_sum_assignment`` (same optimum on the
gated cost matrices; the reference's Munkres package zero-pads rectangular
matrices, which is equivalent to scipy's rectangular LSA) and a stub
``jmodt.config`` carrying the split lists.  Both evaluators then consume
the SAME fabricated gt/tracker txt trees, and every CLEAR-MOT statistic is
compared: MOTA/MOTP/MOTAL/MODA/MODP, recall/precision/F1/FAR, MT/PT/ML,
tp/itp/fp/fn/ifn, id switches, fragments, trajectory counts.

The fabricated sequences exercise: id switches, fragmentation (mid-track
misses), false-positive tracks, a fully-missed trajectory (ML), partial
coverage (PT), Van rows (neighboring-class ignore), DontCare areas
absorbing an FP, sub-min-height detections, and over-threshold
truncation/occlusion gt (ignored gt).

Reference targets: kitti_evaluate.py:401-806 (compute3rdPartyMetrics),
:234-370 (_loadData), :910-959 (evaluate).
"""

from __future__ import annotations

import importlib.util
import logging
import os
import sys
import types

import numpy as np
import pytest

REF_KITTI_EVALUATE = '/root/reference/jmodt/tracking/kitti_evaluate.py'

logger = logging.getLogger('ref_mot_diff')
logger.addHandler(logging.NullHandler())

SEQS = {'0000': 8, '0002': 10, '0005': 6}


def _load_ref_mot():
    munkres = types.ModuleType('munkres')

    class Munkres:
        def compute(self, cost_matrix):
            from scipy.optimize import linear_sum_assignment
            c = np.asarray(cost_matrix, dtype=float)
            if c.size == 0:
                return []
            rows, cols = linear_sum_assignment(c)
            return list(zip(rows.tolist(), cols.tolist()))

    munkres.Munkres = Munkres

    cfg = types.ModuleType('jmodt.config')
    from jmodt_tpu.config import TRAIN_SEQ_ID, VALID_SEQ_ID, TEST_SEQ_ID
    cfg.TRAIN_SEQ_ID = list(TRAIN_SEQ_ID)
    cfg.VALID_SEQ_ID = list(VALID_SEQ_ID)
    cfg.TEST_SEQ_ID = list(TEST_SEQ_ID)

    stubs = {
        'munkres': munkres,
        'jmodt': types.ModuleType('jmodt'),
        'jmodt.config': cfg,
    }
    saved = {k: sys.modules.get(k) for k in stubs}
    sys.modules.update(stubs)
    try:
        spec = importlib.util.spec_from_file_location('ref_kitti_evaluate',
                                                      REF_KITTI_EVALUATE)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
    # shrink to the fabricated sequences so per-frame loops stay tiny
    mod.seqmap = {k: '%06d' % v for k, v in SEQS.items()}
    return mod


@pytest.fixture(scope='module')
def ref_mot():
    return _load_ref_mot()


# ---------------------------------------------------------------------------
# fabricated tracking data
# ---------------------------------------------------------------------------

def _row(frame, tid, x1, y1, x2, y2, obj='Car', trunc=0, occ=0,
         x3d=0.0, z3d=10.0):
    return (f'{frame} {tid} {obj} {trunc} {occ} -1.5 '
            f'{x1:.2f} {y1:.2f} {x2:.2f} {y2:.2f} '
            f'1.50 1.60 3.90 {x3d:.2f} 1.60 {z3d:.2f} 0.10\n')


def _write(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'w') as f:
        f.writelines(rows)


def _box(f, base_x, base_y=120.0, h=60.0, drift=6.0, jitter=0.0):
    x1 = base_x + drift * f + jitter
    y1 = base_y + jitter * 0.5
    return x1, y1, x1 + 1.6 * h, y1 + h


def _fabricate(root):
    """Writes gt/label_02/<seq>.txt and results/sha/val/<seq>.txt."""
    gt_dir = os.path.join(root, 'gt', 'label_02')
    trk_dir = os.path.join(root, 'results', 'sha', 'val')

    # ---- seq 0000: id switch + FP track + Van + DontCare-absorbed FP ----
    gt, trk = [], []
    for f in range(SEQS['0000']):
        gt.append(_row(f, 1, *_box(f, 100)))
        gt.append(_row(f, 2, *_box(f, 500)))
        gt.append(_row(f, 3, *_box(f, 900), obj='Van'))
        gt.append(_row(f, -1, 1100.0, 40.0, 1240.0, 140.0, obj='DontCare'))
        # tracker: track 1 clean; track 2 switches id at frame 4
        trk.append(_row(f, 10, *_box(f, 100, jitter=1.3)))
        trk.append(_row(f, 20 if f < 4 else 21, *_box(f, 500, jitter=0.9)))
        # FP inside the DontCare area (ignored), FP in the open (counted)
        trk.append(_row(f, 30, 1120.0, 50.0, 1200.0, 130.0))
        if f % 2 == 0:
            trk.append(_row(f, 40, *_box(f, 700, base_y=30.0)))
    _write(os.path.join(gt_dir, '0000.txt'), gt)
    _write(os.path.join(trk_dir, '0000.txt'), trk)

    # ---- seq 0002: fragmentation + ML + ignored gt + small det ----
    gt, trk = [], []
    for f in range(SEQS['0002']):
        gt.append(_row(f, 1, *_box(f, 150)))
        gt.append(_row(f, 2, *_box(f, 600)))          # never tracked -> ML
        gt.append(_row(f, 3, *_box(f, 300, base_y=200.0), occ=3))  # ignored
        if f >= 3:
            gt.append(_row(f, 4, *_box(f, 950), trunc=1))          # ignored
        # tracker: track 1 missing frames 4-5 (fragmentation)
        if f not in (4, 5):
            trk.append(_row(f, 11, *_box(f, 150, jitter=0.7)))
        # tiny detection (height 18 < min_height 25): ignored tracker det
        trk.append(_row(f, 50, 400.0 + 3 * f, 100.0, 430.0 + 3 * f, 118.0))
        # tracks the ignored-occlusion gt (ignored tp path)
        trk.append(_row(f, 12, *_box(f, 300, base_y=200.0, jitter=0.4)))
    _write(os.path.join(gt_dir, '0002.txt'), gt)
    _write(os.path.join(trk_dir, '0002.txt'), trk)

    # ---- seq 0005: partial coverage (PT) + Pedestrian rows ----
    gt, trk = [], []
    for f in range(SEQS['0005']):
        gt.append(_row(f, 1, *_box(f, 200)))
        gt.append(_row(f, 2, *_box(f, 800), obj='Pedestrian'))
        if f < 3:  # covers half the frames -> PT
            trk.append(_row(f, 13, *_box(f, 200, jitter=1.1)))
    _write(os.path.join(gt_dir, '0005.txt'), gt)
    _write(os.path.join(trk_dir, '0005.txt'), trk)

    return os.path.join(root, 'gt'), os.path.join(root, 'results')


_STATS = ['MOTA', 'MOTP', 'MOTAL', 'MODA', 'MODP', 'recall', 'precision',
          'F1', 'FAR', 'MT', 'PT', 'ML', 'tp', 'itp', 'fp', 'fn', 'ifn',
          'id_switches', 'fragments', 'n_gt', 'n_igt', 'n_tr', 'n_itr',
          'total_cost', 'n_gt_trajectories', 'n_tr_trajectories']


def test_clear_mot_matches_reference(ref_mot, tmp_path):
    from jmodt_tpu.eval.clear_mot import TrackingEvaluation
    gt_path, result_root = _fabricate(str(tmp_path))

    ref = ref_mot.TrackingEvaluation(
        t_sha='sha', result_root=result_root, part='val', gt_path=gt_path)
    assert ref.loadTracker(logger)
    assert ref.loadGroundtruth(logger)
    assert ref.compute3rdPartyMetrics(logger)

    got = TrackingEvaluation(
        t_sha='sha', result_root=result_root, part='val', gt_path=gt_path,
        seqmap=SEQS)
    assert got.load_tracker(logger)
    assert got.load_groundtruth(logger)
    assert got.compute_metrics(logger)

    for name in _STATS:
        r, g = getattr(ref, name), getattr(got, name)
        assert g == pytest.approx(r, rel=1e-12, abs=1e-12), (
            f'{name}: ours={g} reference={r}')

    # the scenario is not vacuous: every interesting counter fired
    assert ref.id_switches >= 1
    assert ref.fragments >= 1
    assert ref.fp >= 1 and ref.fn >= 1
    assert ref.ML > 0              # at least one mostly-lost trajectory
    assert ref.n_itr >= 1          # ignored tracker detections seen
    assert ref.itp >= 1            # ignored true positives seen


def test_clear_mot_perfect_matches_reference(ref_mot, tmp_path):
    """Sanity differential on a clean perfect-tracking tree."""
    from jmodt_tpu.eval.clear_mot import TrackingEvaluation
    gt_dir = tmp_path / 'gt' / 'label_02'
    trk_dir = tmp_path / 'results' / 'sha' / 'val'
    for seq, n in SEQS.items():
        gt, trk = [], []
        for f in range(n):
            gt.append(_row(f, 1, *_box(f, 100)))
            trk.append(_row(f, 7, *_box(f, 100)))
        _write(str(gt_dir / f'{seq}.txt'), gt)
        _write(str(trk_dir / f'{seq}.txt'), trk)

    ref = ref_mot.TrackingEvaluation(
        t_sha='sha', result_root=str(tmp_path / 'results'), part='val',
        gt_path=str(tmp_path / 'gt'))
    assert ref.loadTracker(logger)
    assert ref.loadGroundtruth(logger)
    assert ref.compute3rdPartyMetrics(logger)

    got = TrackingEvaluation(
        t_sha='sha', result_root=str(tmp_path / 'results'), part='val',
        gt_path=str(tmp_path / 'gt'), seqmap=SEQS)
    assert got.load_tracker(logger)
    assert got.load_groundtruth(logger)
    assert got.compute_metrics(logger)

    for name in _STATS:
        assert getattr(got, name) == pytest.approx(getattr(ref, name)), name
    assert ref.MOTA == pytest.approx(1.0)
