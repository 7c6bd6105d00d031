"""CLEAR-MOT evaluator tests on constructed sequences: perfect tracking,
id switches, false positives, and the ignore rules."""

import logging
import os

import pytest

from jmodt_tpu.eval.clear_mot import TrackingEvaluation, evaluate

logger = logging.getLogger('clear_mot_test')
logger.addHandler(logging.NullHandler())


def row(frame, tid, x1=100.0, y1=100.0, x2=150.0, y2=200.0,
        obj='Car', trunc=0, occ=0, x3d=0.0, z3d=10.0):
    return (f'{frame} {tid} {obj} {trunc} {occ} -1.5 '
            f'{x1} {y1} {x2} {y2} 1.5 1.6 3.9 {x3d} 1.6 {z3d} 0.1\n')


def write_seq(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'w') as f:
        f.writelines(rows)


@pytest.fixture
def setup_eval(tmp_path):
    """Returns (make_eval, gt_root, trk_dir). Sequence '0000', 5 frames,
    two gt tracks moving right."""
    gt_dir = tmp_path / 'gt' / 'label_02'
    trk_dir = tmp_path / 'results' / 'sha' / 'val'
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(trk_dir, exist_ok=True)
    gt_rows = []
    for f in range(5):
        gt_rows.append(row(f, 1, x1=100 + 5 * f, x2=150 + 5 * f))
        gt_rows.append(row(f, 2, x1=400 + 5 * f, x2=450 + 5 * f))
    write_seq(str(gt_dir / '0000.txt'), gt_rows)

    def make_eval():
        e = TrackingEvaluation(
            t_sha='sha', result_root=str(tmp_path / 'results'), part='val',
            gt_path=str(tmp_path / 'gt'), seqmap={'0000': 5})
        assert e.load_tracker(logger)
        assert e.load_groundtruth(logger)
        assert e.compute_metrics(logger)
        return e

    return make_eval, gt_dir, trk_dir


def test_perfect_tracking(setup_eval):
    make_eval, gt_dir, trk_dir = setup_eval
    trk_rows = []
    for f in range(5):
        trk_rows.append(row(f, 10, x1=100 + 5 * f, x2=150 + 5 * f))
        trk_rows.append(row(f, 20, x1=400 + 5 * f, x2=450 + 5 * f))
    write_seq(str(trk_dir / '0000.txt'), trk_rows)
    e = make_eval()
    assert e.MOTA == pytest.approx(1.0)
    assert e.MOTP == pytest.approx(1.0)
    assert e.id_switches == 0 and e.fragments == 0
    assert e.MT == pytest.approx(1.0) and e.ML == 0.0
    assert e.tp == 10 and e.fp == 0 and e.fn == 0


def test_id_switch_detected(setup_eval):
    make_eval, gt_dir, trk_dir = setup_eval
    trk_rows = []
    for f in range(5):
        # swap ids halfway through for gt track 1
        tid = 10 if f < 3 else 11
        trk_rows.append(row(f, tid, x1=100 + 5 * f, x2=150 + 5 * f))
        trk_rows.append(row(f, 20, x1=400 + 5 * f, x2=450 + 5 * f))
    write_seq(str(trk_dir / '0000.txt'), trk_rows)
    e = make_eval()
    assert e.id_switches == 1
    assert e.MOTA == pytest.approx(1.0 - 1 / 10)


def test_false_positive_and_miss(setup_eval):
    make_eval, gt_dir, trk_dir = setup_eval
    trk_rows = []
    for f in range(5):
        trk_rows.append(row(f, 10, x1=100 + 5 * f, x2=150 + 5 * f))
        if f != 2:  # miss gt track 2 in frame 2
            trk_rows.append(row(f, 20, x1=400 + 5 * f, x2=450 + 5 * f))
        trk_rows.append(row(f, 30, x1=800, x2=850))  # stationary FP
    write_seq(str(trk_dir / '0000.txt'), trk_rows)
    e = make_eval()
    assert e.fn == 1
    assert e.fp == 5
    assert e.MOTA == pytest.approx(1.0 - (1 + 5) / 10)


def test_van_gt_is_ignored_not_fp(setup_eval):
    make_eval, gt_dir, trk_dir = setup_eval
    # extra Van gt track: matching it must not create FPs, missing it no FNs
    with open(str(gt_dir / '0000.txt'), 'a') as f:
        for fr in range(5):
            f.write(row(fr, 7, x1=600, x2=650, obj='Van'))
    trk_rows = []
    for f in range(5):
        trk_rows.append(row(f, 10, x1=100 + 5 * f, x2=150 + 5 * f))
        trk_rows.append(row(f, 20, x1=400 + 5 * f, x2=450 + 5 * f))
    write_seq(str(trk_dir / '0000.txt'), trk_rows)
    e = make_eval()
    assert e.MOTA == pytest.approx(1.0)
    assert e.ifn == 5  # the Van gts are ignored false negatives


def test_fragmentation_counted_on_coverage_gap(setup_eval):
    """gt track 1 is covered frames 0-1, missed at 2, re-covered 3-4 by the
    SAME tracker id: one fragmentation, zero id switches
    (kitti_evaluate.py:702-766 trajectory loop).  The reference baseline has
    FRAG=129, so this counter must actually fire."""
    make_eval, gt_dir, trk_dir = setup_eval
    trk_rows = []
    for f in range(5):
        if f != 2:  # coverage gap for gt track 1
            trk_rows.append(row(f, 10, x1=100 + 5 * f, x2=150 + 5 * f))
        trk_rows.append(row(f, 20, x1=400 + 5 * f, x2=450 + 5 * f))
    write_seq(str(trk_dir / '0000.txt'), trk_rows)
    e = make_eval()
    assert e.fragments == 1
    assert e.id_switches == 0
    assert e.fn == 1
    assert e.MOTA == pytest.approx(1.0 - 1 / 10)
    # coverage 4/5 = 0.8 is not > 0.8: the gapped track is only PT
    assert e.PT == pytest.approx(0.5) and e.MT == pytest.approx(0.5)


def test_gap_with_new_id_is_frag_not_switch(setup_eval):
    """Resuming after a gap under a NEW id is a fragmentation but not an id
    switch (the devkit requires gtraj[f-1] != -1 for a switch)."""
    make_eval, gt_dir, trk_dir = setup_eval
    trk_rows = []
    for f in range(5):
        if f < 2:
            trk_rows.append(row(f, 10, x1=100 + 5 * f, x2=150 + 5 * f))
        elif f >= 3:  # resume with a different id after the miss
            trk_rows.append(row(f, 11, x1=100 + 5 * f, x2=150 + 5 * f))
        trk_rows.append(row(f, 20, x1=400 + 5 * f, x2=450 + 5 * f))
    write_seq(str(trk_dir / '0000.txt'), trk_rows)
    e = make_eval()
    assert e.fragments == 1
    assert e.id_switches == 0


def test_midtrack_id_change_is_switch_and_frag(setup_eval):
    """An id change with NO coverage gap counts as both an id switch and a
    fragmentation in the devkit's trajectory pass."""
    make_eval, gt_dir, trk_dir = setup_eval
    trk_rows = []
    for f in range(5):
        tid = 10 if f < 3 else 11
        trk_rows.append(row(f, tid, x1=100 + 5 * f, x2=150 + 5 * f))
        trk_rows.append(row(f, 20, x1=400 + 5 * f, x2=450 + 5 * f))
    write_seq(str(trk_dir / '0000.txt'), trk_rows)
    e = make_eval()
    assert e.id_switches == 1
    assert e.fragments == 1


def test_evaluate_entry(setup_eval, tmp_path):
    make_eval, gt_dir, trk_dir = setup_eval
    trk_rows = []
    for f in range(5):
        trk_rows.append(row(f, 10, x1=100 + 5 * f, x2=150 + 5 * f))
        trk_rows.append(row(f, 20, x1=400 + 5 * f, x2=450 + 5 * f))
    write_seq(str(trk_dir / '0000.txt'), trk_rows)
    mota = evaluate('sha', str(tmp_path / 'results'), 'val',
                    str(tmp_path / 'gt'), logger, seqmap={'0000': 5})
    assert mota == pytest.approx(1.0)
    assert os.path.exists(str(trk_dir / 'eval' / 'car' / 'stats_car.txt'))
