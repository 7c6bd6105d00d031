"""Differential test of the vectorized AP statistics.

`compute_statistics_batch` is an independent re-derivation of the official
greedy matcher (gt-major, per-threshold assignment state); the scalar
`compute_statistics` is a transcription of the reference numba kernel
(eval.py:158-275).  They share no matching code, so agreement across
randomized frames with DontCare boxes, Vans, truncation/occlusion gates,
score-threshold sweeps and empty frames is strong evidence both implement
the protocol correctly.  Also includes hand-computed PR points.
"""

import numpy as np
import pytest

from jmodt_tpu.eval.detection_ap import (clean_data, compute_statistics,
                                         compute_statistics_batch,
                                         get_official_eval_result,
                                         image_box_overlap)


def random_frame(rng, n_gt_max=8, n_dt_max=10):
    """One synthetic frame: gt/dt annos + metric-0 overlap matrix."""
    n_gt = rng.randint(0, n_gt_max + 1)
    n_dt = rng.randint(0, n_dt_max + 1)
    names = rng.choice(['Car', 'Van', 'Pedestrian', 'DontCare'], n_gt,
                       p=[0.55, 0.15, 0.15, 0.15])
    # 2D boxes on a loose grid with jitter so some dt/gt pairs overlap
    def boxes(n, jitter):
        x = rng.randint(0, 5, n) * 120.0 + rng.uniform(-jitter, jitter, n)
        y = rng.randint(0, 3, n) * 120.0 + rng.uniform(-jitter, jitter, n)
        h = rng.uniform(20.0, 90.0, n)
        w = h * rng.uniform(0.8, 1.4, n)
        return np.stack([x, y, x + w, y + h], axis=1)

    gt = {
        'name': names,
        'truncated': rng.uniform(0, 0.6, n_gt),
        'occluded': rng.randint(0, 4, n_gt),
        'alpha': rng.uniform(-np.pi, np.pi, n_gt),
        'bbox': boxes(n_gt, 10.0),
    }
    dt = {
        'name': rng.choice(['Car', 'Pedestrian'], n_dt, p=[0.8, 0.2]),
        'alpha': rng.uniform(-np.pi, np.pi, n_dt),
        'bbox': boxes(n_dt, 25.0),
        'score': rng.uniform(0, 1, n_dt),
    }
    # place some detections right on top of gt boxes for genuine matches
    for j in range(n_dt):
        if n_gt and rng.rand() < 0.5:
            i = rng.randint(n_gt)
            dt['bbox'][j] = gt['bbox'][i] + rng.uniform(-4, 4, 4)
    gt_datas = np.concatenate([gt['bbox'], gt['alpha'][:, None]], axis=1)
    dt_datas = np.concatenate(
        [dt['bbox'], dt['alpha'][:, None], dt['score'][:, None]], axis=1)
    overlaps = image_box_overlap(dt['bbox'].astype(np.float64),
                                 gt['bbox'].astype(np.float64))
    return gt, dt, gt_datas, dt_datas, overlaps


@pytest.mark.parametrize('difficulty', [0, 1, 2])
def test_batch_matches_scalar_on_random_frames(difficulty):
    rng = np.random.RandomState(difficulty)
    checked = 0
    for _ in range(50):
        gt, dt, gt_datas, dt_datas, overlaps = random_frame(rng)
        _, ignored_gt, ignored_det, dc_bboxes = clean_data(
            gt, dt, 0, difficulty)
        thresholds = np.unique(np.concatenate(
            [dt_datas[:, -1] if len(dt_datas) else np.zeros(0),
             [0.0, 0.25, 0.5, 0.75, 1.01]]))[::-1]
        btp, bfp, bfn, bsim = compute_statistics_batch(
            overlaps, gt_datas, dt_datas, ignored_gt, ignored_det,
            dc_bboxes, metric=0, min_overlap=0.5, thresholds=thresholds,
            compute_aos=True)
        for t, thr in enumerate(thresholds):
            tp, fp, fn, sim, _ = compute_statistics(
                overlaps, gt_datas, dt_datas, ignored_gt, ignored_det,
                dc_bboxes, metric=0, min_overlap=0.5, thresh=thr,
                compute_fp=True, compute_aos=True)
            assert (tp, fp, fn) == (btp[t], bfp[t], bfn[t]), \
                f'frame tp/fp/fn mismatch at thr={thr}'
            assert sim == pytest.approx(bsim[t], abs=1e-9)
            checked += 1
    assert checked > 300  # the sweep actually exercised many thresholds


def test_batch_empty_frames():
    empty = np.zeros((0, 6))
    tp, fp, fn, sim = compute_statistics_batch(
        np.zeros((0, 0)), np.zeros((0, 5)), empty, [], [], [],
        metric=0, min_overlap=0.5, thresholds=[0.5, 0.0])
    assert tp.tolist() == [0, 0] and fp.tolist() == [0, 0]
    assert fn.tolist() == [0, 0] and sim.tolist() == [-1.0, -1.0]


def test_batch_hand_computed_pr_point():
    """3 gts, 2 correct dets (scores .9/.8) + 1 false positive (.7):
    at thr=.75 -> tp=2 fp=0 fn=1; at thr=.5 -> tp=2 fp=1 fn=1."""
    gt_bbox = np.array([[0, 0, 50, 50], [200, 0, 250, 50],
                        [400, 0, 450, 50]], np.float64)
    dt_bbox = np.array([[0, 0, 50, 50], [200, 0, 250, 50],
                        [800, 0, 850, 50]], np.float64)
    gt_datas = np.concatenate([gt_bbox, np.zeros((3, 1))], axis=1)
    dt_datas = np.concatenate(
        [dt_bbox, np.zeros((3, 1)), [[0.9], [0.8], [0.7]]], axis=1)
    overlaps = image_box_overlap(dt_bbox, gt_bbox)
    tp, fp, fn, _ = compute_statistics_batch(
        overlaps, gt_datas, dt_datas, [0, 0, 0], [0, 0, 0], [],
        metric=0, min_overlap=0.5, thresholds=[0.75, 0.5])
    assert tp.tolist() == [2, 2]
    assert fp.tolist() == [0, 1]
    assert fn.tolist() == [1, 1]


def test_batch_dontcare_absorbs_fp():
    """A would-be FP that lands on a DontCare region is not counted."""
    gt_bbox = np.array([[0, 0, 50, 50]], np.float64)
    dc = np.array([[300, 0, 400, 80]], np.float64)
    dt_bbox = np.array([[0, 0, 50, 50], [310, 5, 390, 75]], np.float64)
    gt_datas = np.concatenate([gt_bbox, np.zeros((1, 1))], axis=1)
    dt_datas = np.concatenate(
        [dt_bbox, np.zeros((2, 1)), [[0.9], [0.8]]], axis=1)
    overlaps = image_box_overlap(dt_bbox, gt_bbox)
    tp, fp, fn, _ = compute_statistics_batch(
        overlaps, gt_datas, dt_datas, [0], [0, 0], dc,
        metric=0, min_overlap=0.5, thresholds=[0.0])
    assert tp.tolist() == [1] and fp.tolist() == [0] and fn.tolist() == [0]


def test_full_eval_still_consistent():
    """End-to-end AP through the batched path on a mixed scene stays in
    [0, 100] and perfect detections still score 100."""
    from tests.test_detection_ap import BOXES, make_anno
    rng = np.random.RandomState(1)
    gt, dt = [], []
    for f in range(30):
        gt.append(make_anno(BOXES))
        dt.append(make_anno(BOXES, scores=rng.uniform(0.5, 1.0, 3)))
    _, ret = get_official_eval_result(gt, dt, 'Car')
    assert ret['Car_3d_easy'] == pytest.approx(100.0, abs=0.1)


@pytest.mark.parametrize('difficulty', [0, 1, 2])
def test_gather_matches_scalar_on_random_frames(difficulty):
    """The vectorized threshold-gathering pass returns exactly the scalar
    transcription's matched-score list (order included)."""
    from jmodt_tpu.eval.detection_ap import gather_match_scores
    rng = np.random.RandomState(100 + difficulty)
    nonempty = 0
    for _ in range(80):
        gt, dt, gt_datas, dt_datas, overlaps = random_frame(rng)
        _, ignored_gt, ignored_det, dc_bboxes = clean_data(
            gt, dt, 0, difficulty)
        for min_overlap in (0.5, 0.7):
            _, _, _, _, th = compute_statistics(
                overlaps, gt_datas, dt_datas, ignored_gt, ignored_det,
                dc_bboxes, metric=0, min_overlap=min_overlap, thresh=0.0,
                compute_fp=False)
            got = gather_match_scores(
                overlaps, dt_datas[:, -1] if len(dt_datas) else
                np.zeros(0), ignored_gt, ignored_det, min_overlap)
            assert got == th.tolist()
            nonempty += len(got) > 0
    assert nonempty >= 3  # difficulty-0 gates drop most random gts
