"""Detection AP evaluator tests: protocol sanity on constructed annotations
(perfect detections -> AP 100, misses -> lower, criterion variants)."""

import numpy as np
import pytest

from jmodt_tpu.eval.detection_ap import (clean_data, d3_box_overlap,
                                         get_official_eval_result,
                                         get_thresholds, image_box_overlap,
                                         rotate_iou_eval)


def make_anno(boxes3d, names=None, scores=None, bbox_h=80.0):
    """Minimal KITTI anno dict. boxes3d: (N, 7) [x, y, z, h, w, l, ry]."""
    n = len(boxes3d)
    boxes3d = np.asarray(boxes3d, np.float64).reshape(n, 7)
    anno = {
        'name': np.array(names if names is not None else ['Car'] * n),
        'truncated': np.zeros(n),
        'occluded': np.zeros(n, np.int64),
        'alpha': np.full(n, -10.0) if scores is None else np.zeros(n),
        'bbox': np.stack([np.full(n, 100.0), np.full(n, 100.0),
                          np.full(n, 100.0 + bbox_h),
                          np.full(n, 100.0 + bbox_h)], axis=1),
        # anno dims are lhw (evaluate.py:35-38)
        'dimensions': boxes3d[:, [5, 3, 4]],
        'location': boxes3d[:, 0:3],
        'rotation_y': boxes3d[:, 6],
        'score': (np.zeros(n) if scores is None
                  else np.asarray(scores, np.float64)),
    }
    # make 2D bboxes distinct per object so bbox AP matching works
    anno['bbox'] = anno['bbox'] + np.arange(n)[:, None] * 200.0
    return anno


BOXES = np.array([
    [0.0, 1.6, 10.0, 1.5, 1.6, 3.9, 0.1],
    [5.0, 1.6, 20.0, 1.4, 1.7, 4.1, -0.5],
    [-4.0, 1.7, 30.0, 1.6, 1.6, 3.8, 1.2],
])


def test_rotate_iou_identity_and_criteria():
    b = np.array([[0.0, 0.0, 4.0, 2.0, 0.3]])
    np.testing.assert_allclose(rotate_iou_eval(b, b, -1), [[1.0]], rtol=1e-5)
    np.testing.assert_allclose(rotate_iou_eval(b, b, 2), [[8.0]], rtol=1e-5)
    big = np.array([[0.0, 0.0, 8.0, 4.0, 0.3]])  # 4x area, same center/angle
    np.testing.assert_allclose(rotate_iou_eval(b, big, 0), [[1.0]], rtol=1e-4)
    np.testing.assert_allclose(rotate_iou_eval(b, big, 1), [[0.25]], rtol=1e-4)


def test_d3_overlap_identity():
    boxes = BOXES[:, [0, 1, 2, 5, 3, 4, 6]]  # -> [x, y, z, l, h, w, ry]
    iou = d3_box_overlap(boxes, boxes)
    np.testing.assert_allclose(np.diag(iou), np.ones(3), rtol=1e-4)


def test_image_box_overlap():
    a = np.array([[0.0, 0.0, 10.0, 10.0]])
    b = np.array([[5.0, 0.0, 15.0, 10.0]])
    np.testing.assert_allclose(image_box_overlap(a, b), [[50.0 / 150.0]])


def test_get_thresholds_coverage():
    scores = np.linspace(0.99, 0.01, 50)
    th = get_thresholds(scores.copy(), num_gt=50)
    assert len(th) >= 38 and th[0] == pytest.approx(0.99)


def test_clean_data_difficulty_gates():
    gt = make_anno(BOXES, bbox_h=30.0)  # height 30 < easy min 40
    dt = make_anno(BOXES, scores=[0.9] * 3, bbox_h=30.0)
    n_valid, ignored_gt, ignored_dt, _ = clean_data(gt, dt, 0, 0)
    assert n_valid == 0 and all(v == 1 for v in ignored_gt)
    n_valid, ignored_gt, ignored_dt, _ = clean_data(gt, dt, 0, 1)
    assert n_valid == 3 and all(v == 0 for v in ignored_gt)
    # Van counts as ignored-similar for Car
    gt_van = make_anno(BOXES, names=['Van', 'Car', 'Car'])
    n_valid, ignored_gt, _, _ = clean_data(gt_van, dt, 0, 1)
    assert n_valid == 2 and ignored_gt[0] == 1


def test_perfect_detections_ap_100():
    # enough gt to fill all 41 recall sample points (with < ~41 gt the
    # precision tail stays zero by protocol and AP < 100 even when perfect)
    rng = np.random.RandomState(0)
    gt, dt = [], []
    for f in range(30):
        gt.append(make_anno(BOXES))
        dt.append(make_anno(BOXES, scores=rng.uniform(0.5, 1.0, 3)))
    result, ret = get_official_eval_result(gt, dt, 'Car')
    assert ret['Car_3d_easy'] == pytest.approx(100.0, abs=0.1)
    assert ret['Car_3d_moderate'] == pytest.approx(100.0, abs=0.1)
    assert ret['Car_bev_easy'] == pytest.approx(100.0, abs=0.1)
    assert 'bbox AP' in result


def test_missed_detection_lowers_ap():
    gt = [make_anno(BOXES)]
    dt = [make_anno(BOXES[:2], scores=[0.9, 0.8])]  # one gt missed
    _, ret = get_official_eval_result(gt, dt, 'Car')
    assert ret['Car_3d_easy'] < 100.0 * 2 / 3 + 1


def test_shifted_detection_fails_07_overlap():
    shifted = BOXES.copy()
    shifted[:, 0] += 3.0  # > box width: zero overlap at 0.7 threshold
    gt = [make_anno(BOXES)]
    dt = [make_anno(shifted, scores=[0.9, 0.8, 0.7])]
    _, ret = get_official_eval_result(gt, dt, 'Car')
    assert ret['Car_3d_easy'] == pytest.approx(0.0, abs=1e-6)
