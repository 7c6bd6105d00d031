"""Recall bookkeeping parity: the reference counts a gt as recalled if ANY
decoded box covers it, BEFORE the score threshold and NMS
(/root/reference/tools/eval.py:129-156) — survivors-only counting would
under-report recall for gts covered only by low-score or NMS-suppressed
boxes."""

import numpy as np

from jmodt_tpu.models.inference import make_recall_fn


def _box(x, z, ry=0.0):
    # (x, y, z, h, w, l, ry) KITTI camera-frame box
    return [x, 1.6, z, 1.5, 1.6, 3.9, ry]


def test_accumulate_counts_pre_threshold_boxes():
    recall_fn = make_recall_fn(max_gt=4, max_det=8)
    m = 8
    gt = np.zeros((4, 7), np.float32)
    gt[0] = _box(0.0, 10.0)   # covered only by a below-threshold box
    gt[1] = _box(5.0, 30.0)   # covered by a surviving box

    pred_all = np.zeros((1, m, 7), np.float32)
    pred_all[0, 0] = _box(0.0, 10.0)   # perfect match, but keep=False
    pred_all[0, 1] = _box(5.0, 30.0)   # perfect match, keep=True
    roi_mask = np.zeros((1, m), bool)
    roi_mask[0, :2] = True

    # NMS survivor view: only the second box survived the score threshold
    boxes = np.zeros((1, m, 7), np.float32)
    boxes[0, 0] = _box(5.0, 30.0)
    keep = np.zeros((1, m), bool)
    keep[0, 0] = True

    det_out = {'pred_boxes_all': pred_all, 'roi_mask': roi_mask,
               'rois': pred_all, 'boxes': boxes, 'keep': keep}
    acc = np.asarray(recall_fn.accumulate(np.zeros(11, np.int32), det_out,
                                          gt))
    recalled, roi_recalled, n_gt = acc[:5], acc[5:10], acc[10]
    assert n_gt == 2
    # both gts recalled at every threshold (IoU 1.0 matches), even though
    # gt[0]'s only covering box did not survive the score threshold
    np.testing.assert_array_equal(recalled, [2] * 5)
    np.testing.assert_array_equal(roi_recalled, [2] * 5)
