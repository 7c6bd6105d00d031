"""RoI jitter augmentation (reference aug_roi_by_noise_torch /
random_aug_box3d, proposal_target_layer.py:269-339): perturbation bounds per
REG_AUG_METHOD, the p=0.2 keep-original branch, the IoU-threshold early stop,
and the end-to-end effect on _sample_rois_one when ROI_FG_AUG_TIMES > 0."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jmodt_tpu.models.proposal import (_aug_rois_by_noise, _sample_rois_one,
                                       random_aug_box3d)
from jmodt_tpu.ops.rotated_iou import boxes_iou3d


def small_cfg(aug_times=10, method='multiple'):
    import __graft_entry__
    base = __graft_entry__._small_config()
    return dataclasses.replace(
        base, RCNN=dataclasses.replace(base.RCNN, ROI_FG_AUG_TIMES=aug_times,
                                       REG_AUG_METHOD=method))


BOX = np.array([5.0, 1.5, 20.0, 1.5, 1.6, 3.9, 0.3], np.float32)


@pytest.mark.parametrize('method,pos_max,scale_max,ang_max', [
    ('single', 0.5, 0.15, np.pi / 12),
    ('multiple', 1.0, 0.15, np.pi / 3),
])
def test_random_aug_box3d_bounds(method, pos_max, scale_max, ang_max):
    for seed in range(20):
        aug = np.asarray(random_aug_box3d(jax.random.PRNGKey(seed),
                                          jnp.asarray(BOX), method))
        assert np.all(np.abs(aug[0:3] - BOX[0:3]) <= pos_max + 1e-6)
        assert np.all(np.abs(aug[3:6] / BOX[3:6] - 1.0) <= scale_max + 1e-5)
        assert abs(aug[6] - BOX[6]) <= ang_max + 1e-6


def test_random_aug_box3d_normal_runs():
    aug = np.asarray(random_aug_box3d(jax.random.PRNGKey(0), jnp.asarray(BOX),
                                      'normal'))
    assert aug.shape == (7,) and np.all(np.isfinite(aug))


def test_aug_moves_boxes_and_respects_budget():
    """Rows with max_trials=0 are untouched; rows with a budget get (almost
    surely) perturbed boxes and a recomputed IoU."""
    cfg = small_cfg(aug_times=10)
    n = 8
    rois = np.tile(BOX, (n, 1)).astype(np.float32)
    rois[:, 0] += np.arange(n)          # spread in x
    gt = rois.copy()                    # perfect proposals: IoU 1 vs own gt
    src_iou = np.ones(n, np.float32)
    max_trials = np.array([10] * 4 + [0] * 4, np.int32)
    box, iou = _aug_rois_by_noise(jax.random.PRNGKey(3), jnp.asarray(rois),
                                  jnp.asarray(gt), jnp.asarray(src_iou),
                                  jnp.asarray(max_trials), cfg)
    box, iou = np.asarray(box), np.asarray(iou)
    np.testing.assert_allclose(box[4:], rois[4:])   # no budget -> untouched
    np.testing.assert_allclose(iou[4:], 1.0)
    # budgeted rows: the first trial always executes, so each row is either a
    # kept original (IoU stays 1) or a jittered box with the true aug IoU
    for i in range(4):
        moved = not np.allclose(box[i], rois[i])
        if moved:
            true_iou = float(np.asarray(boxes_iou3d(
                jnp.asarray(box[i][None]), jnp.asarray(gt[i][None])))[0, 0])
            assert iou[i] == pytest.approx(true_iou, abs=1e-4)
        else:
            assert iou[i] == pytest.approx(1.0)


def test_aug_stops_at_threshold():
    """A perfect proposal passes the IoU gate on its first candidate, so with
    keep-probability paths aside, the result must still overlap the gt above
    the positive threshold most of the time (early stop keeps the first
    passing candidate rather than the 10th)."""
    cfg = small_cfg(aug_times=10)
    n = 32
    rois = np.tile(BOX, (n, 1)).astype(np.float32)
    rois[:, 0] += np.arange(n) * 8
    gt = rois.copy()
    box, iou = _aug_rois_by_noise(
        jax.random.PRNGKey(0), jnp.asarray(rois), jnp.asarray(gt),
        jnp.ones(n, jnp.float32), jnp.full(n, 10, jnp.int32), cfg)
    # pos_thresh = min(REG_FG_THRESH, CLS_FG_THRESH) = 0.55 by default; an
    # early-stopped trial reports IoU >= thresh. Only rows that burned the
    # whole budget may sit below. With 10 trials that is < 1% of rows.
    thresh = min(cfg.RCNN.REG_FG_THRESH, cfg.RCNN.CLS_FG_THRESH)
    assert np.mean(np.asarray(iou) >= thresh - 1e-6) > 0.9


def test_sample_rois_one_with_aug_keeps_shapes_and_labels():
    cfg = small_cfg(aug_times=10)
    n_roi = cfg.RCNN.ROI_PER_IMAGE
    m = 16
    rng = np.random.RandomState(0)
    gt = np.zeros((4, 7), np.float32)
    gt[0] = [0, 1.5, 10, 1.5, 1.6, 3.9, 0.0]
    gt[1] = [8, 1.5, 30, 1.5, 1.6, 3.9, 0.5]
    rois = np.tile(gt[0], (m, 1)).astype(np.float32)
    rois[:, 0] += rng.uniform(-0.3, 0.3, m)
    rois[m // 2:] = gt[1]
    rois[m // 2:, 2] += rng.uniform(-0.3, 0.3, m // 2)
    tids = np.array([3.0, 7.0, 0.0, 0.0], np.float32)

    out_rois, out_gt, out_iou, out_tids = _sample_rois_one(
        jax.random.PRNGKey(1), jnp.asarray(rois), jnp.asarray(gt),
        jnp.asarray(tids), cfg)
    assert out_rois.shape == (n_roi, 7)
    assert out_gt.shape == (n_roi, 7)
    assert np.all(np.isfinite(np.asarray(out_rois)))
    # every sampled gt must be one of the two real gts
    for g in np.asarray(out_gt):
        assert np.allclose(g, gt[0]) or np.allclose(g, gt[1])
    assert set(np.asarray(out_tids).tolist()) <= {0.0, 3.0, 7.0}


def test_aug_times_zero_is_identity():
    """ROI_FG_AUG_TIMES=0 (the default) must reproduce the un-augmented
    sampling exactly."""
    cfg0 = small_cfg(aug_times=0)
    m = 16
    rng = np.random.RandomState(0)
    gt = np.zeros((4, 7), np.float32)
    gt[0] = [0, 1.5, 10, 1.5, 1.6, 3.9, 0.0]
    rois = np.tile(gt[0], (m, 1)).astype(np.float32)
    rois[:, 0] += rng.uniform(-0.3, 0.3, m)
    tids = np.array([3.0, 0.0, 0.0, 0.0], np.float32)
    r0 = _sample_rois_one(jax.random.PRNGKey(1), jnp.asarray(rois),
                          jnp.asarray(gt), jnp.asarray(tids), cfg0)
    # sampled rois must be a subset of the input rois (no jitter applied)
    for r in np.asarray(r0[0]):
        assert np.any(np.all(np.isclose(r, rois, atol=1e-6), axis=1))
