"""ReID correlation semantics: unique-tid mean features, bidirectional
softmax normalization, and link / start-end label construction against
hand-computed values (reference rcnn.py:145-156, 226-258 and
train_functions.py:282-329)."""

import jax
import jax.numpy as jnp
import numpy as np

from jmodt_tpu.models.rcnn import (masked_bidirectional_softmax,
                                   unique_tid_mean_features)


def test_unique_tid_mean_features():
    tids = jnp.asarray([2.0, 0.0, 5.0, 2.0, -1.0, 5.0])
    feats = jnp.asarray([[1.0], [100.0], [10.0], [3.0], [100.0], [20.0]])
    utids, valid, ufeats = unique_tid_mean_features(tids, feats)
    utids = np.asarray(utids)
    valid = np.asarray(valid)
    ufeats = np.asarray(ufeats)
    # uniques compacted to the front in sorted order; bg (<=0) excluded
    assert utids[valid].tolist() == [2.0, 5.0]
    np.testing.assert_allclose(ufeats[0], [(1.0 + 3.0) / 2])
    np.testing.assert_allclose(ufeats[1], [(10.0 + 20.0) / 2])
    # invalid slots contribute zeros
    np.testing.assert_allclose(ufeats[~valid], 0.0)


def test_masked_bidirectional_softmax_matches_dense():
    """On a fully-valid matrix it equals (softmax rows + softmax cols)/2
    (reference tracker.py:86-89)."""
    rng = np.random.RandomState(0)
    s = jnp.asarray(rng.randn(4, 5).astype(np.float32))
    ones_r = jnp.ones(4, bool)
    ones_c = jnp.ones(5, bool)
    got = np.asarray(masked_bidirectional_softmax(s, ones_r, ones_c))
    want = (np.asarray(jax.nn.softmax(s, axis=1))
            + np.asarray(jax.nn.softmax(s, axis=0))) / 2
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_masked_bidirectional_softmax_restricts_to_valid():
    rng = np.random.RandomState(1)
    s = jnp.asarray(rng.randn(4, 5).astype(np.float32))
    rmask = jnp.asarray([True, True, False, True])
    cmask = jnp.asarray([True, False, True, True, True])
    got = np.asarray(masked_bidirectional_softmax(s, rmask, cmask))
    # invalid rows/cols are exactly zero
    assert (got[2, :] == 0).all() and (got[:, 1] == 0).all()
    # the valid submatrix equals the dense computation on it
    sub = np.asarray(s)[np.ix_([0, 1, 3], [0, 2, 3, 4])]
    sub = jnp.asarray(sub)
    want = (np.asarray(jax.nn.softmax(sub, axis=1))
            + np.asarray(jax.nn.softmax(sub, axis=0))) / 2
    np.testing.assert_allclose(got[np.ix_([0, 1, 3], [0, 2, 3, 4])], want,
                               rtol=1e-5)
    assert np.isfinite(got).all()


def test_reid_labels_hand_computed():
    """gt_link[i, j] = 1 iff prev unique tid i == next unique tid j;
    gt_start = 1 - column sums; gt_end = 1 - row sums
    (reference rcnn.py:251-254)."""
    from jmodt_tpu.models.rcnn import RCNN
    import __graft_entry__

    cfg = __graft_entry__._small_config()
    model = RCNN(cfg)
    r = 2 * cfg.RCNN.ROI_PER_IMAGE
    c = 133
    rng = np.random.RandomState(0)
    pts = rng.randn(r, cfg.RCNN.NUM_POINTS, c).astype(np.float32)
    # prev frame tids: [3, 7, 0, ...]; next frame tids: [7, 9, 0, ...]
    gt_tids = np.zeros((2, cfg.RCNN.ROI_PER_IMAGE), np.float32)
    gt_tids[0, :2] = [3, 7]
    gt_tids[1, :2] = [7, 9]
    variables = model.init(jax.random.PRNGKey(0), pts,
                           gt_tids=jnp.asarray(gt_tids), train=False)
    out = model.apply(variables, pts, gt_tids=jnp.asarray(gt_tids),
                      train=False)
    gt_link = np.asarray(out['reid_gt_link'][0])
    mask = np.asarray(out['reid_link_mask'][0])
    # prev uniques (sorted): [3, 7]; next uniques: [7, 9]
    # only (prev=7, next=7) links
    assert gt_link[1, 0] == 1.0
    assert gt_link.sum() == 1.0
    assert mask[:2, :2].all()
    gt_start = np.asarray(out['reid_gt_start'][0])
    gt_end = np.asarray(out['reid_gt_end'][0])
    start_mask = np.asarray(out['reid_start_mask'][0])
    end_mask = np.asarray(out['reid_end_mask'][0])
    # next tid 7 is linked (start=0), next tid 9 is new (start=1)
    np.testing.assert_allclose(gt_start[start_mask], [0.0, 1.0])
    # prev tid 3 ends (end=1), prev tid 7 continues (end=0)
    np.testing.assert_allclose(gt_end[end_mask], [1.0, 0.0])
