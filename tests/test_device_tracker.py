"""On-device tracker tests: id stability, miss/prune lifecycle, and
agreement with the host tracker on easy sequences."""

import numpy as np
import pytest

from jmodt_tpu.tracking.device_tracker import DeviceTracker


def make_link():
    """(apply_fn, params) for a random link head."""
    import jax
    from jmodt_tpu.models.rcnn import CorrelationHead
    head = CorrelationHead(hidden=(16, 16))
    p = head.init(jax.random.PRNGKey(0), np.zeros((1, 32), np.float32))
    return head.apply, p


def moving_boxes(t, n=2):
    boxes = np.zeros((n, 7), np.float32)
    for i in range(n):
        boxes[i] = [i * 8.0 - 4.0, 1.6, 10.0 + 1.2 * t + 3.0 * i,
                    1.5, 1.6, 3.9, 0.1 * i]
    return boxes


@pytest.fixture
def tracker():
    apply_fn, params = make_link()
    return DeviceTracker(apply_fn, params, feat_dim=32, max_tracks=16,
                         max_dets=8, score_thresh=0.85)


def emitted(out):
    out = {k: np.asarray(v) for k, v in out.items()}
    rows = []
    for i in np.flatnonzero(out['emit']):
        rows.append((int(out['tid'][i]), out['box'][i],
                     float(out['score'][i]), int(out['det_idx'][i])))
    return sorted(rows)


def test_stable_ids_over_sequence(tracker):
    feats = np.random.RandomState(3).randn(2, 32).astype(np.float32)
    ids_per_frame = []
    for t in range(6):
        out = tracker.update(t + 1, moving_boxes(t),
                             np.array([0.95, 0.95], np.float32),
                             feats + 0.01 * t)
        ids_per_frame.append([r[0] for r in emitted(out)])
    assert ids_per_frame[0] == [1, 2]
    for ids in ids_per_frame[1:]:
        assert ids == ids_per_frame[0], f'id switch: {ids_per_frame}'


def test_kalman_state_follows_motion(tracker):
    feats = np.random.RandomState(3).randn(1, 32).astype(np.float32)
    for t in range(8):
        out = tracker.update(t + 1, moving_boxes(t)[:1],
                             np.array([0.95], np.float32), feats[:1])
    rows = emitted(out)
    assert len(rows) == 1
    # Kalman mean z close to the last measurement z = 10 + 1.2*7
    assert abs(rows[0][1][2] - (10 + 1.2 * 7)) < 0.5


def test_miss_and_prune(tracker):
    feats = np.random.RandomState(3).randn(2, 32).astype(np.float32)
    tracker.update(1, moving_boxes(0), np.array([0.95, 0.95], np.float32),
                   feats)
    out = tracker.update(2, moving_boxes(1)[:1],
                         np.array([0.95], np.float32), feats[:1])
    assert [r[0] for r in emitted(out)] == [1]
    state = tracker.state
    assert int(np.sum(np.asarray(state.tid) > 0)) == 2  # missed survives
    tracker.update(3, moving_boxes(2)[:1], np.array([0.95], np.float32),
                   feats[:1])
    assert int(np.sum(np.asarray(tracker.state.tid) > 0)) == 1  # pruned
    # reappearing object -> new id
    out = tracker.update(4, moving_boxes(3),
                         np.array([0.95, 0.95], np.float32), feats)
    ids = [r[0] for r in emitted(out)]
    assert ids[0] == 1 and ids[1] > 2


def test_tentative_low_score_not_emitted(tracker):
    feats = np.random.RandomState(3).randn(2, 32).astype(np.float32)
    tracker.update(1, moving_boxes(0), np.array([0.95, 0.95], np.float32),
                   feats)
    # far-away low-score det: born tentative (misses=1), not emitted
    far = np.array([[30.0, 1.6, 60.0, 1.5, 1.6, 3.9, 0.0]], np.float32)
    out = tracker.update(2, np.concatenate([moving_boxes(1), far]),
                         np.array([0.95, 0.95, 0.3], np.float32),
                         np.concatenate([feats,
                                         np.ones((1, 32), np.float32)]))
    assert [r[0] for r in emitted(out)] == [1, 2]
    assert int(np.sum(np.asarray(tracker.state.tid) > 0)) == 3
    # next frame it IS matched -> emitted with its id
    out = tracker.update(3, np.concatenate([moving_boxes(2), far]),
                         np.array([0.95, 0.95, 0.9], np.float32),
                         np.concatenate([feats,
                                         np.ones((1, 32), np.float32)]))
    assert [r[0] for r in emitted(out)] == [1, 2, 3]


def test_empty_frame_is_noop(tracker):
    feats = np.random.RandomState(3).randn(2, 32).astype(np.float32)
    tracker.update(1, moving_boxes(0), np.array([0.95, 0.95], np.float32),
                   feats)
    before = np.asarray(tracker.state.misses).copy()
    out = tracker.update(2, np.zeros((0, 7), np.float32),
                         np.zeros(0, np.float32),
                         np.zeros((0, 32), np.float32))
    assert emitted(out) == []
    np.testing.assert_array_equal(np.asarray(tracker.state.misses), before)


def test_matches_host_tracker_on_easy_sequence():
    """Greedy device assignment == exact host assignment when objects are
    far apart (the common case)."""
    from jmodt_tpu.tracking import Tracker, Track
    Track.new_id = 1
    apply_fn, params = make_link()
    dev = DeviceTracker(apply_fn, params, feat_dim=32, max_tracks=16,
                        max_dets=8, score_thresh=0.85)
    host = Tracker(apply_fn, apply_fn, params, params,
                   t_miss=2, t_hit=0, hungarian=True, score_thresh=0.85)
    feats = np.random.RandomState(3).randn(3, 32).astype(np.float32)
    for t in range(5):
        boxes = moving_boxes(t, n=3)
        sc = np.array([0.95, 0.9, 0.92], np.float32)
        dev_out = emitted(dev.update(t + 1, boxes, sc, feats))
        host_out = host.update(t + 1, boxes, sc, feats, list(range(3)))
        dev_ids = [r[0] for r in dev_out]
        host_ids = sorted(r[0] for r in host_out)
        assert dev_ids == host_ids, f'frame {t}: {dev_ids} vs {host_ids}'
        # matched det indices agree as well
        dev_map = {r[0]: r[3] for r in dev_out}
        host_map = {r[0]: r[1] for r in host_out}
        assert dev_map == host_map
