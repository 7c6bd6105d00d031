"""Tracker tests: Kalman filter behavior, both assignment paths, and full
multi-frame tracking on synthetic moving objects (id stability, miss
tolerance, pruning) — the reference has no tests, so these encode the
semantics of jmodt/tracking/{kalman,tracker,data_association}.py."""

import numpy as np
import pytest

from jmodt_tpu.tracking import Kalman, Track, Tracker
from jmodt_tpu.tracking.data_association import hungarian_match, mip_solve


@pytest.fixture(autouse=True)
def fresh_track_ids():
    """Track.new_id is class-global (reference track.py:5); isolate tests."""
    Track.new_id = 1
    yield


def make_heads(seed=0, c=32):
    """Random link/se correlation heads (flax); returns the shared apply fn
    (params, x) plus each head's params — the Tracker threads params as
    runtime arguments (never closure captures)."""
    import jax
    from jmodt_tpu.models.rcnn import CorrelationHead
    head = CorrelationHead(hidden=(16, 16))
    k1, k2 = jax.random.split(jax.random.PRNGKey(seed))
    link_p = head.init(k1, np.zeros((1, c), np.float32))
    se_p = head.init(k2, np.zeros((1, c), np.float32))
    return head.apply, link_p, se_p


def moving_boxes(t, n=2):
    """n cars driving forward; returns (n, 7) [x, y, z, h, w, l, ry]."""
    boxes = np.zeros((n, 7), np.float32)
    for i in range(n):
        boxes[i] = [i * 8.0 - 4.0, 1.6, 10.0 + 1.2 * t + 3.0 * i,
                    1.5, 1.6, 3.9, 0.1 * i]
    return boxes


def test_kalman_constant_velocity_convergence():
    kf = Kalman(np.array([0, 1.6, 10, 1.5, 1.6, 3.9, 0.0]))
    for t in range(1, 8):
        kf.predict()
        kf.update(np.array([0, 1.6, 10 + 1.2 * t, 1.5, 1.6, 3.9, 0.0]))
    pred = kf.predict()
    # velocity learned: prediction ~1.2 m ahead of the last measurement
    assert abs(pred[2] - (10 + 1.2 * 8)) < 0.15
    assert abs(pred[0]) < 1e-6


def test_kalman_orientation_flip():
    kf = Kalman(np.array([0, 1.6, 10, 1.5, 1.6, 3.9, 0.0]))
    # measurement flipped by ~pi: the filter should flip its state rather
    # than average the two headings (kalman.py:63-69)
    kf.predict()
    kf.update(np.array([0, 1.6, 11.2, 1.5, 1.6, 3.9, np.pi - 0.05]))
    ang = kf.get_box()[6]
    assert (abs(ang - np.pi) < 0.3) or (abs(ang + np.pi) < 0.3)


def test_hungarian_basic():
    link = np.array([[0.9, 0.1], [0.2, 0.8]], np.float32)
    matched, unmatched, tentative = hungarian_match(link, [0.9, 0.9])
    assert sorted(matched) == [[0, 0], [1, 1]]
    assert unmatched == [] and tentative == []


def test_hungarian_unmatched_detection():
    link = np.array([[5.0, 0.0, 0.0]], np.float32)  # 1 track, 3 dets
    matched, unmatched, tentative = hungarian_match(
        link, [0.9, 0.9, 0.2], score_threshold=0.5)
    assert matched == [[0, 0]]
    assert unmatched == [1]      # confident unmatched -> new track
    assert tentative == [2]      # low score -> tentative


def test_mip_matches_obvious_assignment():
    # 2 tracks, 2 dets, strong diagonal affinity
    link = np.array([[9.0, 0.1], [0.1, 8.0]], np.float32)
    cls = np.zeros(4)
    new = np.array([0.0, 0.0, 0.1, 0.1])
    end = np.array([0.1, 0.1, 0.0, 0.0])
    matched, unmatched, tentative = mip_solve(cls, link, new, end)
    assert sorted(matched) == [[0, 0], [1, 1]]
    assert unmatched == [] and tentative == []


def test_mip_prefers_new_track_over_bad_link():
    # one track far from the only detection: ending the track + starting a
    # new one beats the (negative-affinity) link
    link = np.array([[-5.0]], np.float32)
    cls = np.array([0.0, 0.0])
    new = np.array([0.0, 0.5])
    end = np.array([0.5, 0.0])
    matched, unmatched, tentative = mip_solve(cls, link, new, end)
    assert matched == []
    assert unmatched == [1 - 1]  # det 0 starts a new track


@pytest.mark.parametrize('hungarian', [False, True])
def test_tracker_stable_ids_over_sequence(hungarian):
    apply, link_p, se_p = make_heads(c=32)
    trk = Tracker(apply, apply, link_p, se_p, t_miss=2, t_hit=0, hungarian=hungarian,
                  score_thresh=0.85)
    feats = np.random.RandomState(3).randn(2, 32).astype(np.float32)
    ids_per_frame = []
    for t in range(6):
        boxes = moving_boxes(t)
        results = trk.update(t + 1, boxes, np.array([0.95, 0.95]),
                             feats + 0.01 * t, [f'{t}-a', f'{t}-b'])
        ids_per_frame.append(sorted(r[0] for r in results))
    assert ids_per_frame[0] == [1, 2]
    for ids in ids_per_frame[1:]:
        assert ids == ids_per_frame[0], f'id switch: {ids_per_frame}'


def test_tracker_handles_miss_and_prune():
    apply, link_p, se_p = make_heads(c=32)
    trk = Tracker(apply, apply, link_p, se_p, t_miss=2, t_hit=0, score_thresh=0.85)
    feats = np.random.RandomState(3).randn(2, 32).astype(np.float32)
    trk.update(1, moving_boxes(0), np.array([0.95, 0.95]), feats, ['a', 'b'])
    # frame 2: object 1 missing -> its track survives (misses=1 < t_miss)
    out = trk.update(2, moving_boxes(1)[:1], np.array([0.95]), feats[:1], ['a'])
    assert [r[0] for r in out] == [1]
    assert len(trk.tracks) == 2
    # frames 3-4: still missing -> pruned
    trk.update(3, moving_boxes(2)[:1], np.array([0.95]), feats[:1], ['a'])
    trk.update(4, moving_boxes(3)[:1], np.array([0.95]), feats[:1], ['a'])
    assert len(trk.tracks) == 1
    # reappearing object: with w_cls=100 the MIP's det unary (100*(s-1)) is
    # negative, so an unlinked det enters as *tentative* (misses=1, not yet
    # emitted) and surfaces on its next hit with a NEW id (track was pruned)
    out = trk.update(5, moving_boxes(4), np.array([0.95, 0.95]), feats,
                     ['a', 'b'])
    assert [r[0] for r in out] == [1]
    assert len(trk.tracks) == 2
    out = trk.update(6, moving_boxes(5), np.array([0.95, 0.95]), feats,
                     ['a', 'b'])
    ids = sorted(r[0] for r in out)
    assert ids[0] == 1 and ids[1] > 2


def test_tracker_empty_frame_returns_nothing():
    apply, link_p, se_p = make_heads(c=32)
    trk = Tracker(apply, apply, link_p, se_p)
    assert trk.update(1, np.zeros((0, 7)), np.zeros(0),
                      np.zeros((0, 32)), []) == []


def test_tracker_reset():
    apply, link_p, se_p = make_heads(c=32)
    trk = Tracker(apply, apply, link_p, se_p)
    feats = np.random.RandomState(0).randn(2, 32).astype(np.float32)
    trk.update(1, moving_boxes(0), np.array([0.9, 0.9]), feats, ['a', 'b'])
    trk.reset()
    assert trk.tracks == [] and Track.new_id == 1
    out = trk.update(1, moving_boxes(0), np.array([0.9, 0.9]), feats,
                     ['a', 'b'])
    assert sorted(r[0] for r in out) == [1, 2]
