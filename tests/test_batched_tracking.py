"""Batched (vmapped-over-sequences) tracking: lockstep multi-sequence
stepping must reproduce independent per-sequence DeviceTracker runs,
including ragged lengths via empty-frame padding."""

import numpy as np

from jmodt_tpu.tracking.device_tracker import (DeviceTracker,
                                               init_batched_state,
                                               make_batched_tracker_step)
from tests.test_device_tracker import emitted, make_link, moving_boxes


def make_frame(seq, t, n=2):
    boxes = moving_boxes(t, n=n)
    boxes[:, 0] += seq * 30.0  # sequences live in different places
    return boxes


def test_batched_matches_independent():
    apply_fn, params = make_link()
    D, C, T = 8, 32, 16
    feats = np.random.RandomState(3).randn(2, C).astype(np.float32)

    batched = make_batched_tracker_step(apply_fn, score_thresh=0.85)
    states = init_batched_state(2, T, C)

    singles = [DeviceTracker(apply_fn, params, feat_dim=C, max_tracks=T,
                             max_dets=D, score_thresh=0.85)
               for _ in range(2)]

    # sequence 1 is shorter: frames 4/5 are empty padding for it
    lengths = [6, 4]
    for t in range(6):
        db = np.zeros((2, D, 7), np.float32)
        ds = np.zeros((2, D), np.float32)
        df = np.zeros((2, D, C), np.float32)
        dm = np.zeros((2, D), bool)
        for s in range(2):
            if t < lengths[s]:
                boxes = make_frame(s, t)
                db[s, :2] = boxes
                ds[s, :2] = 0.95
                df[s, :2] = feats
                dm[s, :2] = True
        fids = np.full((2,), t + 1, np.int32)
        states, outs = batched(states, fids, db, ds, df, dm, params)

        for s in range(2):
            if t < lengths[s]:
                single_out = singles[s].update(t + 1, make_frame(s, t)[:2],
                                               np.full(2, 0.95, np.float32),
                                               feats)
                want = emitted(single_out)
            else:
                want = []
            got_out = {k: np.asarray(v)[s] for k, v in outs.items()}
            got = emitted(got_out)
            assert [r[0] for r in got] == [r[0] for r in want], \
                f'seq {s} frame {t}: {got} vs {want}'
            for g, w in zip(got, want):
                np.testing.assert_allclose(g[1], w[1], rtol=1e-4, atol=1e-4)
