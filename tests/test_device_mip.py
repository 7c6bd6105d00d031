"""Device MIP-equivalent assignment tests.

1. `mip_assign` (augmented on-device LAP over outside-option-reduced
   weights) vs the host `mip_solve` (HiGHS branch-and-bound on the
   reference's flow-conservation MIP, data_association.py:31-104) on
   randomized padded instances — matched pairs AND the live/tentative
   birth classification must agree.
2. End-to-end: DeviceTracker(assign='mip') vs the host Tracker on its
   DEFAULT (MIP) path — identical emitted (tid -> det) rows per frame.
"""

import numpy as np
import pytest

jnp = pytest.importorskip('jax.numpy')

from jmodt_tpu.tracking.data_association import mip_solve
from jmodt_tpu.tracking.device_tracker import DeviceTracker, mip_assign

W_CLS, W_SE = 100.0, 1.0


def _random_instance(rng, t_slots, p, d_cap, d):
    """Padded device-side instance + the compact host-side equivalent."""
    active = np.zeros(t_slots, bool)
    act_idx = rng.choice(t_slots, size=p, replace=False)
    active[act_idx] = True
    act_idx = np.flatnonzero(active)          # slot -> compact order
    det_mask = np.zeros(d_cap, bool)
    det_mask[:d] = True

    combined = rng.uniform(-5, 25, (t_slots, d_cap)).astype(np.float32)
    pred_score = rng.uniform(0.0, 1.0, t_slots).astype(np.float32)
    det_score = rng.uniform(0.0, 1.0, d_cap).astype(np.float32)
    start = rng.uniform(0.0, 1.0, d_cap).astype(np.float32)
    end = rng.uniform(0.0, 1.0, t_slots).astype(np.float32)

    link = combined[np.ix_(act_idx, np.arange(d))].astype(np.float64)
    cls_score = W_CLS * (np.concatenate([pred_score[act_idx],
                                         det_score[:d]]) - 1.0)
    new_score = np.concatenate([np.zeros(p), W_SE * start[:d]])
    end_score = np.concatenate([W_SE * end[act_idx], np.zeros(d)])
    host = (cls_score, link, new_score, end_score)
    dev = (combined, pred_score, det_score, start, end, active, det_mask)
    return dev, host, act_idx


@pytest.mark.parametrize('t_slots,p,d_cap,d', [
    (8, 3, 4, 2), (8, 2, 4, 4), (12, 6, 8, 5), (12, 1, 8, 6),
    (16, 8, 8, 8),
])
def test_mip_assign_matches_host_solver(t_slots, p, d_cap, d):
    rng = np.random.RandomState(t_slots * 100 + p * 10 + d)
    for trial in range(25):
        dev, host, act_idx = _random_instance(rng, t_slots, p, d_cap, d)
        combined, pred_score, det_score, start, end, active, det_mask = dev

        t2d, d2t, live_new = mip_assign(
            jnp.asarray(combined), jnp.asarray(pred_score),
            jnp.asarray(det_score), jnp.asarray(start), jnp.asarray(end),
            jnp.asarray(active), jnp.asarray(det_mask), W_CLS, W_SE)
        t2d, d2t = np.asarray(t2d), np.asarray(d2t)
        live_new = np.asarray(live_new)

        slot2compact = {int(s): i for i, s in enumerate(act_idx)}
        got_matched = sorted([slot2compact[s], int(t2d[s])]
                             for s in np.flatnonzero(t2d >= 0))
        got_unmatched = sorted(int(k) for k in np.flatnonzero(live_new))
        got_tentative = sorted(
            int(k) for k in range(d)
            if d2t[k] < 0 and not live_new[k])

        want_matched, want_unmatched, want_tentative = mip_solve(*host)
        assert got_matched == sorted(map(list, want_matched)), \
            f'trial {trial}'
        assert got_unmatched == sorted(want_unmatched), f'trial {trial}'
        assert got_tentative == sorted(want_tentative), f'trial {trial}'
        # consistency of the two returned directions
        for s in np.flatnonzero(t2d >= 0):
            assert d2t[t2d[s]] == s


def test_mip_assign_no_active_tracks():
    """All dets unmatched; live/tentative decided by cls+start sign."""
    rng = np.random.RandomState(0)
    dev, host, _ = _random_instance(rng, 8, 0, 4, 3)
    combined, pred_score, det_score, start, end, active, det_mask = dev
    t2d, d2t, live_new = mip_assign(
        jnp.asarray(combined), jnp.asarray(pred_score),
        jnp.asarray(det_score), jnp.asarray(start), jnp.asarray(end),
        jnp.asarray(active), jnp.asarray(det_mask), W_CLS, W_SE)
    assert np.all(np.asarray(t2d) == -1)
    assert np.all(np.asarray(d2t) == -1)
    want = (W_CLS * (det_score[:3] - 1.0) + W_SE * start[:3]) > 0
    np.testing.assert_array_equal(np.asarray(live_new)[:3], want)


# ---------------------------------------------------------------------------
# e2e: device MIP tracker vs host MIP tracker
# ---------------------------------------------------------------------------

def _make_heads():
    import jax
    from jmodt_tpu.models.rcnn import CorrelationHead
    link = CorrelationHead(hidden=(16, 16))
    se = CorrelationHead(hidden=(16, 16))
    x = np.zeros((1, 32), np.float32)
    lp = link.init(jax.random.PRNGKey(0), x)
    sp = se.init(jax.random.PRNGKey(1), x)
    return link.apply, lp, se.apply, sp


def _frame_boxes(t, n):
    boxes = np.zeros((n, 7), np.float32)
    for i in range(n):
        boxes[i] = [i * 9.0 - 8.0, 1.6, 8.0 + 1.1 * t + 4.0 * i,
                    1.5, 1.6, 3.9, 0.05 * i]
    return boxes


def test_device_mip_matches_host_mip_e2e():
    """The performance path now honors the reference's DEFAULT association
    semantics: emitted rows (tid -> det idx) identical to the host MIP
    tracker over a sequence with births, misses, and re-acquisitions."""
    from jmodt_tpu.tracking import Tracker, Track
    link_apply, lp, se_apply, sp = _make_heads()
    Track.new_id = 1
    host = Tracker(link_apply, se_apply, lp, sp, t_miss=2, t_hit=0,
                   w_cls=W_CLS, w_app=2.0, w_iou=10.0, w_dis=10.0,
                   w_se=W_SE, hungarian=False)
    dev = DeviceTracker(link_apply, (lp, sp), feat_dim=32, max_tracks=16,
                        max_dets=8, assign='mip', se_apply=se_apply,
                        w_cls=W_CLS, w_se=W_SE, w_app=2.0, w_iou=10.0,
                        w_dis=10.0)
    rng = np.random.RandomState(11)
    feats_all = rng.randn(4, 32).astype(np.float32)

    for t in range(8):
        if t < 3:
            n, idx = 2, [0, 1]
        elif t < 5:
            n, idx = 3, [0, 1, 2]          # birth
        elif t == 5:
            n, idx = 2, [0, 2]             # track 1 misses
        else:
            n, idx = 4, [0, 1, 2, 3]       # re-acquire + another birth
        boxes = _frame_boxes(t, 4)[idx]
        scores = np.array([0.95, 0.90, 0.97, 0.88], np.float32)[idx]
        feats = feats_all[idx] + 0.01 * t

        host_out = host.update(t + 1, boxes, scores, feats, list(idx))
        out = {k: np.asarray(v)
               for k, v in dev.update(t + 1, boxes, scores, feats).items()}
        dev_rows = sorted(
            (int(out['tid'][i]), idx[int(out['det_idx'][i])])
            for i in np.flatnonzero(out['emit']))
        host_rows = sorted((r[0], r[1]) for r in host_out)
        assert dev_rows == host_rows, \
            f'frame {t}: dev={dev_rows} host={host_rows}'
