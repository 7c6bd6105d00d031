"""Fully on-device online tracker: one jitted step per frame, no host
feedback.

The reference tracker (jmodt/tracking/tracker.py) bounces between device
(affinity) and host (Kalman, CBC solver) every frame; on hardware where a
device->host value fetch costs real latency, that round trip IS the frame
budget.  This tracker keeps ALL state on device — Kalman means/covariances,
appearance features, miss/hit counters, track ids in fixed slots — so a
whole sequence streams through one compiled program with the host only
*reading* per-frame outputs, which therefore pipeline: the fetch of frame
i's result overlaps the compute of frame i+1.  This is the TPU-native
analog of the reference's "long context": O(1) device state per track,
fixed padded shapes, zero recompilation across a sequence (SURVEY.md §5).

Assignment modes (`assign=`):

  * 'mip' — EXACT equivalent of the reference's DEFAULT stage-2 path, the
    start/end-aware MIP (reference tracker.py:104-124,
    data_association.py:31-104), fully on device.  The flow-conservation
    MIP decomposes exactly (proven in tests/test_mip_differential.py):
    the optimum is the injective partial matching M maximizing
        sum_{(j,k) in M} (cls_j + cls_k + link_jk)
      + sum_{j not matched} max(0, cls_j + w_se*end_j)
      + sum_{k not matched} max(0, cls_k + w_se*start_k)
    which is a max-weight bipartite matching under the REDUCED weights
        w_jk = cls_j + cls_k + link_jk - out_j - out_k,
    solved by `_lap_assign` on a matrix augmented with one personal
    zero-value dummy row per detection ("stay unmatched").  Verified
    against the host `mip_solve` (HiGHS) in tests/test_device_mip.py.
  * 'hungarian' (default) — exact Jonker-Volgenant on the combined
    affinity, identical solutions to the host scipy path
    (`--hungarian` branch, reference data_association.py:107-138).
  * 'greedy' — cheaper best-first matching; can differ in conflict
    configurations.

Kalman semantics (constant velocity, orientation wrap + acute-angle
correction) follow /root/reference/jmodt/tracking/kalman.py:5-104, made
branchless with `jnp.where`.
"""

from __future__ import annotations

import functools
import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from jmodt_tpu.models.rcnn import masked_bidirectional_softmax
from jmodt_tpu.ops.geometry import boxes_center_dist_affinity
from jmodt_tpu.ops.rotated_iou import boxes_iou3d

# State/measurement dims padded to TPU-friendly 16/8 (real dims 10/7): the
# MXU slow-paths batched dot_generals whose dims are not multiples of 8, and
# on this relay that also permanently degrades program caching.  Padding is
# exact: pad rows of H are zero, pad diag of R is 1, pad diag of P0/Q is 0 —
# the pad components of the gain and state stay identically zero.
_DIM_X = 16   # [x, y, z, h, w, l, ry, vx, vy, vz, 6 x pad]
_DIM_Z = 8    # [x, y, z, h, w, l, ry, pad]


class KalmanMats(NamedTuple):
    """Model matrices, threaded through TrackerState as runtime arguments —
    NOT closure constants: on this relay, matmuls against embedded constants
    permanently degrade executable caching."""
    f: jnp.ndarray    # (16, 16) transition
    h: jnp.ndarray    # (8, 16) measurement
    q: jnp.ndarray    # (16, 16) process noise
    r: jnp.ndarray    # (8, 8) measurement noise
    p0: jnp.ndarray   # (16, 16) initial covariance


def _make_mats() -> KalmanMats:
    import numpy as np
    f = np.eye(_DIM_X, dtype=np.float32)
    f[0, 7] = f[1, 8] = f[2, 9] = 1.0
    h = np.eye(_DIM_Z, _DIM_X, dtype=np.float32)
    h[7, 7] = 0.0
    q = np.eye(_DIM_X, dtype=np.float32)
    q[7:10, 7:10] *= 0.01
    q[10:, 10:] = 0.0
    r = np.eye(_DIM_Z, dtype=np.float32)
    p0 = np.eye(_DIM_X, dtype=np.float32) * 10.0
    p0[7:10, 7:10] *= 1000.0
    p0[10:, 10:] = 0.0
    return KalmanMats(f=f, h=h, q=q, r=r, p0=p0)


class TrackerState(NamedTuple):
    """Fixed-slot track store. T slots; tid == 0 means free."""
    mean: jnp.ndarray      # (T, 16) — 10-dim Kalman state zero-padded to
                           # the MXU-friendly _DIM_X=16 (module header)
    cov: jnp.ndarray       # (T, 16, 16) — same padding, pad block zeroed
    feat: jnp.ndarray      # (T, C)
    score: jnp.ndarray     # (T,)
    misses: jnp.ndarray    # (T,) int32
    hits: jnp.ndarray      # (T,) int32
    tid: jnp.ndarray       # (T,) int32
    det_idx: jnp.ndarray   # (T,) int32 — det matched this frame (-1 none)
    next_id: jnp.ndarray   # () int32
    frame_count: jnp.ndarray    # () int32
    last_frame_idx: jnp.ndarray  # () int32
    mats: 'KalmanMats'


def init_state(max_tracks: int, feat_dim: int) -> TrackerState:
    t = max_tracks
    mats = _make_mats()
    return TrackerState(
        mean=jnp.zeros((t, _DIM_X)),
        cov=jnp.tile(jnp.asarray(mats.p0), (t, 1, 1)),
        feat=jnp.zeros((t, feat_dim)), score=jnp.zeros((t,)),
        misses=jnp.zeros((t,), jnp.int32), hits=jnp.zeros((t,), jnp.int32),
        tid=jnp.zeros((t,), jnp.int32),
        det_idx=jnp.full((t,), -1, jnp.int32),
        next_id=jnp.asarray(1, jnp.int32),
        frame_count=jnp.asarray(0, jnp.int32),
        last_frame_idx=jnp.asarray(0, jnp.int32),
        mats=mats)


def _wrap(theta):
    """Into [-pi, pi) (reference kalman.py:49-52)."""
    theta = jnp.where(theta >= math.pi, theta - 2 * math.pi, theta)
    return jnp.where(theta < -math.pi, theta + 2 * math.pi, theta)


def _kalman_predict(mean, cov, steps, mats: KalmanMats):
    """Advance `steps` (traced int >= 1) constant-velocity steps for all
    slots (reference kalman.py:85-95).

    All Kalman matmuls run at HIGHEST matmul precision: the MXU's default
    bf16 operand truncation puts ~0.4% relative error on KITTI-scale
    state coordinates (round-4 on-chip diagnostic), which drifts the
    covariance recursion and flips marginal gating decisions vs the host
    tracker's exact f32.  The matrices are 16x8-padded — multi-pass cost
    is noise."""
    def body(_, mc):
        with jax.default_matmul_precision('highest'):
            m, c = mc
            m = m @ mats.f.T
            c = jnp.matmul(jnp.matmul(mats.f, c), mats.f.T) + mats.q
        return m, c

    mean, cov = jax.lax.fori_loop(0, jnp.maximum(steps, 1), body,
                                  (mean, cov))
    mean = mean.at[:, 6].set(_wrap(mean[:, 6]))
    return mean, cov


def _kalman_update(mean, cov, z7, apply_mask, mats: KalmanMats):
    """Vectorized measurement update with orientation corrections
    (reference kalman.py:43-83), applied only where apply_mask.
    z7: (T, 7) measurements (padded internally to _DIM_Z)."""
    x6 = _wrap(mean[:, 6])
    z6 = _wrap(z7[:, 6])
    diff = jnp.abs(z6 - x6)
    flip = (diff > math.pi / 2) & (diff < math.pi * 3 / 2)
    x6 = jnp.where(flip, _wrap(x6 + math.pi), x6)
    big = jnp.abs(z6 - x6) >= math.pi * 3 / 2
    x6 = x6 + jnp.where(big, jnp.where(z6 > 0, 2 * math.pi, -2 * math.pi),
                        0.0)
    mean = mean.at[:, 6].set(x6)
    z = jnp.zeros((z7.shape[0], _DIM_Z), z7.dtype
                  ).at[:, :7].set(z7).at[:, 6].set(z6)

    # HIGHEST precision: see _kalman_predict — default MXU bf16
    # truncation corrupts the innovation/covariance math on chip
    with jax.default_matmul_precision('highest'):
        y = z - mean @ mats.h.T                               # (T, 8)
        s = jnp.matmul(jnp.matmul(mats.h, cov), mats.h.T) + mats.r
        k = jnp.matmul(jnp.matmul(cov, mats.h.T), jnp.linalg.inv(s))
        new_mean = mean + jnp.matmul(k, y[..., None])[..., 0]
        # cov - K H cov (avoids an embedded identity-matrix matmul operand)
        new_cov = cov - jnp.matmul(k, jnp.matmul(mats.h, cov))
    new_mean = new_mean.at[:, 6].set(_wrap(new_mean[:, 6]))
    m = apply_mask[:, None]
    return (jnp.where(m, new_mean, mean),
            jnp.where(m[..., None], new_cov, cov))


def _lap_assign(affinity, match_thresh):
    """EXACT max-weight bipartite matching — Jonker-Volgenant shortest
    augmenting paths, fully on device.  The on-device counterpart of the
    host `hungarian_match` (data_association.py:107-138 in the reference;
    scipy's linear_sum_assignment implements the same algorithm).

    One augmentation per detection: a Dijkstra-like scan over track slots
    using (T,)-vector relaxations inside a while_loop (at most T pops, far
    fewer in practice since gated matrices reach a free slot immediately),
    followed by a dual update on the scanned columns and a predecessor
    walk-back (at most D steps).  All shapes static; exactness verified
    against scipy over randomized gated matrices in
    tests/test_device_assign.py.

    Note: plain eps-scaled auction is NOT used here deliberately — with
    more track slots than detections (T > D) its eps-complementary
    slackness bound only holds against assignments into the same column
    subset, and stale prices on unassigned slots make it land on
    arbitrarily suboptimal matchings.

    affinity (T, D) with -inf for invalid pairs, T >= D; returns
    (track->det (T,) int32 with -1 unmatched, det->track (D,))."""
    t, d = affinity.shape
    assert t >= d, 'lap assumes at least as many track slots as dets'
    # Finite stand-in for gated pairs (filtered at the end).  MUST stay
    # small relative to f32 precision: once an augmenting path ends in a
    # gated column the dual update subtracts ~big from scanned columns,
    # and f32's ulp at 1e9 (~64) would exceed the whole affinity range
    # (~22 = w_app + w_iou + w_dis), silently corrupting later
    # relaxations.  At 1e4 the ulp is ~1e-3 — far below any meaningful
    # affinity gap.  (Found by differential test with many gated rows.)
    big = 1e4
    inf = 1e30     # scan mask
    aff = jnp.where(jnp.isfinite(affinity), affinity, -big)
    cost = -aff.T  # (D, T): rows = detections, minimize

    def assign_row(r, carry):
        v, col2row, row2col = carry

        def scan_cond(c):
            _, _, _, jfree = c
            return jfree < 0

        def scan_body(c):
            scanned, dvec, pred, jfree = c
            j = jnp.argmin(jnp.where(scanned, inf, dvec)).astype(jnp.int32)
            scanned = scanned.at[j].set(True)
            i = col2row[j]
            free = i < 0
            safe_i = jnp.where(free, 0, i)
            red = dvec[j] + (cost[safe_i] - v) - (cost[safe_i, j] - v[j])
            upd = (~scanned) & (red < dvec) & (~free)
            pred = jnp.where(upd, safe_i, pred)
            dvec = jnp.where(upd, red, dvec)
            return scanned, dvec, pred, jnp.where(free, j, jfree)

        scanned, dvec, pred, jfree = jax.lax.while_loop(
            scan_cond, scan_body,
            (jnp.zeros((t,), bool), cost[r] - v,
             jnp.full((t,), r, jnp.int32), jnp.int32(-1)))

        # dual update on scanned columns (excluding the free one)
        dfin = dvec[jfree]
        sc = scanned.at[jfree].set(False)
        v = jnp.where(sc, v + dvec - dfin, v)

        # augment along the predecessor chain back to row r
        def aug_cond(c):
            _, _, _, done = c
            return ~done

        def aug_body(c):
            j, col2row, row2col, _ = c
            i = pred[j]
            col2row = col2row.at[j].set(i)
            next_j = row2col[i]
            row2col = row2col.at[i].set(j)
            return next_j, col2row, row2col, i == r

        _, col2row, row2col, _ = jax.lax.while_loop(
            aug_cond, aug_body, (jfree, col2row, row2col, False))
        return v, col2row, row2col

    v0 = jnp.zeros((t,))
    c2r0 = jnp.full((t,), -1, jnp.int32)
    r2c0 = jnp.full((d,), -1, jnp.int32)
    _, col2row, row2col = jax.lax.fori_loop(0, d, assign_row,
                                            (v0, c2r0, r2c0))

    # cols are tracks, rows are dets: col2row IS track->det.  Drop pairs at
    # or below the threshold (host hungarian_match:94-96).
    ti = jnp.arange(t)
    di = jnp.arange(d)
    keep_t = (col2row >= 0) & (
        aff[ti, jnp.where(col2row >= 0, col2row, 0)] > match_thresh)
    t2d = jnp.where(keep_t, col2row, -1)
    keep_d = (row2col >= 0) & (
        aff[jnp.where(row2col >= 0, row2col, 0), di] > match_thresh)
    d2t = jnp.where(keep_d, row2col, -1)
    return t2d, d2t


def mip_assign(combined, pred_score, det_score, start, end, active,
               det_mask, w_cls: float, w_se: float):
    """On-device EXACT solve of the reference's data-association MIP
    (reference ortools_solve, data_association.py:31-104) via the
    outside-option decomposition (see module docstring; proven in
    tests/test_mip_differential.py).

    combined: (T, D) w_app*link + w_iou*iou + w_dis*dist; pred_score (T,),
    det_score (D,), start (D,), end (T,) sigmoid scores; active (T,) /
    det_mask (D,) validity.  Returns (t2d (T,) int32 with -1 unmatched,
    d2t (D,) int32 with -1 unmatched, live_new (D,) bool — True where an
    unmatched det's y_det/y_new is 1 in the MIP, i.e. it starts a LIVE
    track; False -> tentative, matching the host classification at
    data_association.py:77-79).
    """
    t, d = combined.shape
    cls_t = w_cls * (pred_score - 1.0)
    cls_d = w_cls * (det_score - 1.0)
    out_t = jnp.maximum(0.0, cls_t + w_se * end)      # (T,)
    out_d = jnp.maximum(0.0, cls_d + w_se * start)    # (D,)
    w = (combined + cls_t[:, None] + cls_d[None, :]
         - out_t[:, None] - out_d[None, :])
    pair_ok = active[:, None] & det_mask[None, :]
    w = jnp.where(pair_ok, w, -jnp.inf)
    # one personal zero-value dummy row per det: "stay unmatched" always
    # available, so the LAP never force-matches a negative-w pair (plain
    # -big gating + post-filter is NOT equivalent: a det whose only real
    # options are negative would push a rival det off its best pair)
    dummy = jnp.where(jnp.eye(d, dtype=bool) & det_mask[None, :],
                      0.0, -jnp.inf)
    aug = jnp.concatenate([w, dummy], axis=0)          # (T+D, D)
    # threshold 0: optimum never contains w<0 pairs (the dummy dominates);
    # dummy matches sit at exactly 0 and are filtered to "unmatched"
    t2d_aug, d2t_aug = _lap_assign(aug, 0.0)
    t2d = t2d_aug[:t]
    d2t = jnp.where(d2t_aug < t, d2t_aug, -1)
    live_new = det_mask & (d2t < 0) & (cls_d + w_se * start > 0)
    return t2d, d2t, live_new


def _greedy_assign(affinity, match_thresh):
    """Best-first bipartite matching on a gated affinity matrix.
    affinity (T, D) with -inf for invalid pairs; returns
    (track->det (T,) int32 with -1 unmatched, det->track (D,))."""
    t, d = affinity.shape
    rounds = min(t, d)

    def body(_, carry):
        aff, t2d, d2t = carry
        flat = jnp.argmax(aff)
        ti, di = flat // d, flat % d
        ok = aff[ti, di] > match_thresh
        t2d = jnp.where(ok, t2d.at[ti].set(di), t2d)
        d2t = jnp.where(ok, d2t.at[di].set(ti), d2t)
        aff = jnp.where(ok, aff.at[ti, :].set(-jnp.inf)
                        .at[:, di].set(-jnp.inf), aff)
        return aff, t2d, d2t

    t2d = jnp.full((t,), -1, jnp.int32)
    d2t = jnp.full((d,), -1, jnp.int32)
    _, t2d, d2t = jax.lax.fori_loop(0, rounds, body, (affinity, t2d, d2t))
    return t2d, d2t


def make_device_tracker_step(link_apply: Callable, t_miss: int = 2,
                             t_hit: int = 0, w_app: float = 2.0,
                             w_iou: float = 10.0, w_dis: float = 10.0,
                             score_thresh: float = 0.0,
                             match_thresh: float = 0.0,
                             assign: str = 'hungarian',
                             se_apply: Callable = None,
                             w_cls: float = 100.0, w_se: float = 1.0,
                             jit: bool = True) -> Callable:
    """Build the jitted per-frame step.

    `link_apply(link_params, x)` maps (..., C) correlation features to
    (..., 1) scores; `link_params` is threaded through every call as a
    runtime argument — closure-captured weights would be hoisted into the
    executable as constants, which this relay's program cache handles
    pathologically.

    `assign`: 'mip' (reference-default start/end MIP semantics, exact —
    requires `se_apply`; the step's `params` argument becomes the tuple
    `(link_params, se_params)`), 'hungarian' (default — exact on-device
    Jonker-Volgenant, identical solutions to the host scipy path) or
    'greedy' (best-first; cheaper, can differ when assignments conflict).

    step(state, frame_id (), det_boxes (D, 7), det_scores (D,),
         det_feats (D, C), det_mask (D,), params) -> (state, output)
    where output is a dict of fixed-shape arrays: 'tid' (T,), 'box' (T, 7),
    'score' (T,), 'det_idx' (T,), 'emit' (T,) bool.
    """
    assert assign in ('mip', 'hungarian', 'greedy'), assign
    if assign == 'mip':
        assert se_apply is not None, "assign='mip' needs the se head"
    assign_fn = _lap_assign if assign == 'hungarian' else _greedy_assign

    def step(state: TrackerState, frame_id, det_boxes, det_scores,
             det_feats, det_mask, params):
        if assign == 'mip':
            link_params, se_params = params
        else:
            link_params = params
        tcap = state.tid.shape[0]
        active = state.tid > 0
        any_det = jnp.any(det_mask)
        passed = jnp.where(any_det, frame_id - state.last_frame_idx, 0)
        frame_count = state.frame_count + passed
        last_frame_idx = jnp.where(any_det, frame_id,
                                   state.last_frame_idx)

        # ---- predict (misses += passed, reference track.py:17-21) ----
        do_predict = any_det & jnp.any(active)
        pm, pc = _kalman_predict(state.mean, state.cov,
                                 jnp.where(do_predict, passed, 1),
                                 state.mats)
        upd = do_predict & active
        mean = jnp.where(upd[:, None], pm, state.mean)
        cov = jnp.where(upd[:, None, None], pc, state.cov)
        misses = jnp.where(any_det & active,
                           state.misses + passed, state.misses)

        # ---- affinity (reference tracker.py:81-124) ----
        pred_boxes = mean[:, :7]
        cor = jnp.abs(state.feat[:, None, :] - det_feats[None, :, :])
        link_raw = link_apply(link_params, cor)[..., 0]
        link = masked_bidirectional_softmax(link_raw, active, det_mask)
        iou = boxes_iou3d(pred_boxes, det_boxes)
        dis = boxes_center_dist_affinity(pred_boxes, det_boxes)
        pair_ok = active[:, None] & det_mask[None, :]
        combined = jnp.where(
            pair_ok, link * w_app + iou * w_iou + dis * w_dis, -jnp.inf)

        had_active = jnp.any(active)
        if assign == 'mip':
            # start/end features: masked cor means over preds/dets
            # (reference tracker.py:104-110; host make_affinity_fn)
            pw = active.astype(cor.dtype)
            dw = det_mask.astype(cor.dtype)
            start_feat = (jnp.sum(cor * pw[:, None, None], axis=0)
                          / jnp.clip(jnp.sum(pw), 1.0, None))   # (D, C)
            end_feat = (jnp.sum(cor * dw[None, :, None], axis=1)
                        / jnp.clip(jnp.sum(dw), 1.0, None))     # (T, C)
            start = jax.nn.sigmoid(se_apply(se_params, start_feat)[..., 0])
            end = jax.nn.sigmoid(se_apply(se_params, end_feat)[..., 0])
            t2d, d2t, live_new = mip_assign(
                combined, state.score, det_scores, start, end, active,
                det_mask, w_cls, w_se)
            # with no live tracks the host births every det live
            # (reference tracker.py:57-65 / our tracker.py:144-149)
            tentative_new = had_active & ~live_new
        else:
            t2d, d2t = assign_fn(combined, match_thresh)
            tentative_new = had_active & (det_scores <= score_thresh)
        matched_t = t2d >= 0
        safe_t2d = jnp.where(matched_t, t2d, 0)

        # ---- update matched (reference tracker.py:125-130) ----
        z = det_boxes[safe_t2d]
        mean, cov = _kalman_update(mean, cov, z, matched_t, state.mats)
        feat = jnp.where(matched_t[:, None], det_feats[safe_t2d],
                         state.feat)
        score = jnp.where(matched_t, det_scores[safe_t2d], state.score)
        misses = jnp.where(matched_t, 0, misses)
        hits = jnp.where(matched_t, state.hits + 1, state.hits)
        det_idx = jnp.where(matched_t, safe_t2d, -1)

        # ---- prune dead BEFORE births to free slots
        # (reference track_management pops at miss >= t_miss) ----
        dead = active & (misses >= t_miss)
        tid = jnp.where(dead, 0, state.tid)

        # ---- births (reference tracker.py:131-143): unmatched dets;
        # live (misses 0) vs tentative (misses 1) per tentative_new.
        # Id/slot order mirrors the host append order: live births first
        # (in det order), then tentative (tracker.py:194-202) ----
        is_new = det_mask & (d2t < 0)
        live_b = is_new & ~tentative_new
        tent_b = is_new & tentative_new
        n_live = jnp.sum(live_b.astype(jnp.int32))
        rank_live = jnp.cumsum(live_b.astype(jnp.int32)) - 1
        rank_tent = n_live + jnp.cumsum(tent_b.astype(jnp.int32)) - 1
        new_rank = jnp.where(live_b, rank_live, rank_tent)    # (D,)
        free = tid == 0
        free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1    # (T,)
        # slot_of_rank[r] = index of the r-th free slot; non-free entries
        # scatter out of bounds and are dropped
        slot_of_rank = jnp.full((tcap,), tcap, jnp.int32).at[
            jnp.where(free, free_rank, tcap)].set(
            jnp.arange(tcap, dtype=jnp.int32), mode='drop')
        born = is_new & (new_rank < jnp.sum(free))             # (D,)
        # non-born dets get dst == tcap (out of bounds) -> dropped
        dst = jnp.where(born,
                        slot_of_rank[jnp.clip(new_rank, 0, tcap - 1)],
                        tcap)

        init_mean = jnp.zeros((det_boxes.shape[0], _DIM_X)
                              ).at[:, :7].set(det_boxes)
        mean = mean.at[dst].set(init_mean, mode='drop')
        cov = cov.at[dst].set(
            jnp.broadcast_to(state.mats.p0,
                             (det_boxes.shape[0],) + state.mats.p0.shape),
            mode='drop')
        feat = feat.at[dst].set(det_feats, mode='drop')
        score = score.at[dst].set(det_scores, mode='drop')
        misses = misses.at[dst].set(tentative_new.astype(jnp.int32),
                                    mode='drop')
        hits = hits.at[dst].set(0, mode='drop')
        det_idx = det_idx.at[dst].set(
            jnp.arange(det_boxes.shape[0], dtype=jnp.int32), mode='drop')
        new_ids = state.next_id + new_rank.astype(jnp.int32)
        tid = tid.at[dst].set(new_ids, mode='drop')
        next_id = state.next_id + jnp.sum(born)

        # ---- emit (reference track_management, tracker.py:35-46) ----
        live = tid > 0
        emit = live & (misses == 0) & any_det & \
            ((hits >= t_hit) | (frame_count <= t_hit))

        new_state = TrackerState(mean=mean, cov=cov, feat=feat, score=score,
                                 misses=misses, hits=hits, tid=tid,
                                 det_idx=det_idx, next_id=next_id,
                                 frame_count=frame_count,
                                 last_frame_idx=last_frame_idx,
                                 mats=state.mats)
        output = {'tid': tid, 'box': mean[:, :7], 'score': score,
                  'det_idx': det_idx, 'emit': emit}
        return new_state, output

    # see make_detection_step: only the outermost program should be jitted
    return jax.jit(step) if jit else step


def make_batched_tracker_step(link_apply: Callable, **kw) -> Callable:
    """vmap the per-frame step over a leading SEQUENCE axis: S independent
    sequences advance in lockstep on one chip.

    The reference evaluates KITTI's 10 val sequences serially
    (tools/eval.py:351-397); with the tracker state living on device and
    all shapes fixed, batching sequences is just a vmap — offline
    evaluation throughput scales with S at near-zero cost.  Sequences of
    different lengths pad with empty frames (det_mask all False), which
    the step treats as a no-op (reference `num_det == 0` early return).

    step(states, frame_ids (S,), det_boxes (S, D, 7), det_scores (S, D),
         det_feats (S, D, C), det_mask (S, D), link_params)
        -> (states, outputs)   with every state/output leaf gaining a
        leading S axis (build states with `init_batched_state`).
    """
    step = make_device_tracker_step(link_apply, jit=False, **kw)
    return jax.jit(jax.vmap(step, in_axes=(0, 0, 0, 0, 0, 0, None)))


def init_batched_state(n_seqs: int, max_tracks: int,
                       feat_dim: int) -> TrackerState:
    """A TrackerState with a leading sequence axis for
    make_batched_tracker_step."""
    s = init_state(max_tracks, feat_dim)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x)[None],
                                   (n_seqs,) + jnp.asarray(x).shape), s)


class DeviceTracker:
    """Convenience wrapper matching the host Tracker's update() signature,
    with the state held on device.  `flush_every` controls how often host
    code reads results; reads of older frames overlap newer compute."""

    def __init__(self, link_apply: Callable, link_params, feat_dim: int,
                 max_tracks: int = 64, max_dets: int = 32, **kw):
        """For `assign='mip'` pass `se_apply=...` in kw and `link_params`
        as the tuple `(link_params, se_params)`."""
        self.step = make_device_tracker_step(link_apply, **kw)
        self.link_params = link_params
        self.max_tracks = max_tracks
        self.max_dets = max_dets
        self.feat_dim = feat_dim
        self.reset()

    def reset(self):
        self.state = init_state(self.max_tracks, self.feat_dim)

    def update(self, frame_id: int, boxes, scores, feats):
        """Returns the raw per-frame output dict of device arrays (call
        jax.device_get / np.asarray lazily — ideally a few frames behind)."""
        import numpy as np
        d = self.max_dets
        db = np.zeros((d, 7), np.float32)
        ds = np.zeros((d,), np.float32)
        df = np.zeros((d, self.feat_dim), np.float32)
        dm = np.zeros((d,), bool)
        n = min(len(scores), d)
        db[:n], ds[:n], df[:n], dm[:n] = boxes[:n], scores[:n], feats[:n], \
            True
        self.state, out = self.step(self.state, jnp.asarray(frame_id),
                                    db, ds, df, dm, self.link_params)
        return out
