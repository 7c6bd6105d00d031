"""On-device exact assignment (_lap_assign, Jonker-Volgenant) vs scipy
Hungarian: identical optimal value on randomized gated matrices, identical
matching away from ties, correct match-threshold filtering and -inf gating,
and the known greedy-failure case."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from jmodt_tpu.tracking.device_tracker import _greedy_assign, _lap_assign


def hungarian_pairs(aff, match_thresh):
    """Host reference (data_association.hungarian_match semantics): gated
    pairs become a large negative cost (the same -1e4 fill the device
    solver uses — values past f32 dual precision corrupt BOTH solvers),
    solve, then drop <= thresh."""
    filled = np.where(np.isfinite(aff), aff, -1e4)
    r, c = linear_sum_assignment(filled, maximize=True)
    keep = filled[r, c] > match_thresh
    return set(zip(r[keep].tolist(), c[keep].tolist()))


def lap_pairs(aff, match_thresh):
    t2d, d2t = _lap_assign(jnp.asarray(aff), match_thresh)
    t2d = np.asarray(t2d)
    return {(t, int(d)) for t, d in enumerate(t2d) if d >= 0}


@pytest.mark.parametrize('t,d', [(8, 4), (16, 16), (64, 16)])
def test_lap_total_value_is_optimal(t, d):
    rng = np.random.RandomState(0)
    for trial in range(15):
        aff = rng.uniform(0, 20, (t, d))
        if trial % 3 == 0:  # gate half the pairs like a real tracker frame
            aff = np.where(rng.rand(t, d) < 0.5, aff, -np.inf)
        got = lap_pairs(aff, match_thresh=-2e9)
        want = hungarian_pairs(aff, match_thresh=-2e9)
        filled = np.where(np.isfinite(aff), aff, -1e4)
        got_val = sum(filled[p] for p in got)
        want_val = sum(filled[p] for p in want)
        assert len(got) == d
        assert got_val == pytest.approx(want_val, abs=1e-2)


def test_lap_optimal_with_unmatchable_dets():
    """The realistic hard case: only a few ACTIVE track slots (the rest
    gated to -inf, like an early or crowded frame) and more valid
    detections than compatible tracks, so some augmenting path must end in
    a gated column.  With a too-large gated fill this corrupts the f32
    duals and the solver silently returns suboptimal matchings (the bug
    this test pins); the real-affinity part of the solution must stay
    optimal."""
    rng = np.random.RandomState(7)
    mismatches = 0
    for trial in range(200):
        t, d = 64, rng.randint(3, 17)
        n_active = rng.randint(1, min(4, d) + 1)
        aff = np.full((t, d), -np.inf)
        # active tracks see a random ~70% of the detections
        for ti in range(n_active):
            for di in range(d):
                if rng.rand() < 0.7:
                    aff[ti, di] = rng.uniform(0, 20)
        got = lap_pairs(aff, match_thresh=0.0)
        want = hungarian_pairs(aff, match_thresh=0.0)
        got_val = sum(aff[p] for p in got)
        want_val = sum(aff[p] for p in want)
        if not np.isclose(got_val, want_val, atol=1e-2):
            mismatches += 1
    assert mismatches == 0, f'{mismatches}/200 suboptimal matchings'


def test_lap_exact_match_on_separated_affinities():
    """Unique optimum: the matching must be IDENTICAL to scipy, not just
    equal-value."""
    rng = np.random.RandomState(1)
    for trial in range(10):
        aff = rng.randint(0, 50, (12, 6)).astype(np.float64)
        aff += np.arange(72).reshape(12, 6) * 1e-3  # break all ties
        assert lap_pairs(aff, -1.0) == hungarian_pairs(aff, -1.0)


def test_lap_respects_match_threshold():
    aff = np.array([[5.0, 0.1], [0.2, 4.0]])
    assert lap_pairs(aff, match_thresh=1.0) == {(0, 0), (1, 1)}
    assert lap_pairs(aff, match_thresh=4.5) == {(0, 0)}


def test_lap_handles_inf_gating():
    """-inf pairs (inactive tracks / masked dets) are never kept."""
    aff = np.full((6, 3), -np.inf)
    aff[0, 0] = 3.0
    aff[1, 1] = 2.0
    got = lap_pairs(aff, match_thresh=0.0)
    assert got == {(0, 0), (1, 1)}
    assert lap_pairs(np.full((4, 2), -np.inf), 0.0) == set()


def test_lap_beats_greedy_on_conflict():
    """The classic greedy failure: best-first takes (0,0)=10 then is stuck
    with (1,1)=1 (total 11); optimal is (0,1)+(1,0) = 9+8 = 17."""
    aff = np.array([[10.0, 9.0], [8.0, 1.0]])
    greedy_t2d, _ = _greedy_assign(jnp.asarray(aff), -1.0)
    greedy = {(t, int(d)) for t, d in enumerate(np.asarray(greedy_t2d))
              if d >= 0}
    assert greedy == {(0, 0), (1, 1)}
    assert lap_pairs(aff, -1.0) == {(0, 1), (1, 0)}


def test_lap_d2t_consistency():
    rng = np.random.RandomState(2)
    aff = rng.uniform(0, 10, (16, 8))
    t2d, d2t = _lap_assign(jnp.asarray(aff), 0.0)
    t2d, d2t = np.asarray(t2d), np.asarray(d2t)
    for t, d in enumerate(t2d):
        if d >= 0:
            assert d2t[d] == t
    for d, t in enumerate(d2t):
        if t >= 0:
            assert t2d[t] == d


def test_lap_jit_compatible():
    import jax
    f = jax.jit(lambda a: _lap_assign(a, 0.0))
    aff = jnp.asarray(np.random.RandomState(3).uniform(0, 10, (16, 8)))
    t2d1, _ = f(aff)
    t2d2, _ = _lap_assign(aff, 0.0)
    np.testing.assert_array_equal(np.asarray(t2d1), np.asarray(t2d2))
