"""Brute-force differential for the MIP data-association solver.

The flow-conservation MIP (reference ortools_solve,
data_association.py:31-104; scipy HiGGS here) decomposes exactly: every
injective partial matching M of preds to dets scores

    sum_{(j,k) in M} (cls[j] + cls[P+k] + link[j,k])
  + sum_{j unmatched} max(0, cls[j] + end[j])
  + sum_{k unmatched} max(0, cls[P+k] + new[P+k])

because an unmatched pred/det's y_det is free to be 0 or 1 paired with its
end/new indicator.  Enumerating all matchings for small P, D gives an
independent oracle for the optimal objective AND the matched/unmatched/
tentative classification mip_solve returns."""

import itertools

import numpy as np
import pytest

from jmodt_tpu.tracking.data_association import mip_solve


def brute_force(cls_score, link, new_score, end_score):
    p, d = link.shape
    best = None
    for size in range(min(p, d) + 1):
        for preds in itertools.combinations(range(p), size):
            for dets in itertools.permutations(range(d), size):
                m = list(zip(preds, dets))
                val = sum(cls_score[j] + cls_score[p + k] + link[j, k]
                          for j, k in m)
                for j in set(range(p)) - set(preds):
                    val += max(0.0, cls_score[j] + end_score[j])
                for k in set(range(d)) - set(dets):
                    val += max(0.0, cls_score[p + k] + new_score[p + k])
                if best is None or val > best[0]:
                    best = (val, m)
    val, m = best
    matched = sorted([j, k] for j, k in m)
    used_dets = {k for _, k in m}
    unmatched, tentative = [], []
    for k in set(range(d)) - used_dets:
        if cls_score[p + k] + new_score[p + k] > 0:
            unmatched.append(k)   # profitable to start a new track
        else:
            tentative.append(k)   # y_det stays 0
    return val, matched, sorted(unmatched), sorted(tentative)


def objective(cls_score, link, new_score, end_score,
              matched, unmatched, tentative):
    p, d = link.shape
    val = sum(cls_score[j] + cls_score[p + k] + link[j, k]
              for j, k in matched)
    used = {k for _, k in matched}
    for j in set(range(p)) - {j for j, _ in matched}:
        val += max(0.0, cls_score[j] + end_score[j])
    for k in unmatched:
        val += cls_score[p + k] + new_score[p + k]
    # tentative dets contribute 0 (y_det = 0)
    assert used.isdisjoint(unmatched) and used.isdisjoint(tentative)
    return val


@pytest.mark.parametrize('p,d', [(1, 1), (2, 2), (3, 2), (2, 3), (3, 3)])
def test_mip_matches_brute_force(p, d):
    rng = np.random.RandomState(p * 10 + d)
    for trial in range(20):
        # realistic magnitudes: unaries w_cls*(s-1) are negative,
        # links span [-5, 25], start/end in [0, 1]
        cls_score = np.concatenate([
            rng.uniform(-20, 0, p), rng.uniform(-20, 0, d)])
        link = rng.uniform(-5, 25, (p, d))
        new_score = np.concatenate([np.zeros(p), rng.uniform(0, 1, d)])
        end_score = np.concatenate([rng.uniform(0, 1, p), np.zeros(d)])

        want_val, want_m, want_u, want_t = brute_force(
            cls_score, link, new_score, end_score)
        got_m, got_u, got_t = mip_solve(cls_score, link, new_score,
                                        end_score)
        got_val = objective(cls_score, link, new_score, end_score,
                            got_m, got_u, got_t)
        # objective must be optimal; the argmax may differ only on exact
        # ties, which continuous random scores make measure-zero
        assert got_val == pytest.approx(want_val, abs=1e-6), \
            f'trial {trial}: {got_val} vs {want_val}'
        assert sorted(map(list, got_m)) == want_m
        assert sorted(got_u) == want_u
        assert sorted(got_t) == want_t
