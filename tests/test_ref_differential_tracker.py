"""Reference-differential test for the FULL host tracking loop.

Runs the reference's OWN Tracker (/root/reference/jmodt/tracking/
tracker.py + data_association.py + track.py + kalman.py) verbatim against
jmodt_tpu/tracking/tracker.py over multi-frame synthetic scenes with
births, misses, deaths, and frame gaps.  Unavailable natives are stubbed
minimally and faithfully:

  * ortools pywraplp  -> an ~80-line adapter over scipy.optimize.milp
    (same binary MIP, exactly optimal — both solvers find THE optimum,
    and random continuous scores make it unique a.s.);
  * boxes_iou3d_gpu   -> our ops.rotated_iou.boxes_iou3d wrapped in torch
    (both sides then consume the identical IoU surface, making the
    SOLVER + lifecycle the tested quantity, not the IoU kernel);
  * filterpy          -> the textbook KalmanFilter stub
    (tests/test_ref_differential_kalman.py proves it equals the
    reference's motion model);
  * link/se heads     -> the same fixed linear weights on both sides.

Agreement required per frame: identical (id, payload, score) result rows
and identical live-track sets.  This pins the default (MIP) association
semantics end-to-end, not just the solver in isolation.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

REF = '/root/reference'


# ---------------------------------------------------------------------------
# pywraplp adapter over scipy.optimize.milp

class _Var:
    def __init__(self, idx):
        self.idx = idx
        self._val = None

    def __mul__(self, c):
        return _Lin({self.idx: float(c)})

    __rmul__ = __mul__

    def solution_value(self):
        return self._val


class _Lin:
    def __init__(self, coeffs):
        self.coeffs = coeffs

    def __eq__(self, other):  # noqa: A003 - pywraplp-style constraint
        assert other == 0
        return ('eq', self.coeffs, 0.0)

    def __hash__(self):  # keep it usable even though __eq__ is hijacked
        return id(self)


def _to_lin(x):
    if isinstance(x, _Var):
        return _Lin({x.idx: 1.0})
    return x


class _Solver:
    CBC_MIXED_INTEGER_PROGRAMMING = 'cbc'

    def __init__(self, name, kind=None):
        self.vars = []
        self.constraints = []
        self.objective = None

    def BoolVar(self, name):
        v = _Var(len(self.vars))
        self.vars.append(v)
        return v

    def Sum(self, items):
        coeffs = {}
        for it in items:
            for i, c in _to_lin(it).coeffs.items():
                coeffs[i] = coeffs.get(i, 0.0) + c
        return _Lin(coeffs)

    def Add(self, constraint):
        self.constraints.append(constraint)

    def Maximize(self, expr):
        self.objective = _to_lin(expr).coeffs

    def Solve(self):
        from scipy.optimize import Bounds, LinearConstraint, milp
        n = len(self.vars)
        c = np.zeros(n)
        for i, w in self.objective.items():
            c[i] = -w  # milp minimizes
        cons = []
        for kind, coeffs, rhs in self.constraints:
            row = np.zeros(n)
            for i, w in coeffs.items():
                row[i] = w
            cons.append(LinearConstraint(row[None, :], rhs, rhs))
        res = milp(c=c, constraints=cons, integrality=np.ones(n),
                   bounds=Bounds(0, 1))
        assert res.success, res.message
        for v, val in zip(self.vars, res.x):
            v._val = float(round(val))
        return 0


@pytest.fixture(scope='module')
def ref_tracker_mod():
    if not os.path.isdir(REF):
        pytest.skip('reference checkout not available')
    if REF not in sys.path:
        sys.path.insert(0, REF)

    # --- stubs ---
    fake_ortools = types.ModuleType('ortools')
    fake_ls = types.ModuleType('ortools.linear_solver')
    fake_pw = types.ModuleType('ortools.linear_solver.pywraplp')
    fake_pw.Solver = _Solver
    fake_ls.pywraplp = fake_pw
    fake_ortools.linear_solver = fake_ls
    sys.modules.setdefault('ortools', fake_ortools)
    sys.modules['ortools.linear_solver'] = fake_ls
    sys.modules['ortools.linear_solver.pywraplp'] = fake_pw

    fake_fp = types.ModuleType('filterpy')
    fake_fpk = types.ModuleType('filterpy.kalman')
    from tests.test_ref_differential_kalman import _KalmanFilter
    fake_fpk.KalmanFilter = _KalmanFilter
    fake_fp.kalman = fake_fpk
    sys.modules.setdefault('filterpy', fake_fp)
    sys.modules['filterpy.kalman'] = fake_fpk

    # CUDA iou3d -> our kernel (identical surface for both sides)
    from jmodt_tpu.ops.rotated_iou import boxes_iou3d
    fake_iou = types.ModuleType('jmodt.ops.iou3d.iou3d_utils')

    def boxes_iou3d_gpu(a, b):
        return torch.from_numpy(np.array(
            boxes_iou3d(a.numpy(), b.numpy()), np.float32, copy=True))

    fake_iou.boxes_iou3d_gpu = boxes_iou3d_gpu
    sys.modules['jmodt.ops.iou3d.iou3d_utils'] = fake_iou

    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.cuda.FloatTensor = torch.FloatTensor

    import importlib

    import jmodt.tracking.kalman
    importlib.reload(jmodt.tracking.kalman)
    import jmodt.tracking.track
    importlib.reload(jmodt.tracking.track)
    import jmodt.tracking.data_association
    importlib.reload(jmodt.tracking.data_association)
    import jmodt.tracking.tracker
    importlib.reload(jmodt.tracking.tracker)
    return jmodt.tracking.tracker


FEAT = 16
W_LINK = None  # set in _models()


def _models(seed=5):
    rng = np.random.RandomState(seed)
    w = (rng.randn(FEAT).astype(np.float32) * 0.3)
    b = np.float32(0.1)
    w_se = (rng.randn(FEAT).astype(np.float32) * 0.3)
    b_se = np.float32(-0.2)

    def ref_link(x):  # (N, C, 1) torch -> (N, 1, 1)
        out = (x[:, :, 0] * torch.from_numpy(w)).sum(1) + float(b)
        return out.view(-1, 1, 1)

    def ref_se(x):  # (N, C, 1) torch -> (N, 1, 1)
        out = (x[:, :, 0] * torch.from_numpy(w_se)).sum(1) + float(b_se)
        return out.view(-1, 1, 1)

    def our_link(params, x):  # (..., C) -> (..., 1)
        import jax.numpy as jnp
        return (x * jnp.asarray(w)).sum(-1, keepdims=True) + b

    def our_se(params, x):
        import jax.numpy as jnp
        return (x * jnp.asarray(w_se)).sum(-1, keepdims=True) + b_se

    return ref_link, ref_se, our_link, our_se


def _scene(seed, n_frames=20, max_obj=6):
    """Objects with persistent ids, constant velocity, feature signatures,
    random birth/death and per-frame dropout."""
    rng = np.random.RandomState(seed)
    objs = []
    for i in range(max_obj):
        objs.append({
            'birth': int(rng.randint(0, n_frames // 2)),
            'death': int(rng.randint(n_frames // 2, n_frames + 3)),
            'pos': rng.randn(3) * np.array([15, 1, 15]) + np.array([0, 1, 30]),
            'vel': rng.randn(3) * np.array([0.8, 0.02, 0.8]),
            'size': np.abs(rng.randn(3)) * 0.3 + np.array([1.5, 1.6, 3.9]),
            'ry': rng.uniform(-np.pi, np.pi),
            'feat': rng.randn(FEAT).astype(np.float32),
        })
    frames = []
    for f in range(n_frames):
        boxes, scores, feats, infos = [], [], [], []
        for i, o in enumerate(objs):
            if not (o['birth'] <= f < o['death']):
                continue
            if rng.rand() < 0.15:  # dropout (missed detection)
                continue
            p = o['pos'] + o['vel'] * f + rng.randn(3) * 0.05
            boxes.append([p[0], p[1], p[2], o['size'][0], o['size'][1],
                          o['size'][2], o['ry'] + rng.randn() * 0.02])
            scores.append(0.55 + 0.45 * rng.rand())
            feats.append(o['feat'] + rng.randn(FEAT).astype(np.float32) * 0.1)
            infos.append(i * 1000 + f)
        frames.append((np.asarray(boxes, np.float32).reshape(-1, 7),
                       np.asarray(scores, np.float32),
                       np.asarray(feats, np.float32).reshape(-1, FEAT),
                       infos))
    return frames


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_tracker_differential_mip(ref_tracker_mod, seed):
    from jmodt_tpu.tracking.tracker import Tracker as OurTracker
    ref_link, ref_se, our_link, our_se = _models()

    ref = ref_tracker_mod.Tracker(
        link_model=ref_link, se_model=ref_se, t_miss=2, t_hit=1,
        w_cls=100, w_app=2, w_iou=10, w_dis=10, w_se=1, hungarian=False)
    ref.reset()
    ours = OurTracker(our_link, our_se, None, None, t_miss=2, t_hit=1,
                      w_cls=100, w_app=2, w_iou=10, w_dis=10, w_se=1,
                      hungarian=False)
    ours.reset()

    for fi, (boxes, scores, feats, infos) in enumerate(_scene(seed)):
        frame_id = fi + 1
        ref_rows = ref.update(frame_id, boxes.copy(), scores.copy(),
                              torch.from_numpy(feats.copy()), list(infos))
        our_rows = ours.update(frame_id, boxes.copy(), scores.copy(),
                               feats.copy(), list(infos))
        ref_set = sorted((int(tid), int(info), round(float(s), 5))
                         for tid, info, s in ref_rows)
        our_set = sorted((int(tid), int(info), round(float(s), 5))
                         for tid, info, s in our_rows)
        assert ref_set == our_set, (
            f'seed {seed} frame {frame_id}: {ref_set} != {our_set}')
    assert sorted(t.id for t in ref.tracks) == \
        sorted(t.id for t in ours.tracks)
