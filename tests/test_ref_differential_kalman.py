"""Reference-differential test for the Kalman track state.

Runs the reference's OWN kalman.py (/root/reference/jmodt/tracking/
kalman.py) against jmodt_tpu/tracking/kalman.py on randomized box
sequences.  filterpy is not in this image, so a faithful ~25-line
textbook stub provides `filterpy.kalman.KalmanFilter` (same defaults:
x=0, P=I, Q=I, R=I; Joseph-form covariance update like filterpy) — the
reference's F/H/P/Q/R setup, orientation-acute corrections, and
multi-step predict logic all execute verbatim from its own source.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

REF = '/root/reference'


class _KalmanFilter:
    """Textbook KalmanFilter with filterpy's API subset and defaults."""

    def __init__(self, dim_x, dim_z):
        self.x = np.zeros((dim_x, 1))
        self.F = np.eye(dim_x)
        self.H = np.zeros((dim_z, dim_x))
        self.P = np.eye(dim_x)
        self.Q = np.eye(dim_x)
        self.R = np.eye(dim_z)

    def predict(self):
        self.x = self.F @ self.x
        self.P = self.F @ self.P @ self.F.T + self.Q

    def update(self, z):
        z = np.asarray(z, float).reshape(-1, 1)
        y = z - self.H @ self.x
        S = self.H @ self.P @ self.H.T + self.R
        K = self.P @ self.H.T @ np.linalg.inv(S)
        self.x = self.x + K @ y
        i_kh = np.eye(self.P.shape[0]) - K @ self.H
        # Joseph form, as filterpy computes it
        self.P = i_kh @ self.P @ i_kh.T + K @ self.R @ K.T


@pytest.fixture(scope='module')
def ref_kalman():
    if not os.path.isdir(REF):
        pytest.skip('reference checkout not available')
    fake_pkg = types.ModuleType('filterpy')
    fake_mod = types.ModuleType('filterpy.kalman')
    fake_mod.KalmanFilter = _KalmanFilter
    fake_pkg.kalman = fake_mod
    saved = {k: sys.modules.get(k) for k in ('filterpy', 'filterpy.kalman')}
    sys.modules['filterpy'] = fake_pkg
    sys.modules['filterpy.kalman'] = fake_mod
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import importlib

    import jmodt.tracking.kalman as rk
    importlib.reload(rk)
    yield rk
    for k, v in saved.items():
        if v is None:
            sys.modules.pop(k, None)
        else:
            sys.modules[k] = v


def test_kalman_differential(ref_kalman):
    from jmodt_tpu.tracking.kalman import Kalman
    rng = np.random.RandomState(0)
    for trial in range(10):
        box0 = rng.randn(7).astype(np.float64)
        box0[6] = rng.uniform(-np.pi, np.pi)
        ref = ref_kalman.Kalman(box0.copy())
        ours = Kalman(box0.copy())
        for step in range(12):
            t = int(rng.randint(1, 3))
            rp = ref.predict(t=t).reshape(-1)
            op = np.asarray(ours.predict(t=t)).reshape(-1)
            np.testing.assert_allclose(op, rp, rtol=1e-6, atol=1e-8,
                                       err_msg=f'trial {trial} step {step}')
            if rng.rand() < 0.8:  # occasional miss (predict-only frame)
                z = rp[:7] + rng.randn(7) * 0.3
                # exercise the orientation-acute corrections: sometimes
                # flip the measured heading by ~pi or wrap outside [-pi,pi)
                if rng.rand() < 0.4:
                    z[6] += np.pi * rng.choice([-1, 1])
                if rng.rand() < 0.3:
                    z[6] += 2 * np.pi * rng.choice([-1, 1])
                ref.update(z.copy())
                ours.update(z.copy())
                np.testing.assert_allclose(
                    np.asarray(ours.get_box()).reshape(-1),
                    ref.get_box().reshape(-1), rtol=1e-6, atol=1e-8,
                    err_msg=f'trial {trial} step {step} update')
        np.testing.assert_allclose(
            np.asarray(ours.get_predicted_box()).reshape(-1),
            ref.get_predicted_box().reshape(-1), rtol=1e-6, atol=1e-8)


def test_kalman_psr_differential(ref_kalman):
    from jmodt_tpu.tracking.kalman import KalmanPSR
    rng = np.random.RandomState(1)
    psr0 = rng.randn(9)
    psr0[6:9] = rng.uniform(-np.pi, np.pi, 3)
    ref = ref_kalman.KalmanPSR(psr0.copy())
    ours = KalmanPSR(psr0.copy())
    for step in range(10):
        rp = ref.predict(t=1).reshape(-1)
        op = np.asarray(ours.predict(t=1)).reshape(-1)
        np.testing.assert_allclose(op, rp, rtol=1e-6, atol=1e-8)
        z = rp[:9] + rng.randn(9) * 0.2
        if rng.rand() < 0.5:
            z[7] += np.pi
        ref.update(z.copy())
        ours.update(z.copy())
        np.testing.assert_allclose(
            np.asarray(ours.get_box()).reshape(-1),
            ref.get_box().reshape(-1), rtol=1e-6, atol=1e-8)
