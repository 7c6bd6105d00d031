"""Reference-differential tests for the 3D box geometry helpers.

Runs the reference's OWN numpy/torch geometry (/root/reference/jmodt/
utils/kitti_utils.py — no CUDA, importable directly) against
jmodt_tpu/ops/geometry.py on randomized boxes: corner extraction, the
y-axis point rotation used by every canonical transform, BEV projection,
and box enlargement.  Corner parity in particular is what makes the
rotated-IoU / iou3d comparisons meaningful.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

REF = '/root/reference'


@pytest.fixture(scope='module')
def ref_ku():
    if not os.path.isdir(REF):
        pytest.skip('reference checkout not available')
    if 'easydict' not in sys.modules:
        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

            def __setattr__(self, k, v):
                self[k] = v

        ed = types.ModuleType('easydict')
        ed.EasyDict = EasyDict
        sys.modules['easydict'] = ed
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # boxes3d_to_corners3d_torch builds buffers with torch.cuda.FloatTensor
    saved = getattr(torch.cuda, 'FloatTensor', None)
    torch.cuda.FloatTensor = torch.FloatTensor
    import jmodt.utils.kitti_utils as ku
    yield ku
    if saved is None:
        delattr(torch.cuda, 'FloatTensor')
    else:
        torch.cuda.FloatTensor = saved


def _boxes(seed, n=64):
    rng = np.random.RandomState(seed)
    b = rng.randn(n, 7).astype(np.float32)
    b[:, 0] *= 20
    b[:, 1] *= 2
    b[:, 2] = np.abs(b[:, 2]) * 30
    b[:, 3:6] = np.abs(b[:, 3:6]) + 0.5
    b[:, 6] = (rng.rand(n) * 2 - 1) * np.pi
    return b


def test_corners3d_differential(ref_ku):
    from jmodt_tpu.ops.geometry import boxes3d_to_corners3d
    b = _boxes(0)
    ref = ref_ku.boxes3d_to_corners3d(b, rotate=True)
    ours = np.asarray(boxes3d_to_corners3d(b))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
    # and the torch variant agrees with itself/ours too
    ref_t = ref_ku.boxes3d_to_corners3d_torch(torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(ours, ref_t, rtol=1e-4, atol=1e-4)


def test_rotate_pc_along_y_differential(ref_ku):
    from jmodt_tpu.ops.geometry import rotate_points_along_y
    rng = np.random.RandomState(1)
    pc = rng.randn(200, 6).astype(np.float32) * 10

    # the numpy reference rotates a whole cloud by ONE angle: both sides
    # compute x' = x cos - z sin (pc @ R^T with R = [[c, -s], [s, c]])
    ang = float(rng.rand() * 2 * np.pi - np.pi)
    ref = ref_ku.rotate_pc_along_y(pc.copy(), ang)
    ours = np.asarray(rotate_points_along_y(pc, ang))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    # the torch variant is per-row angles over (N, P, 3+C) clouds
    pc3 = rng.randn(16, 50, 5).astype(np.float32) * 10
    angs = (rng.rand(16).astype(np.float32) * 2 - 1) * np.pi
    ref_t = ref_ku.rotate_pc_along_y_torch(
        torch.from_numpy(pc3.copy()), torch.from_numpy(angs)).numpy()
    ours_t = np.asarray(rotate_points_along_y(pc3, angs))
    np.testing.assert_allclose(ours_t, ref_t, rtol=1e-4, atol=1e-4)


def test_bev_and_enlarge_differential(ref_ku):
    from jmodt_tpu.ops.geometry import boxes3d_to_bev, enlarge_box3d
    b = _boxes(2)
    ref_bev = ref_ku.boxes3d_to_bev_torch(torch.from_numpy(b)).numpy()
    ours_bev = np.asarray(boxes3d_to_bev(b))
    np.testing.assert_allclose(ours_bev, ref_bev, rtol=1e-5, atol=1e-5)

    ref_big = ref_ku.enlarge_box3d(b.copy(), extra_width=0.2)
    ours_big = np.asarray(enlarge_box3d(b, 0.2))
    np.testing.assert_allclose(ours_big, ref_big, rtol=1e-5, atol=1e-5)
