"""kitti_utils parity helpers + KalmanPSR variant tests."""

import numpy as np

from jmodt_tpu.ops.geometry import boxes3d_to_corners3d
from jmodt_tpu.tracking.kalman import KalmanPSR
from jmodt_tpu.utils.kitti_utils import get_iou3d, in_hull


def test_in_hull_matches_box_test():
    box = np.array([1.0, 1.6, 10.0, 1.5, 1.6, 3.9, 0.7], np.float32)
    corners = np.asarray(boxes3d_to_corners3d(box[None]))[0]
    rng = np.random.RandomState(0)
    pts = rng.uniform(-3, 3, (500, 3)).astype(np.float64)
    pts += box[:3]
    got = in_hull(pts, corners)
    from jmodt_tpu.data.kitti_dataset import in_box3d_mask
    want = in_box3d_mask(pts.astype(np.float32), box)
    # boundary points may flip; interiors must agree
    assert (got == want).mean() > 0.99


def test_get_iou3d_identity_and_disjoint():
    boxes = np.array([[0.0, 1.6, 10.0, 1.5, 1.6, 3.9, 0.3],
                      [20.0, 1.6, 40.0, 1.4, 1.7, 4.1, -0.5]], np.float32)
    corners = np.asarray(boxes3d_to_corners3d(boxes))
    iou = get_iou3d(corners, corners)
    np.testing.assert_allclose(np.diag(iou), [1.0, 1.0], atol=1e-3)
    assert iou[0, 1] < 1e-6


def test_kalman_psr_convergence():
    psr0 = np.array([0, 1.6, 10, 1.5, 1.6, 3.9, 0.1, 0.2, 0.0])
    kf = KalmanPSR(psr0)
    for t in range(1, 8):
        kf.predict()
        z = psr0.copy()
        z[2] += 1.2 * t
        kf.update(z)
    pred = kf.predict()
    assert abs(pred[2] - (10 + 1.2 * 8)) < 0.2
    np.testing.assert_allclose(pred[3:6], [1.5, 1.6, 3.9], atol=0.05)


def test_kalman_psr_rotation_wrap():
    psr0 = np.array([0, 1.6, 10, 1.5, 1.6, 3.9, 0.0, 3.1, 0.0])
    kf = KalmanPSR(psr0)
    kf.predict()
    kf.update(np.array([0, 1.6, 11, 1.5, 1.6, 3.9, 0.0, -3.1, 0.0]))
    # angles stay wrapped in [-pi, pi)
    assert np.all(kf.get_box()[6:9] >= -np.pi)
    assert np.all(kf.get_box()[6:9] < np.pi)
