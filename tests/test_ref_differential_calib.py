"""Reference-differential tests for calibration and label parsing.

Feeds the SAME fabricated KITTI calib/label files to the reference's own
numpy `Calibration`/`Object3d` (/root/reference/jmodt/utils/) and to
jmodt_tpu/utils/, and requires identical projections and parsed fields.
Projection parity is what makes detection outputs (img boxes, alpha)
byte-comparable to the reference's result files.
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

REF = '/root/reference'

CALIB = """P0: 7.215377e+02 0.000000e+00 6.095593e+02 0.000000e+00 0.000000e+00 7.215377e+02 1.728540e+02 0.000000e+00 0.000000e+00 0.000000e+00 1.000000e+00 0.000000e+00
P1: 7.215377e+02 0.000000e+00 6.095593e+02 -3.875744e+02 0.000000e+00 7.215377e+02 1.728540e+02 0.000000e+00 0.000000e+00 0.000000e+00 1.000000e+00 0.000000e+00
P2: 7.215377e+02 0.000000e+00 6.095593e+02 4.485728e+01 0.000000e+00 7.215377e+02 1.728540e+02 2.163791e-01 0.000000e+00 0.000000e+00 1.000000e+00 2.745884e-03
P3: 7.215377e+02 0.000000e+00 6.095593e+02 -3.395242e+02 0.000000e+00 7.215377e+02 1.728540e+02 2.199936e+00 0.000000e+00 0.000000e+00 1.000000e+00 2.729905e-03
R_rect 9.999239e-01 9.837760e-03 -7.445048e-03 -9.869795e-03 9.999421e-01 -4.278459e-03 7.402527e-03 4.351614e-03 9.999631e-01
Tr_velo_cam 7.533745e-03 -9.999714e-01 -6.166020e-04 -4.069766e-03 1.480249e-02 7.280733e-04 -9.998902e-01 -7.631618e-02 9.998621e-01 7.523790e-03 1.480755e-02 -2.717806e-01
Tr_imu_velo 9.999976e-01 7.553071e-04 -2.035826e-03 -8.086759e-01 -7.854027e-04 9.998898e-01 -1.482298e-02 3.195559e-01 2.024406e-03 1.482454e-02 9.998881e-01 -7.997231e-01
"""

LABELS = """Car 0.00 0 -1.58 587.01 173.33 614.12 200.12 1.65 1.67 3.64 -0.65 1.71 46.70 -1.59
Van 0.00 1 -2.46 665.45 160.00 717.93 217.99 2.30 1.92 5.94 4.31 1.65 21.22 -2.26
Pedestrian 0.80 2 -0.20 423.17 173.67 433.17 224.03 1.60 0.38 0.30 -5.87 1.63 23.11 -0.45
DontCare -1 -1 -10 561.00 164.00 601.00 182.00 -1 -1 -1 -1000 -1000 -1000 -10
"""


@pytest.fixture(scope='module')
def files(tmp_path_factory):
    d = tmp_path_factory.mktemp('kitti')
    calib = d / 'calib.txt'
    calib.write_text(CALIB)
    label = d / 'label.txt'
    label.write_text(LABELS)
    return str(calib), str(label)


@pytest.fixture(scope='module')
def ref_mods():
    if not os.path.isdir(REF):
        pytest.skip('reference checkout not available')
    if REF not in sys.path:
        sys.path.insert(0, REF)
    import jmodt.utils.calibration as rc
    import jmodt.utils.object3d as ro
    return rc, ro


def test_calibration_differential(ref_mods, files):
    from jmodt_tpu.utils.calibration import Calibration
    rc, _ = ref_mods
    calib_file, _ = files
    ref = rc.Calibration(calib_file)
    ours = Calibration(calib_file)

    rng = np.random.RandomState(0)
    pts_lidar = rng.randn(300, 3).astype(np.float32) * np.array(
        [30, 10, 2], np.float32) + np.array([20, 0, -1], np.float32)
    np.testing.assert_allclose(ours.lidar_to_rect(pts_lidar),
                               ref.lidar_to_rect(pts_lidar),
                               rtol=1e-5, atol=1e-5)
    pts_rect = ref.lidar_to_rect(pts_lidar)
    ou, od = ours.rect_to_img(pts_rect)
    ru, rd = ref.rect_to_img(pts_rect)
    np.testing.assert_allclose(ou, ru, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(od, rd, rtol=1e-5, atol=1e-5)

    u = rng.rand(100).astype(np.float32) * 1200
    v = rng.rand(100).astype(np.float32) * 370
    depth = (rng.rand(100).astype(np.float32) * 60 + 1)
    np.testing.assert_allclose(ours.img_to_rect(u, v, depth),
                               ref.img_to_rect(u, v, depth),
                               rtol=1e-5, atol=1e-5)

    corners = rng.randn(20, 8, 3).astype(np.float32) * 3 + np.array(
        [0, 1, 30], np.float32)
    ob, obc = ours.corners3d_to_img_boxes(corners)
    rb, rbc = ref.corners3d_to_img_boxes(corners)
    np.testing.assert_allclose(ob, rb, rtol=1e-5, atol=1e-4)
    np.testing.assert_allclose(obc, rbc, rtol=1e-5, atol=1e-4)


def test_object3d_differential(ref_mods, files):
    from jmodt_tpu.utils.object3d import get_objects_from_label
    _, ro = ref_mods
    _, label_file = files
    ref_objs = [ro.Object3d(line)
                for line in open(label_file).read().splitlines()]
    our_objs = get_objects_from_label(label_file)
    assert len(ref_objs) == len(our_objs) == 4
    for r, o in zip(ref_objs, our_objs):
        assert r.cls_type == o.cls_type
        np.testing.assert_allclose(
            [r.truncation, r.occlusion, r.alpha, r.h, r.w, r.l, r.ry],
            [o.truncation, o.occlusion, o.alpha, o.h, o.w, o.l, o.ry],
            rtol=1e-6)
        np.testing.assert_allclose(r.pos, o.pos, rtol=1e-6)
        np.testing.assert_allclose(r.box2d, o.box2d, rtol=1e-6)
        # round-trip through our writer parses back identically
        r2 = ro.Object3d(o.to_kitti_format())
        np.testing.assert_allclose(r2.pos, r.pos, atol=1e-2)
