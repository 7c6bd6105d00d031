"""Reference-differential test for RPN training-label generation.

Runs the reference's OWN static label generator
(/root/reference/jmodt/detection/datasets/kitti_dataset.py:304-334 —
Delaunay-hull point-in-box + enlarged ignore zone + center/size/angle
regression targets) against jmodt_tpu/data/kitti_dataset.py's analytic
version on randomized scenes.  Training targets are the other half of the
loss-parity story: reference losses (test_ref_differential_loss) on
reference labels == our losses on our labels.

Also pins the box-augmentation helper `rotate_box3d_along_y` (alpha-
preserving heading fixup) used by the rotation augmentation.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

REF = '/root/reference'


@pytest.fixture(scope='module')
def ref_ds():
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
    import jmodt.detection.datasets.kitti_dataset as ds
    return ds


def _scene(seed, n_pts=4000, n_boxes=5):
    rng = np.random.RandomState(seed)
    pts = rng.randn(n_pts, 3).astype(np.float32) * np.array(
        [12, 1.5, 12], np.float32) + np.array([0, 0.8, 25], np.float32)
    boxes = np.zeros((n_boxes, 7), np.float32)
    boxes[:, 0] = rng.uniform(-12, 12, n_boxes)
    boxes[:, 1] = rng.uniform(0, 2, n_boxes)
    boxes[:, 2] = rng.uniform(12, 38, n_boxes)
    boxes[:, 3] = rng.uniform(1.4, 1.8, n_boxes)   # h
    boxes[:, 4] = rng.uniform(1.5, 1.8, n_boxes)   # w
    boxes[:, 5] = rng.uniform(3.4, 4.4, n_boxes)   # l
    boxes[:, 6] = rng.uniform(-np.pi, np.pi, n_boxes)
    # drop points landing exactly on the (measure-zero) ignore-zone shell
    return pts, boxes


@pytest.mark.parametrize('seed', [0, 1, 2, 3])
def test_rpn_labels_differential(ref_ds, seed):
    from jmodt_tpu.data.kitti_dataset import generate_rpn_training_labels
    pts, boxes = _scene(seed)
    ref_cls, ref_reg = ref_ds.KittiDataset.generate_rpn_training_labels(
        pts.copy(), boxes.copy())
    our_cls, our_reg = generate_rpn_training_labels(pts.copy(),
                                                    boxes.copy())
    # fg points must exist for the comparison to mean anything
    assert (ref_cls == 1).sum() > 20, 'degenerate scene'
    np.testing.assert_array_equal(np.asarray(our_cls), ref_cls)
    np.testing.assert_allclose(np.asarray(our_reg), ref_reg,
                               rtol=1e-5, atol=1e-5)


def test_rotation_aug_heading_differential(ref_ds):
    """Our rotation augmentation (kitti_dataset.py::data_augmentation
    rotation branch: rotate box, then ry = sign(beta)*pi/2 + alpha - beta
    using the object's stored alpha) == the reference's
    rotate_box3d_along_y, whose alpha is re-derived from the original box."""
    from jmodt_tpu.data.kitti_dataset import rotate_pc_along_y
    rng = np.random.RandomState(7)
    for _ in range(50):
        box = np.zeros(7, np.float32)
        box[0] = rng.uniform(-20, 20)
        box[1] = rng.uniform(0, 2)
        box[2] = rng.uniform(5, 50)
        box[3:6] = rng.uniform(1, 4, 3)
        box[6] = rng.uniform(-np.pi, np.pi)
        ang = float(rng.uniform(-np.pi / 4, np.pi / 4))

        ref = ref_ds.KittiDataset.rotate_box3d_along_y(box.copy(), ang)

        # our data_augmentation composition, on the alpha the label file
        # would carry (the reference derives the same quantity inline)
        old_beta = np.arctan2(box[2], box[0])
        alpha = -np.sign(old_beta) * np.pi / 2 + old_beta + box[6]
        ours = rotate_pc_along_y(box.reshape(1, 7).copy(), ang)[0]
        beta = np.arctan2(ours[2], ours[0])
        ours[6] = np.sign(beta) * np.pi / 2 + alpha - beta
        np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)
