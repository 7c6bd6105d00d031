"""Geometry helpers under the reference's naming (parity surface for
/root/reference/jmodt/utils/kitti_utils.py).

The jit-path implementations live in jmodt_tpu.ops.geometry; this module
re-exports them and adds the host-side helpers the reference keeps in
numpy/scipy/shapely: `in_hull` (Delaunay point-in-box test,
kitti_utils.py:165-179) and `get_iou3d` (shapely polygon IoU,
kitti_utils.py:182-222, unused in the reference's main path) — both
implemented dependency-free via exact canonical-frame / polygon-clip math.
"""

from __future__ import annotations

import numpy as np

from jmodt_tpu.data.kitti_dataset import (in_box3d_mask,  # noqa: F401
                                          rotate_pc_along_y)
from jmodt_tpu.ops.geometry import (boxes3d_to_bev,  # noqa: F401
                                    boxes3d_to_corners3d, enlarge_box3d,
                                    rotate_points_along_y)


def in_hull(p: np.ndarray, hull_corners: np.ndarray) -> np.ndarray:
    """Points inside the convex hull of a 3D box's 8 corners.

    The reference uses scipy.spatial.Delaunay (kitti_utils.py:165-179);
    since the hulls here are always rectangular boxes, an exact half-space
    test against the box's three edge directions is equivalent.

    :param p: (N, 3); hull_corners: (8, 3) in the corner order of
        boxes3d_to_corners3d
    :return: (N,) bool
    """
    c = np.asarray(hull_corners, np.float64)
    origin = c[0]
    # edges from corner 0: corner 1 (length dir), corner 3 (width dir),
    # corner 4 (up dir)
    axes = np.stack([c[1] - c[0], c[3] - c[0], c[4] - c[0]])  # (3, 3)
    rel = np.asarray(p, np.float64) - origin
    t = rel @ axes.T / np.maximum(np.sum(axes * axes, axis=1), 1e-12)
    return np.all((t >= -1e-9) & (t <= 1 + 1e-9), axis=1)


def get_iou3d(corners3d_a: np.ndarray, corners3d_b: np.ndarray
              ) -> np.ndarray:
    """3D IoU from corner sets (reference get_iou3d, kitti_utils.py:182-222,
    shapely-based there; exact rotated-polygon clipping here).

    :param corners3d_a: (N, 8, 3); corners3d_b: (M, 8, 3)
    :return: (N, M)
    """
    import jax
    from jmodt_tpu.ops.rotated_iou import boxes_overlap_bev

    def to_bev_box(corners):
        # BEV footprint from the bottom face, recovering (center, extents,
        # angle) from corners 0/1/3
        c = np.asarray(corners, np.float64)
        center = c[:, :4, [0, 2]].mean(axis=1)
        le = c[:, 1, [0, 2]] - c[:, 0, [0, 2]]
        we = c[:, 3, [0, 2]] - c[:, 0, [0, 2]]
        length = np.linalg.norm(le, axis=1)
        width = np.linalg.norm(we, axis=1)
        # our BEV convention rotates clockwise-positive around the center
        ang = -np.arctan2(le[:, 1], le[:, 0])
        return np.stack([center[:, 0] - length / 2, center[:, 1] - width / 2,
                         center[:, 0] + length / 2, center[:, 1] + width / 2,
                         ang], axis=1).astype(np.float32)

    a, b = to_bev_box(corners3d_a), to_bev_box(corners3d_b)
    with jax.default_device(jax.local_devices(backend='cpu')[0]):
        inter_bev = np.asarray(boxes_overlap_bev(a, b))

    ca, cb = np.asarray(corners3d_a), np.asarray(corners3d_b)
    a_top, a_bot = ca[:, 4, 1], ca[:, 0, 1]   # y up is negative
    b_top, b_bot = cb[:, 4, 1], cb[:, 0, 1]
    h_overlap = np.clip(np.minimum(a_bot[:, None], b_bot[None, :])
                        - np.maximum(a_top[:, None], b_top[None, :]),
                        0.0, None)
    inter = inter_bev * h_overlap
    vol_a = ((a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
             * (a_bot - a_top))[:, None]
    vol_b = ((b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
             * (b_bot - b_top))[None, :]
    return inter / np.maximum(vol_a + vol_b - inter, 1e-9)
