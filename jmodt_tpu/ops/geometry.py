"""Pure-jnp 3D box geometry.

TPU-native rewrite of the reference geometry helpers
(/root/reference/jmodt/utils/kitti_utils.py:33-162).  Everything here is pure,
shape-polymorphic jnp, usable under jit / vmap / grad on CPU and TPU.

KITTI rect-camera box convention used throughout, matching the reference:
boxes3d (N, 7) = [x, y, z, h, w, l, ry], where (x, y, z) is the center of the
box *bottom* face, y points down, and ry rotates around the (downward) y axis.
"""

from __future__ import annotations

import jax.numpy as jnp


def rotate_points_along_y(pts: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rotate points around the camera y axis.

    Mirrors reference `rotate_pc_along_y_torch` (kitti_utils.py:401-419 and
    bbox_transform.py:8-24): x' = x cos + z (-sin); z' = x sin + z cos,
    applied via pc[:, [0, 2]] @ R^T with R = [[c, -s], [s, c]].

    :param pts: (..., 3 + C) points; only the x (0) and z (2) channels rotate.
    :param angle: broadcastable to pts.shape[:-1] minus the point dim — for
        (N, P, 3+C) points pass (N,) angles; for (N, 3+C) pass (N,) or scalar.
    :return: same shape as pts.
    """
    pts = jnp.asarray(pts)
    angle = jnp.asarray(angle)
    c = jnp.cos(angle)
    s = jnp.sin(angle)
    x = pts[..., 0]
    z = pts[..., 2]
    # reference computes [x, z] @ R^T with R = [[c, -s], [s, c]],
    # i.e. x' = x*c - z*s, z' = x*s + z*c
    if hasattr(angle, 'ndim') and getattr(angle, 'ndim', 0) > 0:
        extra = pts.ndim - 1 - angle.ndim
        for _ in range(extra):
            c = c[..., None]
            s = s[..., None]
    new_x = x * c - z * s
    new_z = x * s + z * c
    return pts.at[..., 0].set(new_x).at[..., 2].set(new_z)


def boxes3d_to_corners3d(boxes3d: jnp.ndarray) -> jnp.ndarray:
    """3D boxes to their 8 corners (reference boxes3d_to_corners3d_torch,
    kitti_utils.py:462-488).

    Corner order: bottom face first (y = y_c), then top face (y = y_c - h),
    each going (+l/2,+w/2), (+l/2,-w/2), (-l/2,-w/2), (-l/2,+w/2) in local
    (x=length, z=width) coordinates before the ry rotation.

    :param boxes3d: (N, 7) [x, y, z, h, w, l, ry]
    :return: (N, 8, 3)
    """
    h, w, l = boxes3d[:, 3], boxes3d[:, 4], boxes3d[:, 5]
    ry = boxes3d[:, 6]
    zeros = jnp.zeros_like(l)
    x_c = jnp.stack([l / 2, l / 2, -l / 2, -l / 2, l / 2, l / 2, -l / 2, -l / 2], axis=1)
    y_c = jnp.stack([zeros, zeros, zeros, zeros, -h, -h, -h, -h], axis=1)
    z_c = jnp.stack([w / 2, -w / 2, -w / 2, w / 2, w / 2, -w / 2, -w / 2, w / 2], axis=1)

    # R rows: [c, 0, s], [0, 1, 0], [-s, 0, c] (kitti_utils.py:479-483),
    # applied elementwise — a batched 3x3 dot_general would hit the MXU's
    # sub-tile slow path (and degrades this relay's program cache)
    c = jnp.cos(ry)[:, None]
    s = jnp.sin(ry)[:, None]
    x_r = c * x_c + s * z_c
    z_r = -s * x_c + c * z_c
    corners = jnp.stack([x_r, y_c, z_r], axis=2)  # (N, 8, 3)
    return corners + boxes3d[:, None, 0:3]


def boxes3d_to_bev(boxes3d: jnp.ndarray) -> jnp.ndarray:
    """Boxes to BEV representation [x1, y1, x2, y2, ry] in the x-z plane
    (reference boxes3d_to_bev_torch, kitti_utils.py:491-504).

    The (x1, y1, x2, y2) span is the *unrotated* extent centered at (x, z);
    the rotated-IoU kernel re-applies ry around that center.
    """
    cu, cv = boxes3d[:, 0], boxes3d[:, 2]
    half_l, half_w = boxes3d[:, 5] / 2, boxes3d[:, 4] / 2
    return jnp.stack([cu - half_l, cv - half_w, cu + half_l, cv + half_w, boxes3d[:, 6]], axis=1)


def enlarge_box3d(boxes3d: jnp.ndarray, extra_width: float) -> jnp.ndarray:
    """Grow a box by `extra_width` on each side (reference enlarge_box3d,
    kitti_utils.py:507-517): sizes grow by 2*w, the bottom-face y drops by w."""
    boxes3d = jnp.asarray(boxes3d)
    out = boxes3d.at[..., 3:6].add(extra_width * 2)
    return out.at[..., 1].add(extra_width)


def height_overlap(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise vertical (y) overlap length between box sets (reference
    boxes_iou3d_gpu host composition, iou3d_utils.py:423-431).

    :param boxes_a: (M, 7), :param boxes_b: (N, 7) -> (M, N)
    """
    a_min = (boxes_a[:, 1] - boxes_a[:, 3])[:, None]
    a_max = boxes_a[:, 1][:, None]
    b_min = (boxes_b[:, 1] - boxes_b[:, 3])[None, :]
    b_max = boxes_b[:, 1][None, :]
    return jnp.clip(jnp.minimum(a_max, b_max) - jnp.maximum(a_min, b_min), 0.0, None)


def points_in_boxes3d(pts: jnp.ndarray, boxes3d: jnp.ndarray,
                      max_dis: float = 10.0) -> jnp.ndarray:
    """Point-in-rotated-box test (reference pt_in_box3d,
    roipool3d_kernel.cu:14-28), vectorized over points x boxes.

    :param pts: (N, 3) rect-camera points
    :param boxes3d: (M, 7) [x, y, z, h, w, l, ry] (y is the bottom face)
    :param max_dis: coarse rejection radius in x/z (CUDA kernel passes 10.0)
    :return: (M, N) bool mask
    """
    x, y, z = pts[:, 0][None, :], pts[:, 1][None, :], pts[:, 2][None, :]
    cx = boxes3d[:, 0][:, None]
    bottom_y = boxes3d[:, 1][:, None]
    cz = boxes3d[:, 2][:, None]
    h = boxes3d[:, 3][:, None]
    w = boxes3d[:, 4][:, None]
    l = boxes3d[:, 5][:, None]
    ry = boxes3d[:, 6][:, None]
    cy = bottom_y - h / 2.0
    coarse = (jnp.abs(x - cx) <= max_dis) & (jnp.abs(y - cy) <= h / 2.0) & \
             (jnp.abs(z - cz) <= max_dis)
    cosa, sina = jnp.cos(ry), jnp.sin(ry)
    x_rot = (x - cx) * cosa - (z - cz) * sina
    z_rot = (x - cx) * sina + (z - cz) * cosa
    fine = (x_rot >= -l / 2.0) & (x_rot <= l / 2.0) & (z_rot >= -w / 2.0) & (z_rot <= w / 2.0)
    return coarse & fine


def boxes_center_dist_affinity(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Normalized distance affinity 1 - |center_a - center_b| / max corner distance
    (reference boxes_dist_gpu, jmodt/tracking/data_association.py:408-426).

    :param boxes_a: (M, 7), :param boxes_b: (N, 7) -> (M, N)
    """
    ca = boxes3d_to_corners3d(boxes_a)  # (M, 8, 3)
    cb = boxes3d_to_corners3d(boxes_b)  # (N, 8, 3)
    center = jnp.linalg.norm(boxes_a[:, None, :3] - boxes_b[None, :, :3], axis=-1)  # (M, N)
    corner = jnp.linalg.norm(ca[:, None, :, None, :] - cb[None, :, None, :, :], axis=-1)
    corner = jnp.max(corner.reshape(corner.shape[0], corner.shape[1], 64), axis=-1)
    return 1.0 - center / corner
