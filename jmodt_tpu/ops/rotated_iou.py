"""Branchless rotated-rectangle intersection for BEV boxes, in pure jnp.

TPU-native rewrite of the CUDA polygon-clipping kernel
(/root/reference/jmodt/ops/iou3d/src/iou3d_kernel.cu:14-248).  The CUDA code
walks edges with data-dependent branches and a bubble sort; here every pair of
boxes is evaluated with a fixed 24-slot candidate-vertex buffer and masks, so
the whole (M, N) overlap matrix is one fused vectorized computation — no
dynamic shapes, fully jit/vmap-able, and it maps onto the VPU.

Semantics intentionally match the CUDA kernel, including EPS = 1e-8
(iou3d_kernel.cu:10), the MARGIN = 1e-5 in-box test (iou3d_kernel.cu:50-65),
the strict `s1*s2 > 0 && s3*s4 > 0` segment-crossing test, and the
angle-around-centroid vertex ordering.

BEV box format (5,): [x1, y1, x2, y2, angle] — the axis-aligned extent around
the box center, rotated by `angle` about that center (see
jmodt_tpu/ops/geometry.py::boxes3d_to_bev).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8
MARGIN = 1e-5
_NCAND = 24  # 16 possible edge intersections + 8 corner containments


def _box_corners(box: jnp.ndarray) -> jnp.ndarray:
    """Rotated corners of one BEV box. Mirrors iou3d_kernel.cu:123-148:
    corner order (x1,y1), (x2,y1), (x2,y2), (x1,y2), each rotated by `angle`
    around the center with new_x = dx*cos + dy*sin, new_y = -dx*sin + dy*cos."""
    x1, y1, x2, y2, ang = box[0], box[1], box[2], box[3], box[4]
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    xs = jnp.stack([x1, x2, x2, x1])
    ys = jnp.stack([y1, y1, y2, y2])
    c, s = jnp.cos(ang), jnp.sin(ang)
    nx = (xs - cx) * c + (ys - cy) * s + cx
    ny = -(xs - cx) * s + (ys - cy) * c + cy
    return jnp.stack([nx, ny], axis=1)  # (4, 2)


def _cross3(p1, p2, p0):
    """cross(p1-p0, p2-p0) — iou3d_kernel.cu:38-40."""
    return (p1[..., 0] - p0[..., 0]) * (p2[..., 1] - p0[..., 1]) - \
           (p2[..., 0] - p0[..., 0]) * (p1[..., 1] - p0[..., 1])


def _check_in_box2d(box: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Point-in-rotated-box with MARGIN slack (iou3d_kernel.cu:50-65).
    box: (5,), pts: (..., 2) -> bool (...)."""
    cx = (box[0] + box[2]) / 2
    cy = (box[1] + box[3]) / 2
    c, s = jnp.cos(-box[4]), jnp.sin(-box[4])
    rx = (pts[..., 0] - cx) * c + (pts[..., 1] - cy) * s + cx
    ry = -(pts[..., 0] - cx) * s + (pts[..., 1] - cy) * c + cy
    return (rx > box[0] - MARGIN) & (rx < box[2] + MARGIN) & \
           (ry > box[1] - MARGIN) & (ry < box[3] + MARGIN)


def _segment_intersections(ca: jnp.ndarray, cb: jnp.ndarray):
    """All 16 edge-pair intersections between two quads (iou3d_kernel.cu:67-96).

    ca, cb: (4, 2) rotated corners. Returns points (16, 2) and validity (16,).
    Edge i of quad a runs corner[i] -> corner[(i+1) % 4]; the CUDA code calls
    intersection(a[i+1], a[i], b[j+1], b[j]).
    """
    a0 = ca  # p0: (4, 2)
    a1 = jnp.roll(ca, -1, axis=0)  # p1
    b0 = cb  # q0
    b1 = jnp.roll(cb, -1, axis=0)  # q1

    p0 = a0[:, None, :]  # (4, 1, 2)
    p1 = a1[:, None, :]
    q0 = b0[None, :, :]  # (1, 4, 2)
    q1 = b1[None, :, :]

    # fast bounding-rect exclusion (iou3d_kernel.cu:42-48)
    rect = (jnp.minimum(p0[..., 0], p1[..., 0]) <= jnp.maximum(q0[..., 0], q1[..., 0])) & \
           (jnp.minimum(q0[..., 0], q1[..., 0]) <= jnp.maximum(p0[..., 0], p1[..., 0])) & \
           (jnp.minimum(p0[..., 1], p1[..., 1]) <= jnp.maximum(q0[..., 1], q1[..., 1])) & \
           (jnp.minimum(q0[..., 1], q1[..., 1]) <= jnp.maximum(p0[..., 1], p1[..., 1]))

    s1 = _cross3(q0, p1, p0)
    s2 = _cross3(p1, q1, p0)
    s3 = _cross3(p0, q1, q0)
    s4 = _cross3(q1, p1, q0)
    crossing = (s1 * s2 > 0) & (s3 * s4 > 0)
    valid = rect & crossing

    # main formula (iou3d_kernel.cu:80-85)
    s5 = _cross3(q1, p1, p0)
    denom_main = s5 - s1
    use_main = jnp.abs(denom_main) > EPS
    safe_main = jnp.where(use_main, denom_main, 1.0)
    mx = (s5 * q0[..., 0] - s1 * q1[..., 0]) / safe_main
    my = (s5 * q0[..., 1] - s1 * q1[..., 1]) / safe_main

    # parallel fallback (iou3d_kernel.cu:86-93)
    a0c = p0[..., 1] - p1[..., 1]
    b0c = p1[..., 0] - p0[..., 0]
    c0c = p0[..., 0] * p1[..., 1] - p1[..., 0] * p0[..., 1]
    a1c = q0[..., 1] - q1[..., 1]
    b1c = q1[..., 0] - q0[..., 0]
    c1c = q0[..., 0] * q1[..., 1] - q1[..., 0] * q0[..., 1]
    d = a0c * b1c - a1c * b0c
    safe_d = jnp.where(jnp.abs(d) > 0, d, 1.0)
    fx = (b0c * c1c - b1c * c0c) / safe_d
    fy = (a1c * c0c - a0c * c1c) / safe_d

    px = jnp.where(use_main, mx, fx)
    py = jnp.where(use_main, my, fy)
    pts = jnp.stack([px, py], axis=-1).reshape(16, 2)
    return pts, valid.reshape(16)


def box_overlap_bev(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """Exact intersection area of two rotated BEV boxes
    (iou3d_kernel.cu::box_overlap, lines 108-212). box_a, box_b: (5,)."""
    ca = _box_corners(box_a)
    cb = _box_corners(box_b)

    inter_pts, inter_valid = _segment_intersections(ca, cb)
    b_in_a = _check_in_box2d(box_a, cb)  # (4,)
    a_in_b = _check_in_box2d(box_b, ca)  # (4,)

    pts = jnp.concatenate([inter_pts, cb, ca], axis=0)           # (24, 2)
    valid = jnp.concatenate([inter_valid, b_in_a, a_in_b])        # (24,)

    cnt = jnp.sum(valid)
    fvalid = valid.astype(pts.dtype)
    center = jnp.sum(pts * fvalid[:, None], axis=0) / jnp.maximum(cnt, 1).astype(pts.dtype)

    ang = jnp.arctan2(pts[:, 1] - center[1], pts[:, 0] - center[0])
    ang = jnp.where(valid, ang, jnp.inf)  # invalid slots sort to the end
    order = jnp.argsort(ang)
    spts = pts[order]

    # shoelace fan from the first (min-angle) vertex (iou3d_kernel.cu:205-211)
    p0 = spts[0]
    v = spts - p0[None, :]
    crossv = v[:-1, 0] * v[1:, 1] - v[1:, 0] * v[:-1, 1]  # term k uses pts k, k+1
    k = jnp.arange(_NCAND - 1)
    term_ok = (k >= 1) & (k + 1 <= cnt - 1)
    area = jnp.sum(jnp.where(term_ok, crossv, 0.0))
    return jnp.where(cnt > 0, jnp.abs(area) / 2.0, 0.0)


def boxes_overlap_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotated intersection areas (reference boxes_overlap_bev_gpu,
    iou3d_kernel.cu:223-234). boxes_a: (M, 5), boxes_b: (N, 5) -> (M, N)."""
    return jax.vmap(lambda a: jax.vmap(lambda b: box_overlap_bev(a, b))(boxes_b))(boxes_a)


def boxes_iou_bev(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise rotated BEV IoU (reference iou_bev, iou3d_kernel.cu:214-221)."""
    overlap = boxes_overlap_bev(boxes_a, boxes_b)
    sa = ((boxes_a[:, 2] - boxes_a[:, 0]) * (boxes_a[:, 3] - boxes_a[:, 1]))[:, None]
    sb = ((boxes_b[:, 2] - boxes_b[:, 0]) * (boxes_b[:, 3] - boxes_b[:, 1]))[None, :]
    return overlap / jnp.maximum(sa + sb - overlap, EPS)


def iou_bev_one_to_many(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Rotated BEV IoU of one box against a set — the row primitive the greedy
    NMS loop uses (avoids materializing the full N^2 matrix). box: (5,),
    boxes: (N, 5) -> (N,)."""
    overlap = jax.vmap(lambda b: box_overlap_bev(box, b))(boxes)
    sa = (box[2] - box[0]) * (box[3] - box[1])
    sb = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return overlap / jnp.maximum(sa + sb - overlap, EPS)


def iou_normal_one_to_many(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """Axis-aligned IoU row, ignoring the angle (reference iou_normal,
    iou3d_kernel.cu:295-303)."""
    left = jnp.maximum(box[0], boxes[:, 0])
    right = jnp.minimum(box[2], boxes[:, 2])
    top = jnp.maximum(box[1], boxes[:, 1])
    bottom = jnp.minimum(box[3], boxes[:, 3])
    inter = jnp.maximum(right - left, 0.0) * jnp.maximum(bottom - top, 0.0)
    sa = (box[2] - box[0]) * (box[3] - box[1])
    sb = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
    return inter / jnp.maximum(sa + sb - inter, EPS)


def boxes_iou3d(boxes_a: jnp.ndarray, boxes_b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise 3D IoU = rotated BEV overlap x height overlap / volume union
    (reference boxes_iou3d_gpu, jmodt/ops/iou3d/iou3d_utils.py:409-441).

    :param boxes_a: (M, 7) [x, y, z, h, w, l, ry]
    :param boxes_b: (N, 7)
    :return: (M, N)
    """
    from jmodt_tpu.ops.geometry import boxes3d_to_bev, height_overlap
    bev_a = boxes3d_to_bev(boxes_a)
    bev_b = boxes3d_to_bev(boxes_b)
    overlaps_bev = boxes_overlap_bev(bev_a, bev_b)
    overlaps_h = height_overlap(boxes_a, boxes_b)
    overlaps_3d = overlaps_bev * overlaps_h
    vol_a = (boxes_a[:, 3] * boxes_a[:, 4] * boxes_a[:, 5])[:, None]
    vol_b = (boxes_b[:, 3] * boxes_b[:, 4] * boxes_b[:, 5])[None, :]
    return overlaps_3d / jnp.maximum(vol_a + vol_b - overlaps_3d, 1e-7)
