"""Branchless rotated-rectangle intersection for BEV boxes, in pure jnp.

TPU-native rewrite of the CUDA polygon-clipping kernel
(/root/reference/jmodt/ops/iou3d/src/iou3d_kernel.cu:14-248).  Two
formulations:

  * `box_overlap_bev` (production) — Green's-theorem form: clip each
    polygon's edges against the other rect with branchless Liang-Barsky
    and sum segment shoelace terms.  NO candidate buffers, NO sorting —
    the round-3 profile showed the 24-candidate + argsort form costs
    ~190 ns per pair on TPU and dominated NMS.  Exact up to a 1e-5
    closed/open boundary tie-break (comparable to the CUDA kernel's own
    MARGIN = 1e-5 containment slack).
  * `box_overlap_bev_ref` — CUDA-faithful candidate-vertex form (EPS =
    1e-8 per iou3d_kernel.cu:10, MARGIN in-box tests, strict
    `s1*s2 > 0 && s3*s4 > 0` crossing test, angle-around-centroid vertex
    ordering).  Kept as the oracle; pinned equal in
    tests/test_rotated_iou.py.

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
    """Exact intersection area of two rotated BEV boxes — same result as
    the CUDA kernel (iou3d_kernel.cu::box_overlap, lines 108-212) computed
    WITHOUT candidate-vertex buffers or sorting:

        area(A ∩ B) = 1/2 |sum over boundary segments of (x_a y_b - x_b y_a)|

    where the boundary of A ∩ B is exactly (∂A clipped to B) ∪ (∂B clipped
    to A) and the line integral of Green's theorem is additive over the
    segments in ANY enumeration order — both corner rings share one
    orientation (same `_box_corners` construction), so no angle sort is
    needed.  Each edge clips against the other rect's 4 half-planes with
    branchless Liang-Barsky (~40 ops/edge).  This replaced the 24-slot
    candidate+argsort formulation in round 3: the sort made each pairwise
    overlap ~190 ns on TPU and dominated NMS (the old form is kept as
    `box_overlap_bev_ref` and pinned equal in tests/test_rotated_iou.py).

    box_a, box_b: (5,)."""
    ca = _box_corners(box_a)
    cb = _box_corners(box_b)

    def axes_half(box):
        c, s = jnp.cos(box[4]), jnp.sin(box[4])
        # the corner construction rotates (dx, dy) to
        # (dx c + dy s, -dx s + dy c): the box's local u axis in world
        # coords is (c, -s), v is (s, c)
        u = jnp.stack([c, -s])
        v = jnp.stack([s, c])
        half = jnp.stack([(box[2] - box[0]) / 2, (box[3] - box[1]) / 2])
        center = jnp.stack([(box[0] + box[2]) / 2, (box[1] + box[3]) / 2])
        return jnp.stack([u, v]), half, center

    axes_b, half_b, center_b = axes_half(box_b)
    axes_a, half_a, center_a = axes_half(box_a)
    # one common origin (center_b) for every shoelace term: Green's line
    # integral is origin-independent only over the CLOSED union of both
    # segment sets, and a local origin keeps f32 products small
    # closed/open convention for shared boundaries (identical or
    # edge-touching boxes): A's edges clip against B grown by +tol, B's
    # edges against A shrunk by -tol, so a segment lying exactly on both
    # boundaries is counted ONCE (and f32 jitter around d=0 cannot drop
    # it from both sums).  tol shifts the effective boxes by 1e-5 m —
    # area error ~perimeter*tol, far below the MARGIN=1e-5 the CUDA
    # kernel itself applies to containment tests.
    tol = 1e-5
    sum_a = _edge_clip_shoelace_about(ca - center_b, axes_b, half_b + tol,
                                      jnp.zeros(2, ca.dtype))
    sum_b = _edge_clip_shoelace_about(cb - center_b, axes_a, half_a - tol,
                                      center_a - center_b)
    area = jnp.abs(sum_a + sum_b) / 2.0
    # cap at the smaller rect area: the two sums are exact in real
    # arithmetic; f32 roundoff on near-identical boxes can exceed it by ulps
    cap = jnp.minimum((box_a[2] - box_a[0]) * (box_a[3] - box_a[1]),
                      (box_b[2] - box_b[0]) * (box_b[3] - box_b[1]))
    return jnp.minimum(area, jnp.abs(cap))


def _edge_clip_shoelace_about(corners: jnp.ndarray, other: jnp.ndarray,
                              half: jnp.ndarray,
                              center: jnp.ndarray) -> jnp.ndarray:
    """Green's-theorem boundary contribution of one polygon's edges: clip
    each directed edge p->q of `corners` (4, 2) to the inside of the
    rotated rect (axes `other` (2,2) rows u/v, half-extents `half` (2,),
    centered at `center`, all in the corners' frame) with branchless
    Liang-Barsky, and sum the segment shoelace terms x_a y_b - x_b y_a of
    the surviving pieces."""
    p = corners
    q = jnp.roll(corners, -1, axis=0)
    rel_p = p - center
    rel_q = q - center
    # explicit mul+add (VPU, exact f32) instead of `rel @ axis`: under the
    # callers' vmaps the 2-dim dots become batched dot_generals, and the
    # MXU's default bf16 truncation costs ~0.15 absolute on KITTI-scale
    # corner projections (round-4 on-chip precision audit)
    pu = rel_p[..., 0] * other[0, 0] + rel_p[..., 1] * other[0, 1]
    pv = rel_p[..., 0] * other[1, 0] + rel_p[..., 1] * other[1, 1]
    qu = rel_q[..., 0] * other[0, 0] + rel_q[..., 1] * other[0, 1]
    qv = rel_q[..., 0] * other[1, 0] + rel_q[..., 1] * other[1, 1]
    t0 = jnp.zeros_like(pu)
    t1 = jnp.ones_like(pu)
    for d0, d1 in (
            (pu - half[0], qu - half[0]),
            (-pu - half[0], -qu - half[0]),
            (pv - half[1], qv - half[1]),
            (-pv - half[1], -qv - half[1])):
        denom = d0 - d1
        safe = jnp.where(jnp.abs(denom) > EPS, denom, 1.0)
        t = d0 / safe
        entering = (d0 > 0) & (d1 <= 0)
        leaving = (d0 <= 0) & (d1 > 0)
        outside = (d0 > 0) & (d1 > 0)
        t0 = jnp.where(entering, jnp.maximum(t0, t), t0)
        t1 = jnp.where(leaving, jnp.minimum(t1, t), t1)
        t1 = jnp.where(outside, -1.0, t1)
    ok = t1 > t0
    a = p + t0[:, None] * (q - p)
    b = p + t1[:, None] * (q - p)
    shoe = a[:, 0] * b[:, 1] - b[:, 0] * a[:, 1]
    return jnp.sum(jnp.where(ok, shoe, 0.0))


def box_overlap_bev_ref(box_a: jnp.ndarray, box_b: jnp.ndarray) -> jnp.ndarray:
    """CUDA-faithful candidate-vertex formulation (EPS/MARGIN semantics of
    iou3d_kernel.cu:108-212) — retained as the oracle for the fast Green's
    form above."""
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
