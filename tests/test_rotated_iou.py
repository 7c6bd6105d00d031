"""Rotated IoU / IoU3D tests.

Oracle: an independent Sutherland–Hodgman convex polygon clipper in numpy —
a different algorithm from the production kernel's candidate-vertex method
(which mirrors iou3d_kernel.cu), so agreement is meaningful.
"""

import numpy as np
import pytest

from jmodt_tpu.ops import boxes_iou3d, boxes_iou_bev, boxes_overlap_bev
from jmodt_tpu.ops.geometry import boxes3d_to_bev


def bev_corners_np(box):
    x1, y1, x2, y2, ang = box
    cx, cy = (x1 + x2) / 2, (y1 + y2) / 2
    pts = np.array([[x1, y1], [x2, y1], [x2, y2], [x1, y2]], dtype=np.float64)
    c, s = np.cos(ang), np.sin(ang)
    dx, dy = pts[:, 0] - cx, pts[:, 1] - cy
    return np.stack([dx * c + dy * s + cx, -dx * s + dy * c + cy], axis=1)


def sutherland_hodgman_area(subject, clip):
    """Clip convex polygon `subject` by convex polygon `clip`; return area."""
    def is_ccw(poly):
        return np.sum((np.roll(poly[:, 0], -1) - poly[:, 0]) *
                      (np.roll(poly[:, 1], -1) + poly[:, 1])) < 0

    if not is_ccw(clip):
        clip = clip[::-1]
    output = list(subject if is_ccw(subject) else subject[::-1])
    for i in range(len(clip)):
        a, b = clip[i], clip[(i + 1) % len(clip)]
        input_list, output = output, []
        if not input_list:
            break
        def inside(p):
            return (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0]) >= 0
        def intersect(p, q):
            d1 = (b[0] - a[0]) * (p[1] - a[1]) - (b[1] - a[1]) * (p[0] - a[0])
            d2 = (b[0] - a[0]) * (q[1] - a[1]) - (b[1] - a[1]) * (q[0] - a[0])
            t = d1 / (d1 - d2)
            return p + t * (q - p)
        for j in range(len(input_list)):
            p, q = input_list[j], input_list[(j + 1) % len(input_list)]
            if inside(q):
                if not inside(p):
                    output.append(intersect(p, q))
                output.append(q)
            elif inside(p):
                output.append(intersect(p, q))
    if len(output) < 3:
        return 0.0
    poly = np.array(output)
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))


def oracle_overlap(box_a, box_b):
    return sutherland_hodgman_area(bev_corners_np(box_a), bev_corners_np(box_b))


def test_axis_aligned_identity():
    a = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]], np.float32)
    out = np.asarray(boxes_overlap_bev(a, a))
    np.testing.assert_allclose(out, [[4.0]], rtol=1e-5)


def test_axis_aligned_partial():
    a = np.array([[0.0, 0.0, 2.0, 2.0, 0.0]], np.float32)
    b = np.array([[1.0, 1.0, 3.0, 3.0, 0.0]], np.float32)
    # rtol 1e-4: the Green's-form kernel breaks boundary ties with a 1e-5
    # closed/open tolerance, bounding |area error| by ~tol * clipped edge
    # length (rotated_iou.py::box_overlap_bev)
    np.testing.assert_allclose(np.asarray(boxes_overlap_bev(a, b)), [[1.0]], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(boxes_iou_bev(a, b)), [[1.0 / 7.0]], rtol=1e-4)


def test_disjoint():
    a = np.array([[0.0, 0.0, 1.0, 1.0, 0.3]], np.float32)
    b = np.array([[5.0, 5.0, 6.0, 6.0, -0.7]], np.float32)
    np.testing.assert_allclose(np.asarray(boxes_overlap_bev(a, b)), [[0.0]], atol=1e-7)


def test_rotated_45_square():
    # unit square vs itself rotated 45 deg about the same center:
    # intersection is a regular octagon with area 2*(sqrt(2)-1) for unit square
    a = np.array([[-0.5, -0.5, 0.5, 0.5, 0.0]], np.float32)
    b = np.array([[-0.5, -0.5, 0.5, 0.5, np.pi / 4]], np.float32)
    expected = 2 * (np.sqrt(2) - 1)
    np.testing.assert_allclose(np.asarray(boxes_overlap_bev(a, b)), [[expected]], rtol=1e-4)


@pytest.mark.parametrize('seed', [0, 1, 2])
def test_random_vs_sutherland_hodgman(seed):
    rs = np.random.RandomState(seed)
    n = 24
    centers = rs.uniform(-3, 3, size=(n, 2))
    sizes = rs.uniform(0.5, 3.0, size=(n, 2))
    angles = rs.uniform(-np.pi, np.pi, size=n)
    boxes = np.stack([
        centers[:, 0] - sizes[:, 0] / 2, centers[:, 1] - sizes[:, 1] / 2,
        centers[:, 0] + sizes[:, 0] / 2, centers[:, 1] + sizes[:, 1] / 2,
        angles], axis=1).astype(np.float32)
    got = np.asarray(boxes_overlap_bev(boxes[:12], boxes[12:]))
    want = np.array([[oracle_overlap(a, b) for b in boxes[12:]] for a in boxes[:12]])
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)


def test_iou3d_identical_boxes():
    boxes = np.array([[1.0, 1.5, 10.0, 1.5, 1.6, 3.9, 0.3]], np.float32)
    np.testing.assert_allclose(np.asarray(boxes_iou3d(boxes, boxes)), [[1.0]], rtol=1e-5)


def test_iou3d_height_disjoint():
    a = np.array([[0.0, 0.0, 5.0, 1.0, 1.0, 1.0, 0.0]], np.float32)
    b = np.array([[0.0, 5.0, 5.0, 1.0, 1.0, 1.0, 0.0]], np.float32)  # far below
    np.testing.assert_allclose(np.asarray(boxes_iou3d(a, b)), [[0.0]], atol=1e-7)


def test_iou3d_known_value():
    # two axis-aligned boxes sharing half their volume in x
    a = np.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]], np.float32)
    b = np.array([[1.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]], np.float32)
    # bev overlap: l=2 (x) shifted 1 -> 1x2=2; height overlap 2; inter=4; union 16-4=12
    np.testing.assert_allclose(np.asarray(boxes_iou3d(a, b)), [[4.0 / 12.0]], rtol=1e-5)


def test_bev_conversion():
    boxes = np.array([[1.0, 2.0, 3.0, 1.5, 1.6, 3.9, 0.7]], np.float32)
    bev = np.asarray(boxes3d_to_bev(boxes))
    np.testing.assert_allclose(
        bev, [[1.0 - 3.9 / 2, 3.0 - 1.6 / 2, 1.0 + 3.9 / 2, 3.0 + 1.6 / 2, 0.7]], rtol=1e-6)


def test_greens_form_matches_candidate_form():
    """The sort-free Green's-theorem overlap (box_overlap_bev) equals the
    CUDA-faithful 24-candidate formulation (box_overlap_bev_ref) on random
    generic-position pairs, within the 1e-5 boundary tie-break tolerance."""
    import jax
    from jmodt_tpu.ops.rotated_iou import box_overlap_bev, box_overlap_bev_ref
    rng = np.random.RandomState(0)
    n = 400
    c = rng.uniform(-10, 10, (n, 2, 2)).astype(np.float32)
    wh = rng.uniform(0.5, 6.0, (n, 2, 2)).astype(np.float32)
    ang = rng.uniform(-np.pi, np.pi, (n, 2)).astype(np.float32)
    boxes = np.concatenate([c - wh / 2, c + wh / 2,
                            ang[..., None]], axis=-1)  # (n, 2, 5)
    # overlap-rich subset: second box = first with jittered center/size
    # (well-formed: x2 > x1, y2 > y1 preserved)
    half = n // 2
    c2 = c[half:, 0] + rng.uniform(-1.0, 1.0, (n - half, 2))
    wh2 = wh[half:, 0] * rng.uniform(0.7, 1.3, (n - half, 2))
    boxes[half:, 1, :2] = (c2 - wh2 / 2).astype(np.float32)
    boxes[half:, 1, 2:4] = (c2 + wh2 / 2).astype(np.float32)
    got = jax.vmap(lambda p: box_overlap_bev(p[0], p[1]))(boxes)
    want = jax.vmap(lambda p: box_overlap_bev_ref(p[0], p[1]))(boxes)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=3e-4, rtol=1e-3)
