"""Unit tests for the pointnet2-equivalent ops against brute-force numpy
oracles that replicate the CUDA kernel semantics (SURVEY.md §2.2)."""

import numpy as np

from jmodt_tpu.ops import (
    ball_query, farthest_point_sample, gather_points, gather_xyz,
    group_points, query_and_group, roipool3d, three_interpolate, three_nn,
)
from jmodt_tpu.ops.nms import nms_bev


def fps_oracle(xyz, npoint):
    """Direct port of the FPS semantics (sampling_gpu.cu:93-209)."""
    n = xyz.shape[0]
    idxs = np.zeros(npoint, np.int32)
    temp = np.full(n, 1e10, np.float32)
    old = 0
    for j in range(1, npoint):
        d = np.sum((xyz - xyz[old]) ** 2, axis=1)
        temp = np.minimum(temp, d)
        old = int(np.argmax(temp))
        idxs[j] = old
    return idxs


def test_fps_matches_oracle(rng):
    xyz = rng.randn(2, 128, 3).astype(np.float32)
    got = np.asarray(farthest_point_sample(xyz, 32))
    for b in range(2):
        np.testing.assert_array_equal(got[b], fps_oracle(xyz[b], 32))


def test_fps_spread(rng):
    # FPS on a line should pick well-spread points
    xyz = np.zeros((1, 100, 3), np.float32)
    xyz[0, :, 0] = np.arange(100)
    idx = np.asarray(farthest_point_sample(xyz, 3))[0]
    assert idx[0] == 0 and idx[1] == 99 and idx[2] in (49, 50)


def ball_query_oracle(xyz, new_xyz, radius, nsample):
    """Port of ball_query_gpu.cu:34-43 (first-k with first-hit padding)."""
    m = new_xyz.shape[0]
    out = np.zeros((m, nsample), np.int32)
    for i in range(m):
        cnt = 0
        for k in range(xyz.shape[0]):
            if np.sum((new_xyz[i] - xyz[k]) ** 2) < radius ** 2:
                if cnt == 0:
                    out[i, :] = k
                out[i, cnt] = k
                cnt += 1
                if cnt >= nsample:
                    break
    return out


def test_ball_query_matches_oracle(rng):
    xyz = rng.randn(2, 200, 3).astype(np.float32)
    sel = xyz[:, :50]
    got = np.asarray(ball_query(0.8, 16, xyz, sel, chunk=32))
    for b in range(2):
        np.testing.assert_array_equal(got[b], ball_query_oracle(xyz[b], sel[b], 0.8, 16))


def test_gather_and_group(rng):
    feats = rng.randn(2, 8, 50).astype(np.float32)
    idx = rng.randint(0, 50, size=(2, 10)).astype(np.int32)
    out = np.asarray(gather_points(feats, idx))
    for b in range(2):
        np.testing.assert_allclose(out[b], feats[b][:, idx[b]])

    gidx = rng.randint(0, 50, size=(2, 10, 4)).astype(np.int32)
    gout = np.asarray(group_points(feats, gidx))
    for b in range(2):
        for mm in range(10):
            np.testing.assert_allclose(gout[b, :, mm], feats[b][:, gidx[b, mm]])

    xyz = rng.randn(2, 50, 3).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(gather_xyz(xyz, idx))[0], xyz[0][idx[0]])


def test_query_and_group_shapes(rng):
    xyz = rng.randn(1, 100, 3).astype(np.float32)
    new_xyz = xyz[:, :20]
    feats = rng.randn(1, 6, 100).astype(np.float32)
    out = query_and_group(0.5, 8, xyz, new_xyz, feats, use_xyz=True)
    assert out.shape == (1, 9, 20, 8)
    # grouped xyz is centroid-relative: group of a centroid includes itself -> 0
    out_np = np.asarray(out)
    assert np.any(np.all(np.abs(out_np[0, :3, :, :]) < 1e-6, axis=0))


def test_three_nn_and_interpolate(rng):
    unknown = rng.randn(1, 64, 3).astype(np.float32)
    known = rng.randn(1, 16, 3).astype(np.float32)
    dist, idx = three_nn(unknown, known, chunk=16)
    dist, idx = np.asarray(dist), np.asarray(idx)
    d2 = np.sum((unknown[0][:, None] - known[0][None]) ** 2, axis=-1)
    want_idx = np.argsort(d2, axis=1)[:, :3]
    np.testing.assert_allclose(np.sort(dist[0], 1), np.sort(np.sqrt(
        np.take_along_axis(d2, want_idx, 1)), 1), rtol=1e-4)
    # inverse-distance weighting (pointnet2_modules.py:437-442)
    feats = rng.randn(1, 5, 16).astype(np.float32)
    w = 1.0 / (dist + 1e-8)
    w = w / np.sum(w, axis=2, keepdims=True)
    out = np.asarray(three_interpolate(feats, idx, w))
    want = np.einsum('cnk,nk->cn', feats[0][:, idx[0]], w[0])
    np.testing.assert_allclose(out[0], want, rtol=1e-4)


def roipool_oracle(pts, feat, boxes, extra, k):
    """Port of roipool3d_kernel.cu get_pooled_idx + forward."""
    from jmodt_tpu.ops.geometry import enlarge_box3d, points_in_boxes3d
    big = np.asarray(enlarge_box3d(boxes, extra))
    mask = np.asarray(points_in_boxes3d(pts, big))
    m = boxes.shape[0]
    out = np.zeros((m, k, 3 + feat.shape[1]), np.float32)
    empty = np.zeros(m, np.int32)
    allf = np.concatenate([pts, feat], axis=1)
    for i in range(m):
        hits = np.nonzero(mask[i])[0][:k]
        if len(hits) == 0:
            empty[i] = 1
            continue
        idx = np.array([hits[j % len(hits)] for j in range(k)])
        out[i] = allf[idx]
    return out, empty


def test_roipool3d_matches_oracle(rng):
    pts = rng.uniform(-5, 5, size=(1, 300, 3)).astype(np.float32)
    feat = rng.randn(1, 300, 4).astype(np.float32)
    boxes = np.array([[[0, 1, 0, 2, 2, 3, 0.4],
                       [20, 1, 20, 2, 2, 3, 0.0],  # empty region
                       [0, 1, 0, 4, 4, 6, -0.9]]], np.float32)
    pooled, empty = roipool3d(pts, feat, boxes, 0.2, sampled_pt_num=32)
    want, want_empty = roipool_oracle(pts[0], feat[0], boxes[0], 0.2, 32)
    np.testing.assert_array_equal(np.asarray(empty)[0], want_empty)
    np.testing.assert_allclose(np.asarray(pooled)[0], want, rtol=1e-5)


def nms_oracle(boxes, scores, thresh):
    """Sequential greedy NMS with axis-aligned IoU."""
    order = np.argsort(-scores)
    keep, alive = [], np.ones(len(boxes), bool)
    for i in order:
        if not alive[i]:
            continue
        keep.append(i)
        for j in order:
            if alive[j] and j != i:
                xx1 = max(boxes[i, 0], boxes[j, 0]); yy1 = max(boxes[i, 1], boxes[j, 1])
                xx2 = min(boxes[i, 2], boxes[j, 2]); yy2 = min(boxes[i, 3], boxes[j, 3])
                inter = max(xx2 - xx1, 0) * max(yy2 - yy1, 0)
                sa = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
                sb = (boxes[j, 2] - boxes[j, 0]) * (boxes[j, 3] - boxes[j, 1])
                if inter / max(sa + sb - inter, 1e-8) > thresh:
                    alive[j] = False
        alive[i] = False
    return keep


def test_nms_matches_oracle(rng):
    n = 64
    centers = rng.uniform(0, 10, size=(n, 2))
    sizes = rng.uniform(1.0, 3.0, size=(n, 2))
    boxes = np.stack([centers[:, 0] - sizes[:, 0] / 2, centers[:, 1] - sizes[:, 1] / 2,
                      centers[:, 0] + sizes[:, 0] / 2, centers[:, 1] + sizes[:, 1] / 2,
                      np.zeros(n)], axis=1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    keep_idx, keep_mask = nms_bev(boxes, scores, 0.3, max_keep=n, rotated=False)
    got = list(np.asarray(keep_idx)[np.asarray(keep_mask)])
    assert got == nms_oracle(boxes, scores, 0.3)


def test_nms_rotated_runs(rng):
    n = 32
    boxes = np.concatenate([
        rng.uniform(0, 5, size=(n, 2)), rng.uniform(5, 8, size=(n, 2)),
        rng.uniform(-np.pi, np.pi, size=(n, 1))], axis=1).astype(np.float32)
    scores = rng.rand(n).astype(np.float32)
    keep_idx, keep_mask = nms_bev(boxes, scores, 0.5, max_keep=10, rotated=True)
    assert keep_idx.shape == (10,)
    k = int(np.asarray(keep_mask).sum())
    assert 1 <= k <= 10
    # highest-score box always kept first
    assert int(np.asarray(keep_idx)[0]) == int(np.argmax(scores))


def test_nms_block_sizes_agree(rng):
    """Block-speculative rounds are EXACT greedy for any block size:
    block=1 (one-per-round, the pre-round-3 formulation) must equal
    block=8/16 on dense overlapping rotated boxes, including the keep cap
    and validity masking."""
    n = 96
    boxes = np.concatenate([
        rng.uniform(0, 6, size=(n, 2)), rng.uniform(4, 9, size=(n, 2)),
        rng.uniform(-np.pi, np.pi, size=(n, 1))], axis=1).astype(np.float32)
    boxes[:, 2:4] = boxes[:, :2] + np.abs(boxes[:, 2:4] - boxes[:, :2]) + 0.5
    scores = rng.rand(n).astype(np.float32)
    valid = rng.rand(n) > 0.2
    for max_keep in (16, n):
        ref_i, ref_m = nms_bev(boxes, scores, 0.4, max_keep=max_keep,
                               valid=valid, rotated=True, block=1)
        for block in (4, 8, 16):
            got_i, got_m = nms_bev(boxes, scores, 0.4, max_keep=max_keep,
                                   valid=valid, rotated=True, block=block)
            np.testing.assert_array_equal(np.asarray(got_m),
                                          np.asarray(ref_m))
            np.testing.assert_array_equal(np.asarray(got_i),
                                          np.asarray(ref_i))


def test_feature_last_variants_match(rng):
    """group_points_fl / three_interpolate_fl == the CUDA-layout forms."""
    from jmodt_tpu.ops.grouping import group_points_fl
    from jmodt_tpu.ops.interpolate import three_interpolate_fl
    feats = rng.randn(2, 50, 8).astype(np.float32)       # (B, N, C)
    idx = rng.randint(0, 50, size=(2, 10, 4)).astype(np.int32)
    got = np.asarray(group_points_fl(feats, idx))
    want = np.asarray(group_points(
        np.transpose(feats, (0, 2, 1)), idx))            # (B, C, M, S)
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 3, 1)))

    kf = rng.randn(2, 16, 5).astype(np.float32)          # (B, M, C)
    ii = rng.randint(0, 16, size=(2, 30, 3)).astype(np.int32)
    w = rng.rand(2, 30, 3).astype(np.float32)
    got = np.asarray(three_interpolate_fl(kf, ii, w))
    want = np.asarray(three_interpolate(
        np.transpose(kf, (0, 2, 1)), ii, w))             # (B, C, N)
    np.testing.assert_allclose(got, np.transpose(want, (0, 2, 1)),
                               rtol=1e-5)


def test_ball_query_multi_matches_per_scale(rng):
    """ball_query_multi == tuple of independent ball_query calls, every
    scale, both the single-block and the chunked (lax.map) path."""
    from jmodt_tpu.ops.grouping import ball_query, ball_query_multi
    import jax.numpy as jnp
    xyz = jnp.asarray(rng.randn(2, 512, 3).astype(np.float32) * 4)
    ctr = xyz[:, ::4]                                    # (2, 128, 3)
    radii, nsamples = (0.5, 1.0, 2.5), (8, 16, 4)
    for chunk in (None, 32):                             # 32 forces 4 blocks
        got = ball_query_multi(radii, nsamples, xyz, ctr, chunk=chunk)
        for g, r, s in zip(got, radii, nsamples):
            want = ball_query(r, s, xyz, ctr, chunk=chunk)
            np.testing.assert_array_equal(np.asarray(g), np.asarray(want),
                                          err_msg=f'r={r} chunk={chunk}')
