"""Ball query and neighborhood grouping.

TPU rewrite of /root/reference/jmodt/ops/pointnet2/src/ball_query_gpu.cu and
group_points_gpu.cu.

The CUDA ball query walks points 0..N-1 per centroid and records the *first*
`nsample` indices within `radius`, pre-filling the whole row with the first hit
(ball_query_gpu.cu:34-43: `if (cnt == 0) fill all with k`).  We reproduce that
exactly with a top-k trick: key = index where in-radius else N; the `nsample`
smallest keys are the first-k hits in index order, and misses (key == N) are
replaced by the row's first hit.  Ordering matters downstream only through
grouped max-pool ties, but we keep it bit-faithful anyway.

Memory note: the naive (M, N) distance matrix at the first SA level is
4096 x 16384 x 4 B ≈ 268 MB per (batch row, radius).  `chunk` bounds peak HBM
by processing centroid blocks through `lax.map` over the M axis only — the
batch axis stays inside each block as a batched dot_general.  (An earlier
version mapped over B as well; at RCNN shapes that serialized 100 tiny RoI
problems behind one another and dominated the head's latency.)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# cap on B * chunk * N distance-matrix elements per block (64 MB of f32)
_D2_BUDGET = 16 * 1024 * 1024


def _first_k_in_radius(d2, col, n, r2, nsample):
    """First-`nsample` indices (point order) with d2 < r2, per row.
    key = index where in-radius else N; the nsample smallest keys are the
    first hits.  top_k runs on a flattened 2-D view: 3-D batched top_k
    hits a pathologically slow path on TPU (measured 53 ms vs 0.7 ms at
    the level-0 shape)."""
    key = jnp.where(d2 < r2, col, n)
    neg_top, _ = jax.lax.top_k(-key.reshape(-1, n), nsample)
    idx = (-neg_top).reshape(key.shape[:-1] + (nsample,))  # ascending
    first = idx[..., 0:1]
    miss = idx >= n
    # pad misses with the first hit; all-miss rows fall back to 0
    # (the CUDA kernel leaves uninitialized memory there — callers
    # guarantee at least one hit because centroids come from xyz)
    fallback = jnp.where(first >= n, 0, first)
    return jnp.where(miss, fallback, idx).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=('nsample', 'chunk'))
def ball_query(radius: float, nsample: int, xyz: jnp.ndarray,
               new_xyz: jnp.ndarray, chunk: int | None = None) -> jnp.ndarray:
    """First-`nsample` neighbors within `radius` (strict `d2 < radius^2`,
    ball_query_gpu.cu:379).

    :param xyz: (B, N, 3) all points
    :param new_xyz: (B, M, 3) query centroids
    :param chunk: centroid-block size; default sizes it so the (B, chunk, N)
        distance block stays under ~64 MB
    :return: (B, M, nsample) int32 indices into N
    """
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    r2 = radius * radius
    if chunk is None:
        chunk = max(128, _D2_BUDGET // (b * n))
    chunk = min(chunk, m)
    # pad M to a multiple of chunk so lax.map sees uniform blocks
    pad = (-m) % chunk
    new_xyz_p = jnp.pad(new_xyz, ((0, 0), (0, pad), (0, 0)))

    # squared distances via the matmul identity |q|^2 + |p|^2 - 2 q.p:
    # 3x less HBM traffic than materializing (B, chunk, N, 3) differences,
    # and the contraction rides the MXU.  Coordinates are zero-padded to
    # 8 dims — sub-8 contractions fall off the MXU fast path.
    pts8 = jnp.pad(xyz, ((0, 0), (0, 0), (0, 5)))        # (B, N, 8)
    p_sq = jnp.sum(xyz * xyz, axis=-1)                   # (B, N)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)

    def per_block(q_block):  # (B, chunk, 3)
        q8 = jnp.pad(q_block, ((0, 0), (0, 0), (0, 5)))
        q_sq = jnp.sum(q_block * q_block, axis=-1)       # (B, chunk)
        # precision=HIGHEST is REQUIRED for correctness, not a tuning
        # choice: at default precision the TPU MXU truncates f32 operands
        # to bf16, and the q.p cross term then carries absolute error
        # ~eps_bf16 * |q||p| — measured up to ~32 on KITTI-scale
        # coordinates (round-4 on-chip diagnostic) against r^2 gates as
        # small as 0.01.  HIGHEST (multi-pass) restores f32-accurate
        # products at negligible cost (the contraction dim is only 8).
        d2 = (q_sq[..., None] + p_sq[:, None, :]
              - 2.0 * jax.lax.dot_general(
                  q8, pts8, (((2,), (2,)), ((0,), (0,))),
                  precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32))   # (B, chunk, N)
        return _first_k_in_radius(d2, col, n, r2, nsample)

    nblocks = (m + pad) // chunk
    if nblocks == 1:
        return per_block(new_xyz_p)[:, :m]
    blocks = jnp.moveaxis(new_xyz_p.reshape(b, nblocks, chunk, 3), 1, 0)
    out = jax.lax.map(per_block, blocks)                 # (nblk, B, chunk, S)
    return jnp.moveaxis(out, 0, 1).reshape(b, -1, nsample)[:, :m]


@functools.partial(jax.jit, static_argnames=('radii', 'nsamples', 'chunk'))
def ball_query_multi(radii: tuple, nsamples: tuple, xyz: jnp.ndarray,
                     new_xyz: jnp.ndarray,
                     chunk: int | None = None) -> tuple:
    """`ball_query` for several (radius, nsample) scales sharing ONE
    distance computation (multi-scale grouping queries the same centroids
    against the same cloud per scale — reference pointnet2_modules.py MSG;
    computing d2 once saves a full (B, M, N) materialization per extra
    scale: ~268 MB ≈ 0.3 ms at the level-0 shape).

    Selection semantics per scale are exactly `ball_query`
    (`_first_k_in_radius`); parity is test-pinned.

    :return: tuple of (B, M, nsamples[i]) int32, one per scale
    """
    b, n, _ = xyz.shape
    m = new_xyz.shape[1]
    if chunk is None:
        chunk = max(128, _D2_BUDGET // (b * n))
    chunk = min(chunk, m)
    pad = (-m) % chunk
    new_xyz_p = jnp.pad(new_xyz, ((0, 0), (0, pad), (0, 0)))

    pts8 = jnp.pad(xyz, ((0, 0), (0, 0), (0, 5)))        # (B, N, 8)
    p_sq = jnp.sum(xyz * xyz, axis=-1)                   # (B, N)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n), 2)

    def per_block(q_block):  # (B, chunk, 3) -> tuple per scale
        q8 = jnp.pad(q_block, ((0, 0), (0, 0), (0, 5)))
        q_sq = jnp.sum(q_block * q_block, axis=-1)
        # precision=HIGHEST required for correctness (see ball_query)
        d2 = (q_sq[..., None] + p_sq[:, None, :]
              - 2.0 * jax.lax.dot_general(
                  q8, pts8, (((2,), (2,)), ((0,), (0,))),
                  precision=jax.lax.Precision.HIGHEST,
                  preferred_element_type=jnp.float32))   # (B, chunk, N)
        return tuple(_first_k_in_radius(d2, col, n, r * r, s)
                     for r, s in zip(radii, nsamples))

    nblocks = (m + pad) // chunk
    if nblocks == 1:
        return tuple(o[:, :m] for o in per_block(new_xyz_p))
    blocks = jnp.moveaxis(new_xyz_p.reshape(b, nblocks, chunk, 3), 1, 0)
    outs = jax.lax.map(per_block, blocks)           # tuple of (nblk, ...)
    return tuple(jnp.moveaxis(o, 0, 1).reshape(b, -1, s)[:, :m]
                 for o, s in zip(outs, nsamples))


def group_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[b, c, m, s] = features[b, c, idx[b, m, s]] (reference
    group_points_gpu.cu forward; grad = scatter-add via autodiff).

    :param features: (B, C, N)
    :param idx: (B, M, S) int
    :return: (B, C, M, S)
    """
    b, c, n = features.shape
    _, m, s = idx.shape
    flat = jnp.take_along_axis(features, idx.reshape(b, 1, m * s), axis=2)
    return flat.reshape(b, c, m, s)


def group_points_fl(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Feature-LAST grouping: features (B, N, C), idx (B, M, S) ->
    (B, M, S, C) — one gather, no layout change.  The channel-first
    `group_points` forces a (B, C, N) transpose before and a
    (B, M, S, C) transpose after; at SA shapes those moves cost more HBM
    traffic than the gather itself (round-3 profile).  Kept alongside the
    CUDA-layout version, which remains the oracle-tested reference form."""
    b, n, c = features.shape
    _, m, s = idx.shape
    flat = jnp.take_along_axis(features, idx.reshape(b, m * s, 1), axis=1)
    return flat.reshape(b, m, s, c)


def group_xyz(xyz: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Point-layout grouping: xyz (B, N, 3), idx (B, M, S) -> (B, M, S, 3)."""
    b, n, _ = xyz.shape
    _, m, s = idx.shape
    flat = jnp.take_along_axis(xyz, idx.reshape(b, m * s, 1), axis=1)
    return flat.reshape(b, m, s, 3)


def query_and_group(radius: float, nsample: int, xyz: jnp.ndarray,
                    new_xyz: jnp.ndarray, features: jnp.ndarray | None,
                    use_xyz: bool = True) -> jnp.ndarray:
    """Ball query + grouping + centroid-relative xyz, the fused QueryAndGroup
    module (reference pointnet2_utils.py::QueryAndGroup).

    :param xyz: (B, N, 3); :param new_xyz: (B, M, 3)
    :param features: (B, C, N) or None
    :return: (B, C', M, nsample) with C' = 3 + C if use_xyz else C
    """
    idx = ball_query(radius, nsample, xyz, new_xyz)
    grouped_xyz = group_xyz(xyz, idx) - new_xyz[:, :, None, :]  # (B, M, S, 3)
    grouped_xyz = jnp.transpose(grouped_xyz, (0, 3, 1, 2))      # (B, 3, M, S)
    if features is None:
        assert use_xyz
        return grouped_xyz
    grouped = group_points(features, idx)  # (B, C, M, S)
    if use_xyz:
        return jnp.concatenate([grouped_xyz, grouped], axis=1)
    return grouped


def group_all(xyz: jnp.ndarray, features: jnp.ndarray | None,
              use_xyz: bool = True) -> jnp.ndarray:
    """GroupAll (reference pointnet2_utils.py::GroupAll): the whole cloud as
    one group. xyz (B, N, 3), features (B, C, N) -> (B, C', 1, N)."""
    grouped_xyz = jnp.transpose(xyz, (0, 2, 1))[:, :, None, :]  # (B, 3, 1, N)
    if features is None:
        return grouped_xyz
    grouped = features[:, :, None, :]
    if use_xyz:
        return jnp.concatenate([grouped_xyz, grouped], axis=1)
    return grouped
