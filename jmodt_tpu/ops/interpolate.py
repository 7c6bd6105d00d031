"""Three-nearest-neighbor feature interpolation (feature propagation).

TPU rewrite of /root/reference/jmodt/ops/pointnet2/src/interpolate_gpu.cu:
  - `three_nn` (lines 9-77): brute-force 3-NN; here pairwise distances +
    `lax.top_k(k=3)`, chunked over the query dimension to bound HBM
    (16384 x 4096 at the finest FP level).
  - `three_interpolate` (lines 78-160): inverse-distance weighted gather; the
    scatter-add gradient the CUDA backward hand-writes comes from autodiff.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=('chunk', 'use_pallas'))
def three_nn(unknown: jnp.ndarray, known: jnp.ndarray, chunk: int = 2048,
             use_pallas: bool = True):
    """3 nearest neighbors of each unknown point among the known points.

    :param unknown: (B, N, 3)
    :param known: (B, M, 3)
    :return: (dist (B, N, 3) euclidean distances, idx (B, N, 3) int32),
        matching the sqrt at pointnet2_utils.py:98.
    """
    n = unknown.shape[1]
    if use_pallas and jax.default_backend() == 'tpu' and n % 128 == 0 \
            and n >= 1024:
        # fused distance+top-3 in VMEM: skips the (N, M) HBM matrix and
        # the top_k sort (256 MB + sort at the finest FP level).  Small
        # levels (N < 1024) stay on the XLA path — grid setup dominates.
        from jmodt_tpu.ops.pallas.three_nn import three_nn_pallas
        return three_nn_pallas(unknown, known)
    chunk = min(chunk, n)
    pad = (-n) % chunk
    unknown_p = jnp.pad(unknown, ((0, 0), (0, pad), (0, 0)))

    def per_batch(args):
        u, k = args  # (Np, 3), (M, 3)
        # matmul-identity distances (see ops/grouping.py::ball_query)
        k8 = jnp.pad(k, ((0, 0), (0, 5)))
        k_sq = jnp.sum(k * k, axis=-1)

        def per_block(u_block):
            u8 = jnp.pad(u_block, ((0, 0), (0, 5)))
            u_sq = jnp.sum(u_block * u_block, axis=-1)
            # HIGHEST precision is required: the MXU's default bf16
            # truncation puts ~unit-scale absolute error on the cross
            # term (see ops/grouping.py::ball_query), which reorders and
            # even swaps 3-NN sets on chip (round-4 on-chip diagnostic:
            # 15/128 wrong NN sets at default, 0 at HIGHEST)
            d2 = (u_sq[:, None] + k_sq[None, :]
                  - 2.0 * jnp.dot(u8, k8.T,
                                  precision=jax.lax.Precision.HIGHEST,
                                  preferred_element_type=jnp.float32))
            d2 = jnp.maximum(d2, 0.0)  # guard tiny negatives from rounding
            neg, idx = jax.lax.top_k(-d2, 3)
            return -neg, idx.astype(jnp.int32)

        blocks = u.reshape(-1, chunk, 3)
        d2, idx = jax.lax.map(per_block, blocks)
        return d2.reshape(-1, 3), idx.reshape(-1, 3)

    d2, idx = jax.lax.map(per_batch, (unknown_p, known))
    return jnp.sqrt(d2[:, :n]), idx[:, :n]


def three_interpolate(features: jnp.ndarray, idx: jnp.ndarray,
                      weight: jnp.ndarray) -> jnp.ndarray:
    """Weighted 3-point interpolation (interpolate_gpu.cu:78-118).

    :param features: (B, C, M)
    :param idx: (B, N, 3) int
    :param weight: (B, N, 3)
    :return: (B, C, N)
    """
    b, c, m = features.shape
    n = idx.shape[1]
    gathered = jnp.take_along_axis(features, idx.reshape(b, 1, n * 3), axis=2)
    gathered = gathered.reshape(b, c, n, 3)
    return jnp.sum(gathered * weight[:, None, :, :], axis=-1)


def three_interpolate_fl(features: jnp.ndarray, idx: jnp.ndarray,
                         weight: jnp.ndarray) -> jnp.ndarray:
    """Feature-LAST weighted 3-point interpolation: features (B, M, C),
    idx/weight (B, N, 3) -> (B, N, C).  Avoids the channel-first
    transposes the CUDA-layout `three_interpolate` forces on its callers
    (FPModule); one gather + one weighted sum (round-3 layout pass)."""
    b, m, c = features.shape
    n = idx.shape[1]
    gathered = jnp.take_along_axis(features, idx.reshape(b, n * 3, 1),
                                   axis=1).reshape(b, n, 3, c)
    return jnp.sum(gathered * weight[..., None], axis=2)
