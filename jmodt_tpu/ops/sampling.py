"""Farthest point sampling and index gathering.

TPU rewrite of /root/reference/jmodt/ops/pointnet2/src/sampling_gpu.cu:
  - `farthest_point_sample` (kernel lines 93-209): the CUDA version keeps a
    per-point running min-distance in global memory and does a shared-memory
    argmax tree per step.  The XLA version below carries the (N,) min-distance
    vector through a `lax.scan` — XLA keeps it on-chip — and an optional Pallas
    kernel (jmodt_tpu/ops/pallas/fps.py) pins everything in VMEM for the hot
    (16384 -> 4096) level.
  - `gather_points` (sampling_gpu.cu:8-83): a pure gather; its scatter-add
    gradient comes for free from JAX autodiff of `take_along_axis`.

Tie-breaking note: on exact distance ties the CUDA block reduction picks an
index that depends on thread striding; we use `argmax` (first maximum).  Ties
are measure-zero for real point clouds; metric parity is unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=('npoint', 'use_pallas'))
def farthest_point_sample(xyz: jnp.ndarray, npoint: int,
                          use_pallas: bool = False) -> jnp.ndarray:
    """Iterative farthest point sampling.

    :param xyz: (B, N, 3) float32
    :param npoint: number of samples (M)
    :return: (B, npoint) int32 indices. idx[:, 0] == 0, matching the CUDA
        kernel's fixed seed (sampling_gpu.cu: `old = 0; idxs[0] = old`).
    """
    b, n = xyz.shape[0], xyz.shape[1]
    if use_pallas and jax.default_backend() == 'tpu' and n % 128 == 0:
        # Measured round 3 (fetch-synced, v5e): the XLA scan's sequential
        # steps are latency-bound (~15 us/step regardless of width), so the
        # VMEM-resident kernels win everywhere the shapes allow:
        #   16384->4096  1.8 ms Pallas vs 28.8 ms scan (single-cloud)
        #   1024->256    0.26 vs 0.62; 256->64  0.06 vs 0.10 (single-cloud)
        #   100x512->128 0.32 vs 1.9 (batched row-tiled)
        if b == 1 and n >= 256:
            from jmodt_tpu.ops.pallas.fps import farthest_point_sample_pallas
            return farthest_point_sample_pallas(xyz, npoint)
        if b > 1:
            # Several clouds (batched streams S=4, train batches, RCNN
            # RoIs): one program row-tiles ALL clouds' min-dist state in
            # VMEM and steps them in lockstep.  NEVER vmap the single-cloud
            # kernel here — its grid programs serialize per batch row
            # (measured 5.7 ms vs 0.32 ms at 100x512->128).  Per step the
            # (tb, n) layout costs the same vector passes as the
            # single-cloud (n/128, 128) layout, so lockstep batching is
            # ~free until the VMEM tile cap (fps.py) splits the grid.
            from jmodt_tpu.ops.pallas.fps import (
                farthest_point_sample_batched_pallas)
            return farthest_point_sample_batched_pallas(xyz, npoint)
    # Non-TPU backends (the CPU test suite) use the XLA scan

    def sample_one(pts):  # (N, 3)
        def body(carry, _):
            min_d, last = carry
            d = jnp.sum((pts - pts[last]) ** 2, axis=-1)
            min_d = jnp.minimum(min_d, d)
            nxt = jnp.argmax(min_d).astype(jnp.int32)
            return (min_d, nxt), nxt

        init = (jnp.full((n,), 1e10, dtype=pts.dtype), jnp.asarray(0, jnp.int32))
        _, rest = jax.lax.scan(body, init, None, length=npoint - 1)
        return jnp.concatenate([jnp.zeros((1,), jnp.int32), rest])

    return jax.vmap(sample_one)(xyz)


def gather_points(features: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[b, c, m] = features[b, c, idx[b, m]] (reference gather_points_kernel,
    sampling_gpu.cu:8-34; autograd Function pointnet2_utils.py:39-73).

    :param features: (B, C, N)
    :param idx: (B, M) int
    :return: (B, C, M); gradient w.r.t. features is the scatter-add the CUDA
        backward implements (sampling_gpu.cu:57-83), via autodiff.
    """
    return jnp.take_along_axis(features, idx[:, None, :], axis=2)


def gather_xyz(xyz: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Point-layout gather: xyz (B, N, C), idx (B, M) -> (B, M, C)."""
    return jnp.take_along_axis(xyz, idx[:, :, None], axis=1)
