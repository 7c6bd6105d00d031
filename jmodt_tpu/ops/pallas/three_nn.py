"""Pallas TPU kernel for 3-nearest-neighbor search (FP interpolation).

The XLA path (ops/interpolate.py::three_nn) materializes the full pairwise
distance matrix in HBM (256 MB at the finest FP level, 16384 x 4096) and
runs `lax.top_k` over it.  Here each grid program computes one 128-query
tile of distances directly in VMEM against the whole known set (M x 3
coordinates: <=48 KB, loaded once per program) and reduces the 3 smallest
via three masked min-passes — the distance tile never touches HBM.

Reference kernel: /root/reference/jmodt/ops/pointnet2/src/interpolate_gpu.cu:9-77
(brute-force per-thread 3-NN with insertion updates).  Tie-breaking: the
CUDA kernel's strict `<` comparisons keep the FIRST index among equals;
the masked-min passes below reproduce that (`jnp.min` over candidate
indices attaining the minimum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TILE = 128


def _three_nn_kernel(ux_ref, uy_ref, uz_ref, kx_ref, ky_ref, kz_ref,
                     dist_ref, idx_ref, *, m):
    """One 128-query tile.  u*_ref: (1, 128) query coords; k*_ref: (rows,
    128) known coords (m = rows * 128 logical entries, padded with +inf
    sentinels by the caller); dist_ref/idx_ref: (3, 128) outputs."""
    rows = kx_ref.shape[0]
    flat_idx = (jax.lax.broadcasted_iota(jnp.int32, (rows, _TILE), 0)
                * _TILE
                + jax.lax.broadcasted_iota(jnp.int32, (rows, _TILE), 1))

    def per_query(q, carry):
        # distances from query q to all known points: (rows, 128) in VMEM
        qx = ux_ref[0, q]
        qy = uy_ref[0, q]
        qz = uz_ref[0, q]
        dx = kx_ref[:] - qx
        dy = ky_ref[:] - qy
        dz = kz_ref[:] - qz
        d = dx * dx + dy * dy + dz * dz

        def take_min(d_cur):
            mn = jnp.min(d_cur)
            j = jnp.min(jnp.where(d_cur == mn, flat_idx, m)).astype(
                jnp.int32)
            return mn, j, jnp.where(flat_idx == j, jnp.inf, d_cur)

        d0, j0, d = take_min(d)
        d1, j1, d = take_min(d)
        d2, j2, _ = take_min(d)
        dist_ref[0, q] = d0
        dist_ref[1, q] = d1
        dist_ref[2, q] = d2
        idx_ref[0, q] = j0
        idx_ref[1, q] = j1
        idx_ref[2, q] = j2
        return carry

    jax.lax.fori_loop(0, _TILE, per_query, 0)


@functools.partial(jax.jit, static_argnames=('interpret',))
def three_nn_pallas(unknown: jnp.ndarray, known: jnp.ndarray,
                    interpret: bool = False):
    """(B, N, 3), (B, M, 3) -> (dist (B, N, 3) euclidean, idx (B, N, 3)).
    N must be a multiple of 128; M is padded to a multiple of 128 with
    +inf sentinels (never selected)."""
    b, n, _ = unknown.shape
    m = known.shape[1]
    assert n % _TILE == 0, f'N={n} must be a multiple of {_TILE}'
    pad = (-m) % _TILE
    known_p = jnp.pad(known, ((0, 0), (0, pad), (0, 0)),
                      constant_values=jnp.inf)
    rows = (m + pad) // _TILE

    kx = known_p[..., 0].reshape(b, rows, _TILE)
    ky = known_p[..., 1].reshape(b, rows, _TILE)
    kz = known_p[..., 2].reshape(b, rows, _TILE)
    ux = unknown[..., 0].reshape(b, n // _TILE, 1, _TILE)
    uy = unknown[..., 1].reshape(b, n // _TILE, 1, _TILE)
    uz = unknown[..., 2].reshape(b, n // _TILE, 1, _TILE)

    kernel = functools.partial(_three_nn_kernel, m=m + pad)
    call = pl.pallas_call(
        kernel,
        grid=(n // _TILE,),
        # queries + outputs in SMEM: the kernel reads/writes one scalar per
        # dynamic index q, which VMEM refs do not support (cf. pallas/fps.py)
        in_specs=[pl.BlockSpec((None, 1, _TILE), lambda t: (t, 0, 0),
                               memory_space=pltpu.SMEM)] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec((None, 3, _TILE), lambda t: (t, 0, 0),
                                memory_space=pltpu.SMEM)] * 2,
        out_shape=[
            jax.ShapeDtypeStruct((n // _TILE, 3, _TILE), jnp.float32),
            jax.ShapeDtypeStruct((n // _TILE, 3, _TILE), jnp.int32),
        ],
        interpret=interpret,
    )

    def one(uxa, uya, uza, kxa, kya, kza):
        d, i = call(uxa, uya, uza, kxa, kya, kza)
        # (n//128, 3, 128) -> (n, 3)
        d = d.transpose(0, 2, 1).reshape(n, 3)
        i = i.transpose(0, 2, 1).reshape(n, 3)
        return d, i

    d, i = jax.vmap(one)(ux, uy, uz, kx, ky, kz)
    return jnp.sqrt(d), i
