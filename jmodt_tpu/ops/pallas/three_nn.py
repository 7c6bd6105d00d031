"""Pallas TPU kernel for 3-nearest-neighbor search (FP interpolation).

The XLA path (ops/interpolate.py::three_nn) materializes the full pairwise
distance matrix in HBM (256 MB at the finest FP level, 16384 x 4096) and
runs `lax.top_k` over it.  Here each grid program computes one 128-query
tile of distances directly in VMEM against the whole known set (M x 3
coordinates: <=48 KB, loaded once per program) and reduces the 3 smallest
via three masked min-passes, each fully vectorized over the (128, M)
distance tile — the tile never touches HBM and nothing sorts.

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
                     dist_ref, idx_ref, *, mp):
    """One 128-query tile, vectorized over the whole tile.  u*_ref: (1,
    128) query coords; k*_ref: (1, mp) known coords (padded with +inf
    sentinels by the caller); dist_ref/idx_ref: (3, 128) outputs."""
    dx = kx_ref[0, :][None, :] - ux_ref[0, :][:, None]   # (128, mp)
    dy = ky_ref[0, :][None, :] - uy_ref[0, :][:, None]
    dz = kz_ref[0, :][None, :] - uz_ref[0, :][:, None]
    d = dx * dx + dy * dy + dz * dz
    col = jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)

    for s in range(3):
        mn = jnp.min(d, axis=1)                           # (128,)
        j = jnp.min(jnp.where(d == mn[:, None], col, mp),
                    axis=1).astype(jnp.int32)             # first argmin
        dist_ref[s, :] = mn
        idx_ref[s, :] = j
        if s < 2:
            d = jnp.where(col == j[:, None], jnp.inf, d)


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
    mp = m + pad

    kx = known_p[..., 0].reshape(b, 1, mp)
    ky = known_p[..., 1].reshape(b, 1, mp)
    kz = known_p[..., 2].reshape(b, 1, mp)
    ux = unknown[..., 0].reshape(b, n // _TILE, 1, _TILE)
    uy = unknown[..., 1].reshape(b, n // _TILE, 1, _TILE)
    uz = unknown[..., 2].reshape(b, n // _TILE, 1, _TILE)

    kernel = functools.partial(_three_nn_kernel, mp=mp)
    call = pl.pallas_call(
        kernel,
        grid=(n // _TILE,),
        in_specs=[pl.BlockSpec((None, 1, _TILE), lambda t: (t, 0, 0))] * 3
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=[pl.BlockSpec((None, 3, _TILE), lambda t: (t, 0, 0))] * 2,
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
