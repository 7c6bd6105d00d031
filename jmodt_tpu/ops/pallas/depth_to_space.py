"""Pallas depth-to-space for NonOverlapDeconv outputs.

The image pyramid's deconvs (reference backbone.py:130-139; kernel ==
stride) are one MXU matmul producing a tap-major table, followed by a
depth-to-space move to full resolution.  XLA lowers that move as a 6-D
transpose whose minor dims are tiny (k, r), which round-4 attribution
(tools/bench_pyramid.py) suspects costs most of the ~5 ms `img_pyramid`
component.  This kernel does the same move as a sublane-only shuffle —
for one low-res row, (w0, k, k*r) -> (k, w0, k*r) never moves the lane
dimension (k*r stays minor), which the VPU executes at copy speed.

Block sizes: one low-res row per grid step — the largest level
(k=16, r=16, w0=80) needs 80*16*16*16*4 B = 1.3 MB in + 1.3 MB out of
VMEM, comfortably inside the ~16 MB budget with double buffering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _d2s_kernel(y_ref, o_ref, *, k, kr, w0):
    # y_ref: (1, 1, w0 * k * kr) — one batch row, one low-res row, taps
    # ordered (x, dy, dx*r).  o_ref: (1, k, w0 * kr) — k full-res rows.
    y = y_ref[0, 0].reshape(w0, k, kr)
    o_ref[0] = jnp.transpose(y, (1, 0, 2)).reshape(k, w0 * kr)


@functools.partial(jax.jit, static_argnames=('k', 'r', 'h0', 'w0',
                                             'interpret'))
def depth_to_space_pallas(taps: jnp.ndarray, k: int, r: int, h0: int,
                          w0: int, interpret: bool = False) -> jnp.ndarray:
    """(B, h0*w0, k*k*r) tap-major deconv table -> (B, h0*k * w0*k, r)
    full-resolution row-major map (flattened spatially).

    Row ordering matches NonOverlapDeconv's transpose
    (image_backbone.py): full-res pixel (y, x) reads table row
    (y//k)*w0 + x//k at tap (y%k)*k + (x%k).
    """
    b = taps.shape[0]
    kr = k * r
    y = taps.reshape(b, h0, w0 * k * kr)
    out = pl.pallas_call(
        functools.partial(_d2s_kernel, k=k, kr=kr, w0=w0),
        grid=(b, h0),
        in_specs=[pl.BlockSpec((1, 1, w0 * k * kr), lambda i, j: (i, j, 0))],
        out_specs=pl.BlockSpec((1, k, w0 * kr), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h0 * k, w0 * kr), taps.dtype),
        interpret=interpret,
    )(y)
    return out.reshape(b, h0 * k * w0 * k, r)


def depth_to_space_xla(taps: jnp.ndarray, k: int, r: int, h0: int,
                       w0: int) -> jnp.ndarray:
    """Reference XLA formulation of the same move (6-D transpose)."""
    b = taps.shape[0]
    y = taps.reshape(b, h0, w0, k, k, r)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5))
    return y.reshape(b, h0 * k * w0 * k, r)
