"""Pallas depth-to-space for NonOverlapDeconv outputs.

The image pyramid's deconvs (reference backbone.py:130-139; kernel ==
stride) are one MXU matmul producing a tap-major table, followed by a
depth-to-space move to full resolution.  XLA lowers that move as a 6-D
transpose whose minor dims are tiny (k, r), which round-4 attribution
(tools/bench_pyramid.py) suspects costs most of the ~5 ms `img_pyramid`
component.  This kernel does the same move as a sublane-only shuffle —
for one low-res row, (w0, k, k*r) -> (k, w0, k*r) never moves the lane
dimension (k*r stays minor), which the VPU executes at copy speed.

Mosaic blocking (the round-4 on-chip lowering fix — the first version
blocked one low-res row per grid step, and Mosaic requires the block's
sublane dim to be divisible by 8 or equal to the array dim): each block
covers 8 low-res rows x a `w0c`-column chunk, with `w0c` chosen so the
lane extent w0c*k*k*r is 128-divisible and the block stays <=256 KB/row
in VMEM.  Of the four production level shapes (k in {2,4,8,16}, r=16,
h0 in {192,96,48,24}) only k=8/16 satisfy `supported(...)` on the real
chip (k*r must be lane-aligned; see _pick_w0c); callers must gate on it
and fall back to `depth_to_space_xla` — or better, the `stack_mm`
row-major deconv formulation (models/image_backbone.py), which avoids
the interleaving move entirely at every k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_ROWS = 8                 # low-res rows per block (Mosaic sublane quantum)
_MAX_LANE = 65536         # per-row lane elements cap (~256 KB f32/row)
_MAX_BLOCK = 1 << 21      # total block elements cap (~8 MB f32)


def _pick_rows(h0: int) -> int:
    """Sublane rows per block: the Mosaic quantum when h0 allows it,
    otherwise the full dim (a block equal to the array dim is also
    legal) — the latter only occurs at miniature test shapes."""
    return _ROWS if h0 % _ROWS == 0 else h0


def _pick_w0c(k: int, r: int, h0: int, w0: int, interpret: bool = False):
    """Largest divisor of w0 whose block fits VMEM and whose lane extents
    (in: w0c*k*k*r, out: w0c*k*r) are 128-divisible (or full-width).

    Additionally requires k*r % 128 == 0 unless `interpret`: the kernel's
    in-VMEM lane reshape (w0c, k, k*r) is only a relayout Mosaic can
    lower when the minor extent is lane-aligned — below that the round-4
    on-chip probe got an INTERNAL compiler crash (k=2/4, k*r=32/64),
    while k=8/16 (k*r=128/256) compile and run bit-exact.  Callers fall
    back to the XLA form (or the stack_mm row-major deconv) for small
    k."""
    kr = k * r
    if kr % 128 and not interpret:
        return None
    rows = _pick_rows(h0)
    for w0c in range(w0, 0, -1):
        if w0 % w0c:
            continue
        if w0c * k * kr > _MAX_LANE or rows * w0c * k * kr > _MAX_BLOCK:
            continue
        in_ok = (w0c == w0) or (w0c * k * kr) % 128 == 0
        out_ok = (w0c == w0) or (w0c * kr) % 128 == 0
        if in_ok and out_ok:
            return w0c
    return None


def supported(k: int, r: int, h0: int, w0: int) -> bool:
    return _pick_w0c(k, r, h0, w0) is not None


def _d2s_kernel(y_ref, o_ref, *, k, kr, w0c, rows):
    # y_ref: (1, rows, w0c * k * kr) — `rows` low-res rows of one batch,
    # taps ordered (x, dy, dx*r).  o_ref: (1, rows * k, w0c * kr) — the
    # rows*k full-res rows they expand to; full-res row (row, dy) is out
    # sublane row*k + dy, matching the (0, 2, 1, 3) transpose below.
    y = y_ref[0].reshape(rows, w0c, k, kr)
    o_ref[0] = jnp.transpose(y, (0, 2, 1, 3)).reshape(rows * k, w0c * kr)


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
    w0c = _pick_w0c(k, r, h0, w0, interpret)
    if w0c is None:
        raise ValueError(
            f'depth_to_space_pallas: unsupported shape k={k} r={r} '
            f'h0={h0} w0={w0}; gate on supported() and use the XLA form')
    rows = _pick_rows(h0)
    y = taps.reshape(b, h0, w0 * k * kr)
    out = pl.pallas_call(
        functools.partial(_d2s_kernel, k=k, kr=kr, w0c=w0c, rows=rows),
        grid=(b, h0 // rows, w0 // w0c),
        in_specs=[pl.BlockSpec((1, rows, w0c * k * kr),
                               lambda i, j, c: (i, j, c))],
        out_specs=pl.BlockSpec((1, rows * k, w0c * kr),
                               lambda i, j, c: (i, j, c)),
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
