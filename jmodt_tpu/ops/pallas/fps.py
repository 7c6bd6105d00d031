"""Pallas TPU kernel for farthest point sampling.

The CUDA reference (jmodt/ops/pointnet2/src/sampling_gpu.cu:93-209) keeps a
per-point running min-distance in global memory with a shared-memory argmax
tree per step.  Here the whole working set lives in VMEM: the (N,) point
coordinates and the min-distance vector are laid out as (N/128, 128) tiles
that never leave the chip across the `npoint` sequential steps — each step
is one VPU pass (distance update + running min) plus a two-stage argmax.

The XLA `lax.scan` fallback (jmodt_tpu/ops/sampling.py) is
semantics-identical; this kernel exists for the hot RPN level-0 shape
(16384 -> 4096) where keeping min-dist pinned in VMEM avoids the scan's
per-step HBM round trip.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _fps_kernel(x_ref, y_ref, z_ref, out_ref, mind_ref, *, npoint, rows):
    """One batch row.  x/y/z_ref: (rows, 128) coordinate tiles;
    out_ref: (1, npoint) int32; mind_ref: (rows, 128) VMEM scratch."""
    mind_ref[:] = jnp.full((rows, _LANES), 1e10, jnp.float32)
    out_ref[0, 0] = 0
    flat_idx = (jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
                * _LANES
                + jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1))

    def body(t, last):
        # coordinates of the previously selected point: dynamic per-lane
        # scalar loads from VMEM are unsupported, so select via a one-hot
        # masked reduction (one extra VPU pass per coordinate)
        sel = flat_idx == last
        px = jnp.sum(jnp.where(sel, x_ref[:], 0.0))
        py = jnp.sum(jnp.where(sel, y_ref[:], 0.0))
        pz = jnp.sum(jnp.where(sel, z_ref[:], 0.0))
        dx = x_ref[:] - px
        dy = y_ref[:] - py
        dz = z_ref[:] - pz
        d = dx * dx + dy * dy + dz * dz
        mind = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = mind
        # argmax with first-index tie-breaking (matches jnp.argmax): find
        # the max value, then the smallest flat index attaining it
        m = jnp.max(mind)
        nxt = jnp.min(jnp.where(mind == m, flat_idx, rows * _LANES)
                      ).astype(jnp.int32)
        out_ref[0, t] = nxt
        return nxt

    jax.lax.fori_loop(1, npoint, body, jnp.asarray(0, jnp.int32))


@functools.partial(jax.jit, static_argnames=('npoint', 'interpret'))
def farthest_point_sample_pallas(xyz: jnp.ndarray, npoint: int,
                                 interpret: bool = False) -> jnp.ndarray:
    """(B, N, 3) float32 -> (B, npoint) int32, N a multiple of 128.
    idx[:, 0] == 0, matching the CUDA kernel's fixed seed."""
    b, n, _ = xyz.shape
    assert n % _LANES == 0, f'N={n} must be a multiple of {_LANES}'
    rows = n // _LANES

    x = xyz[..., 0].reshape(b, rows, _LANES)
    y = xyz[..., 1].reshape(b, rows, _LANES)
    z = xyz[..., 2].reshape(b, rows, _LANES)

    kernel = functools.partial(_fps_kernel, npoint=npoint, rows=rows)
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((1, npoint), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        # indices are written one scalar per step -> SMEM output
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        scratch_shapes=[pltpu.VMEM((rows, _LANES), jnp.float32)],
        interpret=interpret,
    )
    return jax.vmap(lambda xa, ya, za: call(xa, ya, za)[0])(x, y, z)


# --------------------------------------------------------------------------
# Batched variant: many small clouds (the RCNN RoI shape, e.g. 100-512 RoIs
# of 512 points each).  The single-cloud kernel above serializes over batch
# rows (one grid program per cloud), and the XLA scan pays ~15 us of fused-op
# latency per step; here one program holds a (TB, N) row-tile of EVERY
# cloud's min-distance state in VMEM and runs the npoint steps internally,
# each step a few VPU passes vectorized over all TB clouds at once.
# --------------------------------------------------------------------------


def _fps_batched_kernel(x_ref, y_ref, z_ref, out_ref, mind_ref, *, npoint):
    """x/y/z_ref, mind_ref: (TB, N); out_ref: (TB, npoint) int32."""
    tb, n = x_ref.shape
    mind_ref[:] = jnp.full((tb, n), 1e10, jnp.float32)
    col = jax.lax.broadcasted_iota(jnp.int32, (tb, n), 1)
    # Mosaic cannot store to a dynamic single lane (out[:, t]); instead the
    # whole (TB, npoint) block is rewritten each step with a lane-mask —
    # a cheap VPU pass at npoint <= a few hundred lanes
    out_col = jax.lax.broadcasted_iota(jnp.int32, (tb, npoint), 1)
    out_ref[:] = jnp.zeros((tb, npoint), jnp.int32)

    def body(t, last):  # last: (TB, 1) int32 previously selected per cloud
        sel = col == last
        px = jnp.sum(jnp.where(sel, x_ref[:], 0.0), axis=1, keepdims=True)
        py = jnp.sum(jnp.where(sel, y_ref[:], 0.0), axis=1, keepdims=True)
        pz = jnp.sum(jnp.where(sel, z_ref[:], 0.0), axis=1, keepdims=True)
        dx = x_ref[:] - px
        dy = y_ref[:] - py
        dz = z_ref[:] - pz
        d = dx * dx + dy * dy + dz * dz
        mind = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = mind
        # per-row argmax, first-index tie-breaking (matches jnp.argmax)
        m = jnp.max(mind, axis=1, keepdims=True)
        nxt = jnp.min(jnp.where(mind == m, col, n), axis=1,
                      keepdims=True).astype(jnp.int32)
        out_ref[:] = jnp.where(out_col == t, nxt, out_ref[:])
        return nxt

    jax.lax.fori_loop(1, npoint, body, jnp.zeros((tb, 1), jnp.int32))


_TILE_B = 128


@functools.partial(jax.jit, static_argnames=('npoint', 'interpret'))
def farthest_point_sample_batched_pallas(xyz: jnp.ndarray, npoint: int,
                                         interpret: bool = False
                                         ) -> jnp.ndarray:
    """(B, N, 3) float32 -> (B, npoint) int32 for B > 1 clouds stepped in
    lockstep.  idx[:, 0] == 0 (CUDA fixed seed).  B pads to the row tile."""
    b, n, _ = xyz.shape
    tb = min(_TILE_B, b + ((-b) % 8))   # row-tile: multiple of 8 sublanes
    # cap the tile so the four (tb, n) f32 VMEM planes (x, y, z, min-dist)
    # stay within ~6 MB — at n=16384 that is tb=24, still one grid step for
    # the batched-streams shape (S=4) and the train batch
    tb = min(tb, max(8, (6 * 2 ** 20 // (16 * n)) // 8 * 8))
    pad = (-b) % tb
    xyz_p = jnp.pad(xyz, ((0, pad), (0, 0), (0, 0)))
    bp = b + pad

    x = xyz_p[..., 0]
    y = xyz_p[..., 1]
    z = xyz_p[..., 2]
    kernel = functools.partial(_fps_batched_kernel, npoint=npoint)
    out = pl.pallas_call(
        kernel,
        grid=(bp // tb,),
        in_specs=[pl.BlockSpec((tb, n), lambda i: (i, 0))] * 3,
        out_specs=pl.BlockSpec((tb, npoint), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((bp, npoint), jnp.int32),
        scratch_shapes=[pltpu.VMEM((tb, n), jnp.float32)],
        interpret=interpret,
    )(x, y, z)
    return out[:b]
