"""Fused gather + pointwise-MLP + max-pool for the RCNN set-abstraction
levels (eval path).

The XLA formulation of one single-scale SA level materializes the grouped
tensor (R, M, S, C) and every MLP intermediate in HBM — at the RCNN's
sa_0 shapes (100 RoIs x 128 centers x 64 samples x 131 ch) that is ~2.5 GB
of traffic for 81 GFLOP of matmul.  This kernel keeps the whole
group->MLP->max chain in VMEM per (roi, center-tile) grid program:

  - the neighbor gather is a one-hot matmul on the MXU (rows = TMI*S group
    samples, contraction over the N source points) — gathers are exact
    because each one-hot row has a single 1.0;
  - the *first* MLP layer is hoisted OUT of the kernel entirely: Dense is
    linear, so Dense(concat[xyz - center, feats]) == gather(catf @ W1)
    - center @ W1[:3] + b1.  The caller precomputes feats1 = catf @ W1
    (one big (R*N, C) matmul XLA tiles perfectly) and cxw = new_xyz @
    W1[:3]; the kernel only gathers the 128-wide projected features.
  - remaining layers are (TMI*S, C) matmuls + bias + relu, then max over S.

BatchNorm (eval = running stats) is an affine per-channel map the caller
folds into each layer's (W, b) — see jmodt_tpu/ops/fused_sa.py.

Reference op: /root/reference/jmodt/ops/pointnet2/src/group_points_gpu.cu +
pointnet2_modules.py:356-390 (QueryAndGroup -> SharedMLP -> F.max_pool2d);
this fusion has no reference counterpart — it exists because on TPU the
HBM round-trips, not the FLOPs, dominate the unfused form.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_ROWS_TARGET = 512  # TMI * S rows per inner sub-tile
# cap on the (TMI, S, N) one-hot block built per sub-tile: at the RPN
# backbone's N=4096 levels the 512-row target alone would make it an 8 MB
# f32 intermediate — over half of VMEM once the (1, N, C1) feature table
# and the matmul operands are resident
_ONEHOT_BYTES = 2 * 1024 * 1024


def _kernel(f1_hi_ref, f1_lo_ref, idx_ref, cxw_ref, b1_ref, *rest,
            tmi: int, n: int):
    """One (roi, center-tile) program.

    f1_hi_ref/f1_lo_ref: (1, N, C1) bf16 hi/lo split of the projected
        per-point features (catf @ W1 folded): hi = bf16(f1),
        lo = bf16(f1 - hi).  The one-hot gather dot must reproduce f1
        VALUES, not bf16 truncations of them — at default precision the
        MXU truncates an f32 operand to bf16 (measured ~1% output error
        on chip, round-4 verify_pallas), and Precision.HIGHEST costs 6
        passes.  Because the one-hot operand is exact in bf16 (rows of
        0/1), gathering hi and lo separately with two full-rate bf16
        passes reconstructs f1 to ~2^-17 relative — f32-class accuracy
        at 2x the default-dot cost instead of 6x.
    idx_ref: (1, TM, S) int32 neighbor indices into N
    cxw_ref: (1, TM, C1) center correction (new_xyz @ W1[:3] folded)
    b1_ref:  (1, C1) folded layer-1 bias
    rest: [w2, b2, w3, b3, ..., out_ref] — extra folded layers then output
    """
    out_ref = rest[-1]
    layer_refs = rest[:-1]
    tm, s = idx_ref.shape[1], idx_ref.shape[2]
    for ti in range(tm // tmi):
        idx_sub = idx_ref[0, ti * tmi:(ti + 1) * tmi, :]        # (TMI, S)
        onehot = (jax.lax.broadcasted_iota(jnp.int32, (tmi, s, n), 2)
                  == idx_sub[:, :, None]).astype(jnp.bfloat16
                                                 ).reshape(tmi * s, n)
        g = (jnp.dot(onehot, f1_hi_ref[0],
                     preferred_element_type=jnp.float32)
             + jnp.dot(onehot, f1_lo_ref[0],
                       preferred_element_type=jnp.float32))      # (TMI*S, C1)
        h = g + b1_ref[:]                                        # (1, C1) bc
        h = (h.reshape(tmi, s, -1)
             - cxw_ref[0, ti * tmi:(ti + 1) * tmi, :][:, None, :])
        h = jnp.maximum(h, 0.0).reshape(tmi * s, -1)
        for li in range(0, len(layer_refs), 2):
            w_ref, b_ref = layer_refs[li], layer_refs[li + 1]
            h = jnp.maximum(
                jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32)
                + b_ref[:], 0.0)
        out_ref[0, ti * tmi:(ti + 1) * tmi, :] = jnp.max(
            h.reshape(tmi, s, -1), axis=1)


@functools.partial(jax.jit, static_argnames=('interpret',))
def grouped_gather_mlp_max(feats1: jnp.ndarray, idx: jnp.ndarray,
                           cxw: jnp.ndarray, b1: jnp.ndarray,
                           layers: tuple, interpret: bool = False
                           ) -> jnp.ndarray:
    """max_s relu(...relu(gather(feats1)[b,m,s] + b1 - cxw[b,m]) @ W2 + b2...)

    :param feats1: (B, N, C1) f32 — first layer already applied per point
    :param idx: (B, M, S) int32 neighbor indices
    :param cxw: (B, M, C1) f32 per-center linear correction
    :param b1: (C1,) f32
    :param layers: tuple of (W (Cin, Cout), b (Cout,)) folded eval layers
    :return: (B, M, C_last) f32
    """
    b, n, c1 = feats1.shape
    _, m, s = idx.shape
    tm = m if m <= 128 else 128
    assert m % tm == 0, (m, tm)
    # one-hot block is built in bf16 (2 bytes) — see _kernel docstring
    tmi = max(1, min(tm, _ROWS_TARGET // s, _ONEHOT_BYTES // (s * n * 2)))
    while tm % tmi:
        tmi -= 1

    f1_hi = feats1.astype(jnp.bfloat16)
    f1_lo = (feats1 - f1_hi.astype(jnp.float32)).astype(jnp.bfloat16)

    flat = []
    for w, bias in layers:
        flat += [w, bias.reshape(1, -1)]
    c_out = layers[-1][0].shape[1] if layers else c1

    kernel = functools.partial(_kernel, tmi=tmi, n=n)
    grid = (b, m // tm)
    in_specs = [
        pl.BlockSpec((1, n, c1), lambda bb, t: (bb, 0, 0)),
        pl.BlockSpec((1, n, c1), lambda bb, t: (bb, 0, 0)),
        pl.BlockSpec((1, tm, s), lambda bb, t: (bb, t, 0)),
        pl.BlockSpec((1, tm, c1), lambda bb, t: (bb, t, 0)),
        pl.BlockSpec((1, c1), lambda bb, t: (0, 0)),
    ] + [pl.BlockSpec(x.shape, lambda bb, t: (0, 0)) for x in flat]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, tm, c_out), lambda bb, t: (bb, t, 0)),
        out_shape=jax.ShapeDtypeStruct((b, m, c_out), jnp.float32),
        interpret=interpret,
    )(f1_hi, f1_lo, idx, cxw, b1.reshape(1, -1), *flat)
    return out
