"""Whole-SA-level Pallas megakernel: FPS + multi-scale ball query +
gather + folded MLP + max-pool in ONE TPU program per backbone level.

VERDICT r4 lever #2 / PERF_ANALYSIS "Levers still open" (2): the RPN
backbone's SA levels 1-3 (N <= 4096) are dominated by per-op dispatch
and small-shape inefficiency, not FLOPs — standalone costs ~3 ms total
for work whose speed-of-light is well under 1 ms.  This kernel keeps the
ENTIRE level resident in VMEM:

  phase 1 (FPS)      — identical math to ops/pallas/fps.py::_fps_kernel
                       (reference sampling_gpu.cu:93-209): the (N,)
                       min-distance state lives in (N/128, 128) VMEM
                       tiles; each of the `npoint` sequential steps also
                       extracts the selected point's coordinates and its
                       precomputed |p|^2 into (M, 8)/(M, 1) center
                       tables via masked one-pass writes (Mosaic has no
                       dynamic row stores).
  phase 2 (per scale)— feats1 = catf @ W1 (the hoisted first Dense of
                       ops/fused_sa.py) computed chunk-by-chunk into
                       bf16 hi/lo VMEM tables (the exact-gather split of
                       ops/pallas/grouped_gather_mlp.py).
  phase 3 (per scale, per center tile)
                     — squared distances d2 = (q2 + p2) - 2 q.p via a
                       Precision.HIGHEST MXU dot, mirroring
                       ops/grouping.py::ball_query TERM FOR TERM (the
                       round-4 MXU-truncation rule: exact-semantics
                       matmuls never run at default precision);
                     — first-`nsample`-in-index-order selection
                       (ball_query_gpu.cu:34-43 semantics) expressed as
                       rank = running-count + (in_radius @ T128), T128
                       the 128x128 inclusive upper-triangular ones
                       (counts <= 128 are exact in bf16), then a
                       rank-one-hot (TM*S, 128) block whose MXU product
                       with the hi/lo tables IS the neighbor gather —
                       the (M, N) distance matrix never exists in HBM;
                     — folded MLP layers 2..L and the sample max-pool,
                       with empty-ball rows reproducing the XLA
                       fallback's point-0 fill and beyond-count slots
                       masked out of the max (the XLA path fills them
                       with the first hit — idempotent under max).

Outputs per level: FPS indices (B, M) int32 (consumed by LI-Fusion's
image gather, backbone.py:169-171), centers (B, M, 8) f32 (lanes 0-2 =
new_xyz, exact copies of the selected xyz rows), and one pooled feature
tensor (B, M, C_last) per scale.

Semantics twin: `sa_level_fused_xla` below composes the existing tested
ops (farthest_point_sample + ball_query_multi + fused_sa_eval) — the
kernel is selection-exact against it (same FPS argmax tie-breaking, same
d2 expression at HIGHEST precision, same first-k-in-index-order rule)
and float-reassociation-close on the MLP values; tests/test_sa_level.py
pins both in interpret mode, tools/verify_pallas.py re-checks on chip.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_TM = 128  # centers per phase-3 tile


def _sa_level_kernel(x_ref, y_ref, z_ref, psq_ref, catf_ref, *args,
                     idx_ref, c8_ref, out_refs, mind_ref, c8s_ref,
                     cqs_ref, hi_refs, lo_refs, npoint: int, rows: int,
                     radii2: tuple, nsamples: tuple, n_layers: tuple):
    """One batch row's full SA level.

    x/y/z/psq_ref: (rows, 128) f32 coordinate / |p|^2 tiles
    catf_ref: (N, C) f32 concat[xyz, feats] (C = 3 without features)
    args: folded weights, per scale in order:
        [w1pad8 (8, C1), w1 (C, C1), b1 (1, C1), w2, b2, ...]
        (w1pad8 = W1's xyz rows zero-padded to 8 — the center
        correction matmul operand; c8's lanes 3-7 are zero)
    idx_ref: (1, M) int32 SMEM out; c8_ref: (1, M, 8) f32 out
    out_refs: per scale (1, M, C_last) f32 out
    mind_ref: (rows, 128) f32 FPS scratch
    c8s_ref: (M, 8) / cqs_ref: (M, 1) f32 center scratch
    hi_refs / lo_refs: per scale (N, C1) bf16 feature-table scratch
    """
    m = npoint
    nscales = len(radii2)
    # unpack the flat weight refs
    w1pads, w1s, b1s, rest_layers = [], [], [], []
    wi = 0
    for si in range(nscales):
        w1pads.append(args[wi])
        w1s.append(args[wi + 1])
        b1s.append(args[wi + 2])
        wi += 3
        layers = []
        for _ in range(n_layers[si] - 1):
            layers.append((args[wi], args[wi + 1]))
            wi += 2
        rest_layers.append(layers)

    # ---- phase 1: FPS (ops/pallas/fps.py math) + center extraction ----
    mind_ref[:] = jnp.full((rows, _LANES), 1e10, jnp.float32)
    idx_ref[0, 0] = 0
    flat_idx = (jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0)
                * _LANES
                + jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1))
    row_m = jax.lax.broadcasted_iota(jnp.int32, (m, 8), 0)
    lane8 = jax.lax.broadcasted_iota(jnp.int32, (m, 8), 1)
    row_m1 = jax.lax.broadcasted_iota(jnp.int32, (m, 1), 0)

    def extract(t, last):
        """Record point `last` as center row t; returns its coords."""
        sel = flat_idx == last
        px = jnp.sum(jnp.where(sel, x_ref[:], 0.0))
        py = jnp.sum(jnp.where(sel, y_ref[:], 0.0))
        pz = jnp.sum(jnp.where(sel, z_ref[:], 0.0))
        pq = jnp.sum(jnp.where(sel, psq_ref[:], 0.0))
        cval = jnp.where(lane8 == 0, px,
                         jnp.where(lane8 == 1, py,
                                   jnp.where(lane8 == 2, pz, 0.0)))
        c8s_ref[:] = jnp.where(row_m == t, cval, c8s_ref[:])
        cqs_ref[:] = jnp.where(row_m1 == t, pq, cqs_ref[:])
        return px, py, pz

    def fps_body(t, last):
        px, py, pz = extract(t - 1, last)
        dx = x_ref[:] - px
        dy = y_ref[:] - py
        dz = z_ref[:] - pz
        d = dx * dx + dy * dy + dz * dz
        mind = jnp.minimum(mind_ref[:], d)
        mind_ref[:] = mind
        mx = jnp.max(mind)
        nxt = jnp.min(jnp.where(mind == mx, flat_idx, rows * _LANES)
                      ).astype(jnp.int32)
        idx_ref[0, t] = nxt
        return nxt

    last = jax.lax.fori_loop(1, m, fps_body, jnp.asarray(0, jnp.int32))
    extract(m - 1, last)
    c8_ref[0] = c8s_ref[:]

    # ---- phase 2: per-scale bf16 hi/lo feature tables ----
    nchunks = rows  # N // 128

    for si in range(nscales):
        def f1_body(c, _, si=si):
            rowsl = catf_ref[pl.ds(c * _LANES, _LANES), :]     # (128, C)
            f1 = jnp.dot(rowsl, w1s[si][:],
                         preferred_element_type=jnp.float32)   # (128, C1)
            hi = f1.astype(jnp.bfloat16)
            lo = (f1 - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            hi_refs[si][pl.ds(c * _LANES, _LANES), :] = hi
            lo_refs[si][pl.ds(c * _LANES, _LANES), :] = lo
            return 0

        jax.lax.fori_loop(0, nchunks, f1_body, 0)

    # ---- phase 3: per-scale, per-center-tile query + gather + MLP ----
    # inclusive upper-triangular ones: rank[j] = sum_{i<=j} in[i];
    # in-chunk counts <= 128 are exact in bf16
    t128 = (jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 0)
            <= jax.lax.broadcasted_iota(jnp.int32, (_LANES, _LANES), 1)
            ).astype(jnp.bfloat16)
    tm = min(_TM, m)

    for si in range(nscales):
        r2, s = radii2[si], nsamples[si]
        c1 = w1s[si].shape[1]
        b1 = b1s[si][:]                                        # (1, C1)
        # Mosaic iota is integer-only; compare in f32 (rank is f32)
        s3 = jax.lax.broadcasted_iota(jnp.int32, (tm, s, _LANES), 1
                                      ).astype(jnp.float32)
        slot0 = s3[..., :1] == 0.0                             # (tm, s, 1)

        for ti in range(m // tm):
            # static row slices of full-ref reads: Mosaic rejects
            # memref slices whose LANE extent (8 / 1) is not
            # 128-aligned, but value slices at static offsets lower fine
            c8t = c8s_ref[:][ti * tm:(ti + 1) * tm, :]         # (tm, 8)
            cqt = cqs_ref[:][ti * tm:(ti + 1) * tm, :]         # (tm, 1)

            def q_body(c, carry, c8t=c8t, cqt=cqt, r2=r2, s=s, s3=s3,
                       si=si):
                g, off = carry
                xc = jnp.concatenate(
                    [x_ref[pl.ds(c, 1), :], y_ref[pl.ds(c, 1), :],
                     z_ref[pl.ds(c, 1), :],
                     jnp.zeros((5, _LANES), jnp.float32)], axis=0)
                pq = psq_ref[pl.ds(c, 1), :]                   # (1, 128)
                # mirrors ball_query term for term: (q2 + p2) - 2 q.p
                # with a HIGHEST dot (the MXU-truncation rule)
                cross = jax.lax.dot_general(
                    c8t, xc, (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)        # (tm, 128)
                d2 = cqt + pq - 2.0 * cross
                inb = d2 < r2
                inr = inb.astype(jnp.bfloat16)
                cum = jnp.dot(inr, t128,
                              preferred_element_type=jnp.float32)
                rank = off + cum                               # (tm, 128)
                sel = ((rank[:, None, :] == (s3 + 1.0))
                       & inb[:, None, :]).astype(jnp.bfloat16)
                sel2 = sel.reshape(tm * s, _LANES)
                hic = hi_refs[si][pl.ds(c * _LANES, _LANES), :]
                loc = lo_refs[si][pl.ds(c * _LANES, _LANES), :]
                g = (g
                     + jnp.dot(sel2, hic,
                               preferred_element_type=jnp.float32)
                     + jnp.dot(sel2, loc,
                               preferred_element_type=jnp.float32))
                off = off + jnp.sum(inr.astype(jnp.float32), axis=1,
                                    keepdims=True)
                return g, off

            g0 = jnp.zeros((tm * s, c1), jnp.float32)
            off0 = jnp.zeros((tm, 1), jnp.float32)
            g, count = jax.lax.fori_loop(0, nchunks, q_body, (g0, off0))

            # empty-ball rows: the XLA path gathers point 0 into every
            # slot (grouping.py::_first_k_in_radius fallback) — fill
            # slot 0 with point 0's features and keep only it valid
            f1_0 = (hi_refs[si][0:1, :].astype(jnp.float32)
                    + lo_refs[si][0:1, :].astype(jnp.float32))  # (1, C1)
            g3 = g.reshape(tm, s, c1)
            empty = (count == 0.0)[:, :, None]                 # (tm,1,1)
            g3 = jnp.where(slot0 & empty, f1_0[None], g3)
            valid = (s3[..., :1] < count[:, None, :]) | (slot0 & empty)

            cxw = jnp.dot(c8t, w1pads[si][:],
                          preferred_element_type=jnp.float32)  # (tm, C1)
            h = jnp.maximum(g3 + b1[None] - cxw[:, None, :], 0.0)
            h = h.reshape(tm * s, c1)
            for (w, b) in rest_layers[si]:
                h = jnp.maximum(
                    jnp.dot(h, w[:], preferred_element_type=jnp.float32)
                    + b[:], 0.0)
            cw = h.shape[-1]
            h = jnp.where(valid, h.reshape(tm, s, cw), -1e30)
            out_refs[si][0, pl.ds(ti * tm, tm), :] = jnp.max(h, axis=1)


def _pad128(x: int) -> int:
    return -(-x // _LANES) * _LANES


def _flatten_layers(folded_per_scale, cc_pad: int):
    """Per scale: [w1pad8, w1, b1, w2, b2, ...] — see kernel docstring.

    Every lane-facing dimension is zero-padded to a 128 multiple (Mosaic
    requires row-sliced VMEM refs to have lane-aligned extents).  Zero
    padding is EXACT through the whole chain: padded catf columns meet
    padded W1 rows (0 products), padded output channels carry b=0 and
    cxw=0 so relu emits 0, and the next layer's padded rows consume
    those zeros.  The caller slices the padded outputs back down."""
    flat = []
    n_layers = []
    c1s = []
    c_lasts = []
    for layers in folded_per_scale:
        n_layers.append(len(layers))
        w1, b1 = layers[0]
        c1p = _pad128(w1.shape[1])
        c1s.append(c1p)
        c_lasts.append(_pad128(layers[-1][0].shape[1]))
        pad8 = jnp.zeros((8, c1p), jnp.float32)
        flat.append(pad8.at[:3, :w1.shape[1]].set(
            w1[:3].astype(jnp.float32)))
        w1p = jnp.zeros((cc_pad, c1p), jnp.float32)
        flat.append(w1p.at[:w1.shape[0], :w1.shape[1]].set(
            w1.astype(jnp.float32)))
        b1p = jnp.zeros((1, c1p), jnp.float32)
        flat.append(b1p.at[:, :b1.shape[0]].set(
            b1.reshape(1, -1).astype(jnp.float32)))
        cin_p = c1p
        for w, b in layers[1:]:
            cout_p = _pad128(w.shape[1])
            wp = jnp.zeros((cin_p, cout_p), jnp.float32)
            flat.append(wp.at[:w.shape[0], :w.shape[1]].set(
                w.astype(jnp.float32)))
            bp = jnp.zeros((1, cout_p), jnp.float32)
            flat.append(bp.at[:, :b.shape[0]].set(
                b.reshape(1, -1).astype(jnp.float32)))
            cin_p = cout_p
    return flat, tuple(n_layers), tuple(c1s), tuple(c_lasts)


@functools.partial(jax.jit, static_argnames=('npoint', 'radii', 'nsamples',
                                             'n_layers', 'interpret'))
def _sa_level_call(xyz, catf, flat_weights, npoint: int, radii: tuple,
                   nsamples: tuple, n_layers: tuple,
                   interpret: bool = False):
    b, n, _ = xyz.shape
    rows = n // _LANES
    x = xyz[..., 0].reshape(b, rows, _LANES)
    y = xyz[..., 1].reshape(b, rows, _LANES)
    z = xyz[..., 2].reshape(b, rows, _LANES)
    # the SAME expression ball_query uses for p_sq (bit-parity)
    psq = jnp.sum(xyz * xyz, axis=-1).reshape(b, rows, _LANES)

    nscales = len(radii)
    c1s = []
    c_lasts = []
    wi = 0
    for si in range(nscales):
        c1s.append(flat_weights[wi].shape[1])
        last_w = wi + 1 if n_layers[si] == 1 else (
            wi + 3 + 2 * (n_layers[si] - 1) - 2)
        c_lasts.append(flat_weights[last_w].shape[1])
        wi += 3 + 2 * (n_layers[si] - 1)

    kernel = functools.partial(
        _sa_level_kernel, npoint=npoint, rows=rows,
        radii2=tuple(r * r for r in radii), nsamples=nsamples,
        n_layers=n_layers)

    cc = catf.shape[-1]
    in_specs = ([pl.BlockSpec((1, rows, _LANES), lambda bb: (bb, 0, 0))] * 4
                + [pl.BlockSpec((1, n, cc), lambda bb: (bb, 0, 0))]
                + [pl.BlockSpec(w.shape, lambda bb: (0,) * w.ndim)
                   for w in flat_weights])
    out_shapes = ([jax.ShapeDtypeStruct((b, npoint), jnp.int32),
                   jax.ShapeDtypeStruct((b, npoint, 8), jnp.float32)]
                  + [jax.ShapeDtypeStruct((b, npoint, cl), jnp.float32)
                     for cl in c_lasts])
    out_specs = ([pl.BlockSpec((1, npoint), lambda bb: (bb, 0),
                               memory_space=pltpu.SMEM),
                  pl.BlockSpec((1, npoint, 8), lambda bb: (bb, 0, 0))]
                 + [pl.BlockSpec((1, npoint, cl), lambda bb: (bb, 0, 0))
                    for cl in c_lasts])
    scratch = ([pltpu.VMEM((rows, _LANES), jnp.float32),
                pltpu.VMEM((npoint, 8), jnp.float32),
                pltpu.VMEM((npoint, 1), jnp.float32)]
               + [pltpu.VMEM((n, c1), jnp.bfloat16) for c1 in c1s]
               + [pltpu.VMEM((n, c1), jnp.bfloat16) for c1 in c1s])

    nin = 5 + len(flat_weights)

    def body(*refs):
        ins = refs[:nin]
        outs = refs[nin:nin + 2 + nscales]
        scr = refs[nin + 2 + nscales:]
        kernel(ins[0].at[0], ins[1].at[0], ins[2].at[0], ins[3].at[0],
               ins[4].at[0], *ins[5:],
               idx_ref=outs[0], c8_ref=outs[1], out_refs=outs[2:],
               mind_ref=scr[0], c8s_ref=scr[1], cqs_ref=scr[2],
               hi_refs=scr[3:3 + nscales], lo_refs=scr[3 + nscales:])

    res = pl.pallas_call(
        body,
        grid=(b,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shapes,
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, y, z, psq, catf, *flat_weights)
    return res[0], res[1], tuple(res[2:])


def sa_level_fused(xyz: jnp.ndarray, feats: Optional[jnp.ndarray],
                   npoint: int, radii: Sequence[float],
                   nsamples: Sequence[int],
                   folded_per_scale: Sequence[Sequence[Tuple]],
                   interpret: bool = False):
    """Full fused SA level (use_xyz=True).

    :param xyz: (B, N, 3) f32; :param feats: (B, N, C) f32 or None
    :param folded_per_scale: per scale, list of folded (W, b) layers
        (ops/fused_sa.py::fold_pointwise_mlp), W1 of shape (3+C, C1)
    :return: (new_xyz (B, M, 3) f32, pooled (B, M, sum C_last) f32,
        idx (B, M) int32)
    """
    catf = (xyz if feats is None
            else jnp.concatenate([xyz, feats.astype(jnp.float32)], -1))
    cc_pad = _pad128(catf.shape[-1])
    if cc_pad != catf.shape[-1]:
        catf = jnp.pad(catf, ((0, 0), (0, 0),
                              (0, cc_pad - catf.shape[-1])))
    flat, n_layers, _, _ = _flatten_layers(folded_per_scale, cc_pad)
    idx, c8, outs = _sa_level_call(
        xyz, catf, tuple(flat), npoint, tuple(radii), tuple(nsamples),
        n_layers, interpret=interpret)
    out = jnp.concatenate(
        [o[..., :layers[-1][0].shape[1]]
         for o, layers in zip(outs, folded_per_scale)], axis=-1)
    return c8[..., :3], out, idx


def sa_level_supported(n: int, npoint: int, feat_channels: int) -> bool:
    """Shape gate: N a lane multiple, M tileable by the center tile, and
    the catf VMEM table bounded (~6 MB) so the whole working set (catf +
    2 scales of hi/lo tables + per-tile gather blocks) stays well inside
    VMEM.  The production levels 1-3 (4096/1024/256 points) all pass;
    level 0 (N=16384) fails the table bound — and is excluded on cost
    grounds anyway (see PERF_ANALYSIS.md: the one-hot gather at level-0
    shapes burns ~0.5 TFLOP and the slot masks cost ~3.2G VPU element
    passes, both above the XLA path's measured 1.05 ms)."""
    if n % _LANES or n < _LANES or n > 8192:
        return False
    if npoint < 8 or npoint % min(_TM, npoint):
        return False
    return n * (feat_channels + 3) * 4 <= 6 * 2 ** 20


def sa_level_fused_xla(xyz, feats, npoint, radii, nsamples,
                       folded_per_scale):
    """Semantics twin from existing tested ops (the parity oracle)."""
    from jmodt_tpu.ops.fused_sa import fused_sa_eval
    from jmodt_tpu.ops.grouping import ball_query, ball_query_multi
    from jmodt_tpu.ops.sampling import farthest_point_sample, gather_xyz
    idx = farthest_point_sample(xyz, npoint)
    new_xyz = gather_xyz(xyz, idx)
    if len(radii) > 1:
        nbrs = ball_query_multi(tuple(radii), tuple(nsamples), xyz,
                                new_xyz)
    else:
        nbrs = (ball_query(radii[0], nsamples[0], xyz, new_xyz),)
    outs = [fused_sa_eval(xyz, feats, new_xyz, nbr, folded,
                          use_pallas=False)
            for nbr, folded in zip(nbrs, folded_per_scale)]
    out = outs[0] if len(outs) == 1 else jnp.concatenate(outs, -1)
    return new_xyz, out, idx
