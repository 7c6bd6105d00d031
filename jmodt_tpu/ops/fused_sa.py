"""Eval-time fused single-scale set abstraction: BN folding + restructured
group->MLP->max with the first Dense hoisted before the gather.

Math (all linear algebra, no approximation beyond float reassociation):

    SA level:  out[b, m] = max_s MLP(concat[xyz[idx] - center, feats[idx]])
    Layer 1 is Dense (+ eval BatchNorm = per-channel affine), so with
    catf = concat[xyz, feats] (per POINT, not per group sample):

        h1 = relu( gather(catf @ W1')[b,m,s] + b1' - (center @ W1'[:3])[b,m] )

    where (W1', b1') fold the BN running stats into the Dense kernel.
    The (B, N, C) @ (C, C1) matmul runs once per point instead of once per
    group sample (S-fold FLOP cut on layer 1) and — more importantly on
    TPU — the gathered (B, M, S, C) tensor never exists at the wide input
    width.  The remaining layers + max-pool run either through the Pallas
    VMEM kernel (jmodt_tpu/ops/pallas/grouped_gather_mlp.py) or an XLA
    fallback with identical math.

Reference: /root/reference/jmodt/ops/pointnet2/pointnet2_modules.py:356-390;
BatchNorm fold is the standard inference-time identity
    y = scale * (x - mean) / sqrt(var + eps) + bias
      = x * s + (bias - mean * s),   s = scale / sqrt(var + eps).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from jmodt_tpu.ops.grouping import group_points_fl
from jmodt_tpu.ops.pallas.grouped_gather_mlp import grouped_gather_mlp_max

_BN_EPS = 1e-5


def fold_pointwise_mlp(params: dict, batch_stats: Optional[dict]
                       ) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], ...]:
    """Fold a PointwiseMLP's Dense(+BatchNorm) stack into per-layer (W, b).

    :param params: the module's 'params' subtree
        {'PointwiseLayer_i': {'Dense_0': ..., 'BatchNorm_0': ...}}
    :param batch_stats: matching 'batch_stats' subtree (None if use_bn=False)
    :return: tuple of (W (Cin, Cout) f32, b (Cout,) f32)
    """
    out = []
    for i in range(len(params)):
        layer = params[f'PointwiseLayer_{i}']
        w = layer['Dense_0']['kernel'].astype(jnp.float32)
        if 'BatchNorm_0' in layer:
            bn = layer['BatchNorm_0']
            st = batch_stats[f'PointwiseLayer_{i}']['BatchNorm_0']
            s = (bn['scale'].astype(jnp.float32)
                 * jax.lax.rsqrt(st['var'].astype(jnp.float32) + _BN_EPS))
            b = (bn['bias'].astype(jnp.float32)
                 - st['mean'].astype(jnp.float32) * s)
            w = w * s[None, :]
        else:
            b = layer['Dense_0']['bias'].astype(jnp.float32)
        out.append((w, b))
    return tuple(out)


def fused_sa_eval(xyz: jnp.ndarray, feats: Optional[jnp.ndarray],
                  new_xyz: jnp.ndarray, idx: jnp.ndarray,
                  layers: Sequence[Tuple[jnp.ndarray, jnp.ndarray]],
                  use_pallas: Optional[bool] = None) -> jnp.ndarray:
    """One single-scale use_xyz=True SA level on folded eval weights.

    :param xyz: (B, N, 3) f32 point coords
    :param feats: (B, N, C) point features, or None (xyz-only level, e.g.
        the RPN backbone's first SA level — reference
        pointnet2_modules.py:356-390 with features=None)
    :param new_xyz: (B, M, 3) f32 centers
    :param idx: (B, M, S) int32 ball-query indices
    :param layers: folded (W, b) per MLP layer, W1 (3+C, C1) first
    :return: (B, M, C_last) f32
    """
    (w1, b1), rest = layers[0], layers[1:]
    catf = (xyz if feats is None
            else jnp.concatenate([xyz, feats.astype(jnp.float32)], axis=-1))
    feats1 = catf @ w1                       # (B, N, C1) — pre-gather Dense
    cxw = new_xyz @ w1[:3]                   # (B, M, C1) center correction
    if use_pallas is None:
        # auto: Pallas only at lane-sized clouds; sub-128-point levels
        # (miniature test configs) take the XLA form of the same math
        use_pallas = (jax.default_backend() == 'tpu'
                      and xyz.shape[1] >= 128)
    if use_pallas:
        return grouped_gather_mlp_max(feats1, idx, cxw, b1, tuple(rest))
    # XLA fallback — same math, grouped intermediates in HBM
    g = group_points_fl(feats1, idx)         # (B, M, S, C1)
    h = jnp.maximum(g + b1 - cxw[:, :, None, :], 0.0)
    for w, b in rest:
        h = jnp.maximum(h @ w + b, 0.0)
    return jnp.max(h, axis=2)
