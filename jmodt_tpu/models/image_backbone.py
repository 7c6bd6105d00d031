"""Image CNN for LI-Fusion.

TPU rewrite of /root/reference/jmodt/detection/modeling/backbone.py:9-89
(BasicBlock stack, DeConv pyramid, grid-sample feature gather).  Layout is
NHWC (TPU-native); the reference's NCHW permutes away.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

class BasicBlock(nn.Module):
    """conv3x3(s=1) -> BN -> ReLU -> conv3x3(s=2), no bias (reference
    BasicBlock, backbone.py:15-30; each block halves H, W)."""
    features: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (3, 3), strides=(1, 1), padding=1,
                    use_bias=False, dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        x = nn.relu(x)
        x = nn.Conv(self.features, (3, 3), strides=(2, 2), padding=1,
                    use_bias=False, dtype=self.dtype)(x)
        return x


def _bilinear_corners(h: int, w: int, xy: jnp.ndarray):
    """Corner indices, in-map masks and blend weights of a grid_sample
    (align_corners=True, padding_mode='zeros') at full-res size (h, w).

    padding_mode='zeros' (the reference grid_sample default): weights come
    from the UNCLAMPED floor, and each of the four taps contributes zero
    when its pixel lies outside the map — clamping before the weight
    computation would EXTRAPOLATE (weights far outside [0, 1]) for points
    that project outside the image instead of fading them to zero.

    Returns ((u0, u1), (v0, v1), (in_u0, in_u1), (in_v0, in_v1), au, av);
    u/v are clamped int32, au/av float32 with a trailing channel axis.
    """
    # align_corners=True: -1 -> 0, +1 -> size-1
    u = (xy[..., 0] + 1.0) * 0.5 * (w - 1)
    v = (xy[..., 1] + 1.0) * 0.5 * (h - 1)
    u0f = jnp.floor(u)
    v0f = jnp.floor(v)
    au = (u - u0f)[..., None]
    av = (v - v0f)[..., None]

    def clampi(x, hi):
        return jnp.clip(x, 0, hi).astype(jnp.int32)

    uu = (clampi(u0f, w - 1), clampi(u0f + 1, w - 1))
    vv = (clampi(v0f, h - 1), clampi(v0f + 1, h - 1))
    inu = ((u0f >= 0) & (u0f <= w - 1),
           (u0f + 1 >= 0) & (u0f + 1 <= w - 1))
    inv = ((v0f >= 0) & (v0f <= h - 1),
           (v0f + 1 >= 0) & (v0f + 1 <= h - 1))
    return uu, vv, inu, inv, au, av


def feature_gather(feature_map: jnp.ndarray, xy: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling of image features at projected point locations —
    `F.grid_sample(..., align_corners=True)` (reference feature_gather,
    backbone.py:79-89) as explicit gathers.

    :param feature_map: (B, H, W, C)
    :param xy: (B, N, 2) in [-1, 1] normalized to the *fixed* image size
        (kitti_dataset.py:253-255)
    :return: (B, N, C)
    """
    b, h, w, c = feature_map.shape
    (u0i, u1i), (v0i, v1i), (in_u0, in_u1), (in_v0, in_v1), au, av = \
        _bilinear_corners(h, w, xy)
    # interpolation weights in the feature dtype: keeps bf16 feature maps
    # bf16 through the blend instead of promoting every gather to f32
    au = au.astype(feature_map.dtype)
    av = av.astype(feature_map.dtype)

    flat = feature_map.reshape(b, h * w, c)

    def take(vi, ui, ok):
        t = jnp.take_along_axis(flat, (vi * w + ui)[..., None], axis=1)
        return t * ok[..., None].astype(feature_map.dtype)

    f00 = take(v0i, u0i, in_v0 & in_u0)
    f01 = take(v0i, u1i, in_v0 & in_u1)
    f10 = take(v1i, u0i, in_v1 & in_u0)
    f11 = take(v1i, u1i, in_v1 & in_u1)
    top = f00 * (1 - au) + f01 * au
    bot = f10 * (1 - au) + f11 * au
    return top * (1 - av) + bot * av


class NonOverlapDeconv(nn.Module):
    """ConvTranspose with kernel == stride (the pyramid's only case),
    expressed as one matmul + depth-to-space: every output pixel
    (y*k+dy, x*k+dx) is a pure channel map of input pixel (y, x) through
    the (dy, dx) kernel tap, so the whole op is
    (B*H*W, C) @ (C, k*k*R) followed by a reshape — an MXU matmul instead
    of the padded/dilated convolution XLA lowers conv_transpose to.
    Parameter shapes match nn.ConvTranspose ((k, k, C, R) kernel, (R,)
    bias); equality vs nn.ConvTranspose is test-pinned.

    Round-4 carried tap-major / row-major / Pallas depth-to-space
    formulations of this op; the on-chip step-level A/B settled on this
    materialized slice+stack form (PERF_ANALYSIS.md round-4 session 3)
    and the alternates now live only in tools/bench_pyramid.py."""
    features: int
    kernel: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        k, r = self.kernel, self.features
        b, h, w, c = x.shape
        kern = self.param('kernel', nn.initializers.lecun_normal(),
                          (k, k, c, r))
        bias = self.param('bias', nn.initializers.zeros, (r,))
        cdt = self.dtype or x.dtype
        # lax.conv_transpose (transpose_kernel=False) applies the kernel
        # spatially mirrored relative to the output-tap view; flip so the
        # parameters stay bit-compatible with nn.ConvTranspose
        wk = jnp.transpose(kern[::-1, ::-1], (2, 0, 1, 3))  # (c, k, k, r)
        wmat = wk.reshape(c, k * k * r)
        y = (x.reshape(b * h * w, c).astype(cdt) @ wmat.astype(cdt))
        # materialization: per-dy slice + stack instead of the 6-D
        # transpose — identical permutation, but XLA lowers it ~1.5x
        # faster on chip (round-4 pyramid A/B: 2.71 vs 4.02 ms for the
        # full 4-level pyramid + sample; bit-exact, maxerr 0.0)
        y = y.reshape(b, h, w, k, k * r)
        rows = [y[:, :, :, dy, :].reshape(b, h, w * k, r) for dy in range(k)]
        y = jnp.stack(rows, axis=2).reshape(b, h * k, w * k, r)
        return y + bias.astype(cdt)


class ImagePyramidFusion(nn.Module):
    """DeConv each level back to full resolution, concat, 1x1 conv + BN + ReLU
    (reference backbone.py:130-139, 187-196).  The deconvs are
    NonOverlapDeconv (kernel == stride in every config), a matmul
    formulation of the same math.

    With `xy` given (eval only), the full-resolution map is never
    materialized: the fused map exists solely to be bilinearly sampled at
    the projected point locations (reference backbone.py:194-195), so each
    level keeps its tap-major matmul output (B, H*W*k*k, r) in HBM and the
    four bilinear corners gather per-level rows directly; the 1x1 conv, BN
    (running stats) and ReLU then apply to the 4*N gathered rows instead
    of 384x1280 pixels.  relu(BN(.)) runs per PIXEL before the bilinear
    blend and out-of-map corners contribute zero AFTER the relu — exactly
    feature_gather(full_map, xy).  Parameter trees are identical in both
    modes (same submodules, same call order).

    The fused formulation is the round-4 A/B winner 'preconv' (one wide
    4-corner gather of the materialized pre-conv map; detection_step
    22.57 'taps' / 20.47 'preconv' / 21.70 'pallas_d2s' / 22.78
    'stack_mm' ms on chip).  The losing formulations live only in
    tools/bench_pyramid.py as the A/B record."""
    reduce_channels: Sequence[int]
    kernels: Sequence[int]
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, img_levels, train: bool = False, xy=None):
        if xy is None:
            ups = []
            for i, feat in enumerate(img_levels):
                up = NonOverlapDeconv(self.reduce_channels[i],
                                      self.kernels[i],
                                      dtype=self.dtype)(feat)
                ups.append(up)
            x = jnp.concatenate(ups, axis=-1)
            x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype)(x)
            return nn.relu(x)

        # fused gather path (eval: BN must use running stats — batch-stat
        # collection is defined over the full map, which this path skips)
        assert not train, 'fused pyramid gather is an eval-only path'
        return self._wide_gather(img_levels, xy)

    def _wide_gather(self, img_levels, xy):
        """'preconv' fused eval: materialize the PRE-conv concat map
        (R-channel levels only — never the post-conv full-res map),
        gather the four bilinear corners ONCE as wide rows, then
        conv/BN/ReLU on the 4N gathered rows.  Submodule creation order
        matches the materialized path exactly (deconvs, conv, bn)."""
        k0 = self.kernels[0]
        _, h00, w00, _ = img_levels[0].shape
        h, w = h00 * k0, w00 * k0
        cols = []
        for i, feat in enumerate(img_levels):
            k, r = self.kernels[i], self.reduce_channels[i]
            b, h0, w0, _ = feat.shape
            dec = NonOverlapDeconv(r, k, dtype=self.dtype)
            cols.append(dec(feat).reshape(b, h * w, r))
        flat = jnp.concatenate(cols, axis=-1)            # (B, H*W, sum r)
        conv = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)
        bn = nn.BatchNorm(use_running_average=True, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype)

        uu, vv, inu, inv, au, av = _bilinear_corners(h, w, xy)
        idx = jnp.concatenate([vv[ci] * w + uu[cj]
                               for ci in range(2) for cj in range(2)],
                              axis=1)                    # (B, 4N)
        oks = [inv[ci] & inu[cj] for ci in range(2) for cj in range(2)]
        g = jnp.take_along_axis(flat, idx[..., None], axis=1)
        b_, n4, cc = g.shape
        x = conv(g.reshape(b_, n4, 1, cc))
        x = nn.relu(bn(x))[:, :, 0, :]                   # (B, 4N, out)
        n = xy.shape[1]
        f = x.reshape(b_, 4, n, self.out_channels)
        ok = jnp.stack(oks, axis=1)[..., None].astype(f.dtype)
        f = f * ok
        au = au.astype(f.dtype)
        av = av.astype(f.dtype)
        top = f[:, 0] * (1 - au) + f[:, 1] * au
        bot = f[:, 2] * (1 - au) + f[:, 3] * au
        return top * (1 - av) + bot * av
