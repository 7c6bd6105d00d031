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
    # align_corners=True: -1 -> 0, +1 -> size-1
    u = (xy[..., 0] + 1.0) * 0.5 * (w - 1)
    v = (xy[..., 1] + 1.0) * 0.5 * (h - 1)
    # padding_mode='zeros' (the reference grid_sample default): weights come
    # from the UNCLAMPED floor, and each of the four taps contributes zero
    # when its pixel lies outside the map — clamping before the weight
    # computation would EXTRAPOLATE (weights far outside [0, 1]) for points
    # that project outside the image instead of fading them to zero
    u0f = jnp.floor(u)
    v0f = jnp.floor(v)
    # interpolation weights in the feature dtype: keeps bf16 feature maps
    # bf16 through the blend instead of promoting every gather to f32
    au = (u - u0f)[..., None].astype(feature_map.dtype)
    av = (v - v0f)[..., None].astype(feature_map.dtype)

    def clampi(x, hi):
        return jnp.clip(x, 0, hi).astype(jnp.int32)

    u0i, u1i = clampi(u0f, w - 1), clampi(u0f + 1, w - 1)
    v0i, v1i = clampi(v0f, h - 1), clampi(v0f + 1, h - 1)
    in_u0 = (u0f >= 0) & (u0f <= w - 1)
    in_u1 = (u0f + 1 >= 0) & (u0f + 1 <= w - 1)
    in_v0 = (v0f >= 0) & (v0f <= h - 1)
    in_v1 = (v0f + 1 >= 0) & (v0f + 1 <= h - 1)

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
    bias); equality vs nn.ConvTranspose is test-pinned."""
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
        wmat = jnp.transpose(kern[::-1, ::-1], (2, 0, 1, 3)).reshape(
            c, k * k * r)
        y = (x.reshape(b * h * w, c).astype(cdt) @ wmat.astype(cdt))
        y = y.reshape(b, h, w, k, k, r)
        y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, h * k, w * k, r)
        return y + bias.astype(cdt)


class ImagePyramidFusion(nn.Module):
    """DeConv each level back to full resolution, concat, 1x1 conv + BN + ReLU
    (reference backbone.py:130-139, 187-196).  The deconvs are
    NonOverlapDeconv (kernel == stride in every config), a matmul
    formulation of the same math."""
    reduce_channels: Sequence[int]
    kernels: Sequence[int]
    out_channels: int
    dtype: Any = None

    @nn.compact
    def __call__(self, img_levels, train: bool = False):
        ups = []
        for i, feat in enumerate(img_levels):
            up = NonOverlapDeconv(self.reduce_channels[i], self.kernels[i],
                                  dtype=self.dtype)(feat)
            ups.append(up)
        x = jnp.concatenate(ups, axis=-1)
        x = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype)(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype)(x)
        return nn.relu(x)
