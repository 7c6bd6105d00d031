"""Shared flax building blocks.

Replaces the torch helpers in /root/reference/jmodt/ops/pointnet2/
pytorch_utils.py (SharedMLP / Conv1d / Conv2d / FC).  Every reference
"Conv1d/Conv2d with kernel_size 1" is a pointwise channel map, so here it is
an `nn.Dense` over a feature-*last* layout — the idiomatic TPU layout that
lets XLA batch the channel matmuls straight onto the MXU instead of emulating
channel-first convolutions.

Ordering matches _ConvBase (pytorch_utils.py:36-103): conv -> BN -> activation,
bias only when BN is off.  BatchNorm uses torch defaults (momentum 0.1 ->
flax momentum 0.9, eps 1e-5).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax.numpy as jnp
from flax import linen as nn


def compute_dtype(cfg) -> Any:
    """Network compute dtype from cfg.DTYPE (the AMP analog — see
    config.py).  Params always stay float32 (flax param_dtype default);
    BatchNorm statistics are computed in f32 by flax regardless."""
    return jnp.bfloat16 if cfg.DTYPE == 'bfloat16' else jnp.float32


class PointwiseLayer(nn.Module):
    """Dense -> optional BN -> optional activation, on (..., C) tensors.
    `dtype` is the compute dtype (None = f32 promotion); params stay f32."""
    features: int
    use_bn: bool = False
    activation: Callable | None = nn.relu
    kernel_init: Callable = nn.initializers.kaiming_normal()
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Dense(self.features, use_bias=not self.use_bn,
                     kernel_init=self.kernel_init, dtype=self.dtype)(x)
        if self.use_bn:
            x = nn.BatchNorm(use_running_average=not train,
                             momentum=0.9, epsilon=1e-5, dtype=self.dtype)(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


class PointwiseMLP(nn.Module):
    """Stack of PointwiseLayer — the SharedMLP equivalent
    (pytorch_utils.py:6-33). All layers ReLU-activated."""
    features: Sequence[int]
    use_bn: bool = False
    kernel_init: Callable = nn.initializers.kaiming_normal()
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for f in self.features:
            x = PointwiseLayer(f, use_bn=self.use_bn,
                               kernel_init=self.kernel_init,
                               dtype=self.dtype)(x, train=train)
        return x


class HeadMLP(nn.Module):
    """Hidden pointwise layers + linear output head, with the reference's
    dropout insertion after the first layer (rpn.py:224-225, rcnn.py:51-52:
    `layers.insert(1, nn.Dropout(p))`).

    :param hidden: hidden widths (cfg *_FC lists)
    :param out_features: final linear width
    :param dp_ratio: dropout prob after the first hidden layer (0 disables)
    :param out_bias_init / out_kernel_init: overrides for the focal-init cls
        bias (rpn.py:259-262) and the std-0.001 reg head (rpn.py:264,
        rcnn.py:134).
    """
    hidden: Sequence[int]
    out_features: int
    use_bn: bool = False
    dp_ratio: float = 0.0
    kernel_init: Callable = nn.initializers.kaiming_normal()
    out_kernel_init: Callable | None = None
    out_bias_init: Callable = nn.initializers.zeros
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, f in enumerate(self.hidden):
            x = PointwiseLayer(f, use_bn=self.use_bn,
                               kernel_init=self.kernel_init,
                               dtype=self.dtype)(x, train=train)
            if i == 0 and self.dp_ratio > 0:
                x = nn.Dropout(self.dp_ratio, deterministic=not train)(x)
        out_init = self.out_kernel_init or self.kernel_init
        # head outputs feed losses / proposal decode: always emit f32
        return nn.Dense(self.out_features, kernel_init=out_init,
                        bias_init=self.out_bias_init,
                        dtype=self.dtype)(x).astype(jnp.float32)


def normal_init(stddev: float):
    return nn.initializers.normal(stddev)


def constant_init(value: float):
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)
    return init
