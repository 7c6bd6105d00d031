"""Reference-differential tests for the bbox decoder and image sampler.

Runs the reference's OWN torch code — `decode_bbox_target`
(/root/reference/jmodt/utils/bbox_transform.py:27-213, pure torch) and
`F.grid_sample` (the kernel behind its `feature_gather`,
detection/modeling/backbone.py:79-89) — against this repo's
`models/bbox_codec.py` and `models/image_backbone.py::feature_gather` on
randomized inputs, across every config branch combination the reference
supports (BBOX_AVG_BY_BIN x RY_WITH_BIN x get_ry_fine x get_y_by_bin).
The decode math is THE AP-critical numeric path: a one-bin offset or a
flipped residual sign silently wrecks 3D AP while every shape stays right.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip('torch')

REF = '/root/reference'


@pytest.fixture(scope='module')
def ref_bt():
    if not os.path.isdir(REF):
        pytest.skip('reference checkout not available')
    if 'easydict' not in sys.modules:
        class EasyDict(dict):
            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

            def __setattr__(self, k, v):
                self[k] = v

        ed = types.ModuleType('easydict')
        ed.EasyDict = EasyDict
        sys.modules['easydict'] = ed
    if REF not in sys.path:
        sys.path.insert(0, REF)
    # the reference assumes CUDA tensors: .get_device() -> index for .to()
    saved = torch.Tensor.get_device
    torch.Tensor.get_device = lambda self: 'cpu'
    import jmodt.utils.bbox_transform as bt
    yield bt
    torch.Tensor.get_device = saved


LOC_SCOPE, LOC_BIN, HEAD_BIN = 1.5, 0.5, 12
ANCHOR = np.array([1.526, 1.629, 3.882], np.float32)


def _reg_channels(get_xz_fine, get_y_by_bin):
    per_loc = int(LOC_SCOPE / LOC_BIN) * 2
    c = per_loc * (4 if get_xz_fine else 2)
    c += (int(0.5 / 0.25) * 2) * 2 if get_y_by_bin else 1
    return c + HEAD_BIN * 2 + 3


@pytest.mark.parametrize('avg_by_bin', [False, True])
@pytest.mark.parametrize('ry_with_bin', [False, True])
@pytest.mark.parametrize('get_ry_fine', [False, True])
@pytest.mark.parametrize('get_y_by_bin', [False, True])
def test_decode_differential(ref_bt, avg_by_bin, ry_with_bin, get_ry_fine,
                             get_y_by_bin):
    import jax.numpy as jnp

    from jmodt_tpu.models.bbox_codec import decode_bbox_target

    from jmodt.config import cfg as ref_cfg
    ref_cfg.TRAIN.BBOX_AVG_BY_BIN = ref_cfg.EVAL.BBOX_AVG_BY_BIN = avg_by_bin
    ref_cfg.TRAIN.RY_WITH_BIN = ref_cfg.EVAL.RY_WITH_BIN = ry_with_bin

    rng = np.random.RandomState(
        avg_by_bin * 8 + ry_with_bin * 4 + get_ry_fine * 2 + get_y_by_bin)
    n = 64
    roi = rng.randn(n, 7).astype(np.float32)
    roi[:, 3:6] = np.abs(roi[:, 3:6]) + 1.0
    reg = (rng.randn(n, _reg_channels(True, get_y_by_bin))
           .astype(np.float32))

    ref = ref_bt.decode_bbox_target(
        torch.from_numpy(roi), torch.from_numpy(reg),
        LOC_SCOPE, LOC_BIN, HEAD_BIN, torch.from_numpy(ANCHOR),
        get_xz_fine=True, get_y_by_bin=get_y_by_bin,
        get_ry_fine=get_ry_fine).numpy()
    ours = np.asarray(decode_bbox_target(
        jnp.asarray(roi), jnp.asarray(reg), jnp.asarray(ANCHOR),
        LOC_SCOPE, LOC_BIN, HEAD_BIN, get_xz_fine=True,
        get_y_by_bin=get_y_by_bin, get_ry_fine=get_ry_fine,
        avg_by_bin=avg_by_bin, ry_with_bin=ry_with_bin))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_decode_differential_anchor_points(ref_bt):
    """RPN decode: 3-dim anchor points instead of 7-dim RoIs (no
    canonical un-rotation)."""
    import jax.numpy as jnp

    from jmodt_tpu.models.bbox_codec import decode_bbox_target

    from jmodt.config import cfg as ref_cfg
    ref_cfg.TRAIN.BBOX_AVG_BY_BIN = ref_cfg.EVAL.BBOX_AVG_BY_BIN = False
    ref_cfg.TRAIN.RY_WITH_BIN = ref_cfg.EVAL.RY_WITH_BIN = False

    rng = np.random.RandomState(99)
    n = 128
    pts = rng.randn(n, 3).astype(np.float32) * 10
    reg = rng.randn(n, _reg_channels(True, False)).astype(np.float32)
    ref = ref_bt.decode_bbox_target(
        torch.from_numpy(pts), torch.from_numpy(reg),
        LOC_SCOPE, LOC_BIN, HEAD_BIN, torch.from_numpy(ANCHOR),
        get_xz_fine=True, get_y_by_bin=False, get_ry_fine=False).numpy()
    ours = np.asarray(decode_bbox_target(
        jnp.asarray(pts), jnp.asarray(reg), jnp.asarray(ANCHOR),
        LOC_SCOPE, LOC_BIN, HEAD_BIN, get_xz_fine=True,
        get_y_by_bin=False, get_ry_fine=False, avg_by_bin=False,
        ry_with_bin=False))
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_feature_gather_vs_grid_sample():
    """Bilinear image sampling == F.grid_sample(align_corners=True) for
    in-range coords (the product domain: pts_xy is normalized to the
    fixed image size and only in-image points carry the fusion flag)."""
    import torch.nn.functional as F

    from jmodt_tpu.models.image_backbone import feature_gather

    rng = np.random.RandomState(0)
    fmap = rng.randn(2, 24, 40, 8).astype(np.float32)       # NHWC
    xy = (rng.rand(2, 300, 2) * 2 - 1).astype(np.float32)   # in [-1, 1]

    ref = F.grid_sample(
        torch.from_numpy(np.transpose(fmap, (0, 3, 1, 2))),  # NCHW
        torch.from_numpy(xy).unsqueeze(1),                   # (B, 1, N, 2)
        align_corners=True).squeeze(2).numpy()               # (B, C, N)
    ours = np.asarray(feature_gather(fmap, xy))              # (B, N, C)
    np.testing.assert_allclose(np.transpose(ours, (0, 2, 1)), ref,
                               rtol=1e-5, atol=1e-5)

    # exact grid corners / edges
    corners = np.array([[[-1, -1], [1, 1], [-1, 1], [1, -1], [0, 0]]],
                       np.float32)
    ref = F.grid_sample(
        torch.from_numpy(np.transpose(fmap[:1], (0, 3, 1, 2))),
        torch.from_numpy(corners).unsqueeze(1),
        align_corners=True).squeeze(2).numpy()
    ours = np.asarray(feature_gather(fmap[:1], corners))
    np.testing.assert_allclose(np.transpose(ours, (0, 2, 1)), ref,
                               rtol=1e-5, atol=1e-5)


def test_feature_gather_out_of_range_zero_pads():
    """padding_mode='zeros' (the reference grid_sample default): points
    projecting OUTSIDE the image fade to zero tap-by-tap instead of
    extrapolating from clamped edge pixels."""
    import torch.nn.functional as F

    from jmodt_tpu.models.image_backbone import feature_gather

    rng = np.random.RandomState(7)
    fmap = rng.randn(1, 16, 24, 4).astype(np.float32) + 3.0  # offset: no
    # accidental zeros masking a wrong blend
    xy = (rng.rand(1, 400, 2) * 6 - 3).astype(np.float32)    # in [-3, 3]
    # include exact boundary and just-outside values
    xy[0, :8] = [[-1, -1], [1, 1], [-1.0001, 0], [1.0001, 0],
                 [0, -1.0001], [0, 1.0001], [-3, -3], [3, 3]]
    ref = F.grid_sample(
        torch.from_numpy(np.transpose(fmap, (0, 3, 1, 2))),
        torch.from_numpy(xy).unsqueeze(1),
        mode='bilinear', padding_mode='zeros',
        align_corners=True).squeeze(2).numpy()
    ours = np.asarray(feature_gather(fmap, xy))
    np.testing.assert_allclose(np.transpose(ours, (0, 2, 1)), ref,
                               rtol=1e-4, atol=1e-5)
