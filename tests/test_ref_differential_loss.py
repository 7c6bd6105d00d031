"""Reference-differential tests for the loss library.

Runs the reference's OWN torch losses (/root/reference/jmodt/utils/
loss_utils.py — pure torch, importable with an easydict stub) against
jmodt_tpu/losses.py on randomized inputs: DiceLoss, the sigmoid focal
classification loss, and the full bin-based `get_reg_loss` across both
IOU_LOSS_TYPE branches, use_cls_score, RPN/RCNN angle modes, y-by-bin,
and per-row (SIZE_RES_ON_ROI-style) anchor sizes.  The training objective
is where silent sign/offset bugs hide; this pins every component
(loc/angle/size/iou) to the reference's numeric values.
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
def ref_lu():
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
    # the reference builds one-hot buffers with torch.cuda.FloatTensor
    # (loss_utils.py:146 etc.) — alias the CPU constructors for the test
    saved = {n: getattr(torch.cuda, n, None)
             for n in ('FloatTensor', 'LongTensor', 'ByteTensor')}
    torch.cuda.FloatTensor = torch.FloatTensor
    torch.cuda.LongTensor = torch.LongTensor
    torch.cuda.ByteTensor = torch.ByteTensor
    import jmodt.utils.loss_utils as lu
    yield lu
    for n, v in saved.items():
        if v is None:
            delattr(torch.cuda, n)
        else:
            setattr(torch.cuda, n, v)


def test_dice_loss_differential(ref_lu):
    from jmodt_tpu.losses import dice_loss
    rng = np.random.RandomState(0)
    logits = rng.randn(500).astype(np.float32) * 3
    target = rng.choice([0.0, 1.0, -1.0], size=500,
                        p=[0.45, 0.45, 0.1]).astype(np.float32)
    ref = ref_lu.DiceLoss(ignore_target=-1)(
        torch.from_numpy(logits), torch.from_numpy(target)).item()
    ours = float(dice_loss(logits, target, ignore_target=-1))
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_focal_loss_differential(ref_lu):
    from jmodt_tpu.losses import sigmoid_focal_loss
    rng = np.random.RandomState(1)
    logits = rng.randn(300).astype(np.float32) * 4
    target = (rng.rand(300) > 0.7).astype(np.float32)
    weights = rng.rand(300).astype(np.float32)
    ref = ref_lu.SigmoidFocalClassificationLoss(gamma=2.0, alpha=0.25)(
        torch.from_numpy(logits), torch.from_numpy(target),
        torch.from_numpy(weights)).numpy()
    ours = np.asarray(sigmoid_focal_loss(logits, target, weights))
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


LOC_SCOPE, LOC_BIN, HEAD_BIN = 1.5, 0.5, 12
ANCHOR = np.array([1.526, 1.629, 3.882], np.float32)


def _make_inputs(seed, n, get_y_by_bin, get_ry_fine):
    rng = np.random.RandomState(seed)
    per_loc = int(LOC_SCOPE / LOC_BIN) * 2
    c = per_loc * 4
    c += (int(0.5 / 0.25) * 2) * 2 if get_y_by_bin else 1
    c += HEAD_BIN * 2 + 3
    pred_reg = rng.randn(n, c).astype(np.float32)
    reg_label = rng.randn(n, 7).astype(np.float32)
    reg_label[:, 0] *= 0.8   # dx, dz roughly within the scope
    reg_label[:, 2] *= 0.8
    reg_label[:, 3:6] = ANCHOR * (1 + 0.2 * rng.randn(n, 3).astype(np.float32))
    if get_ry_fine:
        # canonical RCNN labels: ry within +-pi/4 of the roi heading
        reg_label[:, 6] = (rng.rand(n).astype(np.float32) - 0.5) * (np.pi / 3)
    else:
        reg_label[:, 6] = (rng.rand(n).astype(np.float32) * 2 - 1) * np.pi
    cls_score = rng.rand(n).astype(np.float32)
    return pred_reg, reg_label, cls_score


@pytest.mark.parametrize('iou_type', ['raw', 'cls_mask_with_bin'])
@pytest.mark.parametrize('use_cls_score', [False, True])
@pytest.mark.parametrize('get_ry_fine', [False, True])
def test_reg_loss_differential(ref_lu, iou_type, use_cls_score, get_ry_fine):
    import jax.numpy as jnp

    from jmodt_tpu.losses import get_reg_loss

    from jmodt.config import cfg as ref_cfg
    ref_cfg.TRAIN.IOU_LOSS_TYPE = iou_type

    n = 64
    pred_reg, reg_label, cls_score = _make_inputs(
        hash((iou_type, use_cls_score, get_ry_fine)) % 1000, n,
        False, get_ry_fine)
    ref_loc, ref_ang, ref_size, ref_iou, _ = ref_lu.get_reg_loss(
        torch.from_numpy(cls_score), torch.from_numpy(pred_reg),
        torch.from_numpy(reg_label), LOC_SCOPE, LOC_BIN, HEAD_BIN,
        torch.from_numpy(ANCHOR), get_xz_fine=True, get_y_by_bin=False,
        get_ry_fine=get_ry_fine, use_cls_score=use_cls_score)
    out = get_reg_loss(
        jnp.asarray(cls_score), jnp.asarray(pred_reg),
        jnp.asarray(reg_label), jnp.ones((n,), bool), LOC_SCOPE, LOC_BIN,
        HEAD_BIN, jnp.asarray(ANCHOR), get_xz_fine=True,
        get_y_by_bin=False, get_ry_fine=get_ry_fine,
        use_cls_score=use_cls_score, iou_loss_type=iou_type)
    np.testing.assert_allclose(float(out.loc_loss), ref_loc.item(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.angle_loss), ref_ang.item(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.size_loss), ref_size.item(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.iou_loss), ref_iou.item(),
                               rtol=1e-4, atol=1e-5)


def test_reg_loss_differential_roi_anchor(ref_lu):
    """Per-row anchor sizes (SIZE_RES_ON_ROI).

    NOTE get_y_by_bin=True is untestable against the reference: its own
    code crashes there (`y_offset_l` unbound at loss_utils.py:236 once the
    iou term reads pred_y — the branch is dead in every reference config,
    cfg.RCNN.LOC_Y_BY_BIN defaults False)."""
    import jax.numpy as jnp

    from jmodt_tpu.losses import get_reg_loss

    from jmodt.config import cfg as ref_cfg
    ref_cfg.TRAIN.IOU_LOSS_TYPE = 'raw'

    n = 48
    pred_reg, reg_label, cls_score = _make_inputs(7, n, False, False)
    rng = np.random.RandomState(8)
    anchor_rows = (ANCHOR * (1 + 0.1 * rng.randn(n, 3))).astype(np.float32)
    ref_loc, ref_ang, ref_size, ref_iou, _ = ref_lu.get_reg_loss(
        torch.from_numpy(cls_score), torch.from_numpy(pred_reg),
        torch.from_numpy(reg_label), LOC_SCOPE, LOC_BIN, HEAD_BIN,
        torch.from_numpy(anchor_rows), get_xz_fine=True, get_y_by_bin=False,
        get_ry_fine=False, use_cls_score=False)
    out = get_reg_loss(
        jnp.asarray(cls_score), jnp.asarray(pred_reg),
        jnp.asarray(reg_label), jnp.ones((n,), bool), LOC_SCOPE, LOC_BIN,
        HEAD_BIN, jnp.asarray(anchor_rows), get_xz_fine=True,
        get_y_by_bin=False, get_ry_fine=False, use_cls_score=False,
        iou_loss_type='raw')
    np.testing.assert_allclose(float(out.loc_loss), ref_loc.item(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.angle_loss), ref_ang.item(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.size_loss), ref_size.item(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.iou_loss), ref_iou.item(),
                               rtol=1e-4, atol=1e-5)


def test_reg_loss_fg_mask_equals_reference_row_selection(ref_lu):
    """Our fg_mask formulation == the reference's fancy-indexed subset."""
    import jax.numpy as jnp

    from jmodt_tpu.losses import get_reg_loss

    from jmodt.config import cfg as ref_cfg
    ref_cfg.TRAIN.IOU_LOSS_TYPE = 'raw'

    n = 80
    pred_reg, reg_label, cls_score = _make_inputs(11, n, False, False)
    fg = np.random.RandomState(12).rand(n) > 0.4
    ref_loc, ref_ang, ref_size, ref_iou, _ = ref_lu.get_reg_loss(
        torch.from_numpy(cls_score[fg]), torch.from_numpy(pred_reg[fg]),
        torch.from_numpy(reg_label[fg]), LOC_SCOPE, LOC_BIN, HEAD_BIN,
        torch.from_numpy(ANCHOR), get_xz_fine=True, get_y_by_bin=False,
        get_ry_fine=False, use_cls_score=False)
    out = get_reg_loss(
        jnp.asarray(cls_score), jnp.asarray(pred_reg),
        jnp.asarray(reg_label), jnp.asarray(fg), LOC_SCOPE, LOC_BIN,
        HEAD_BIN, jnp.asarray(ANCHOR), get_xz_fine=True,
        get_y_by_bin=False, get_ry_fine=False, use_cls_score=False,
        iou_loss_type='raw')
    np.testing.assert_allclose(float(out.loc_loss), ref_loc.item(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.angle_loss), ref_ang.item(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.size_loss), ref_size.item(),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(float(out.iou_loss), ref_iou.item(),
                               rtol=1e-4, atol=1e-5)
