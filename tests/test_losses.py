"""Loss-library oracle tests: perfect bin-encoded predictions drive each
regression term to ~zero (reference get_reg_loss, loss_utils.py:91-355),
plus focal/dice sanity."""

import numpy as np
import jax.numpy as jnp

from jmodt_tpu.losses import (dice_loss, get_reg_loss, sigmoid_focal_loss,
                              smooth_l1)


def perfect_reg_vector(target, anchor, loc_scope=1.5, loc_bin_size=0.5,
                       nhb=9):
    """Encode a target [dx, dy, dz, h, w, l, ry] into the regression layout
    so that decoding recovers it exactly (hard one-hot bins)."""
    per_bin = int(loc_scope / loc_bin_size) * 2
    reg = np.zeros(per_bin * 4 + nhb * 2 + 3 + 1, np.float32)
    BIG = 30.0
    for v, bl, rl in ((target[0], 0, per_bin * 2),
                      (target[2], per_bin, per_bin * 3)):
        shift = np.clip(v + loc_scope, 0, 2 * loc_scope - 1e-3)
        b = int(shift / loc_bin_size)
        res = (shift - (b * loc_bin_size + loc_bin_size / 2)) / loc_bin_size
        reg[bl + b] = BIG
        reg[rl + b] = res
    reg[per_bin * 4] = target[1]  # y offset
    ang_per = (np.pi / 2) / nhb
    ry = target[6] % (2 * np.pi)
    if np.pi * 0.5 < ry < np.pi * 1.5:
        ry = (ry + np.pi) % (2 * np.pi)
    shift_angle = np.clip((ry + np.pi * 0.5) % (2 * np.pi) - np.pi * 0.25,
                          1e-3, np.pi * 0.5 - 1e-3)
    b = int(shift_angle / ang_per)
    res = (shift_angle - (b * ang_per + ang_per / 2)) / (ang_per / 2)
    reg[per_bin * 4 + 1 + b] = BIG
    reg[per_bin * 4 + 1 + nhb + b] = res
    reg[per_bin * 4 + 1 + 2 * nhb:] = (target[3:6] - anchor) / anchor
    return reg


def test_perfect_prediction_near_zero_loss():
    anchor = np.array([1.52, 1.63, 3.88], np.float32)
    rng = np.random.RandomState(0)
    n = 16
    targets = np.zeros((n, 7), np.float32)
    targets[:, 0] = rng.uniform(-1.2, 1.2, n)
    targets[:, 1] = rng.uniform(-0.3, 0.3, n)
    targets[:, 2] = rng.uniform(-1.2, 1.2, n)
    targets[:, 3:6] = anchor * rng.uniform(0.95, 1.05, (n, 3))
    targets[:, 6] = rng.uniform(-np.pi / 4 + 0.05, np.pi / 4 - 0.05, n)
    reg = np.stack([perfect_reg_vector(t, anchor) for t in targets])

    out = get_reg_loss(
        cls_score=jnp.ones(n), pred_reg=jnp.asarray(reg),
        reg_label=jnp.asarray(targets), fg_mask=jnp.ones(n, bool),
        loc_scope=1.5, loc_bin_size=0.5, num_head_bin=9,
        anchor_size=jnp.asarray(anchor), get_ry_fine=True,
        use_cls_score=True, iou_loss_type='raw')
    # CE against a BIG-logit one-hot -> ~0; residuals exact -> 0
    assert float(out.loc_loss) < 1e-3
    assert float(out.angle_loss) < 1e-3
    assert float(out.size_loss) < 1e-6
    # perfect boxes: IoU ~1 -> -log(iou) ~ 0
    assert float(out.iou_loss) < 1e-2

    # corrupting the predictions must raise every term
    bad = get_reg_loss(
        cls_score=jnp.ones(n),
        pred_reg=jnp.asarray(reg + rng.randn(*reg.shape).astype(np.float32)),
        reg_label=jnp.asarray(targets), fg_mask=jnp.ones(n, bool),
        loc_scope=1.5, loc_bin_size=0.5, num_head_bin=9,
        anchor_size=jnp.asarray(anchor), get_ry_fine=True,
        use_cls_score=True, iou_loss_type='raw')
    assert float(bad.loc_loss) > float(out.loc_loss)
    assert float(bad.size_loss) > float(out.size_loss)


def test_focal_loss_downweights_easy():
    logits = jnp.asarray([8.0, 0.0])   # easy positive, hard positive
    targets = jnp.asarray([1.0, 1.0])
    w = jnp.ones(2)
    loss = np.asarray(sigmoid_focal_loss(logits, targets, w))
    assert loss[0] < loss[1] * 1e-3  # easy example nearly free


def test_dice_loss_extremes():
    logits = jnp.asarray([20.0, -20.0, 20.0])
    assert float(dice_loss(logits, jnp.asarray([1.0, 0.0, 1.0]))) < 1e-3
    assert float(dice_loss(logits, jnp.asarray([0.0, 1.0, 0.0]))) > 0.99


def test_smooth_l1_branches():
    d = jnp.asarray([0.5, 2.0])
    np.testing.assert_allclose(np.asarray(smooth_l1(d, jnp.zeros(2))),
                               [0.125, 1.5])


def test_per_row_anchor_size_res_on_roi():
    """SIZE_RES_ON_ROI (train_functions.py:245-246): get_reg_loss accepts
    (N, 3) per-row anchors; encoding each row's size residuals against its
    own anchor still zeroes the size loss, and per-row anchors equal to the
    mean reproduce the (3,)-anchor result exactly."""
    mean = np.array([1.52, 1.63, 3.88], np.float32)
    rng = np.random.RandomState(1)
    n = 8
    anchors = mean * rng.uniform(0.7, 1.3, (n, 3)).astype(np.float32)
    targets = np.zeros((n, 7), np.float32)
    targets[:, 0] = rng.uniform(-1.2, 1.2, n)
    targets[:, 1] = rng.uniform(-0.3, 0.3, n)
    targets[:, 2] = rng.uniform(-1.2, 1.2, n)
    targets[:, 3:6] = anchors * rng.uniform(0.9, 1.1, (n, 3))
    targets[:, 6] = rng.uniform(-np.pi / 4 + 0.05, np.pi / 4 - 0.05, n)
    reg = np.stack([perfect_reg_vector(t, a)
                    for t, a in zip(targets, anchors)])
    out = get_reg_loss(
        cls_score=jnp.ones(n), pred_reg=jnp.asarray(reg),
        reg_label=jnp.asarray(targets), fg_mask=jnp.ones(n, bool),
        loc_scope=1.5, loc_bin_size=0.5, num_head_bin=9,
        anchor_size=jnp.asarray(anchors), get_ry_fine=True,
        use_cls_score=True, iou_loss_type='raw')
    assert float(out.size_loss) < 1e-6
    assert float(out.iou_loss) < 1e-2

    # (N, 3) anchors all equal to the mean == (3,) mean anchor, bit for bit
    reg_m = np.stack([perfect_reg_vector(t, mean) for t in targets])
    a = get_reg_loss(
        cls_score=jnp.ones(n), pred_reg=jnp.asarray(reg_m),
        reg_label=jnp.asarray(targets), fg_mask=jnp.ones(n, bool),
        loc_scope=1.5, loc_bin_size=0.5, num_head_bin=9,
        anchor_size=jnp.asarray(mean), get_ry_fine=True,
        use_cls_score=True, iou_loss_type='raw')
    b = get_reg_loss(
        cls_score=jnp.ones(n), pred_reg=jnp.asarray(reg_m),
        reg_label=jnp.asarray(targets), fg_mask=jnp.ones(n, bool),
        loc_scope=1.5, loc_bin_size=0.5, num_head_bin=9,
        anchor_size=jnp.asarray(np.tile(mean, (n, 1))), get_ry_fine=True,
        use_cls_score=True, iou_loss_type='raw')
    assert float(a.size_loss) == float(b.size_loss)
    assert float(a.iou_loss) == float(b.iou_loss)


def test_reg_loss_optimum_decodes_to_gt():
    """Cross-consistency of the LOSS channel layout with the DECODER's:
    a prediction optimized to minimize get_reg_loss must decode to the gt
    box exactly (same bins, residual scaling, angle convention).  Guards
    against a silently permuted head layout — training would reduce the
    loss while eval decodes garbage."""
    import jax
    import jax.numpy as jnp
    from jmodt_tpu.losses import get_reg_loss
    from jmodt_tpu.models.bbox_codec import decode_bbox_target

    loc_scope, loc_bin_size, nbin = 3.0, 0.5, 12
    anchor = jnp.asarray([1.52563191, 1.62856739, 3.8831164])
    dx, dy, dz, ry = 1.3, -0.2, -1.7, 2.4
    h, w, l = 1.6, 1.7, 4.1
    reg_label = jnp.asarray([[dx, dy, dz, h, w, l, ry]], jnp.float32)
    fg = jnp.ones((1,), bool)

    def loss_fn(p):
        out = get_reg_loss(jnp.ones((1,)), p, reg_label, fg,
                           loc_scope, loc_bin_size, nbin, anchor,
                           get_xz_fine=True, get_ry_fine=False,
                           use_cls_score=False, iou_loss_type='raw')
        return out.loc_loss + out.angle_loss + 3 * out.size_loss

    step = jax.jit(lambda p: p - 0.1 * jax.grad(loss_fn)(p))
    pred = jnp.zeros((1, 76), jnp.float32)
    for _ in range(2500):
        pred = step(pred)
    dec = np.asarray(decode_bbox_target(
        jnp.zeros((1, 7)), pred, anchor_size=anchor, loc_scope=loc_scope,
        loc_bin_size=loc_bin_size, num_head_bin=nbin, get_xz_fine=True,
        get_y_by_bin=False, get_ry_fine=False, avg_by_bin=False,
        ry_with_bin=False))[0]
    np.testing.assert_allclose(dec[:6], [dx, dy, dz, h, w, l], atol=0.02)
    ry_err = abs(((dec[6] - ry + np.pi) % (2 * np.pi)) - np.pi)
    assert ry_err < 0.02, ry_err
