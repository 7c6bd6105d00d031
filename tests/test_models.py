"""Model stack tests: shape contracts on a scaled-down config (CPU-runnable),
mirroring the reference data-shape trace (SURVEY.md §3.4)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jmodt_tpu.config import (Config, LIFusionConfig, ModeConfig, RCNNConfig,
                              RCNNSAConfig, RPNConfig, SAConfig, TrainConfig)


def small_config(li_fusion=True):
    """A miniature config preserving all structural ratios: 256 points,
    64x128 image, 16 proposals, 8 RoIs/frame, 32 pts/RoI."""
    sa = SAConfig(NPOINTS=(64, 32, 16, 8),
                  RADIUS=((0.1, 0.5), (0.5, 1.0), (1.0, 2.0), (2.0, 4.0)),
                  NSAMPLE=((4, 8), (4, 8), (4, 8), (4, 8)),
                  MLPS=(((8, 8, 16), (8, 8, 16)),
                        ((16, 16, 32), (16, 16, 32)),
                        ((32, 32, 64), (32, 32, 64)),
                        ((64, 64, 128), (64, 64, 128))))
    li = LIFusionConfig(ENABLED=li_fusion, IMG_FEATURES_CHANNEL=32,
                        IMG_CHANNELS=(3, 8, 16, 32, 64),
                        POINT_CHANNELS=(32, 64, 128, 256),
                        DeConv_Reduce=(4, 4, 4, 4))
    rpn = RPNConfig(NUM_POINTS=256, SA_CONFIG=sa,
                    FP_MLPS=((32, 32), (64, 64), (128, 128), (128, 128)),
                    CLS_FC=(32,), REG_FC=(32,))
    rcnn_sa = RCNNSAConfig(NPOINTS=(16, 8, -1), RADIUS=(0.2, 0.4, 100.0),
                           NSAMPLE=(8, 8, 8),
                           MLPS=((32, 32, 32), (32, 32, 64), (64, 64, 128)))
    rcnn = RCNNConfig(NUM_POINTS=32, SA_CONFIG=rcnn_sa, XYZ_UP_LAYER=(32, 32),
                      CLS_FC=(64, 64), REG_FC=(64, 64), ROI_PER_IMAGE=8)
    return Config(
        LI_FUSION=li, RPN=rpn, RCNN=rcnn,
        REID=dataclasses.replace(Config().REID, LINK_FC=(64, 64), SE_FC=(64, 64)),
        TRAIN=TrainConfig(RPN_PRE_NMS_TOP_N=64, RPN_POST_NMS_TOP_N=16),
        EVAL=ModeConfig(SPLIT='val', RPN_PRE_NMS_TOP_N=64,
                        RPN_POST_NMS_TOP_N=16, RPN_NMS_THRESH=0.8),
        TEST=ModeConfig(SPLIT='test', RPN_PRE_NMS_TOP_N=64,
                        RPN_POST_NMS_TOP_N=16, RPN_NMS_THRESH=0.8))


def make_inputs(rng, cfg, b=1, img_hw=(64, 128)):
    n = cfg.RPN.NUM_POINTS
    pts = rng.randn(b, n, 3).astype(np.float32) * 5
    pts[..., 2] += 20  # positive depth so zone-1 proposals exist
    img = rng.randn(b, *img_hw, 3).astype(np.float32)
    xy = rng.uniform(-1, 1, size=(b, n, 2)).astype(np.float32)
    return pts, img, xy


@pytest.fixture(scope='module')
def cfg():
    return small_config()


def test_rpn_forward_shapes(rng, cfg):
    from jmodt_tpu.models.rpn import RPN, rpn_reg_channels
    pts, img, xy = make_inputs(rng, cfg)
    model = RPN(cfg)
    variables = model.init(jax.random.PRNGKey(0), pts, img, xy, train=False)
    out = model.apply(variables, pts, img, xy, train=False)
    n = cfg.RPN.NUM_POINTS
    assert out['rpn_cls'].shape == (1, n, 1)
    assert out['rpn_reg'].shape == (1, n, rpn_reg_channels(cfg))
    assert out['backbone_features'].shape == (1, n, cfg.RPN.FP_MLPS[0][-1])
    # focal prior: initial sigmoid(cls) should be ~0.01
    p = jax.nn.sigmoid(np.asarray(out['rpn_cls']))
    assert 0.001 < p.mean() < 0.1


def test_point_rcnn_eval_forward(rng, cfg):
    from jmodt_tpu.models import PointRCNN
    pts, img, xy = make_inputs(rng, cfg)
    model = PointRCNN(cfg, mode='EVAL')
    variables = model.init(jax.random.PRNGKey(0), pts, img, xy, train=False)
    out = model.apply(variables, pts, img, xy, train=False)
    m = cfg.EVAL.RPN_POST_NMS_TOP_N
    assert out['rois'].shape == (1, m, 7)
    assert out['roi_scores_raw'].shape == (1, m)
    assert out['rcnn_cls'].shape == (m, 1)
    assert out['rcnn_feat'].shape == (m, cfg.RCNN.SA_CONFIG.MLPS[-1][-1])
    assert np.isfinite(np.asarray(out['rcnn_cls'])).all()
    assert np.asarray(out['roi_mask']).sum() >= 1


def test_point_rcnn_train_forward(rng, cfg):
    from jmodt_tpu.models import PointRCNN
    b = 2  # one (prev, next) pair
    pts, img, xy = make_inputs(rng, cfg, b=b)
    g = 4
    gt = np.zeros((b, g, 7), np.float32)
    gt[:, :2] = np.array([[0, 1, 20, 1.5, 1.6, 3.9, 0.3],
                          [3, 1, 25, 1.5, 1.6, 3.9, -0.5]], np.float32)
    tids = np.zeros((b, g), np.float32)
    tids[:, :2] = [[1, 2], [1, 2]]
    model = PointRCNN(cfg, mode='TRAIN')
    variables = model.init(jax.random.PRNGKey(0), pts, img, xy,
                           gt_boxes3d=gt, gt_tids=tids,
                           sample_key=jax.random.PRNGKey(1), train=True)
    out = model.apply(variables, pts, img, xy, gt_boxes3d=gt, gt_tids=tids,
                      sample_key=jax.random.PRNGKey(1), train=True,
                      rngs={'dropout': jax.random.PRNGKey(2)},
                      mutable=['batch_stats'])[0]
    r = b * cfg.RCNN.ROI_PER_IMAGE
    assert out['rcnn_cls'].shape == (r, 1)
    assert out['targets'].cls_label.shape == (r,)
    assert out['reid_link'].shape[0] == b // 2
    assert np.isfinite(np.asarray(out['reid_link'])).all()


def test_decode_encode_roundtrip(rng):
    """Golden property: decoding the one-hot encoding of a target recovers it
    (bin codec round trip, SURVEY.md §4 item 2)."""
    from jmodt_tpu.models.bbox_codec import decode_bbox_target
    cfg = Config()
    anchor = jnp.asarray(cfg.mean_size)
    n = 32
    loc_scope, loc_bin_size, nhb = 1.5, 0.5, 9
    per_bin = int(loc_scope / loc_bin_size) * 2

    centers = rng.uniform(-1.2, 1.2, (n, 2)).astype(np.float32)  # x, z offsets
    y_off = rng.uniform(-0.3, 0.3, n).astype(np.float32)
    sizes = (np.asarray(anchor) * rng.uniform(0.9, 1.1, (n, 3))).astype(np.float32)
    ry = rng.uniform(-np.pi / 4 + 0.05, np.pi / 4 - 0.05, n).astype(np.float32)

    # build the regression vector that encodes these targets exactly
    reg = np.zeros((n, per_bin * 4 + nhb * 2 + 3 + 1), np.float32)
    BIG = 20.0
    for i in range(n):
        for (v, bl, rl) in ((centers[i, 0], 0, per_bin * 2),
                            (centers[i, 1], per_bin, per_bin * 3)):
            shift = np.clip(v + loc_scope, 0, 2 * loc_scope - 1e-3)
            b = int(shift / loc_bin_size)
            res = (shift - (b * loc_bin_size + loc_bin_size / 2)) / loc_bin_size
            reg[i, bl + b] = BIG
            reg[i, rl:rl + per_bin] = res  # same residual in every bin slot
        reg[i, per_bin * 4] = y_off[i]
        ang_per = (np.pi / 2) / nhb
        shift_angle = np.clip(ry[i] + np.pi / 4, 1e-3, np.pi / 2 - 1e-3)
        b = int(shift_angle / ang_per)
        res = (shift_angle - (b * ang_per + ang_per / 2)) / (ang_per / 2)
        reg[i, per_bin * 4 + 1 + b] = BIG
        reg[i, per_bin * 4 + 1 + nhb + b] = res
        reg[i, per_bin * 4 + 1 + 2 * nhb:] = (sizes[i] - np.asarray(anchor)) / np.asarray(anchor)

    roi = np.zeros((n, 3), np.float32)
    out = decode_bbox_target(jnp.asarray(roi), jnp.asarray(reg), anchor,
                             loc_scope, loc_bin_size, nhb, get_ry_fine=True,
                             avg_by_bin=True, ry_with_bin=False)
    out = np.asarray(out)
    # BIG logit makes softmax one-hot to ~1e-9; residual identical across bins
    np.testing.assert_allclose(out[:, 0], centers[:, 0], atol=2e-3)
    np.testing.assert_allclose(out[:, 2], centers[:, 1], atol=2e-3)
    np.testing.assert_allclose(out[:, 1], y_off, atol=1e-5)
    np.testing.assert_allclose(out[:, 3:6], sizes, rtol=1e-4)
    np.testing.assert_allclose(out[:, 6], ry, atol=2e-3)


def test_decode_argmax_mode(rng):
    """Hard-argmax decode path (avg_by_bin=False)."""
    from jmodt_tpu.models.bbox_codec import decode_bbox_target
    cfg = Config()
    anchor = jnp.asarray(cfg.mean_size)
    reg = rng.randn(8, 6 * 4 + 9 * 2 + 4).astype(np.float32)
    roi = rng.randn(8, 7).astype(np.float32)
    out = decode_bbox_target(jnp.asarray(roi), jnp.asarray(reg), anchor,
                             1.5, 0.5, 9, get_ry_fine=True,
                             avg_by_bin=False, ry_with_bin=False)
    assert out.shape == (8, 7)
    assert np.isfinite(np.asarray(out)).all()


def test_nonoverlap_deconv_matches_conv_transpose(rng):
    """NonOverlapDeconv (matmul + depth-to-space) == nn.ConvTranspose with
    the same parameters, for every pyramid kernel size."""
    import flax.linen as fnn
    from jmodt_tpu.models.image_backbone import NonOverlapDeconv
    for k in (2, 4, 8, 16):
        x = jnp.asarray(rng.randn(2, 6, 10, 8).astype(np.float32))
        mine = NonOverlapDeconv(4, k)
        mv = mine.init(jax.random.PRNGKey(k), x)
        ref = fnn.ConvTranspose(4, (k, k), strides=(k, k))
        a = mine.apply(mv, x)
        b = ref.apply({'params': dict(mv['params'])}, x)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
