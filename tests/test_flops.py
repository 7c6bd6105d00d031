"""Analytic FLOP model sanity tests (jmodt_tpu/utils/flops.py)."""

import dataclasses

from jmodt_tpu.config import Config
from jmodt_tpu.utils.flops import detection_flops


def test_components_and_total():
    t = detection_flops(Config(), track_k=16, max_tracks=64)
    for key in ('image_cnn', 'deconv_pyramid', 'rpn_sa_mlps', 'rpn_fp',
                'rpn_heads', 'rcnn', 'li_fusion', 'tracker'):
        assert t[key] > 0, key
    assert t['total'] == sum(v for k, v in t.items() if k != 'total')
    # magnitude anchor: the full program is a few 1e11 FLOPs/frame and
    # must stay below XLA cost_analysis's measured 3.42e11 (which
    # overcounts; BENCH_r02)
    assert 1e11 < t['total'] < 3.42e11


def test_lidar_only_drops_image_terms():
    cfg = Config()
    cfg = dataclasses.replace(
        cfg, LI_FUSION=dataclasses.replace(cfg.LI_FUSION, ENABLED=False))
    t = detection_flops(cfg)
    assert 'image_cnn' not in t and 'li_fusion' not in t
    # image terms are ~45% of the fused total
    assert t['total'] < detection_flops(Config())['total'] * 0.6


def test_scales_with_rois():
    t100 = detection_flops(Config(), rois=100)
    t512 = detection_flops(Config(), rois=512)
    assert t512['rcnn'] > 4 * t100['rcnn']
    assert t512['image_cnn'] == t100['image_cnn']
