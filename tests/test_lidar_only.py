"""LiDAR-only mode (LI_FUSION disabled) — BASELINE.json config 1 and the
reference's cfg.LI_FUSION.ENABLED=False path (rpn.py:74-79)."""

import dataclasses

import jax
import numpy as np


def test_lidar_only_eval_forward(rng):
    import __graft_entry__
    from jmodt_tpu.models import PointRCNN

    base = __graft_entry__._small_config()
    cfg = dataclasses.replace(
        base, LI_FUSION=dataclasses.replace(base.LI_FUSION, ENABLED=False))
    n = cfg.RPN.NUM_POINTS
    pts = rng.randn(1, n, 3).astype(np.float32) * 5
    pts[..., 2] += 20
    model = PointRCNN(cfg, mode='EVAL')
    variables = model.init(jax.random.PRNGKey(0), pts, None, None,
                           train=False)
    out = model.apply(variables, pts, None, None, train=False)
    m = cfg.EVAL.RPN_POST_NMS_TOP_N
    assert out['rois'].shape == (1, m, 7)
    assert np.isfinite(np.asarray(out['rcnn_cls'])).all()
    # no image parameters exist in this mode
    flat = jax.tree_util.tree_leaves_with_path(variables['params'])
    names = [jax.tree_util.keystr(p) for p, _ in flat]
    assert not any('img' in s or 'fusion' in s for s in names)
