"""Mixed-precision (cfg.DTYPE='bfloat16') coverage: the AMP analog
(reference train_utils.py:124-143).  Params and head outputs must stay f32,
backbone activations must actually be bf16, and a training step must produce
finite f32 gradients whose values track the f32 run closely."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def small_cfg(dtype):
    import __graft_entry__
    base = __graft_entry__._small_config()
    return dataclasses.replace(base, DTYPE=dtype)


def test_dtype_defaults_and_env_knob():
    from jmodt_tpu.config import Config
    # conftest sets JMODT_DTYPE=float32 for the suite
    assert Config().DTYPE == 'float32'
    assert dataclasses.replace(Config(), DTYPE='bfloat16').DTYPE == 'bfloat16'


def test_backbone_computes_in_bf16_params_stay_f32():
    from jmodt_tpu.data.synthetic import make_eval_frame
    from jmodt_tpu.models import PointRCNN
    cfg = small_cfg('bfloat16')
    model = PointRCNN(cfg, mode='EVAL')
    frame = make_eval_frame(seed=0, cfg=cfg, npoints=cfg.RPN.NUM_POINTS,
                            img_hw=(64, 128))
    variables = jax.jit(lambda k: model.init(
        k, frame['pts_input'], frame['img'], frame['pts_xy'],
        train=False))(jax.random.PRNGKey(0))
    # master params all f32
    for leaf in jax.tree_util.tree_leaves(variables['params']):
        assert leaf.dtype == jnp.float32, leaf.dtype
    out = jax.jit(lambda v: model.apply(
        v, frame['pts_input'], frame['img'], frame['pts_xy'],
        train=False))(variables)
    # backbone features are bf16 (the memory/bandwidth carrier) ...
    assert out['backbone_features'].dtype == jnp.bfloat16
    # ... while every head / loss-facing output is f32
    for k in ('rpn_cls', 'rpn_reg', 'rcnn_cls', 'rcnn_reg', 'rcnn_feat'):
        assert out[k].dtype == jnp.float32, (k, out[k].dtype)
    assert np.isfinite(np.asarray(out['rcnn_cls'])).all()


@pytest.mark.parametrize('seed', [0])
def test_bf16_train_step_matches_f32_closely(seed):
    """Same init, same batch: the bf16 loss and grad norm must land in the
    same ballpark as the f32 run.  Tolerances are loose because bf16
    backbone noise can flip discrete choices downstream (proposal NMS
    ordering, RoI fg/bg sampling), which legitimately moves the loss;
    actual bf16 convergence is covered by the overfit test run with
    JMODT_DTYPE=bfloat16 (and was green on the full suite)."""
    from jmodt_tpu.data.synthetic import make_pair_batch
    from jmodt_tpu.models import PointRCNN
    from jmodt_tpu.train import create_train_state, make_train_step

    results = {}
    for dtype in ('float32', 'bfloat16'):
        cfg = small_cfg(dtype)
        batch = make_pair_batch(seed=seed, cfg=cfg, num_pairs=1,
                                npoints=cfg.RPN.NUM_POINTS, img_hw=(64, 128))
        model = PointRCNN(cfg, mode='TRAIN')
        init_key, step_key = jax.random.split(jax.random.PRNGKey(seed))
        variables = jax.jit(lambda k: model.init(
            k, batch['pts_input'], batch['img'], batch['pts_xy'],
            gt_boxes3d=batch['gt_boxes3d'], gt_tids=batch['gt_tids'],
            sample_key=jax.random.PRNGKey(1), train=True))(init_key)
        state, tx = create_train_state(cfg, variables, steps_per_epoch=10)
        step = jax.jit(make_train_step(cfg, model, tx))
        state, metrics = step(state, batch, step_key)
        # gradients (via the param update) stay f32
        for leaf in jax.tree_util.tree_leaves(state.params):
            assert leaf.dtype == jnp.float32
        results[dtype] = (float(metrics['loss']), float(metrics['grad_norm']))
    l32, g32 = results['float32']
    l16, g16 = results['bfloat16']
    assert np.isfinite([l16, g16]).all()
    assert l16 == pytest.approx(l32, rel=0.5)
    assert g16 == pytest.approx(g32, rel=2.0)
