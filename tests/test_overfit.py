"""Training-health test: the full train step overfits one synthetic batch
— total loss must drop substantially, proving gradients flow end-to-end
through backbone, fusion, RPN, RoI sampling, RCNN and ReID heads."""

import jax
import numpy as np


def test_overfit_single_batch():
    import __graft_entry__
    from jmodt_tpu.data.synthetic import make_pair_batch
    from jmodt_tpu.models import PointRCNN
    from jmodt_tpu.train import create_train_state, make_train_step

    cfg = __graft_entry__._small_config()  # FINETUNE=False, RPN trainable
    batch = make_pair_batch(seed=0, cfg=cfg, num_pairs=1, img_hw=(64, 128))
    jbatch = {k: v for k, v in batch.items() if k != 'sample_id'}

    model = PointRCNN(cfg, mode='TRAIN')
    variables = jax.jit(lambda k: model.init(
        k, batch['pts_input'], batch['img'], batch['pts_xy'],
        gt_boxes3d=batch['gt_boxes3d'], gt_tids=batch['gt_tids'],
        sample_key=jax.random.PRNGKey(1), train=True))(jax.random.PRNGKey(0))
    state, tx = create_train_state(cfg, variables, steps_per_epoch=1000)
    step = jax.jit(make_train_step(cfg, model, tx))

    key = jax.random.PRNGKey(7)
    losses = []
    for i in range(30):
        state, tb = step(state, jbatch, key)
        losses.append(float(tb['loss']))
    assert all(np.isfinite(losses)), losses
    first = np.mean(losses[:3])
    last = np.mean(losses[-3:])
    # ~25% drop in 30 steps at lr 2e-4 is the observed healthy trajectory
    assert last < 0.85 * first, \
        f'loss did not drop: {first:.3f} -> {last:.3f}'
    # rpn cls loss specifically must improve (backbone gradients flow)
    assert float(tb['rpn_loss_cls']) < first
