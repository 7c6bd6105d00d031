"""Train-step tests: loss composition, finetune masking, one full optimizer
step (CPU), and the data-parallel sharded step on the virtual 8-device mesh
(SURVEY.md §4: the TPU analog of multi-node tests without a cluster)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jmodt_tpu.config import Config


@pytest.fixture(scope='module')
def small_cfg():
    import __graft_entry__
    return __graft_entry__._small_config()


@pytest.fixture(scope='module')
def batch(small_cfg):
    from jmodt_tpu.data.synthetic import make_pair_batch
    return make_pair_batch(seed=0, cfg=small_cfg, num_pairs=1,
                           img_hw=(64, 128))


def test_synthetic_batch_contract(small_cfg, batch):
    n = small_cfg.RPN.NUM_POINTS
    assert batch['pts_input'].shape == (2, n, 3)
    assert batch['rpn_cls_label'].shape == (2, n)
    assert batch['rpn_reg_label'].shape == (2, n, 7)
    # both frames of the pair share track ids
    assert (batch['gt_tids'][0] == batch['gt_tids'][1]).all()
    assert (batch['gt_tids'][0] > 0).sum() >= 2
    # cars produce foreground points
    assert (batch['rpn_cls_label'] > 0).sum() > 50
    # fg reg targets point at box centers: offsets bounded by box diagonal
    fg = batch['rpn_cls_label'][0] > 0
    assert np.abs(batch['rpn_reg_label'][0][fg][:, :3]).max() < 4.0


def test_rpn_loss_decreases_on_perfect_logits(small_cfg, batch):
    from jmodt_tpu.train.train_step import rpn_loss_fn
    n = small_cfg.RPN.NUM_POINTS
    label = jnp.asarray(batch['rpn_cls_label'])
    good = jnp.where(label > 0, 10.0, -10.0)[..., None]
    bad = -good
    reg = jnp.zeros((2, n, 76))
    reg_label = jnp.asarray(batch['rpn_reg_label'])
    loss_good, _ = rpn_loss_fn(small_cfg, good, reg, label, reg_label)
    loss_bad, _ = rpn_loss_fn(small_cfg, bad, reg, label, reg_label)
    assert float(loss_good) < float(loss_bad)


def test_nan_inputs_do_not_poison_loss(small_cfg, batch):
    from jmodt_tpu.train.train_step import rpn_loss_fn
    n = small_cfg.RPN.NUM_POINTS
    label = jnp.asarray(batch['rpn_cls_label'])
    cls = jnp.zeros((2, n, 1)).at[0, 0, 0].set(jnp.nan)
    reg = jnp.zeros((2, n, 76)).at[0, :, 0].set(jnp.inf)
    loss, tb = rpn_loss_fn(small_cfg, cls, reg, label,
                           jnp.asarray(batch['rpn_reg_label']))
    assert np.isfinite(float(loss))


def test_trainable_mask_finetune():
    from jmodt_tpu.train.train_step import trainable_mask
    cfg = Config()  # FINETUNE=True by default
    params = {'rpn': {'k': 0}, 'rcnn': {'link_layer': {'k': 0},
                                        'se_layer': {'k': 0},
                                        'cls_head': {'k': 0}}}
    mask = trainable_mask(cfg, params)
    assert mask['rcnn']['link_layer']['k'] and mask['rcnn']['se_layer']['k']
    assert not mask['rpn']['k'] and not mask['rcnn']['cls_head']['k']

    full = dataclasses.replace(
        cfg, TRAIN=dataclasses.replace(cfg.TRAIN, FINETUNE=False),
        RPN=dataclasses.replace(cfg.RPN, FIXED=False))
    mask = trainable_mask(full, params)
    assert all(jax.tree_util.tree_leaves(mask))


def test_full_train_step(small_cfg, batch):
    from jmodt_tpu.models import PointRCNN
    from jmodt_tpu.train import create_train_state, make_train_step

    model = PointRCNN(small_cfg, mode='TRAIN')
    variables = jax.jit(lambda k: model.init(
        k, batch['pts_input'], batch['img'], batch['pts_xy'],
        gt_boxes3d=batch['gt_boxes3d'], gt_tids=batch['gt_tids'],
        sample_key=jax.random.PRNGKey(1), train=True))(jax.random.PRNGKey(0))
    state, tx = create_train_state(small_cfg, variables, steps_per_epoch=10)
    step = jax.jit(make_train_step(small_cfg, model, tx))

    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    new_state, tb = step(state, jbatch, jax.random.PRNGKey(7))
    assert np.isfinite(float(tb['loss']))
    assert int(new_state.step) == 1
    # params actually moved (FINETUNE=False in the small config)
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))),
        state.params, new_state.params)
    assert max(jax.tree_util.tree_leaves(moved)) > 0

    # second step with same compiled fn
    new_state2, tb2 = step(new_state, jbatch, jax.random.PRNGKey(8))
    assert np.isfinite(float(tb2['loss']))


def test_finetune_step_freezes_detector(small_cfg, batch):
    """Regression: optax.masked passes raw gradients through for
    mask=False leaves — without an explicit set_to_zero the 'frozen'
    detector trunk receives unscaled gradient ASCENT (observed: a
    100-epoch link/se finetune grew the frozen RCNN xyz_up kernels from
    |W|=1.3 to 138 through the link-loss backprop).  After one finetune
    step every non-link/se parameter must be bit-identical."""
    from jmodt_tpu.models import PointRCNN
    from jmodt_tpu.train import create_train_state, make_train_step

    cfg = dataclasses.replace(
        small_cfg,
        TRAIN=dataclasses.replace(small_cfg.TRAIN, FINETUNE=True),
        RPN=dataclasses.replace(small_cfg.RPN, FIXED=True))
    model = PointRCNN(cfg, mode='TRAIN')
    variables = jax.jit(lambda k: model.init(
        k, batch['pts_input'], batch['img'], batch['pts_xy'],
        gt_boxes3d=batch['gt_boxes3d'], gt_tids=batch['gt_tids'],
        sample_key=jax.random.PRNGKey(1), train=True))(jax.random.PRNGKey(0))
    state, tx = create_train_state(cfg, variables, steps_per_epoch=10)
    step = jax.jit(make_train_step(cfg, model, tx))

    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    new_state, tb = step(state, jbatch, jax.random.PRNGKey(7))
    assert np.isfinite(float(tb['loss']))

    from flax.traverse_util import flatten_dict
    old = flatten_dict(state.params)
    new = flatten_dict(new_state.params)
    moved_frozen, moved_heads = [], []
    for k in old:
        path = '/'.join(str(p) for p in k)
        delta = float(jnp.max(jnp.abs(old[k] - new[k])))
        if 'link_layer' in path or 'se_layer' in path:
            moved_heads.append(delta)
        elif delta != 0.0:
            moved_frozen.append((path, delta))
    assert not moved_frozen, f'frozen params moved: {moved_frozen[:5]}'
    assert max(moved_heads) > 0, 'link/se heads never trained'


def test_finetune_fused_sa_never_picks_pallas(small_cfg, batch, monkeypatch):
    """Regression (round-4 ladder stage-3 crash): with cfg.RPN.FIXED the
    RPN runs eval-mode (train=False) inside a differentiated apply, and the
    fused-SA gate used to resolve use_pallas=None -> Pallas on TPU.  The
    Pallas kernel defines no JVP, and jax.grad linearizes the whole forward
    (the RPN params carry tangents even though the optimizer mask freezes
    them afterwards) -> 'Linearization failed to produce known values for
    all output primals'.  CPU tests never caught it because use_pallas=None
    resolves to the XLA form off-TPU.  Assert the under_grad plumbing pins
    use_pallas=False for every fused-SA call in a finetune train step."""
    import jmodt_tpu.models.pointnet2 as pn2
    from jmodt_tpu.models import PointRCNN
    from jmodt_tpu.train import create_train_state, make_train_step

    seen = []
    real = pn2.fused_sa_eval

    def spy(*args, use_pallas=None, **kw):
        seen.append(use_pallas)
        return real(*args, use_pallas=use_pallas, **kw)

    monkeypatch.setattr(pn2, 'fused_sa_eval', spy)

    cfg = dataclasses.replace(
        small_cfg,
        TRAIN=dataclasses.replace(small_cfg.TRAIN, FINETUNE=True),
        RPN=dataclasses.replace(small_cfg.RPN, FIXED=True, FUSED_SA=True))
    model = PointRCNN(cfg, mode='TRAIN')
    variables = jax.jit(lambda k: model.init(
        k, batch['pts_input'], batch['img'], batch['pts_xy'],
        gt_boxes3d=batch['gt_boxes3d'], gt_tids=batch['gt_tids'],
        sample_key=jax.random.PRNGKey(1), train=True))(jax.random.PRNGKey(0))
    state, tx = create_train_state(cfg, variables, steps_per_epoch=10)
    # no jit: the spy must observe the trace-time static use_pallas values
    step = make_train_step(cfg, model, tx)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    _, tb = step(state, jbatch, jax.random.PRNGKey(7))
    assert np.isfinite(float(tb['loss']))
    assert seen, 'fused-SA path never ran — gate moved? test is stale'
    assert all(p is False for p in seen), \
        f'fused_sa_eval called with use_pallas={set(seen)} under grad'


def test_finetune_fused_pyramid_stays_materialized(small_cfg, batch,
                                                   monkeypatch):
    """Same hazard class as the fused-SA gate (ADVICE r4 medium): with
    cfg.RPN.FIXED the backbone runs train=False inside jax.grad; the
    FUSED_PYRAMID gate must also test under_grad so the formulation
    choice stays stable under AD (and any future non-differentiable
    fused-path optimization stays safe)."""
    import jmodt_tpu.models.image_backbone as ib
    from jmodt_tpu.models import PointRCNN
    from jmodt_tpu.train import create_train_state, make_train_step

    called = []
    real = ib.ImagePyramidFusion._wide_gather

    def spy(self, img_levels, xy):
        called.append(True)
        return real(self, img_levels, xy)

    monkeypatch.setattr(ib.ImagePyramidFusion, '_wide_gather', spy)

    cfg = dataclasses.replace(
        small_cfg,
        TRAIN=dataclasses.replace(small_cfg.TRAIN, FINETUNE=True),
        RPN=dataclasses.replace(small_cfg.RPN, FIXED=True),
        LI_FUSION=dataclasses.replace(small_cfg.LI_FUSION,
                                      FUSED_PYRAMID=True))
    model = PointRCNN(cfg, mode='TRAIN')
    variables = jax.jit(lambda k: model.init(
        k, batch['pts_input'], batch['img'], batch['pts_xy'],
        gt_boxes3d=batch['gt_boxes3d'], gt_tids=batch['gt_tids'],
        sample_key=jax.random.PRNGKey(1), train=True))(jax.random.PRNGKey(0))
    state, tx = create_train_state(cfg, variables, steps_per_epoch=10)
    step = make_train_step(cfg, model, tx)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    _, tb = step(state, jbatch, jax.random.PRNGKey(7))
    assert np.isfinite(float(tb['loss']))
    assert not called, \
        'fused pyramid gather ran inside a differentiated finetune apply'


def test_dryrun_multichip_8():
    import __graft_entry__
    __graft_entry__.dryrun_multichip(8)
