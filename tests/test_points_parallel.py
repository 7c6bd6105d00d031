"""2-D (data, points) mesh: the train step with the point dimension (and
image width) sharded over the inner axis must compile, execute, and agree
with the pure data-parallel step on the same batch — GSPMD inserts the
collectives; the math is identical up to reduction order.

Runs on the virtual 8-device CPU mesh from tests/conftest.py
(SURVEY.md §4: multi-node testing without a cluster)."""

import jax
import numpy as np
import pytest


@pytest.fixture(scope='module')
def setup():
    import __graft_entry__
    from jmodt_tpu.data.synthetic import make_pair_batch
    from jmodt_tpu.models import PointRCNN
    from jmodt_tpu.train import create_train_state, make_train_step

    cfg = __graft_entry__._small_config()
    batch = make_pair_batch(seed=0, cfg=cfg, num_pairs=4,
                            npoints=cfg.RPN.NUM_POINTS, img_hw=(64, 128))
    model = PointRCNN(cfg, mode='TRAIN')
    init_key, step_key = jax.random.split(jax.random.PRNGKey(0))
    variables = jax.jit(lambda k: model.init(
        k, batch['pts_input'][:2], batch['img'][:2], batch['pts_xy'][:2],
        gt_boxes3d=batch['gt_boxes3d'][:2], gt_tids=batch['gt_tids'][:2],
        sample_key=jax.random.PRNGKey(1), train=True))(init_key)
    state, tx = create_train_state(cfg, variables, steps_per_epoch=10)
    step_fn = make_train_step(cfg, model, tx)
    return cfg, batch, state, step_fn, step_key


def run_on_mesh(mesh, batch, state, step_fn, step_key):
    from jmodt_tpu.parallel import (batch_sharding, replicated_sharding,
                                    shard_batch)
    repl = replicated_sharding(mesh)
    sharded = shard_batch(batch, mesh)
    state = jax.device_put(state, repl)
    step = jax.jit(step_fn,
                   in_shardings=(repl,
                                 {k: batch_sharding(mesh, k) for k in batch},
                                 repl),
                   out_shardings=(repl, repl))
    new_state, metrics = step(state, sharded, jax.device_put(step_key, repl))
    jax.block_until_ready(new_state)
    return new_state, metrics


def test_mesh_2d_shapes():
    from jmodt_tpu.parallel import make_mesh_2d
    mesh = make_mesh_2d(jax.devices()[:8], sp=2)
    assert dict(mesh.shape) == {'data': 4, 'points': 2}
    mesh = make_mesh_2d(jax.devices()[:8], sp=4)
    assert dict(mesh.shape) == {'data': 2, 'points': 4}
    with pytest.raises(AssertionError):
        make_mesh_2d(jax.devices()[:8], sp=3)


def test_batch_sharding_specs():
    from jmodt_tpu.parallel import batch_sharding, make_mesh, make_mesh_2d
    m2 = make_mesh_2d(jax.devices()[:8], sp=2)
    assert batch_sharding(m2, 'pts_input').spec == jax.sharding.PartitionSpec(
        'data', 'points')
    assert batch_sharding(m2, 'img').spec == jax.sharding.PartitionSpec(
        'data', None, 'points')
    assert batch_sharding(m2, 'gt_boxes3d').spec == \
        jax.sharding.PartitionSpec('data')
    m1 = make_mesh(jax.devices()[:8])
    assert batch_sharding(m1, 'pts_input').spec == \
        jax.sharding.PartitionSpec('data')


def test_points_parallel_matches_data_parallel(setup):
    from jmodt_tpu.parallel import make_mesh, make_mesh_2d
    cfg, batch, state, step_fn, step_key = setup

    # dp over 8 needs 8 pairs; use dp=4 1-D mesh vs (4, 2) 2-D mesh so the
    # per-data-shard batch is identical and only the point sharding differs
    s1, m1 = run_on_mesh(make_mesh(jax.devices()[:4]), batch, state,
                         step_fn, step_key)
    s2, m2 = run_on_mesh(make_mesh_2d(jax.devices()[:8], sp=2), batch,
                         state, step_fn, step_key)
    l1, l2 = float(m1['loss']), float(m2['loss'])
    assert np.isfinite(l1) and np.isfinite(l2)
    # identical math modulo reduction order / GSPMD rewrites
    assert l2 == pytest.approx(l1, rel=1e-3)
    assert float(m2['grad_norm']) == pytest.approx(float(m1['grad_norm']),
                                                   rel=1e-2)
    assert int(s2.step) == 1
