"""Checkpoint save/restore tests incl. the strict=False partial-restore
semantics that bootstrap the link/se finetune from a detection-only
checkpoint (reference train_utils.py:31-66)."""

import logging

import numpy as np

from jmodt_tpu.train.checkpoint import (checkpoint_state, load_checkpoint,
                                        save_checkpoint)

logger = logging.getLogger('ckpt_test')
logger.addHandler(logging.NullHandler())


def tree(v1, v2, v3):
    return {'params': {'rpn': {'w': np.full((3, 3), v1, np.float32)},
                       'rcnn': {'link_layer': {'w': np.full(4, v2,
                                                            np.float32)},
                                'cls': {'b': np.full(2, v3, np.float32)}}},
            'batch_stats': {}}


def test_roundtrip(tmp_path):
    state = checkpoint_state(tree(1.0, 2.0, 3.0), opt_state=None,
                             epoch=7, it=123)
    path = save_checkpoint(state, str(tmp_path / 'ckpt'))
    template = tree(0.0, 0.0, 0.0)
    variables, opt, it, epoch = load_checkpoint(path, template, log=logger)
    assert epoch == 7 and it == 123 and opt is None
    np.testing.assert_array_equal(variables['params']['rpn']['w'], 1.0)
    np.testing.assert_array_equal(
        variables['params']['rcnn']['link_layer']['w'], 2.0)


def test_partial_restore_keeps_missing_subtrees(tmp_path):
    # detection-only checkpoint: no link_layer subtree
    saved = tree(5.0, 0.0, 6.0)
    del saved['params']['rcnn']['link_layer']
    path = save_checkpoint(checkpoint_state(saved), str(tmp_path / 'det'))
    template = tree(0.0, 9.0, 0.0)  # link init value 9.0 must survive
    variables, _, _, _ = load_checkpoint(path, template, log=logger)
    np.testing.assert_array_equal(variables['params']['rpn']['w'], 5.0)
    np.testing.assert_array_equal(
        variables['params']['rcnn']['link_layer']['w'], 9.0)


def test_shape_mismatch_keeps_template(tmp_path):
    saved = tree(5.0, 2.0, 6.0)
    saved['params']['rpn']['w'] = np.zeros((2, 2), np.float32)  # wrong shape
    path = save_checkpoint(checkpoint_state(saved), str(tmp_path / 'bad'))
    template = tree(1.0, 0.0, 0.0)
    variables, _, _, _ = load_checkpoint(path, template, log=logger)
    np.testing.assert_array_equal(variables['params']['rpn']['w'], 1.0)
    np.testing.assert_array_equal(
        variables['params']['rcnn']['link_layer']['w'], 2.0)


def test_orbax_async_roundtrip(tmp_path):
    """Async orbax writer: save returns, wait() joins the background IO,
    and load_checkpoint auto-detects the .orbax directory and restores
    through the same strict=False merge."""
    from jmodt_tpu.train.checkpoint import AsyncCheckpointWriter
    writer = AsyncCheckpointWriter()
    try:
        state = checkpoint_state(tree(1.0, 2.0, 3.0), opt_state=None,
                                 epoch=7, it=123)
        path = save_checkpoint(state, str(tmp_path / 'ckpt'), writer=writer)
        assert path.endswith('.orbax')
        writer.wait()
        template = tree(0.0, 0.0, 0.0)
        variables, opt, it, epoch = load_checkpoint(
            str(tmp_path / 'ckpt'), template, log=logger)
        assert epoch == 7 and it == 123 and opt is None
        np.testing.assert_array_equal(variables['params']['rpn']['w'], 1.0)
        np.testing.assert_array_equal(
            variables['params']['rcnn']['link_layer']['w'], 2.0)
    finally:
        writer.close()


def test_orbax_partial_restore(tmp_path):
    """A detection-only orbax checkpoint still bootstraps a template with
    extra heads (strict=False)."""
    from jmodt_tpu.train.checkpoint import AsyncCheckpointWriter
    writer = AsyncCheckpointWriter()
    try:
        partial = {'params': {'rpn': {'w': np.full((3, 3), 5.0,
                                                   np.float32)}},
                   'batch_stats': {}}
        state = checkpoint_state(partial, opt_state=None, epoch=1, it=1)
        save_checkpoint(state, str(tmp_path / 'det_only'), writer=writer)
        writer.wait()
        template = tree(0.0, 7.0, 7.0)
        variables, _, _, _ = load_checkpoint(str(tmp_path / 'det_only'),
                                             template, log=logger)
        np.testing.assert_array_equal(variables['params']['rpn']['w'], 5.0)
        # untouched subtrees keep template values
        np.testing.assert_array_equal(
            variables['params']['rcnn']['cls']['b'], 7.0)
    finally:
        writer.close()
