"""tools/mot_sweep.py: offline MOT hyper-parameter sweep over persisted
stage-1 detections.  Fabricates a micro KITTI tree (fake_kitti), runs the
eval CLI's stage 1 to persist detections + ReID features, fabricates a
checkpoint holding only the link/se heads, then sweeps a 2x2 grid and
checks the ranking artifact.  Values are meaningless (random weights);
the contract under test is plumbing: head-only checkpoint read, frame
preloading, tracker reuse across host-knob configs, CLEAR-MOT scoring,
and the parametrized eval_tracking MOT knobs staying at reference
defaults when absent (synthetic_ladder's SimpleNamespace path)."""

import json
import logging
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from tests.test_data_layer import fake_kitti  # noqa: F401  (fixture)
from tests.test_full_ladder import load_eval_cli

logger = logging.getLogger('mot_sweep_test')
logger.addHandler(logging.NullHandler())


def test_mot_param_defaults_without_flags():
    """SimpleNamespace callers (synthetic_ladder.py) predate the CLI
    flags: absent attrs must resolve to the reference values
    (reference tools/eval.py:300-319)."""
    mod = load_eval_cli()
    p = mod.mot_params_from_args(types.SimpleNamespace())
    assert p == mod.MOT_PARAM_DEFAULTS
    # explicit None (argparse default) also falls back
    p = mod.mot_params_from_args(types.SimpleNamespace(cls_thresh=None,
                                                       t_miss=5))
    assert p['cls_thresh'] == 0.85 and p['t_miss'] == 5


@pytest.mark.filterwarnings('ignore')
def test_sweep_end_to_end(fake_kitti, tmp_path):  # noqa: F811
    import __graft_entry__
    from jmodt_tpu.data.converter import create_train_sample_data
    from jmodt_tpu.models.rcnn import CorrelationHead
    from jmodt_tpu.train.checkpoint import save_checkpoint

    root = tmp_path / 'data_root'
    root.mkdir()
    os.symlink(fake_kitti, root / 'tracking')
    create_train_sample_data(str(fake_kitti),
                             str(root / 'tracking_object'), num_seqs=20)

    cfg = __graft_entry__._small_config()
    mod = load_eval_cli()
    args = types.SimpleNamespace(
        data_root=str(root), det_output=str(tmp_path / 'det'),
        output_dir=str(tmp_path / 'out'), ckpt=None, tag='ladder',
        hungarian=False, device_tracker=False, batch_seqs=False,
        only_tracking=False, test=False, synthetic_frames=0, small=True,
        max_dets=32, max_tracks=64)
    mod.eval_joint_detection(args, cfg, logger)
    assert os.listdir(tmp_path / 'det' / 'txt')

    # head-only checkpoint: exactly the subtree load_head_params reads
    feat_dim = cfg.RCNN.SA_CONFIG.MLPS[-1][-1]
    x = np.zeros((1, feat_dim), np.float32)
    import jax
    link = CorrelationHead(cfg.REID.LINK_FC, use_bn=cfg.REID.USE_BN).init(
        jax.random.PRNGKey(0), x)['params']
    se = CorrelationHead(cfg.REID.SE_FC, use_bn=cfg.REID.USE_BN).init(
        jax.random.PRNGKey(1), x)['params']
    ckpt = save_checkpoint(
        {'epoch': 0, 'it': 0, 'optimizer_state': None,
         'model_state': {'params': {'rcnn': {'link_layer': link,
                                             'se_layer': se}}}},
        str(tmp_path / 'heads'))

    out = tmp_path / 'sweep'
    argv = ['mot_sweep.py',
            '--det_output', str(tmp_path / 'det'),
            '--data_root', str(root),
            '--ckpt', ckpt,
            '--output_dir', str(out),
            '--grid', json.dumps({'cls_thresh': [0.0, 0.99],
                                  't_miss': [2, 4], 't_hit': [0]})]
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'mot_sweep', os.path.join(os.path.dirname(__file__), '..',
                                  'tools', 'mot_sweep.py'))
    sweep = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sweep)
    old_argv = sys.argv
    try:
        sys.argv = argv
        sweep.main()
    finally:
        sys.argv = old_argv

    res = json.load(open(out / 'sweep_results.json'))
    assert len(res['results']) == 4
    # every config produced per-seq txts in the CLEAR-MOT layout
    for r in res['results']:
        d = out / r['tag'] / 'val'
        assert sorted(p for p in os.listdir(d) if p.endswith('.txt'))
    # at least the permissive-gate configs must score (random weights ->
    # MOTA is garbage but finite); ranking is sorted descending
    scored = [r for r in res['results'] if r['mota'] is not None]
    assert scored, 'no config produced a valid CLEAR-MOT score'
    assert res['best'] is not None
    best = max(scored, key=lambda r: r['mota'])
    assert res['best']['mota'] == best['mota']
    # base params recorded for reproducibility
    assert res['base'] == mod.MOT_PARAM_DEFAULTS

def test_load_tracking_heads_uses_checkpoint_arch(tmp_path):
    """A checkpoint whose head widths differ from cfg (e.g. a --wide
    ladder tree evaluated under --small) must yield the CHECKPOINT's
    architecture and weights — the old cfg-built path silently kept its
    random init on shape mismatch, scoring stage 2 with untrained heads."""
    import jax
    import __graft_entry__
    from jmodt_tpu.models.rcnn import CorrelationHead
    from jmodt_tpu.train.checkpoint import save_checkpoint

    cfg = __graft_entry__._small_config()
    odd_fc = (48, 24)                       # matches no config anywhere
    assert odd_fc != tuple(cfg.REID.LINK_FC)
    x = np.zeros((1, 96), np.float32)
    link = CorrelationHead(odd_fc).init(jax.random.PRNGKey(0), x)['params']
    se = CorrelationHead(odd_fc).init(jax.random.PRNGKey(1), x)['params']
    ckpt = save_checkpoint(
        {'epoch': 0, 'it': 0, 'optimizer_state': None,
         'model_state': {'params': {'rcnn': {'link_layer': link,
                                             'se_layer': se}}}},
        str(tmp_path / 'heads'))

    mod = load_eval_cli()
    link_head, se_head, link_params, se_params = mod.load_tracking_heads(
        cfg, ckpt, logger)
    assert tuple(link_head.hidden) == odd_fc
    assert tuple(se_head.hidden) == odd_fc
    np.testing.assert_array_equal(
        link_params['params']['mlp']['PointwiseLayer_0']['Dense_0']['kernel'],
        link['mlp']['PointwiseLayer_0']['Dense_0']['kernel'])
    # and the heads actually apply at the checkpoint's feature width
    out = link_head.apply(link_params, np.zeros((3, 96), np.float32))
    assert out.shape == (3, 1)
