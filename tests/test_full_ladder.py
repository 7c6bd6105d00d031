"""The full no-data parity ladder on a fabricated KITTI tree: raw tracking
data -> converter -> eval CLI stage 1 (detection forward, KITTI writers,
recall counters, official AP) -> stage 2 (lockstep multi-sequence device
tracking) -> CLEAR-MOT.  This is exactly the pipeline a real-data round
would run (reference tools/eval.py end to end), executed with a fresh-init
small model — metric VALUES are meaningless (random weights), but every
stage must run, produce well-formed artifacts, and hand off to the next."""

import logging
import os
import sys
import types

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from tests.test_data_layer import fake_kitti  # noqa: F401  (fixture)

logger = logging.getLogger('ladder')
logger.addHandler(logging.NullHandler())


def load_eval_cli():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'eval_cli', os.path.join(os.path.dirname(__file__), '..',
                                 'tools', 'eval.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.filterwarnings('ignore')
def test_full_ladder(fake_kitti, tmp_path):  # noqa: F811
    import dataclasses
    import __graft_entry__
    from jmodt_tpu.data.converter import create_train_sample_data

    # data_root layout the eval CLI expects: tracking/ (raw) +
    # tracking_object/ (converter output)
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
        hungarian=False, device_tracker=True, batch_seqs=True,
        only_tracking=False, test=False, synthetic_frames=0, small=True,
        max_dets=32, max_tracks=64)

    # ---- stage 1: detection + writers + recall + official AP ----
    mod.eval_joint_detection(args, cfg, logger)
    txts = sorted(os.listdir(tmp_path / 'det' / 'txt'))
    feats = sorted(os.listdir(tmp_path / 'det' / 'feat'))
    assert len(txts) == 8 and len(feats) == 8  # both seqs, 4 frames each
    # any written row must round-trip through Object3d
    from jmodt_tpu.utils.object3d import Object3d
    rows = 0
    for t in txts:
        for line in open(tmp_path / 'det' / 'txt' / t):
            o = Object3d(line)
            assert np.isfinite(o.box3d).all()
            rows += 1
    # feature files align with txt rows
    for t, f in zip(txts, feats):
        n_txt = sum(1 for _ in open(tmp_path / 'det' / 'txt' / t))
        arr = np.load(tmp_path / 'det' / 'feat' / f)
        assert arr.shape[0] == n_txt

    # ---- stage 2: lockstep tracking over the val sequences ----
    mod.eval_tracking(args, cfg, logger)
    trk_dir = tmp_path / 'out' / 'ladder' / 'val'
    seq_txts = sorted(p for p in os.listdir(trk_dir) if p.endswith('.txt'))
    # one txt per val sequence in seq2sample (sequences absent from the
    # fabricated tree are legitimately empty)
    assert '0000.txt' in seq_txts and '0019.txt' in seq_txts
    for t in seq_txts:
        for line in open(trk_dir / t):
            fields = line.split()
            assert len(fields) >= 17 and fields[2] == 'Car'
            int(fields[0]), int(fields[1])  # frame, tid parse

    # ---- CLEAR-MOT over the fabricated gt (explicit 4-frame seqmap; the
    # CLI default uses the official KITTI seqmap, which only applies to
    # real data) ----
    from jmodt_tpu.eval.clear_mot import evaluate as evaluate_tracking
    for extra in set(seq_txts) - {'0000.txt', '0019.txt'}:
        (trk_dir / extra).touch()
    evaluate_tracking(result_sha='ladder', result_root=str(tmp_path / 'out'),
                      part='val', gt_path=str(root / 'tracking' / 'training'),
                      logger=logger, seqmap={'0000': 4, '0019': 4})
