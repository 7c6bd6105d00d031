"""The full synthetic learning ladder through the REAL pipeline
(VERDICT r2 next-step #7).

Data: `write_synthetic_kitti_tree` fabricates an on-disk KITTI tracking
tree of constant-velocity cars with dense surface points; the standard
converter then produces the tracking_object layout.  Training runs the
reference's 3-stage recipe through the actual CLI (tools/train.py):

  1. lidar-only from scratch  (--set LI_FUSION.ENABLED False)
  2. fusion, bootstrapped from stage 1 via the strict=False partial
     restore (the fusion/image parameters initialize fresh)
  3. finetune: link/se heads only (--finetune), detector frozen

Evaluation runs tools/eval.py on the held validation sequences: stage-1
official AP, then stage-2 on-device MIP tracking + CLEAR-MOT.  Prints one
JSON line with AP/MOTA; a driver (tests or CI) can assert thresholds.

Designed for the real TPU (tens of ms/step); on CPU use tiny
--epochs/--frames.  Usage:
  python tools/synthetic_ladder.py --out /tmp/ladder --frames 24 \
      --epochs1 500 --epochs2 150 --epochs3 60
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))


def run_train(argv):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        'train_cli', os.path.join(os.path.dirname(__file__), 'train.py'))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ['train.py'] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


def latest_ckpt(ckpt_dir):
    """Stem of the highest-EPOCH checkpoint.  Epoch number, not mtime: a
    supervisor resume can leave mixed generations in one directory (an
    old epoch_350 next to a fresh epoch_50), and the furthest training
    state is the one with the largest saved epoch."""
    def epoch_of(path):
        m = re.search(r'checkpoint_epoch_(\d+)', path)
        return int(m.group(1)) if m else -1
    cands = sorted(glob.glob(os.path.join(ckpt_dir, 'checkpoint_epoch_*')),
                   key=epoch_of)
    assert cands, f'no checkpoints in {ckpt_dir}'
    stem = cands[-1]
    return stem[:-len('.ckpt')] if stem.endswith('.ckpt') else stem


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', type=str, default='output/ladder')
    ap.add_argument('--frames', type=int, default=24,
                    help='frames per synthetic sequence')
    ap.add_argument('--seqs', type=int, default=4,
                    help='sequences (train/val split per the standard '
                         'KITTI seq-id lists)')
    ap.add_argument('--epochs1', type=int, default=500)
    ap.add_argument('--epochs2', type=int, default=150)
    ap.add_argument('--epochs3', type=int, default=60)
    ap.add_argument('--lr', type=float, default=1e-3)
    ap.add_argument('--batch', type=int, default=4)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--wide', action='store_true',
                    help='double the miniature model widths and point '
                         'budget (capacity headroom for the ladder)')
    ap.add_argument('--stage1_ckpt', type=str, default=None,
                    help='reuse an existing stage-1 (lidar-only) '
                         'checkpoint stem instead of training stage 1')
    ap.add_argument('--resume1', type=str, default=None,
                    help='checkpoint stem to CONTINUE stage 1 from '
                         '(restores optimizer state + epoch via '
                         'TRAIN.RELOAD_OPTIMIZER for this stage only; '
                         'epochs1 and TMAX stay the full-run values)')
    ap.add_argument('--stage2_ckpt', type=str, default=None,
                    help='reuse an existing stage-2 checkpoint stem '
                         'instead of training stage 2 (requires '
                         '--stage1_ckpt)')
    ap.add_argument('--resume2', type=str, default=None,
                    help='checkpoint stem to CONTINUE stage 2 from '
                         '(restores optimizer state + epoch)')
    ap.add_argument('--resume3', type=str, default=None,
                    help='checkpoint stem to CONTINUE stage 3 from '
                         '(restores optimizer state + epoch)')
    ap.add_argument('--eval_ckpt', type=str, default=None,
                    help='skip all training and run the final eval block '
                         'on this checkpoint stem')
    ap.add_argument('--eval_lidar_only', action='store_true',
                    help='with --eval_ckpt: evaluate under '
                         'LI_FUSION.ENABLED=False (stage-1 checkpoints '
                         'have no fusion parameters)')
    ap.add_argument('--set', dest='set_kv', nargs='*', default=[],
                    help='extra cfg overrides forwarded to every training '
                         'stage, e.g. --set TRAIN.GRAD_NORM_CLIP 10 '
                         '(mini-scale runs clip every step at the '
                         'reference default of 1.0, throttling the '
                         'effective lr ~10x)')
    args = ap.parse_args()

    import __graft_entry__
    from jmodt_tpu.data.converter import create_train_sample_data
    from jmodt_tpu.data.synthetic import write_synthetic_kitti_tree

    cfg = __graft_entry__._small_config()
    if args.wide:
        import dataclasses
        from jmodt_tpu.config import RCNNSAConfig, SAConfig
        sa = SAConfig(
            NPOINTS=(256, 128, 64, 32),
            RADIUS=cfg.RPN.SA_CONFIG.RADIUS,
            NSAMPLE=((8, 16),) * 4,
            MLPS=(((16, 16, 32), (16, 16, 32)),
                  ((32, 32, 64), (32, 32, 64)),
                  ((64, 64, 128), (64, 64, 128)),
                  ((128, 128, 256), (128, 128, 256))))
        cfg = dataclasses.replace(
            cfg,
            RPN=dataclasses.replace(
                cfg.RPN, NUM_POINTS=1024, SA_CONFIG=sa,
                FP_MLPS=((64, 64), (128, 128), (256, 256), (256, 256)),
                CLS_FC=(64,), REG_FC=(64,)),
            RCNN=dataclasses.replace(
                cfg.RCNN, NUM_POINTS=64,
                SA_CONFIG=RCNNSAConfig(
                    NPOINTS=(32, 16, -1), RADIUS=(0.2, 0.4, 100.0),
                    NSAMPLE=(8, 8, 8),
                    MLPS=((64, 64, 64), (64, 64, 128), (128, 128, 256))),
                XYZ_UP_LAYER=(64, 64), CLS_FC=(128, 128),
                REG_FC=(128, 128)))
        # the CLIs rebuild cfg from --small; patch the entry's factory so
        # every stage sees the widened config
        __graft_entry__._small_config = lambda: cfg
    root = os.path.abspath(args.out)
    data_root = os.path.join(root, 'data')
    tree = os.path.join(data_root, 'tracking')
    if not os.path.isdir(os.path.join(data_root, 'tracking_object')):
        # 128x256 with the writer's f=2h camera: projected car heights
        # pass the official AP difficulty gates (synthetic.py camera note)
        write_synthetic_kitti_tree(
            tree, cfg, n_seqs=args.seqs,
            n_frames=args.frames, img_hw=(128, 256), seed=args.seed)
        create_train_sample_data(
            tree, os.path.join(data_root, 'tracking_object'),
            num_seqs=args.seqs)

    common = ['--data_root', data_root, '--small', '--workers', '0',
              '--log_every', '50', '--ckpt_every', '50',
              '--batch_size', str(args.batch)]

    # NOTE --finetune is store_false (reference flag semantics): passing
    # it DISABLES finetune mode, i.e. trains the full detector
    # TRAIN.TMAX must track the stage's epoch count: the reference-default
    # cosine T_max of 50 EPOCHS (config.py:185) anneals the lr to ~0 after
    # 50 epochs, which starves any longer synthetic run
    # ---- stage 1: lidar-only from scratch ----
    if args.eval_ckpt:
        ck1 = ck2 = ck3 = args.eval_ckpt
    elif args.stage1_ckpt:
        ck1 = args.stage1_ckpt
    else:
        out1 = os.path.join(root, 'stage1')
        # NOTE --ckpt must precede --set: --set is argparse.REMAINDER
        # (reference CLI semantics) and swallows everything after it
        # a --resumeN continuation must restore optimizer + epoch:
        # tools/train.py only does that under cfg.TRAIN.RELOAD_OPTIMIZER
        # (reference train.py:108-113 semantics; default False so the
        # stage-2/3 BOOTSTRAP --ckpt loads seed weights only)
        reload1 = (['TRAIN.RELOAD_OPTIMIZER', 'True']
                   if args.resume1 else [])
        run_train(common + [
            '--output_dir', out1, '--finetune',
            '--epochs', str(args.epochs1)]
            + (['--ckpt', args.resume1] if args.resume1 else [])
            + ['--set', 'LI_FUSION.ENABLED', 'False', 'TRAIN.LR',
               str(args.lr), 'TRAIN.TMAX', str(args.epochs1)]
            + reload1 + args.set_kv)
        ck1 = latest_ckpt(os.path.join(out1, 'ckpt'))

    if not args.eval_ckpt:
        # ---- stage 2: fusion, partial-restore bootstrap ----
        if args.stage2_ckpt:
            ck2 = args.stage2_ckpt
        else:
            out2 = os.path.join(root, 'stage2')
            reload2 = (['TRAIN.RELOAD_OPTIMIZER', 'True']
                       if args.resume2 else [])
            run_train(common + [
                '--output_dir', out2, '--finetune',
                '--ckpt', args.resume2 or ck1,
                '--epochs', str(args.epochs2),
                '--set', 'TRAIN.LR', str(args.lr / 2),
                'TRAIN.TMAX', str(args.epochs2)] + reload2 + args.set_kv)
            ck2 = latest_ckpt(os.path.join(out2, 'ckpt'))

        # ---- stage 3: finetune link/se only (default mode) ----
        out3 = os.path.join(root, 'stage3')
        reload3 = (['TRAIN.RELOAD_OPTIMIZER', 'True']
                   if args.resume3 else [])
        run_train(common + [
            '--output_dir', out3, '--ckpt', args.resume3 or ck2,
            '--epochs', str(args.epochs3),
            '--set', 'TRAIN.TMAX', str(args.epochs3)]
            + reload3 + args.set_kv)
        ck3 = latest_ckpt(os.path.join(out3, 'ckpt'))

    # ---- eval: stage-1 AP + stage-2 MOT over the val sequences ----
    import importlib.util
    import logging
    import types
    spec = importlib.util.spec_from_file_location(
        'eval_cli', os.path.join(os.path.dirname(__file__), 'eval.py'))
    emod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(emod)
    logger = logging.getLogger('ladder')
    logger.setLevel(logging.INFO)
    logger.addHandler(logging.StreamHandler())
    if args.eval_lidar_only:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, LI_FUSION=dataclasses.replace(cfg.LI_FUSION, ENABLED=False))
    eargs = types.SimpleNamespace(
        data_root=data_root, det_output=os.path.join(root, 'det'),
        output_dir=os.path.join(root, 'mot'), ckpt=ck3, tag='ladder',
        hungarian=False, device_tracker=True, batch_seqs=True,
        only_tracking=False, test=False, synthetic_frames=0, small=True,
        max_dets=32, max_tracks=64)
    ap_dict = emod.eval_joint_detection(eargs, cfg, logger) or {}
    mota = emod.eval_tracking(eargs, cfg, logger)

    print(json.dumps({
        'ap_3d_moderate': float(ap_dict.get('Car_3d_moderate', -1.0)),
        'ap_bev_moderate': float(ap_dict.get('Car_bev_moderate', -1.0)),
        # evaluate() returns False on a failed evaluation (sequence-count
        # mismatch / nothing scored) — that must stay distinguishable from
        # a genuine MOTA of 0.0, and isinstance(False, int) is True
        'mota': (float(mota) if isinstance(mota, (int, float))
                 and not isinstance(mota, bool) else None),
        'stages': [args.epochs1, args.epochs2, args.epochs3],
    }))


if __name__ == '__main__':
    main()
