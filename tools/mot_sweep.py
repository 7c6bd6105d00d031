"""Offline MOT hyper-parameter sweep over persisted stage-1 detections.

The reference hardcodes its tracking hyper-parameters (reference
tools/eval.py:300-319: t_miss=2, t_hit=0, w_cls=100, w_app=2, w_iou=10,
w_dis=10, w_se=1, cls_thresh=0.85) — values tuned for a strong KITTI
detector.  A weaker detector (e.g. the synthetic ladder's) wants a lower
detection gate and a longer miss budget; this tool finds that out from
data instead of folklore: it replays the persisted detections + ReID
features (`<det_output>/txt|feat`, written by tools/eval.py stage 1)
through the host Tracker for every config in a grid, scores each with
CLEAR-MOT against the ground truth, and reports the ranking.

No model is built: only the link/se correlation heads are read from the
checkpoint (train/checkpoint.py::read_checkpoint_state), so a full sweep
is CPU-cheap and can run while the chip trains.  Trackers are cached per
(w_app, w_iou, w_dis, hungarian) — the only values baked into the jitted
affinity program — and the host-side knobs (cls_thresh, t_miss, t_hit,
w_cls, w_se, match_thresh) are swept without recompiles.

Usage (after a synthetic_ladder run):
  JMODT_PLATFORM=cpu python tools/mot_sweep.py \
      --det_output output/ladder6/det --data_root output/ladder6/data \
      --ckpt output/ladder6/stage3/ckpt/checkpoint_best \
      --output_dir output/ladder6/mot_sweep

Then re-run tools/eval.py --only_tracking with the winning flags (they
are printed verbatim) through the production device-tracker path.
"""

import argparse
import importlib.util
import itertools
import json
import logging
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_GRID = {
    # detection gate is the dominant knob for a weak detector; the rest
    # refine around the reference defaults
    'cls_thresh': [0.3, 0.5, 0.7, 0.85],
    't_miss': [2, 4],
    't_hit': [0, 1],
}


def _load_eval_module():
    spec = importlib.util.spec_from_file_location(
        'eval_cli', os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 'eval.py'))
    emod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(emod)
    return emod


def load_frames(emod, det_output, data_root, logger):
    """Pre-load every frame's detections + features once (the sweep's
    inner loop must not re-parse text files per config)."""
    if data_root:
        from jmodt_tpu.data.converter import (read_sample2frame,
                                              read_seq2sample)
        base = os.path.join(data_root, 'tracking_object', 'training')
        seq2sample = read_seq2sample(os.path.join(base, 'seq2sample.txt'))
        sample2frame = read_sample2frame(
            os.path.join(base, 'sample2frame.txt'))
        from jmodt_tpu.config import VALID_SEQ_ID
        seq_list = [s for s in VALID_SEQ_ID if s in seq2sample]
    else:
        ids = sorted(p[:-4] for p in os.listdir(
            os.path.join(det_output, 'txt')) if p.endswith('.txt'))
        seq2sample = {'0000': ids}
        sample2frame = {s: ('0000', '%06d' % i) for i, s in enumerate(ids)}
        seq_list = ['0000']

    frames = {}          # seq_id -> [(frame_id, objs, boxes, scores, feats)]
    n_dets = 0
    for seq_id in seq_list:
        rows = []
        for sample_id in seq2sample.get(seq_id, []):
            txt = os.path.join(det_output, 'txt', f'{sample_id}.txt')
            if not os.path.isfile(txt):
                continue
            with open(txt) as f:
                lines = f.readlines()
            if not lines:
                continue   # eval_tracking skips empty frames the same way
            frame_id = int(sample2frame[sample_id][1])
            objs = np.array([emod.Object3d(line) for line in lines])
            feats = np.load(os.path.join(det_output, 'feat',
                                         f'{sample_id}.npy'))
            assert len(feats) == len(objs), \
                f'{sample_id}: obj {len(objs)} != feat {len(feats)}'
            boxes = np.stack([o.box3d for o in objs])
            scores = np.array([o.score for o in objs], np.float32)
            rows.append((frame_id, objs, boxes, scores, feats))
            n_dets += len(objs)
        frames[seq_id] = rows
    logger.info('loaded %d sequences, %d frames, %d detections',
                len(frames), sum(len(v) for v in frames.values()), n_dets)
    return seq_list, frames


def run_config(emod, tracker, params, seq_list, frames, res_root, tag,
               part='val'):
    """Replay all sequences through `tracker` at `params`; write KITTI
    tracking txts under <res_root>/<tag>/<part>/ (the CLEAR-MOT layout)."""
    res_dir = os.path.join(res_root, tag, part)
    os.makedirs(res_dir, exist_ok=True)
    tracker.t_miss = params['t_miss']
    tracker.t_hit = params['t_hit']
    tracker.w_cls = params['w_cls']
    tracker.w_se = params['w_se']
    tracker.match_thresh = params['match_thresh']
    cls_thresh = params['cls_thresh']
    for seq_id in seq_list:
        tracker.reset()
        with open(os.path.join(res_dir, f'{seq_id}.txt'), 'w') as out_file:
            for frame_id, objs, boxes, scores, feats in frames[seq_id]:
                mask = scores > cls_thresh
                results = tracker.update(frame_id, boxes[mask], scores[mask],
                                         feats[mask], objs[mask])
                emod.save_kitti_tracking_format(results, frame_id, out_file)


def main():
    ap = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    ap.add_argument('--det_output', type=str, required=True,
                    help='stage-1 output dir holding txt/ and feat/')
    ap.add_argument('--data_root', type=str, required=True,
                    help='dataset root (tracking/ gt + tracking_object/)')
    ap.add_argument('--ckpt', type=str, required=True,
                    help='checkpoint providing the link/se heads')
    ap.add_argument('--output_dir', type=str, default='output/mot_sweep')
    ap.add_argument('--grid', type=str, default=None,
                    help='JSON dict param->list overriding the default '
                         'grid; params: cls_thresh, t_miss, t_hit, w_cls, '
                         'w_app, w_iou, w_dis, w_se, match_thresh')
    ap.add_argument('--hungarian', action='store_true')
    ap.add_argument('--top', type=int, default=10)
    args = ap.parse_args()

    from jmodt_tpu.utils import apply_platform_override
    apply_platform_override()

    logging.basicConfig(level=logging.INFO, format='%(message)s')
    logger = logging.getLogger('mot_sweep')
    mot_logger = logging.getLogger('mot_sweep.clearmot')
    mot_logger.setLevel(logging.WARNING)   # CLEAR-MOT is chatty per run

    emod = _load_eval_module()
    from jmodt_tpu.eval.clear_mot import evaluate
    from jmodt_tpu.models.rcnn import CorrelationHead
    from jmodt_tpu.tracking import Tracker

    link_params, se_params = emod.load_head_params(args.ckpt)
    link_fc, link_bn = emod.infer_head_arch(link_params)
    se_fc, se_bn = emod.infer_head_arch(se_params)
    logger.info('head arch from ckpt: link=%s bn=%s se=%s bn=%s',
                link_fc, link_bn, se_fc, se_bn)
    link_head = CorrelationHead(link_fc, use_bn=link_bn)
    se_head = CorrelationHead(se_fc, use_bn=se_bn)

    seq_list, frames = load_frames(emod, args.det_output, args.data_root,
                                   logger)

    grid = dict(DEFAULT_GRID)
    if args.grid:
        grid.update(json.loads(args.grid))
    base = dict(emod.MOT_PARAM_DEFAULTS)
    keys = sorted(grid)
    combos = [dict(zip(keys, vals))
              for vals in itertools.product(*(grid[k] for k in keys))]
    logger.info('sweeping %d configs over %s', len(combos), keys)

    gt_path = os.path.join(args.data_root, 'tracking', 'training')
    seqmap = emod._seqmap_from_gt(gt_path)
    os.makedirs(args.output_dir, exist_ok=True)

    trackers = {}   # (w_app, w_iou, w_dis) -> Tracker (jit-cache reuse)
    results = []
    for i, combo in enumerate(combos):
        params = dict(base, **combo)
        key = (params['w_app'], params['w_iou'], params['w_dis'])
        if key not in trackers:
            trackers[key] = Tracker(
                link_head.apply, se_head.apply, link_params, se_params,
                w_app=key[0], w_iou=key[1], w_dis=key[2],
                hungarian=args.hungarian)
        tag = f'cfg{i:03d}'
        run_config(emod, trackers[key], params, seq_list, frames,
                   args.output_dir, tag)
        mota = evaluate(result_sha=tag, result_root=args.output_dir,
                        part='val', gt_path=gt_path, logger=mot_logger,
                        seqmap=seqmap)
        mota = (float(mota) if isinstance(mota, (int, float))
                and not isinstance(mota, bool) else None)
        results.append({'tag': tag, 'mota': mota, **combo})
        logger.info('[%d/%d] %s -> MOTA %s', i + 1, len(combos), combo,
                    f'{mota:.4f}' if mota is not None else 'failed')

    ranked = sorted([r for r in results if r['mota'] is not None],
                    key=lambda r: -r['mota'])
    with open(os.path.join(args.output_dir, 'sweep_results.json'), 'w') as f:
        json.dump({'grid': grid, 'base': base, 'results': results,
                   'best': ranked[0] if ranked else None}, f, indent=1)
        f.write('\n')

    logger.info('\ntop %d:', min(args.top, len(ranked)))
    for r in ranked[:args.top]:
        logger.info('  MOTA %.4f  %s', r['mota'],
                    {k: v for k, v in r.items() if k not in ('tag', 'mota')})
    if ranked:
        best = ranked[0]
        flags = ' '.join(f'--{k} {v}' for k, v in best.items()
                         if k not in ('tag', 'mota'))
        logger.info('\nbest: MOTA %.4f — rerun with: tools/eval.py '
                    '--only_tracking %s', best['mota'], flags)


if __name__ == '__main__':
    main()
