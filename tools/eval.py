"""CLI: two-stage evaluation — joint detection inference, then tracking.

Port of /root/reference/tools/eval.py:
  stage 1 (eval_joint_detection, :40-242): batch-1 inference, decode + score
    + rotated NMS (fused on device, jmodt_tpu/models/inference.py), recall
    bookkeeping, per-sample KITTI txt + 512-d feature npy, empty-file
    backfill, detection AP;
  stage 2 (eval_tracking, :294-417): per-sequence online tracking over the
    stage-1 files, per-frame timing of Tracker.update only, KITTI tracking
    txt, CLEAR-MOT.

Without --data_root, stage 1 runs on synthetic frames (writes the same
files) and stage 2 tracks over them with a fabricated single-sequence map —
the full pipeline is exercisable with no dataset on disk.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import logging
import os
import re
import time
from datetime import datetime

import jax
import numpy as np

from jmodt_tpu.config import TEST_SEQ_ID, VALID_SEQ_ID, Config
from jmodt_tpu.models import PointRCNN
from jmodt_tpu.models.inference import make_detection_step, make_recall_fn
from jmodt_tpu.models.rcnn import CorrelationHead
from jmodt_tpu.tracking import Tracker
from jmodt_tpu.utils import (apply_platform_override,
                             enable_compilation_cache)
from jmodt_tpu.utils.kitti_io import (save_kitti_detection_format,
                                      save_kitti_tracking_format)
from jmodt_tpu.utils.object3d import Object3d

THRESH_LIST = (0.1, 0.3, 0.5, 0.7, 0.9)


def build_model_and_ckpt(cfg, mode, ckpt, example, logger):
    model = PointRCNN(cfg, mode=mode)
    variables = jax.jit(lambda k: model.init(
        k, example['pts_input'], example['img'], example['pts_xy'],
        train=False))(jax.random.PRNGKey(0))
    if ckpt:
        from jmodt_tpu.train.checkpoint import load_checkpoint
        variables, _, _, _ = load_checkpoint(ckpt, variables, log=logger)
    else:
        logger.info('WARNING: no --ckpt given, using random weights')
    return model, variables


def eval_joint_detection(args, cfg, logger):
    logger.info('********** Start evaluate detection **********')
    num_list = re.findall(r'\d+', args.ckpt) if args.ckpt else []
    epoch_id = num_list[-1] if num_list else 'no_number'
    mode = 'TEST' if args.test else 'EVAL'
    split = cfg.TEST.SPLIT if args.test else cfg.EVAL.SPLIT

    txt_dir = os.path.join(args.det_output, 'txt')
    feat_dir = os.path.join(args.det_output, 'feat')
    os.makedirs(txt_dir, exist_ok=True)
    os.makedirs(feat_dir, exist_ok=True)

    if args.data_root:
        from jmodt_tpu.data.kitti_dataset import KittiDataset
        dataset = KittiDataset(
            root_dir=args.data_root, npoints=cfg.RPN.NUM_POINTS,
            split=split, mode=mode, classes=cfg.CLASSES,
            challenge='tracking', logger=logger, cfg=cfg,
            # --small must match the training-side image geometry
            # (tools/train.py img_hw) or pts_xy normalization shifts
            fixed_img_size=(64, 128) if args.small else (384, 1280),
            raw_uint8_images=True)
        sample_ids = list(dataset.sample_id_list)

        def frames():
            for sid in sample_ids:
                s = dataset.get_sample_dict(sid)
                yield sid, dataset.collate_batch([s]), \
                    dataset.get_calib(sid), dataset.get_image_shape(sid)
    else:
        from jmodt_tpu.data.synthetic import make_eval_frame
        from jmodt_tpu.utils.calibration import Calibration
        logger.info('no --data_root: synthetic frames x%d',
                    args.synthetic_frames)
        dataset = None
        sample_ids = list(range(args.synthetic_frames))
        calib = Calibration({'P2': np.array(
            [[720.0, 0, 620, 0], [0, 720.0, 190, 0], [0, 0, 1, 0]],
            np.float32), 'R0': np.eye(3, dtype=np.float32),
            'Tr_velo2cam': np.eye(3, 4, dtype=np.float32)})

        def frames():
            for sid in sample_ids:
                yield sid, make_eval_frame(seed=sid, cfg=cfg), calib, \
                    (384, 1280, 3)

    example = next(frames())[1]
    model, variables = build_model_and_ckpt(cfg, mode, args.ckpt,
                                            example, logger)
    step = make_detection_step(cfg, model)
    recall_fn = make_recall_fn()
    max_gt = 32

    # recall counters accumulate ON DEVICE across frames; per frame the
    # host fetches exactly ONE packed buffer (fetch latency dominates on
    # tethered hosts — see CLAUDE.md)
    recall_acc = np.zeros(11, np.int32)
    final_total = 0
    t_infer = 0.0
    n_frames = 0

    for sid, data, calib, img_shape in frames():
        t0 = time.perf_counter()
        out = step(variables, data['pts_input'], data['img'],
                   data['pts_xy'])
        if not args.test and 'gt_boxes3d' in data:
            gt = np.zeros((max_gt, 7), np.float32)
            g = np.asarray(data['gt_boxes3d'][0])[:max_gt]
            gt[:len(g)] = g
            recall_acc = recall_fn.accumulate(recall_acc, out, gt)
        packed = np.asarray(out['packed'][0])   # the single fetch
        t_infer += time.perf_counter() - t0
        n_frames += 1

        keep = packed[:, 8] > 0.5
        boxes = packed[keep, 0:7]
        scores = packed[keep, 7]
        feats = packed[keep, 9:]

        if len(boxes):
            final_total += save_kitti_detection_format(
                int(sid), calib, boxes, txt_dir, scores, img_shape,
                feats, feat_dir, cls_name=cfg.CLASSES)
        else:
            open(os.path.join(txt_dir, '%06d.txt' % int(sid)), 'w').close()
            np.save(os.path.join(feat_dir, '%06d.npy' % int(sid)),
                    np.zeros((0, feats.shape[-1]), np.float32))

    # empty-file backfill (reference tools/eval.py:203-212)
    empty_cnt = 0
    for sid in sample_ids:
        cur = os.path.join(txt_dir, '%06d.txt' % int(sid))
        if not os.path.exists(cur):
            open(cur, 'w').close()
            empty_cnt += 1
    if empty_cnt:
        logger.info('dumped %d empty files', empty_cnt)

    recall_acc = np.asarray(recall_acc)
    total_recalled, total_roi_recalled = recall_acc[:5], recall_acc[5:10]
    total_gt = int(recall_acc[10])
    logger.info('---------- performance of epoch %s ----------', epoch_id)
    logger.info('inference: %.1f ms/frame over %d frames',
                1e3 * t_infer / max(n_frames, 1), n_frames)
    logger.info('final average detections: %.3f',
                final_total / max(len(sample_ids), 1))
    for idx, thresh in enumerate(THRESH_LIST):
        logger.info('total roi bbox recall(thresh=%.3f): %d / %d = %f',
                    thresh, total_roi_recalled[idx], total_gt,
                    total_roi_recalled[idx] / max(total_gt, 1))
    for idx, thresh in enumerate(THRESH_LIST):
        logger.info('total bbox recall(thresh=%.3f): %d / %d = %f',
                    thresh, total_recalled[idx], total_gt,
                    total_recalled[idx] / max(total_gt, 1))

    ap_dict = None
    if not args.test and args.data_root:
        from jmodt_tpu.eval.detection_ap import evaluate_detections
        name_to_class = {'Car': 0, 'Pedestrian': 1, 'Cyclist': 2}
        ap_str, ap_dict = evaluate_detections(
            dataset.label_dir, txt_dir, image_idx_list=sample_ids,
            current_class=name_to_class[cfg.CLASSES])
        logger.info(ap_str)
        logger.info('%s', ap_dict)
    logger.info('result saved to: %s', args.det_output)
    return ap_dict


def _track_sequences_batched(args, cfg, logger, seq_list, seq2sample,
                             sample2frame, link_head, link_params,
                             tracking_res_dir, t_miss, t_hit, w_app, w_iou,
                             w_dis, cls_thresh, match_thresh,
                             se_head=None, se_params=None,
                             w_cls: float = 100.0, w_se: float = 1.0,
                             max_dets: int = 32, max_tracks: int = 64):
    """All sequences tracked in LOCKSTEP on one chip: the per-frame device
    step is vmapped over a leading sequence axis
    (device_tracker.make_batched_tracker_step), so offline evaluation
    throughput scales with the sequence count at near-zero cost — the
    reference iterates its 10 val sequences serially
    (tools/eval.py:351-397).  Shorter sequences pad with empty frames
    (det_mask all False = tracker no-op); results are fetched AFTER the
    timed loop (device fetches are expensive on the relay) and written to
    the same per-sequence txt files as the serial path."""
    import jax
    import jax.numpy as jnp

    from jmodt_tpu.tracking.device_tracker import (init_batched_state,
                                                   make_batched_tracker_step)
    from jmodt_tpu.utils.kitti_io import save_kitti_tracking_format
    from jmodt_tpu.utils.object3d import Object3d

    feat_dim = (_persisted_feat_dim(args.det_output)
                or cfg.RCNN.SA_CONFIG.MLPS[-1][-1])

    # preload every sequence's detections (host IO outside the timed loop)
    seq_frames = []  # per seq: list of (frame_id, boxes, scores, feats, objs)
    dropped = 0
    for seq_id in seq_list:
        frames = []
        for sample_id in seq2sample.get(seq_id, []):
            txt = os.path.join(args.det_output, 'txt', f'{sample_id}.txt')
            with open(txt) as f:
                lines = f.readlines()
            if not lines:
                continue
            objs = np.array([Object3d(line) for line in lines])
            feats = np.load(os.path.join(args.det_output, 'feat',
                                         f'{sample_id}.npy'))
            boxes = np.stack([o.box3d for o in objs])
            scores = np.array([o.score for o in objs], np.float32)
            mask = scores > cls_thresh
            dropped += max(int(mask.sum()) - max_dets, 0)
            frames.append((int(sample2frame[sample_id][1]), boxes[mask],
                           scores[mask], feats[mask], objs[mask]))
        seq_frames.append(frames)
    if dropped:
        logger.warning('--batch_seqs: %d detections above cls_thresh '
                       'dropped by the max_dets=%d cap (raise --max_dets, '
                       'keeping it <= --max_tracks)', dropped, max_dets)

    n_seq = len(seq_list)
    max_len = max((len(f) for f in seq_frames), default=0)
    if n_seq == 0 or max_len == 0:
        return 0.0, 0

    # default association = the reference's start/end MIP semantics
    # (tracker.py:104-124), exactly solved on device; --hungarian selects
    # the alternate branch, as in the host path
    if args.hungarian:
        step = make_batched_tracker_step(
            link_head.apply, t_miss=t_miss, t_hit=t_hit, w_app=w_app,
            w_iou=w_iou, w_dis=w_dis, score_thresh=cls_thresh,
            match_thresh=match_thresh, assign='hungarian')
        step_params = link_params
    else:
        step = make_batched_tracker_step(
            link_head.apply, t_miss=t_miss, t_hit=t_hit, w_app=w_app,
            w_iou=w_iou, w_dis=w_dis, assign='mip',
            se_apply=se_head.apply, w_cls=w_cls, w_se=w_se)
        step_params = (link_params, se_params)
    states = init_batched_state(n_seq, max_tracks, feat_dim)

    total_frames = sum(len(f) for f in seq_frames)
    outs = []
    t0 = time.perf_counter()
    for t in range(max_len):
        db = np.zeros((n_seq, max_dets, 7), np.float32)
        ds = np.zeros((n_seq, max_dets), np.float32)
        df = np.zeros((n_seq, max_dets, feat_dim), np.float32)
        dm = np.zeros((n_seq, max_dets), bool)
        fid = np.zeros((n_seq,), np.int32)
        for s, frames in enumerate(seq_frames):
            if t < len(frames):
                frame_id, boxes, scores, feats, _ = frames[t]
                n = min(len(scores), max_dets)
                db[s, :n], ds[s, :n] = boxes[:n], scores[:n]
                df[s, :n], dm[s, :n] = feats[:n], True
                fid[s] = frame_id
        states, out = step(states, jnp.asarray(fid), db, ds, df, dm,
                           step_params)
        outs.append(out)
    jax.block_until_ready(states)
    total_time = time.perf_counter() - t0

    # Fetch outside the timed region, and FEW fetches: stack each output
    # key over time on device, then one host transfer per key (5 total) —
    # per-value fetches cost ~35 ms+ each on the relay (CLAUDE.md), so
    # per-(seq, frame) fetches would take minutes on a real split.
    stacked = {k: np.asarray(jnp.stack([o[k] for o in outs]))
               for k in outs[0]}  # (L, S, ...) each
    for s, seq_id in enumerate(seq_list):
        out_path = os.path.join(tracking_res_dir, f'{seq_id}.txt')
        with open(out_path, 'w') as out_file:
            for t in range(len(seq_frames[s])):
                frame_id, _, _, _, objs = seq_frames[s][t]
                emit, tid = stacked['emit'][t, s], stacked['tid'][t, s]
                det_idx = stacked['det_idx'][t, s]
                score = stacked['score'][t, s]
                results = [
                    (int(tid[i]), objs[int(det_idx[i])], float(score[i]))
                    for i in np.flatnonzero(emit)
                    if 0 <= int(det_idx[i]) < len(objs)]
                save_kitti_tracking_format(results, frame_id, out_file)
    return total_time, total_frames


def _seqmap_from_gt(gt_path: str) -> dict:
    """Per-sequence frame counts from the image_02 directories (frames
    exist even when unlabeled) — equals the official SEQMAP on the real
    KITTI tree and makes fabricated/synthetic trees evaluable.  Falls back
    to max-label-frame+1 where images are absent."""
    seqmap = {}
    img_root = os.path.join(gt_path, 'image_02')
    label_dir = os.path.join(gt_path, 'label_02')
    for name in sorted(os.listdir(label_dir)):
        if not name.endswith('.txt'):
            continue
        seq = name[:-4]
        img_dir = os.path.join(img_root, seq)
        if os.path.isdir(img_dir):
            seqmap[seq] = sum(1 for p in os.listdir(img_dir)
                              if p.endswith(('.png', '.jpg')))
            continue
        last = 0
        with open(os.path.join(label_dir, name)) as f:
            for line in f:
                if line.strip():
                    last = max(last, int(float(line.split()[0])))
        seqmap[seq] = last + 1
    return seqmap


def load_head_params(ckpt_path):
    """Read ONLY the link/se head weights from a checkpoint (no model
    build/init — reference keeps them under params/rcnn/{link,se}_layer)."""
    from jmodt_tpu.train.checkpoint import read_checkpoint_state
    state = read_checkpoint_state(ckpt_path)
    rcnn = state['model_state']['params']['rcnn']
    return ({'params': rcnn['link_layer']}, {'params': rcnn['se_layer']})


def infer_head_arch(head_params):
    """Derive (hidden_widths, use_bn) from a head's own param tree, so
    stage 2 never depends on reconstructing the training-time config (the
    ladder's --wide patch lives only inside synthetic_ladder.py).  HeadMLP
    names hidden layers PointwiseLayer_<i> and the final projection
    Dense_0; BN presence shows up as BatchNorm_* keys."""
    import itertools
    mlp = head_params['params']['mlp']
    hidden = []
    use_bn = False
    for i in itertools.count():
        layer = mlp.get(f'PointwiseLayer_{i}')
        if layer is None:
            break
        hidden.append(int(layer['Dense_0']['kernel'].shape[1]))
        use_bn = use_bn or any('BatchNorm' in k for k in layer)
    return tuple(hidden), use_bn


def load_tracking_heads(cfg, ckpt, logger, test=False):
    """Link/se correlation heads for stage 2.

    Stage 2 replays whatever stage 1 persisted, so with a checkpoint the
    checkpoint is authoritative: read the head subtrees raw and derive
    their architecture from the stored shapes (a cfg-built model would
    silently keep its random init whenever the shapes mismatch, e.g. a
    --wide ladder tree evaluated under --small).  Without a checkpoint
    (smoke mode) fall back to cfg-built random heads, as the reference's
    no-ckpt path does."""
    if ckpt:
        link_params, se_params = load_head_params(ckpt)
        link_fc, link_bn = infer_head_arch(link_params)
        se_fc, se_bn = infer_head_arch(se_params)
        link_head = CorrelationHead(link_fc, use_bn=link_bn)
        se_head = CorrelationHead(se_fc, use_bn=se_bn)
        return link_head, se_head, link_params, se_params
    logger.info('WARNING: no --ckpt given, using random head weights')
    from jmodt_tpu.data.synthetic import make_eval_frame
    example = make_eval_frame(seed=0, cfg=cfg, npoints=cfg.RPN.NUM_POINTS)
    _, variables = build_model_and_ckpt(
        cfg, 'TEST' if test else 'EVAL', None, example, logger)
    rcnn_params = variables['params']['rcnn']
    link_head = CorrelationHead(cfg.REID.LINK_FC, use_bn=cfg.REID.USE_BN)
    se_head = CorrelationHead(cfg.REID.SE_FC, use_bn=cfg.REID.USE_BN)
    return (link_head, se_head, {'params': rcnn_params['link_layer']},
            {'params': rcnn_params['se_layer']})


def _persisted_feat_dim(det_output):
    """ReID feature width of the persisted stage-1 features.  Stage 2
    replays whatever stage 1 wrote, so the tracker state must be sized
    from the data, not from cfg (which may not match the checkpoint that
    produced the detections, e.g. synthetic_ladder --wide trees)."""
    feat_dir = os.path.join(det_output, 'feat')
    if os.path.isdir(feat_dir):
        for p in sorted(os.listdir(feat_dir)):
            if p.endswith('.npy'):
                arr = np.load(os.path.join(feat_dir, p), mmap_mode='r')
                if arr.ndim == 2 and arr.shape[0] > 0:
                    return int(arr.shape[1])
    return None


MOT_PARAM_DEFAULTS = {
    # reference tools/eval.py:300-319
    't_miss': 2, 't_hit': 0, 'w_cls': 100.0, 'w_app': 2.0, 'w_iou': 10.0,
    'w_dis': 10.0, 'w_se': 1.0, 'cls_thresh': 0.85, 'match_thresh': 0.0,
}


def mot_params_from_args(args):
    """MOT hyper-parameters with reference defaults for absent attrs."""
    return {k: getattr(args, k, None) if getattr(args, k, None) is not None
            else d for k, d in MOT_PARAM_DEFAULTS.items()}


def eval_tracking(args, cfg, logger):
    """Stage 2 (reference eval_tracking, tools/eval.py:294-417)."""
    part = 'test' if args.test else 'val'
    tracking_res_dir = os.path.join(args.output_dir, args.tag, part)
    os.makedirs(tracking_res_dir, exist_ok=True)

    # MOT hyper-parameters (reference tools/eval.py:300-319).  Defaults
    # are the reference's; each is overridable from the CLI (getattr so
    # programmatic SimpleNamespace callers like synthetic_ladder.py that
    # predate the flags keep reference behavior), swept offline by
    # tools/mot_sweep.py over persisted stage-1 detections.
    p = mot_params_from_args(args)
    t_miss, t_hit = p['t_miss'], p['t_hit']
    w_cls, w_app, w_iou, w_dis, w_se = (p['w_cls'], p['w_app'], p['w_iou'],
                                        p['w_dis'], p['w_se'])
    cls_thresh = p['cls_thresh']
    score_thresh, match_thresh = 0.0, p['match_thresh']
    logger.info('********** Start evaluate tracking **********')
    logger.info('t_miss=%d t_hit=%d w_cls=%d w_app=%d w_iou=%d w_dis=%d '
                'w_se=%d', t_miss, t_hit, w_cls, w_app, w_iou, w_dis, w_se)

    # only the link/se heads are needed (reference tools/eval.py:326-340);
    # the apply fns take (params, x): the trackers thread the head weights
    # as runtime arguments so no device call closure-captures them
    # (CLAUDE.md program-poison rule #2)
    link_head, se_head, link_params, se_params = load_tracking_heads(
        cfg, args.ckpt, logger, test=args.test)

    if args.device_tracker:
        # fully on-device fast path; association defaults to the
        # reference-default MIP semantics (exact, device-side) and honors
        # --hungarian like the host path — see
        # jmodt_tpu/tracking/device_tracker.py
        from jmodt_tpu.tracking.device_tracker import DeviceTracker
        feat_dim = (_persisted_feat_dim(args.det_output)
                    or cfg.RCNN.SA_CONFIG.MLPS[-1][-1])
        if args.hungarian:
            car_tracker = DeviceTracker(
                link_head.apply, link_params, feat_dim=feat_dim,
                max_tracks=args.max_tracks, max_dets=args.max_dets,
                t_miss=t_miss, t_hit=t_hit, w_app=w_app, w_iou=w_iou,
                w_dis=w_dis, score_thresh=cls_thresh,
                match_thresh=match_thresh, assign='hungarian')
        else:
            car_tracker = DeviceTracker(
                link_head.apply, (link_params, se_params),
                feat_dim=feat_dim, max_tracks=args.max_tracks,
                max_dets=args.max_dets, t_miss=t_miss, t_hit=t_hit,
                w_app=w_app, w_iou=w_iou, w_dis=w_dis, assign='mip',
                se_apply=se_head.apply, w_cls=w_cls, w_se=w_se)
    else:
        car_tracker = Tracker(link_head.apply, se_head.apply,
                              link_params, se_params, t_miss=t_miss,
                              t_hit=t_hit, w_cls=w_cls, w_app=w_app,
                              w_iou=w_iou, w_dis=w_dis, w_se=w_se,
                              hungarian=args.hungarian,
                              score_thresh=score_thresh,
                              match_thresh=match_thresh)

    if args.data_root:
        from jmodt_tpu.data.converter import (read_sample2frame,
                                              read_seq2sample)
        base = os.path.join(args.data_root, 'tracking_object',
                            'testing' if args.test else 'training')
        seq2sample = read_seq2sample(os.path.join(base, 'seq2sample.txt'))
        sample2frame = read_sample2frame(
            os.path.join(base, 'sample2frame.txt'))
        seq_list = (list(TEST_SEQ_ID) if args.test else
                    [s for s in VALID_SEQ_ID if s in seq2sample])
    else:
        # fabricate one sequence over the synthetic stage-1 outputs
        ids = sorted(p[:-4] for p in os.listdir(
            os.path.join(args.det_output, 'txt')) if p.endswith('.txt'))
        seq2sample = {'0000': ids}
        sample2frame = {s: ('0000', '%06d' % i)
                        for i, s in enumerate(ids)}
        seq_list = ['0000']

    if args.batch_seqs:
        total_time, total_frames = _track_sequences_batched(
            args, cfg, logger, seq_list, seq2sample, sample2frame,
            link_head, link_params, tracking_res_dir,
            t_miss=t_miss, t_hit=t_hit, w_app=w_app, w_iou=w_iou,
            w_dis=w_dis, cls_thresh=cls_thresh, match_thresh=match_thresh,
            se_head=se_head, se_params=se_params, w_cls=w_cls, w_se=w_se,
            max_dets=args.max_dets, max_tracks=args.max_tracks)
        fps = total_frames / total_time if total_time > 0 else float('nan')
        logger.info('total frames: %d, total time: %.3f, frames per '
                    'second: %.1f', total_frames, total_time, fps)
        if not args.test and args.data_root:
            from jmodt_tpu.eval.clear_mot import evaluate as eval_trk
            gt_path = os.path.join(args.data_root, 'tracking', 'training')
            return eval_trk(result_sha=args.tag, result_root=args.output_dir,
                            part=part, gt_path=gt_path, logger=logger,
                            seqmap=_seqmap_from_gt(gt_path))
        return None

    total_time, total_frames = 0.0, 0
    for seq_id in seq_list:
        sample_list = seq2sample.get(seq_id, [])
        out_path = os.path.join(tracking_res_dir, f'{seq_id}.txt')
        car_tracker.reset()
        with open(out_path, 'w') as out_file:
            for sample_id in sample_list:
                txt = os.path.join(args.det_output, 'txt',
                                   f'{sample_id}.txt')
                with open(txt) as f:
                    object_lines = f.readlines()
                if not object_lines:
                    continue
                objs = np.array([Object3d(line) for line in object_lines])
                feats = np.load(os.path.join(args.det_output, 'feat',
                                             f'{sample_id}.npy'))
                assert len(feats) == len(objs), \
                    f'obj {len(objs)} != feat {len(feats)}'
                boxes = np.stack([o.box3d for o in objs])
                scores = np.array([o.score for o in objs], np.float32)

                mask = scores > cls_thresh
                boxes, scores = boxes[mask], scores[mask]
                feats, objs = feats[mask], objs[mask]
                frame_id = int(sample2frame[sample_id][1])

                t0 = time.perf_counter()
                if args.device_tracker:
                    out = car_tracker.update(frame_id, boxes, scores, feats)
                    total_time += time.perf_counter() - t0
                    out = {k: np.asarray(v) for k, v in out.items()}
                    results = [
                        (int(out['tid'][i]), objs[int(out['det_idx'][i])],
                         float(out['score'][i]))
                        for i in np.flatnonzero(out['emit'])
                        if 0 <= int(out['det_idx'][i]) < len(objs)]
                else:
                    results = car_tracker.update(frame_id, boxes, scores,
                                                 feats, objs)
                    total_time += time.perf_counter() - t0
                total_frames += 1
                save_kitti_tracking_format(results, frame_id, out_file)
    fps = total_frames / total_time if total_time > 0 else float('nan')
    logger.info('total frames: %d, total time: %.3f, frames per second: '
                '%.1f', total_frames, total_time, fps)

    if not args.test and args.data_root:
        from jmodt_tpu.eval.clear_mot import evaluate as evaluate_tracking
        gt_path = os.path.join(args.data_root, 'tracking', 'training')
        return evaluate_tracking(
            result_sha=args.tag, result_root=args.output_dir, part=part,
            gt_path=gt_path, logger=logger,
            seqmap=_seqmap_from_gt(gt_path))


def main():
    parser = argparse.ArgumentParser(description='arg parser')
    parser.add_argument('--data_root', type=str, default=None)
    parser.add_argument('--det_output', type=str, default='output/det')
    parser.add_argument('--output_dir', type=str, default='output')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--tag', type=str, default='mot_data')
    parser.add_argument('--hungarian', action='store_true')
    parser.add_argument('--device_tracker', action='store_true',
                        help='use the fully on-device tracker (exact '
                             'Jonker-Volgenant assignment) instead of the '
                             'host MIP/Hungarian parity path')
    parser.add_argument('--batch_seqs', action='store_true',
                        help='track ALL sequences in lockstep with the '
                             'vmapped device tracker (offline throughput '
                             'mode; implies the device tracker)')
    parser.add_argument('--max_dets', type=int, default=32,
                        help='device-tracker per-frame detection cap '
                             '(above-threshold extras are dropped, with a '
                             'warning)')
    parser.add_argument('--max_tracks', type=int, default=64,
                        help='device-tracker track-slot capacity')
    for k, d in MOT_PARAM_DEFAULTS.items():
        parser.add_argument(f'--{k}', type=type(d), default=None,
                            help=f'MOT hyper-parameter (reference '
                                 f'default {d})')
    parser.add_argument('--only_tracking', action='store_true')
    parser.add_argument('--test', action='store_true')
    parser.add_argument('--synthetic_frames', type=int, default=8)
    parser.add_argument('--small', action='store_true')
    args = parser.parse_args()
    if args.max_dets > args.max_tracks:
        # the exact device assignment needs at least as many track slots
        # as detections (device_tracker._lap_assign asserts t >= d)
        parser.error(f'--max_dets ({args.max_dets}) must be <= '
                     f'--max_tracks ({args.max_tracks})')

    apply_platform_override()
    enable_compilation_cache()
    np.random.seed(2333)  # reference tools/eval.py:36

    logger = logging.getLogger('eval')
    logger.setLevel(logging.INFO)
    ch = logging.StreamHandler()
    ch.setFormatter(logging.Formatter('%(message)s'))
    logger.addHandler(ch)

    if args.small:
        import __graft_entry__
        cfg = __graft_entry__._small_config()
    else:
        cfg = Config()

    stamp = datetime.now().strftime('%Y-%m-%d-%H-%M-%S')
    if not args.only_tracking:
        os.makedirs(args.det_output, exist_ok=True)
        fh = logging.FileHandler(
            os.path.join(args.det_output, f'{stamp}.log'))
        logger.addHandler(fh)
        eval_joint_detection(args, cfg, logger)
        logger.removeHandler(fh)

    os.makedirs(os.path.join(args.output_dir, args.tag), exist_ok=True)
    fh = logging.FileHandler(
        os.path.join(args.output_dir, args.tag, f'{stamp}.log'))
    logger.addHandler(fh)
    eval_tracking(args, cfg, logger)


if __name__ == '__main__':
    main()
