"""Ground-truth-as-detections oracle for the synthetic AP evaluation.

VERDICT r4 "Next round" #2: the ladder's AP_3d@0.5 ~= 11.8 was
uninterpretable because nobody measured the CEILING the official
difficulty gates (MIN_HEIGHT 40/25/25 px, MAX_OCCLUSION, MAX_TRUNCATION
— reference tools/evaluate.py gates, mirrored in
jmodt_tpu/eval/detection_ap.py::clean_data) permit on the synthetic val
split.  This tool feeds the val split's OWN gt boxes back as detections
(score 1.0) through the same evaluator:

  - ceiling ~= 100 per difficulty  -> the gates pass, the writer's f=2h
    camera produces scoreable gts, and a low trained AP is a genuine
    detector gap;
  - ceiling << 100                 -> the denominator itself is gated
    away and trained AP numbers must be read as a fraction of THIS
    ceiling, not of 100.

Also reports the per-difficulty valid-gt counts (the denominators) and,
with --jitter, a noise-degraded oracle (gt + N(0, sigma) on center/size)
to show how fast AP decays off the perfect-match point at the 0.5/0.7
IoU thresholds.

Usage:
  python tools/oracle_ap.py --data_root output/ladder5/data [--jitter 0.1]

CPU-safe (pure numpy evaluator); no TPU client is created.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

from jmodt_tpu.utils.runtime import apply_platform_override  # noqa: E402

# default to the CPU backend: the evaluator is numpy + a CPU-pinned jit,
# and this tool must be runnable while a TPU client owns the relay
os.environ.setdefault('JMODT_PLATFORM', 'cpu')
apply_platform_override()

NAME_TO_CLASS = {'Car': 0, 'Pedestrian': 1, 'Cyclist': 2}


def read_split_ids(data_root, split):
    split_file = os.path.join(data_root, 'tracking_object', 'ImageSets',
                              split + '.txt')
    with open(split_file) as f:
        return [int(line.split()[0]) for line in f if line.strip()]


def write_oracle_dets(label_dir, out_dir, ids, cls_name, rng=None,
                      jitter=0.0):
    """Copy each gt line of `cls_name` as a detection with score 1.0.
    With jitter > 0, perturb 3D center (x, z) and size (h, w, l) by
    N(0, jitter) resp. N(0, jitter/2) per field — the 2D bbox is left
    exact so the degradation isolates the 3D/BEV IoU response."""
    os.makedirs(out_dir, exist_ok=True)
    n_lines = 0
    for sid in ids:
        src = os.path.join(label_dir, '%06d.txt' % sid)
        out = []
        if os.path.exists(src):
            with open(src) as f:
                for line in f:
                    p = line.split()
                    if not p or p[0] != cls_name:
                        continue
                    if jitter > 0.0:
                        # fields: 8-10 = h, w, l; 11-13 = x, y, z
                        for i in (8, 9, 10):
                            p[i] = '%.4f' % (float(p[i])
                                             + rng.normal(0, jitter / 2))
                        for i in (11, 13):
                            p[i] = '%.4f' % (float(p[i])
                                             + rng.normal(0, jitter))
                    out.append(' '.join(p) + ' 1.0')
                    n_lines += 1
        with open(os.path.join(out_dir, '%06d.txt' % sid), 'w') as f:
            f.write('\n'.join(out) + ('\n' if out else ''))
    return n_lines


def count_valid_gts(label_dir, ids, current_class):
    """Per-difficulty valid-gt counts under the official gates — the AP
    denominators (detection_ap.py::clean_data semantics)."""
    from jmodt_tpu.eval.detection_ap import get_label_anno
    MIN_HEIGHT = (40, 25, 25)
    MAX_OCCLUSION = (0, 1, 2)
    MAX_TRUNCATION = (0.15, 0.3, 0.5)
    cls_name = [k for k, v in NAME_TO_CLASS.items()
                if v == current_class][0].lower()
    counts = [0, 0, 0]
    total = 0
    for sid in ids:
        anno = get_label_anno(os.path.join(label_dir, '%06d.txt' % sid))
        for i, name in enumerate(anno['name']):
            if name.lower() != cls_name:
                continue
            total += 1
            height = anno['bbox'][i, 3] - anno['bbox'][i, 1]
            for d in range(3):
                if (anno['occluded'][i] <= MAX_OCCLUSION[d]
                        and anno['truncated'][i] <= MAX_TRUNCATION[d]
                        and height > MIN_HEIGHT[d]):
                    counts[d] += 1
    return total, counts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--data_root', required=True)
    ap.add_argument('--split', default='val')
    ap.add_argument('--classes', default='Car')
    ap.add_argument('--out', default=None,
                    help='oracle det dir (default <data_root>/../oracle)')
    ap.add_argument('--jitter', type=float, default=0.0,
                    help='also run a noise-degraded oracle at this sigma')
    args = ap.parse_args()

    from jmodt_tpu.eval.detection_ap import evaluate_detections

    data_root = os.path.abspath(args.data_root)
    label_dir = os.path.join(data_root, 'tracking_object', 'training',
                             'label_2')
    ids = read_split_ids(data_root, args.split)
    out_root = args.out or os.path.join(os.path.dirname(data_root),
                                        'oracle')
    cur = NAME_TO_CLASS[args.classes]

    total, valid = count_valid_gts(label_dir, ids, cur)
    result = {'split': args.split, 'frames': len(ids),
              'gt_total': total,
              'gt_valid_easy_mod_hard': valid}

    txt = os.path.join(out_root, 'txt')
    n = write_oracle_dets(label_dir, txt, ids, args.classes)
    ap_str, ap_dict = evaluate_detections(label_dir, txt,
                                          image_idx_list=ids,
                                          current_class=cur)
    print(ap_str)
    result['oracle_dets'] = n
    result['ceiling'] = {k: round(float(v), 4) for k, v in ap_dict.items()}

    if args.jitter > 0.0:
        rng = np.random.RandomState(0)
        txt_j = os.path.join(out_root, 'txt_jitter')
        write_oracle_dets(label_dir, txt_j, ids, args.classes, rng=rng,
                          jitter=args.jitter)
        ap_str_j, ap_dict_j = evaluate_detections(label_dir, txt_j,
                                                  image_idx_list=ids,
                                                  current_class=cur)
        print(ap_str_j)
        result['jitter_sigma'] = args.jitter
        result['jittered'] = {k: round(float(v), 4)
                              for k, v in ap_dict_j.items()}

    print(json.dumps(result))


if __name__ == '__main__':
    main()
