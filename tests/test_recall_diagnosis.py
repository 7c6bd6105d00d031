"""tools/recall_diagnosis.py on a fabricated micro-split.

The tool buckets every val gt by its best-IoU detection into
hit / pure-miss / poor-localization / orientation classes (see the tool's
docstring; protocol pieces come from jmodt_tpu/eval/detection_ap.py, the
same parser+overlap code the AP number uses — reference protocol
/root/reference/tools/kitti_object_eval/eval.py).  Controlled cases:

  frame 000000: gt A matched exactly (hit, score 0.9)
                gt B with no detection anywhere near (pure miss)
  frame 000001: gt C with a det at a small offset (0.1 <= IoU < 0.5 ->
                poor localization)
                gt D square-footprint, det same footprint rotated pi/2
                and lifted clear of the gt vertically (BEV IoU ~1,
                3D IoU ~0, dry = pi/2 -> orientation bucket)
                + one far-away unmatched det (FP, score 0.2)
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))


def _label_line(name, bbox, hwl, xyz, ry, score=None):
    h, w, l = hwl
    x, y, z = xyz
    parts = [name, '0', '0', '0.0',
             *['%.2f' % v for v in bbox],
             '%.2f %.2f %.2f' % (h, w, l),
             '%.2f %.2f %.2f' % (x, y, z),
             '%.4f' % ry]
    if score is not None:
        parts.append('%.4f' % score)
    return ' '.join(parts)


def _write(path, lines):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, 'w') as f:
        f.write('\n'.join(lines) + '\n')


def test_recall_diagnosis_buckets(tmp_path):
    from tools import recall_diagnosis

    root = tmp_path / 'data'
    obj = root / 'tracking_object'
    labels = obj / 'training' / 'label_2'
    dets = tmp_path / 'det'
    _write(str(obj / 'ImageSets' / 'val.txt'), ['000000', '000001'])

    bbox_tall = (100.0, 100.0, 180.0, 150.0)  # 50 px -> tallest band

    # ---- frame 0: one exact hit + one pure miss ----
    _write(str(labels / '000000.txt'), [
        _label_line('Car', bbox_tall, (1.5, 1.6, 4.0), (0.0, 1.5, 8.0), 0.1),
        _label_line('Car', bbox_tall, (1.5, 1.6, 4.0), (12.0, 1.5, 25.0), 0.0),
    ])
    _write(str(dets / '000000.txt'), [
        _label_line('Car', bbox_tall, (1.5, 1.6, 4.0), (0.0, 1.5, 8.0), 0.1,
                    score=0.9),
    ])

    # ---- frame 1: poor localization + orientation + one far FP ----
    _write(str(labels / '000001.txt'), [
        _label_line('Car', bbox_tall, (1.5, 1.6, 4.0), (0.0, 1.5, 8.0), 0.0),
        # square footprint so a pi/2 spin keeps BEV IoU = 1
        _label_line('Car', bbox_tall, (2.0, 4.0, 4.0), (-10.0, 2.0, 15.0),
                    0.0),
    ])
    _write(str(dets / '000001.txt'), [
        # 1 m z-offset on the 1.6 m-wide side (ry=0 puts l along x):
        # overlap 0.6/1.6 -> IoU ~0.23, inside (0.1, 0.5)
        _label_line('Car', bbox_tall, (1.5, 1.6, 4.0), (0.0, 1.5, 9.0), 0.0,
                    score=0.8),
        # same footprint, spun pi/2, lifted 3 m: BEV ~1, 3D ~0
        _label_line('Car', bbox_tall, (2.0, 4.0, 4.0), (-10.0, -1.0, 15.0),
                    np.pi / 2, score=0.7),
        _label_line('Car', bbox_tall, (1.5, 1.6, 4.0), (40.0, 1.5, 90.0),
                    0.0, score=0.2),
    ])

    out = recall_diagnosis.main([
        '--data_root', str(root), '--det_dir', str(dets),
        '--split', 'val', '--iou', '0.5',
        '--json_out', str(tmp_path / 'diag.json')])

    assert out['n_gt'] == 4
    assert out['n_det'] == 4
    assert out['recall'] == 0.25          # only gt A
    assert out['pure_miss_frac'] == 0.25  # gt B
    assert out['poor_loc_frac'] == 0.25   # gt C
    assert out['ry_flip_frac'] == 0.25    # gt D
    # FP accounting: the unmatched far det + BOTH frame-1 dets that
    # failed the 3D-IoU match (poor-loc and spun dets are not "matched")
    assert out['fp_count'] == 3
    assert out['matched_score_median'] == 0.9
    # every fabricated gt sits in the >=40 px height band
    assert out['recall_by_height_px']['40-999'][0] == 4
    # 8 m and 15 m gts in the 0-10/10-20 bands; the hit is at 8 m
    assert out['recall_by_range_m']['0-10'] == [2, 0.5]
    # the json_out side artifact round-trips
    with open(tmp_path / 'diag.json') as f:
        assert json.load(f)['n_gt'] == 4
