"""Data-layer tests: calibration math, label parsing, the tracking->object
converter, and the dataset pipeline end-to-end on a tiny fake KITTI tree."""

import os

import numpy as np
import pytest

from jmodt_tpu.config import Config
from jmodt_tpu.utils.calibration import Calibration
from jmodt_tpu.utils.object3d import Object3d

CALIB_TXT = """P0: 721.5377 0.0 609.5593 0.0 0.0 721.5377 172.854 0.0 0.0 0.0 1.0 0.0
P1: 721.5377 0.0 609.5593 0.0 0.0 721.5377 172.854 0.0 0.0 0.0 1.0 0.0
P2: 721.5377 0.0 609.5593 44.85728 0.0 721.5377 172.854 0.2163791 0.0 0.0 1.0 0.002745884
P3: 721.5377 0.0 609.5593 -339.5242 0.0 721.5377 172.854 2.199936 0.0 0.0 1.0 0.002729905
R0_rect: 0.9999239 0.00983776 -0.007445048 -0.0098698 0.9999421 -0.004278459 0.007402527 0.004351614 0.9999631
Tr_velo_to_cam: 0.007533745 -0.9999714 -0.000616602 -0.004069766 0.01480249 0.0007280733 -0.9998902 -0.07631618 0.9998621 0.00752379 0.01480755 -0.2717806
"""


# A calib scaled to the fixture's tiny 60x120 images (fu=fv=60, cu=60,
# cv=30), identity R0, and the standard velodyne->camera axis permutation
# (x_rect=-y_velo, y_rect=-z_velo, z_rect=x_velo)
TINY_CALIB = """P0: 60 0 60 0 0 60 30 0 0 0 1 0
P1: 60 0 60 0 0 60 30 0 0 0 1 0
P2: 60 0 60 0 0 60 30 0 0 0 1 0
P3: 60 0 60 0 0 60 30 0 0 0 1 0
R0_rect: 1 0 0 0 1 0 0 0 1
Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0
"""


@pytest.fixture(scope='module')
def fake_kitti(tmp_path_factory):
    """Two-sequence KITTI *tracking* tree with deterministic content."""
    from PIL import Image
    root = tmp_path_factory.mktemp('kitti')
    rng = np.random.RandomState(0)
    for split, seqs, nframes in (('training', ['0000', '0019'], 4),
                                 ('testing', ['0000'], 2)):
        for seq in seqs:
            for sub in ('image_02', 'velodyne'):
                os.makedirs(root / split / sub / seq, exist_ok=True)
            os.makedirs(root / split / 'calib', exist_ok=True)
            os.makedirs(root / split / 'label_02', exist_ok=True)
            with open(root / split / 'calib' / f'{seq}.txt', 'w') as f:
                f.write(TINY_CALIB)
            labels = []
            for fr in range(nframes):
                Image.fromarray(
                    (rng.rand(60, 120, 3) * 255).astype(np.uint8)
                ).save(root / split / 'image_02' / seq / f'{fr:06d}.png')
                # forward-ish lidar points (positive x in velodyne frame)
                pts = np.zeros((3000, 4), np.float32)
                pts[:, 0] = rng.uniform(5, 60, 3000)    # x fwd
                pts[:, 1] = rng.uniform(-8, 8, 3000)    # y left
                pts[:, 2] = rng.uniform(-1.6, 0.5, 3000)
                pts[:, 3] = rng.rand(3000)
                pts.tofile(root / split / 'velodyne' / seq / f'{fr:06d}.bin')
                # two tracked cars per frame, one DontCare
                labels.append(
                    f'{fr} 1 Car 0 0 -1.5 100 100 200 160 1.5 1.6 3.9 '
                    f'{-2 + 0.1 * fr:.2f} 1.6 {12 + fr:.2f} 0.1\n')
                labels.append(
                    f'{fr} 2 Car 0 0 1.2 300 100 400 160 1.4 1.7 4.1 '
                    f'{3 - 0.1 * fr:.2f} 1.7 {20 + fr:.2f} -0.3\n')
                labels.append(f'{fr} -1 DontCare -1 -1 -10 0 0 0 0 '
                              f'-1 -1 -1 -1000 -1000 -1000 -10\n')
            with open(root / split / 'label_02' / f'{seq}.txt', 'w') as f:
                f.writelines(labels)
    return root


def test_calibration_projection_roundtrip(tmp_path):
    calib_file = tmp_path / 'calib.txt'
    calib_file.write_text(CALIB_TXT)
    calib = Calibration(str(calib_file))
    pts_lidar = np.array([[20.0, 1.0, -0.5], [40.0, -3.0, 0.2]], np.float32)
    pts_rect = calib.lidar_to_rect(pts_lidar)
    # velodyne x-forward becomes rect z-depth
    np.testing.assert_allclose(pts_rect[:, 2], pts_lidar[:, 0], atol=1.0)
    pts_img, depth = calib.rect_to_img(pts_rect)
    back = calib.img_to_rect(pts_img[:, 0], pts_img[:, 1], depth)
    np.testing.assert_allclose(back, pts_rect, atol=1e-2)


def test_object3d_parse_and_format():
    line = ('Car 0 0 -1.50 100.0 100.0 200.0 160.0 '
            '1.50 1.60 3.90 -2.00 1.60 12.00 0.10 7')
    obj = Object3d(line)
    assert obj.cls_type == 'Car' and obj.score == 7.0
    np.testing.assert_allclose(
        obj.box3d, [-2.0, 1.6, 12.0, 1.5, 1.6, 3.9, 0.1], rtol=1e-6)
    assert obj.to_kitti_format().startswith('Car 0 0 -1.50')


def test_converter_and_dataset(fake_kitti):
    import dataclasses
    from jmodt_tpu.data.converter import (create_train_sample_data,
                                          create_test_sample_data,
                                          read_seq2sample, read_sample2frame)
    from jmodt_tpu.data.kitti_dataset import KittiDataset

    out = str(fake_kitti / 'tracking_object')
    create_train_sample_data(str(fake_kitti), out, num_seqs=20)
    create_test_sample_data(str(fake_kitti), out, seq_ids=('0000',))

    # converter wrote only the two real sequences, 4 frames each
    s2s = read_seq2sample(os.path.join(out, 'training', 'seq2sample.txt'))
    assert s2s['0000'] == ['000000', '000001', '000002', '000003']
    assert s2s['0019'] == ['000004', '000005', '000006', '000007']
    s2f = read_sample2frame(os.path.join(out, 'training', 'sample2frame.txt'))
    assert s2f['000005'] == ('0019', '000001')

    # tids were remapped globally: seq 0019's two objects got fresh ids
    with open(os.path.join(out, 'training', 'label_2', '000004.txt')) as f:
        tids = [int(line.split()[-1]) for line in f
                if line.startswith('Car')]
    assert tids == [3, 4]

    # small_val split is a consecutive-pair list over seq 0019
    with open(os.path.join(out, 'ImageSets', 'small_val.txt')) as f:
        pairs = [line.split() for line in f]
    assert pairs == [['000004', '000005'], ['000005', '000006'],
                     ['000006', '000007']]

    # pair-mode dataset with RPN labels
    cfg = Config()
    cfg = dataclasses.replace(cfg, RPN=dataclasses.replace(cfg.RPN,
                                                           FIXED=False))
    ds = KittiDataset(str(fake_kitti), npoints=512, split='small_val',
                      mode='TRAIN', cfg=cfg, max_gt=8,
                      fixed_img_size=(64, 128))
    assert len(ds) == 3
    batch = ds.collate_batch([ds[0]])
    assert batch['pts_input'].shape == (2, 512, 3)
    assert batch['img'].shape == (2, 64, 128, 3)
    assert batch['pts_xy'].shape == (2, 512, 2)
    assert batch['gt_boxes3d'].shape == (2, 8, 7)
    assert batch['gt_tids'].shape == (2, 8)
    assert batch['rpn_cls_label'].shape == (2, 512)
    assert batch['rpn_reg_label'].shape == (2, 512, 7)
    # both frames of the pair carry the same (global) tids
    assert set(batch['gt_tids'][0][batch['gt_tids'][0] > 0]) \
        == set(batch['gt_tids'][1][batch['gt_tids'][1] > 0]) == {3.0, 4.0}
    # pts normalized xy within [-1, 1]
    assert np.abs(batch['pts_xy']).max() <= 1.0
    # the fixture has more far (z>=40) points than npoints, hitting the
    # degenerate near/far branch: sampling must still keep near points
    # (a far-only draw silently zeroes all fg labels in mini configs)
    assert (batch['pts_input'][0][:, 2] < 40.0).any()
    # gt boxes present, in range
    assert (np.abs(batch['gt_boxes3d'][0]).sum(axis=1) > 0).sum() == 2

    # raw uint8 image path (device-side normalization)
    ds_u8 = KittiDataset(str(fake_kitti), npoints=512, split='small_val',
                         mode='TRAIN', cfg=cfg, max_gt=8,
                         fixed_img_size=(64, 128), raw_uint8_images=True)
    s_u8 = ds_u8[0][0]
    assert s_u8['img'].dtype == np.uint8
    assert s_u8['img'].shape == (64, 128, 3)

    # eval mode: flat sample list
    ds_eval = KittiDataset(str(fake_kitti), npoints=512, split='val',
                           mode='EVAL', cfg=cfg, max_gt=8,
                           fixed_img_size=(64, 128))
    assert len(ds_eval) == 8  # both 0000 and 0019 are in VALID_SEQ_ID
    sample = ds_eval[0]
    assert sample['pts_input'].shape == (512, 3)
