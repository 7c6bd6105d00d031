"""Viewer smoke tests on a fabricated mini KITTI tracking directory: the
BEV renderer and the 3D painted-point-cloud renderer (reference
viewer.py:92-152) must both produce PNGs, and the image-RGB painting must
pick up the pixel colors of projected points."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..'))

from tests.test_data_layer import CALIB_TXT


def kitti_row(frame, tid, x, y, z, h=1.5, w=1.6, length=3.9, ry=0.1,
              obj='Car'):
    # KITTI tracking: frame tid type trunc occ alpha bbox(4) h w l x y z ry
    return (f'{frame} {tid} {obj} 0 0 -1.5 100 100 150 200 '
            f'{h} {w} {length} {x} {y} {z} {ry}\n')


@pytest.fixture(scope='module')
def mini_seq(tmp_path_factory):
    from PIL import Image
    root = tmp_path_factory.mktemp('kitti_trk')
    seq = '0000'
    os.makedirs(root / 'calib', exist_ok=True)
    (root / 'calib' / f'{seq}.txt').write_text(CALIB_TXT)
    os.makedirs(root / 'velodyne' / seq, exist_ok=True)
    os.makedirs(root / 'image_02' / seq, exist_ok=True)
    rng = np.random.RandomState(0)
    n_frames = 3
    for f in range(n_frames):
        pts = np.zeros((4000, 4), np.float32)
        pts[:, 0] = rng.uniform(3, 60, 4000)      # velodyne x fwd
        pts[:, 1] = rng.uniform(-20, 20, 4000)
        pts[:, 2] = rng.uniform(-2, 1, 4000)
        pts.tofile(str(root / 'velodyne' / seq / ('%06d.bin' % f)))
        img = np.zeros((375, 1242, 3), np.uint8)
        img[..., 0] = 200   # red-dominant image -> red-painted points
        Image.fromarray(img).save(
            str(root / 'image_02' / seq / ('%06d.png' % f)))
    label_dir = root / 'labels'
    os.makedirs(label_dir, exist_ok=True)
    rows = []
    for f in range(n_frames):
        rows.append(kitti_row(f, 1, x=0.0 + 0.5 * f, y=1.6, z=12.0 + f))
        rows.append(kitti_row(f, 2, x=-4.0, y=1.6, z=20.0 - f))
    (label_dir / f'{seq}.txt').write_text(''.join(rows))
    return root, label_dir


def make_viewer(mini_seq, out):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), '..',
                                    'tools', 'visualization'))
    from viewer import KittiSequenceViewer
    root, label_dir = mini_seq
    return KittiSequenceViewer(str(root), 0, str(out), str(label_dir))


def test_bev_render(mini_seq, tmp_path):
    v = make_viewer(mini_seq, tmp_path / 'viz')
    path = v.render_frame('000001')
    assert os.path.exists(path) and os.path.getsize(path) > 1000


def test_painted_point_cloud_colors(mini_seq, tmp_path):
    v = make_viewer(mini_seq, tmp_path / 'viz')
    pts, colors = v.get_painted_point_cloud('000000')
    assert len(pts) > 100                      # some points project inside
    assert colors.shape == (len(pts), 3)
    # the synthetic image is red-dominant everywhere
    assert np.all(colors[:, 0] > colors[:, 1])
    assert np.all(colors[:, 0] == pytest.approx(200 / 255.0, abs=1e-6))


def test_3d_render_with_trajectories(mini_seq, tmp_path):
    v = make_viewer(mini_seq, tmp_path / 'viz')
    path = v.render_frame_3d('000002')         # last frame: 3-point trails
    assert os.path.exists(path) and os.path.getsize(path) > 1000
    trails = v._trajectories_for_frame(2)
    assert set(trails) == {1, 2}
    assert trails[1].shape == (3, 3)
    # trajectory y is the lifted box center, not the bottom face
    assert trails[1][0, 1] == pytest.approx(1.6 - 1.5 / 2)


def test_visualize_both_views(mini_seq, tmp_path):
    out = tmp_path / 'viz'
    v = make_viewer(mini_seq, out)
    v.visualize(frames=['000000'], view='both')
    assert os.path.exists(out / '000000.png')
    assert os.path.exists(out / '000000_3d.png')
