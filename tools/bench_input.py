"""Host input-pipeline throughput benchmark (VERDICT r2 "missing" #3).

Fabricates a realistic-size KITTI tracking tree (375x1242 PNG frames,
~120k-point velodyne clouds), runs the converter, then measures the
training feed rate of `KittiDataset.get_sample_dict` + `collate_batch`:

  * native C++ loader (fused velodyne load+project+filter) on vs off
  * 0 vs 4 torch DataLoader worker processes
  * one-batch-lookahead `jax.device_put` prefetch rate (upload path)

Prints one JSON line of frames/s per configuration.  Compare against the
train-step capacity printed by tools/bench_train_step.py.

Usage: python tools/bench_input.py [--frames 24] [--batch 4] [--small]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

CALIB = """P0: 721.5377 0.0 609.5593 0.0 0.0 721.5377 172.854 0.0 0.0 0.0 1.0 0.0
P1: 721.5377 0.0 609.5593 0.0 0.0 721.5377 172.854 0.0 0.0 0.0 1.0 0.0
P2: 721.5377 0.0 609.5593 44.85728 0.0 721.5377 172.854 0.2163791 0.0 0.0 1.0 0.002745884
P3: 721.5377 0.0 609.5593 -339.5242 0.0 721.5377 172.854 2.199936 0.0 0.0 1.0 0.002729905
R_rect 0.9999239 0.00983776 -0.007445048 -0.008698 0.9999421 0.004278459 0.004283835 -0.004213357 0.9999631
Tr_velo_cam 0.007533745 -0.9999714 -0.000616602 -0.004069766 0.01480249 0.0007280733 -0.9998902 -0.07631618 0.9998621 0.00752379 0.01480755 -0.2717806
Tr_imu_velo 0.9999976 0.0007553071 -0.002035826 -0.8086759 -0.0007854027 0.9998898 -0.01482298 0.3195559 0.002024406 0.01482454 0.9998881 -0.7997231
"""


TINY_CALIB = """P0: 60 0 160 0 0 60 48 0 0 0 1 0
P1: 60 0 160 0 0 60 48 0 0 0 1 0
P2: 60 0 160 0 0 60 48 0 0 0 1 0
P3: 60 0 160 0 0 60 48 0 0 0 1 0
R0_rect: 1 0 0 0 1 0 0 0 1
Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0
"""


def fabricate(root: str, n_frames: int, img_hw=(375, 1242),
              n_pts: int = 120000, seed: int = 0, calib: str = CALIB):
    """Two sequences of n_frames each, full-size frames."""
    from PIL import Image
    rng = np.random.RandomState(seed)
    for seq in ('0000', '0001'):
        for sub in ('image_02', 'velodyne'):
            os.makedirs(os.path.join(root, 'training', sub, seq),
                        exist_ok=True)
        os.makedirs(os.path.join(root, 'training', 'calib'), exist_ok=True)
        os.makedirs(os.path.join(root, 'training', 'label_02'),
                    exist_ok=True)
        with open(os.path.join(root, 'training', 'calib', f'{seq}.txt'),
                  'w') as f:
            f.write(calib)
        labels = []
        for fr in range(n_frames):
            # natural-image-like content compresses like real PNGs do;
            # pure noise would overstate decode cost
            base = rng.rand(img_hw[0] // 8, img_hw[1] // 8, 3)
            img = np.kron(base, np.ones((8, 8, 1)))[:img_hw[0], :img_hw[1]]
            img = (img * 255).astype(np.uint8)
            Image.fromarray(img).save(os.path.join(
                root, 'training', 'image_02', seq, f'{fr:06d}.png'))
            pts = np.zeros((n_pts, 4), np.float32)
            pts[:, 0] = rng.uniform(1, 70, n_pts)
            pts[:, 1] = rng.uniform(-35, 35, n_pts)
            pts[:, 2] = rng.uniform(-2, 1.2, n_pts)
            pts[:, 3] = rng.rand(n_pts)
            pts.tofile(os.path.join(root, 'training', 'velodyne', seq,
                                    f'{fr:06d}.bin'))
            for tid, (x0, z0) in enumerate([(-2.0, 12.0), (3.0, 20.0),
                                            (0.0, 35.0)]):
                labels.append(
                    f'{fr} {tid + 1} Car 0 0 -1.5 100 100 200 160 '
                    f'1.5 1.6 3.9 {x0 + 0.1 * fr:.2f} 1.6 '
                    f'{z0 + fr:.2f} 0.1\n')
        with open(os.path.join(root, 'training', 'label_02',
                               f'{seq}.txt'), 'w') as f:
            f.writelines(labels)


def measure_feed(ds, batch_size: int, num_workers: int,
                 max_batches: int) -> float:
    from jmodt_tpu.train.trainer import make_loader
    loader_fn = make_loader(ds, batch_size, shuffle=False,
                            num_workers=num_workers)
    # one warm pass (touches page cache, spawns workers)
    it = iter(loader_fn())
    next(it)
    t0 = time.perf_counter()
    n = 0
    for batch in loader_fn():
        n += 1
        if n >= max_batches:
            break
    dt = time.perf_counter() - t0
    frames = n * batch_size * (2 if ds.pair_mode else 1)
    return frames / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--frames', type=int, default=24,
                    help='frames per fabricated sequence')
    ap.add_argument('--batch', type=int, default=4,
                    help='PAIRS per batch (8 frames at default)')
    ap.add_argument('--small', action='store_true',
                    help='miniature frames (tests/CI)')
    ap.add_argument('--keep', type=str, default=None,
                    help='reuse/keep the tree at this path')
    args = ap.parse_args()

    from jmodt_tpu.utils import apply_platform_override
    apply_platform_override()
    from jmodt_tpu.config import Config
    from jmodt_tpu.data.converter import create_train_sample_data
    from jmodt_tpu.data.kitti_dataset import KittiDataset

    img_hw = (96, 320) if args.small else (375, 1242)
    n_pts = 12000 if args.small else 120000
    npoints = 2048 if args.small else 16384

    root = args.keep or tempfile.mkdtemp(prefix='bench_input_')
    tree = os.path.join(root, 'tracking')
    conv = os.path.join(root, 'tracking_object')
    if not os.path.isdir(conv):
        fabricate(tree, args.frames, img_hw=img_hw, n_pts=n_pts,
                  calib=TINY_CALIB if args.small else CALIB)
        create_train_sample_data(tree, conv, num_seqs=2)

    cfg = Config()
    res = {'frames_per_seq': args.frames, 'batch_pairs': args.batch,
           'img_hw': list(img_hw), 'n_pts': n_pts}
    max_batches = max(2, (args.frames - 2) // args.batch)
    for native in (True, False):
        for workers in (0, 4):
            ds = KittiDataset(root, npoints=npoints, split='train',
                              mode='TRAIN', cfg=cfg, rpn_labels=True,
                              use_native=native, raw_uint8_images=True)
            fps = measure_feed(ds, args.batch, workers, max_batches)
            res[f'native={int(native)}_workers={workers}'] = round(fps, 1)

    # upload path: one-batch-lookahead device_put of collated batches
    import jax
    ds = KittiDataset(root, npoints=npoints, split='train', mode='TRAIN',
                      cfg=cfg, rpn_labels=True, use_native=True,
                      raw_uint8_images=True)
    from jmodt_tpu.train.trainer import make_loader
    batches = list(make_loader(ds, args.batch, shuffle=False,
                               num_workers=0)())[:max_batches]
    arrs = [{k: v for k, v in b.items() if isinstance(v, np.ndarray)
             and v.dtype != object} for b in batches]
    import jax.numpy as jnp
    touch = jax.jit(lambda ps: sum(
        jnp.sum(jnp.asarray(x, jnp.float32).ravel()[:8])
        for p in ps for x in jax.tree_util.tree_leaves(p)))
    float(touch([jax.device_put(arrs[0])]))  # warm upload + sync program
    # honest sync: ONE scalar fetch that depends on every upload; slope
    # over two upload counts cancels the constant fetch latency
    def upload(n):
        t0 = time.perf_counter()
        put = [jax.device_put(arrs[i % len(arrs)]) for i in range(n)]
        float(touch(put))
        return time.perf_counter() - t0
    n1, n2 = len(arrs), 3 * len(arrs)
    dt = (upload(n2) - upload(n1)) / (n2 - n1)
    res['device_put_frames_per_s'] = round(args.batch * 2 / dt, 1)

    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps(res))


if __name__ == '__main__':
    main()
