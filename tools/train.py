"""CLI: train / finetune the joint detection + ReID model.

Port of /root/reference/tools/train.py.  With --data_root it trains on a
converted KITTI tracking_object tree; without it, it runs on synthetic
scenes (jmodt_tpu/data/synthetic.py) so the full loop can be exercised on
any machine (this image has no KITTI data).

Finetune mode (default, like the reference: tools/train.py:20,54-58) freezes
everything except the link/se heads via the optax trainable mask.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import dataclasses
import logging
import os

import jax
import numpy as np

from jmodt_tpu.config import Config, config_from_overrides
from jmodt_tpu.models import PointRCNN
from jmodt_tpu.train import create_train_state
from jmodt_tpu.train.checkpoint import load_checkpoint
from jmodt_tpu.train.trainer import Trainer, make_loader
from jmodt_tpu.utils import (apply_platform_override,
                             enable_compilation_cache)


def create_logger(log_file):
    # explicit handlers, not basicConfig: in-process multi-stage runs
    # (tools/synthetic_ladder.py) call main() repeatedly, and basicConfig
    # is a no-op after the first call — stage 2's file handler would never
    # attach and its lines would land in stage 1's train.log.  The file
    # handler goes on the ROOT logger (as basicConfig did) so records from
    # every library logger — e.g. the native-loader fallback warning in
    # jmodt_tpu/native — still reach train.log.
    fmt = logging.Formatter('%(asctime)s  %(levelname)5s  %(message)s')
    root = logging.getLogger()
    root.setLevel(logging.INFO)
    for h in list(root.handlers):
        if isinstance(h, logging.FileHandler):
            root.removeHandler(h)
            h.close()
    fh = logging.FileHandler(log_file)
    fh.setFormatter(fmt)
    root.addHandler(fh)
    logger = logging.getLogger('train')
    logger.setLevel(logging.INFO)
    for h in list(logger.handlers):
        logger.removeHandler(h)
        h.close()
    console = logging.StreamHandler()
    console.setFormatter(fmt)
    logger.addHandler(console)
    return logger


def synthetic_loader_fn(cfg, pairs_per_epoch, batch_pairs, npoints, img_hw,
                        seed0):
    from jmodt_tpu.data.synthetic import make_pair_batch

    def gen():
        for i in range(pairs_per_epoch // batch_pairs):
            yield make_pair_batch(seed=seed0 + i, cfg=cfg,
                                  num_pairs=batch_pairs, npoints=npoints,
                                  img_hw=img_hw)
    return gen


def main():
    parser = argparse.ArgumentParser(description='arg parser')
    parser.add_argument('--data_root', type=str, default=None)
    parser.add_argument('--challenge', type=str, default='tracking')
    parser.add_argument('--finetune', action='store_false',
                        help='finetune link/se heads only (default true; '
                             'passing the flag disables it, matching the '
                             'reference flag semantics)')
    parser.add_argument('--batch_size', type=int, default=4,
                        help='frame pairs per step (reference batch 12)')
    parser.add_argument('--output_dir', type=str, default='output')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--epochs', type=int, default=None)
    parser.add_argument('--train_with_eval', action='store_true')
    parser.add_argument('--data_parallel', action='store_true',
                        help='shard the batch over all local devices')
    parser.add_argument('--points_parallel', type=int, default=1,
                        help='additionally shard the point dimension over '
                             'this many devices per data shard (a 2-D '
                             '(data, points) mesh; device count must be '
                             'divisible). Implies --data_parallel.')
    parser.add_argument('--multihost', action='store_true',
                        help='initialize jax.distributed for multi-host '
                             'data parallelism over DCN (beyond reference '
                             'parity; coordinator from env vars)')
    parser.add_argument('--small', action='store_true',
                        help='miniature config for smoke runs')
    parser.add_argument('--ckpt_every', type=int, default=1,
                        help='save a checkpoint every K epochs (final '
                             'epoch always saves)')
    parser.add_argument('--workers', type=int, default=4,
                        help='DataLoader worker processes (reference '
                             'tools/train.py:69-78 uses 4); 0 = in-process '
                             '(faster on low-CPU hosts, bench_input.py)')
    parser.add_argument('--log_every', type=int, default=1,
                        help='fetch/log the loss scalar every K steps; '
                             'K>1 keeps steps queued back-to-back (a '
                             'per-step fetch serializes the pipeline)')
    parser.add_argument('--async_ckpt', action='store_true',
                        help='write checkpoints with the orbax async '
                             'writer (.orbax dirs; IO overlaps training)')
    parser.add_argument('--synthetic_pairs', type=int, default=16,
                        help='pairs per synthetic epoch (no --data_root)')
    parser.add_argument('--set', dest='set_cfgs', default=None,
                        nargs=argparse.REMAINDER)
    args = parser.parse_args()

    if args.multihost:
        jax.distributed.initialize()
    apply_platform_override()
    enable_compilation_cache()
    os.makedirs(args.output_dir, exist_ok=True)
    logger = create_logger(os.path.join(args.output_dir, 'train.log'))

    if args.small:
        import __graft_entry__
        cfg = __graft_entry__._small_config()
    else:
        cfg = Config()
    if args.set_cfgs:
        cfg = config_from_overrides(cfg, args.set_cfgs)
    cfg = dataclasses.replace(
        cfg,
        RPN=dataclasses.replace(cfg.RPN, FIXED=args.finetune),
        TRAIN=dataclasses.replace(cfg.TRAIN, FINETUNE=args.finetune))
    if args.epochs is not None:
        cfg = dataclasses.replace(
            cfg, TRAIN=dataclasses.replace(cfg.TRAIN, EPOCHS=args.epochs))
    logger.info('devices: %s', jax.devices())
    # fusion= disambiguates stage 1 (lidar-only) from stage 2 in
    # ladder_report when epochs1 == epochs2 (both log finetune=False)
    logger.info('finetune=%s fusion=%s epochs=%d', args.finetune,
                cfg.LI_FUSION.ENABLED, cfg.TRAIN.EPOCHS)

    img_hw = (64, 128) if args.small else (384, 1280)
    if args.data_root:
        from jmodt_tpu.data.kitti_dataset import KittiDataset
        train_set = KittiDataset(
            root_dir=args.data_root, npoints=cfg.RPN.NUM_POINTS,
            split=cfg.TRAIN.SPLIT, mode='TRAIN', logger=logger,
            classes=cfg.CLASSES, challenge=args.challenge, cfg=cfg,
            fixed_img_size=img_hw)
        train_loader_fn = make_loader(train_set, args.batch_size,
                                      shuffle=True,
                                      num_workers=args.workers)
        steps_per_epoch = max(len(train_set) // args.batch_size, 1)
        val_loader_fn = None
        if args.train_with_eval:
            val_set = KittiDataset(
                root_dir=args.data_root, npoints=cfg.RPN.NUM_POINTS,
                split=cfg.TRAIN.VAL_SPLIT, mode='TRAIN', logger=logger,
                classes=cfg.CLASSES, challenge=args.challenge, cfg=cfg,
                fixed_img_size=img_hw)
            val_loader_fn = make_loader(val_set, args.batch_size,
                                        shuffle=False,
                                        num_workers=min(args.workers, 2))
    else:
        logger.info('no --data_root: training on synthetic scenes')
        npoints = cfg.RPN.NUM_POINTS
        train_loader_fn = synthetic_loader_fn(
            cfg, args.synthetic_pairs, args.batch_size, npoints, img_hw, 0)
        val_loader_fn = (synthetic_loader_fn(
            cfg, max(args.synthetic_pairs // 4, args.batch_size),
            args.batch_size, npoints, img_hw, 10_000)
            if args.train_with_eval else None)
        steps_per_epoch = max(args.synthetic_pairs // args.batch_size, 1)

    # init model from one batch
    batch0 = next(iter(train_loader_fn()))
    model = PointRCNN(cfg, mode='TRAIN')
    variables = jax.jit(lambda k: model.init(
        k, batch0['pts_input'][:2], batch0['img'][:2], batch0['pts_xy'][:2],
        gt_boxes3d=batch0['gt_boxes3d'][:2], gt_tids=batch0['gt_tids'][:2],
        sample_key=jax.random.PRNGKey(1), train=True))(jax.random.PRNGKey(0))

    start_epoch = it = 0
    state, tx = create_train_state(cfg, variables, steps_per_epoch)
    if args.ckpt:
        opt_template = state.opt_state if cfg.TRAIN.RELOAD_OPTIMIZER else None
        variables, opt_state, ckpt_it, ckpt_epoch = load_checkpoint(
            args.ckpt, variables, opt_template, log=logger)
        state, tx = create_train_state(cfg, variables, steps_per_epoch)
        if cfg.TRAIN.RELOAD_OPTIMIZER:
            # resume: restore optimizer and continue from the saved epoch
            # (reference tools/train.py:108-111); otherwise the checkpoint
            # only seeds the weights (finetune bootstrap, :112-113)
            it, start_epoch = ckpt_it, ckpt_epoch
            if opt_state is not None:
                state = state.replace(opt_state=opt_state,
                                      step=np.int32(it))

    tb_log = None
    try:
        from tensorboardX import SummaryWriter
        tb_log = SummaryWriter(
            log_dir=os.path.join(args.output_dir, 'tensorboard'))
    except Exception:
        logger.info('tensorboardX unavailable; skipping tb logging')

    mesh = None
    if args.points_parallel > 1 and len(jax.devices()) > 1:
        from jmodt_tpu.parallel import make_mesh_2d
        mesh = make_mesh_2d(sp=args.points_parallel)
        logger.info('(data, points) mesh: %s over %d devices',
                    dict(mesh.shape), len(jax.devices()))
    elif args.data_parallel and len(jax.devices()) > 1:
        from jmodt_tpu.parallel import make_mesh
        mesh = make_mesh()
        logger.info('data-parallel over %d devices', len(jax.devices()))

    ckpt_dir = os.path.join(args.output_dir, 'ckpt')
    os.makedirs(ckpt_dir, exist_ok=True)
    ckpt_writer = None
    if args.async_ckpt:
        from jmodt_tpu.train.checkpoint import AsyncCheckpointWriter
        ckpt_writer = AsyncCheckpointWriter()
        logger.info('async orbax checkpointing enabled')
    trainer = Trainer(cfg, model, state, tx, ckpt_dir=ckpt_dir,
                      tb_log=tb_log, mesh=mesh, log=logger,
                      ckpt_writer=ckpt_writer, log_every=args.log_every)
    trainer.ckpt_every = max(args.ckpt_every, 1)
    logger.info('*************** Start training ***************')
    trainer.train(it, start_epoch, cfg.TRAIN.EPOCHS, train_loader_fn,
                  val_loader_fn)
    logger.info('*************** End training ***************')


if __name__ == '__main__':
    main()
