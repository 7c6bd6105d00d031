"""Epoch-loop trainer.

Port of /root/reference/jmodt/utils/train_utils.py::Trainer (lines 116-210):
per-epoch train + optional val epochs, per-epoch checkpoints, best-model
snapshot by val loss, early stop when train loss falls while val loss rises
for more than `stop_thres` consecutive epochs, tensorboard scalars per loss
term.

TPU differences: the whole optimizer step is one jitted program (AMP +
GradScaler become bf16 network compute with f32 master params via
cfg.DTYPE — no scaler needed, see models/layers.py::compute_dtype), the
train step can be sharded over a data-parallel mesh by passing
`mesh=make_mesh()`, and checkpoints are flax msgpack via
jmodt_tpu.train.checkpoint.
"""

from __future__ import annotations

import logging
import math
import os
import time
from typing import Any, Callable, Iterable, Optional

import jax
import numpy as np

from jmodt_tpu.config import Config
from jmodt_tpu.train.checkpoint import checkpoint_state, save_checkpoint
from jmodt_tpu.train.train_step import (TrainState, make_train_step,
                                        make_val_step)

logger = logging.getLogger(__name__)


def _scalarize(tb: dict) -> dict:
    return {k: float(v) for k, v in tb.items()
            if np.ndim(v) == 0}


class Trainer:
    """:param model: PointRCNN(mode='TRAIN') flax module
    :param tx: optax transformation (from make_optimizer)
    :param mesh: optional jax.sharding.Mesh for data-parallel steps
    """

    def __init__(self, cfg: Config, model, state: TrainState, tx,
                 ckpt_dir: str, tb_log=None, eval_frequency: int = 1,
                 mesh=None, log: Optional[logging.Logger] = None,
                 ckpt_writer=None, log_every: int = 1,
                 prefetch: bool = True):
        # optional checkpoint.AsyncCheckpointWriter: per-epoch saves then
        # overlap the next epoch's compute (orbax background IO)
        self.ckpt_writer = ckpt_writer
        # log_every: fetch the loss scalar to host only every K steps —
        # a device->host value fetch is the ONLY operation that waits for
        # execution on this class of runtime, so a per-step float(loss)
        # serializes the whole pipeline; at K>1 steps dispatch back-to-back
        # (the reference logs per step, train_utils.py:144-147)
        self.log_every = max(int(log_every), 1)
        # prefetch: upload batch i+1 (device_put, async) while step i runs
        self.prefetch = prefetch
        # ckpt_every: per-epoch snapshots every K epochs (the final epoch
        # always saves; reference saves every epoch, train_utils.py:171-174)
        self.ckpt_every = 1
        self.cfg = cfg
        self.model = model
        if mesh is not None:
            # put_replicated, not device_put: on a multi-process mesh
            # device_put cannot target other hosts' devices — each process
            # supplies its identical host copy instead (parallel/mesh.py)
            from jmodt_tpu.parallel import put_replicated
            state = put_replicated(state, mesh)
        self.state = state
        self.ckpt_dir = ckpt_dir
        self.tb_log = tb_log
        self.eval_frequency = max(eval_frequency, 1)
        self.log = log or logger

        train_step = make_train_step(cfg, model, tx)
        val_step = make_val_step(cfg, model)
        self._mesh = mesh
        if mesh is not None:
            # 1-D mesh: pure data parallel.  2-D (data, points) mesh: the
            # point/width dims of known batch fields are additionally split
            # over the inner axis (jmodt_tpu/parallel/mesh.py) — shardings
            # are attached per-field by _device_batch via shard_batch, and
            # jit infers in_shardings from the committed arrays.
            from jmodt_tpu.parallel import replicated_sharding
            repl = replicated_sharding(mesh)
            self._repl = repl
            self._train_step = jax.jit(train_step, out_shardings=(repl, repl))
            self._val_step = jax.jit(val_step, out_shardings=(repl, repl))
        else:
            self._repl = None
            self._train_step = jax.jit(train_step)
            self._val_step = jax.jit(val_step)

    def _device_batch(self, batch: dict) -> dict:
        batch = {k: v for k, v in batch.items()
                 if isinstance(v, np.ndarray) and k != 'sample_id'}
        if self._mesh is not None:
            from jmodt_tpu.parallel import shard_batch
            batch = shard_batch(batch, self._mesh)
        elif self.prefetch:
            batch = jax.device_put(batch)  # async upload
        return batch

    def _batches(self, iterable):
        """One-batch-lookahead device feed: the (async) device_put of batch
        i+1 is issued before batch i's step result is consumed, so host
        decode/collate and upload overlap device compute."""
        if not self.prefetch:
            for batch in iterable:
                yield self._device_batch(batch)
            return
        it = iter(iterable)
        try:
            nxt = self._device_batch(next(it))
        except StopIteration:
            return
        for batch in it:
            cur, nxt = nxt, self._device_batch(batch)
            yield cur
        yield nxt

    def eval_epoch(self, val_loader: Iterable, key) -> tuple:
        """Loss-only val epoch (reference eval_epoch,
        train_utils.py:85-114)."""
        eval_dict: dict = {}
        nan_dict: dict = {}
        total_loss = []
        n = 0
        for dbatch in self._batches(val_loader):
            n += 1
            loss, tb = self._val_step(self.state, dbatch, key)
            loss = float(loss)
            if loss > 0:
                total_loss.append(loss)
            for k, v in _scalarize(tb).items():
                if not math.isnan(v):
                    eval_dict[k] = eval_dict.get(k, 0.0) + v
                else:
                    nan_dict[k] = nan_dict.get(k, 0) + 1
        for k in eval_dict:
            eval_dict[k] /= max(n - nan_dict.get(k, 0), 1)
        return (sum(total_loss) / len(total_loss) if total_loss else 0.0,
                eval_dict)

    def train(self, start_it: int, start_epoch: int, n_epochs: int,
              train_loader_fn: Callable[[], Iterable],
              val_loader_fn: Optional[Callable[[], Iterable]] = None,
              stop_thres: int = 5, seed: int = 0) -> TrainState:
        """Reference Trainer.train (train_utils.py:116-210).
        `train_loader_fn()` returns a fresh epoch iterable of numpy batches.
        """
        it = start_it
        key = jax.random.PRNGKey(seed)
        min_val_loss = float('inf')
        last_logged = 0.0  # carried across epochs shorter than log_every
        prev_train_loss = prev_val_loss = -1.0
        counter = 0
        val_loss_epoch = 0.0

        for epoch in range(start_epoch, n_epochs):
            t0 = time.time()
            train_losses = []
            for dbatch in self._batches(train_loader_fn()):
                it += 1
                self.state, tb = self._train_step(self.state, dbatch, key)
                if it % self.log_every:
                    continue  # skip the host fetch; steps queue back-to-back
                loss = float(tb['loss'])
                if loss > 0:
                    train_losses.append(loss)
                    if self.tb_log is not None:
                        self.tb_log.add_scalar('train_loss', loss, it)
                        for k, v in _scalarize(tb).items():
                            self.tb_log.add_scalar('train_' + k, v, it)
            trained_epoch = epoch + 1
            # epochs with fewer than log_every its sample no loss; report
            # the last sampled value instead of a misleading 0.0
            train_loss_epoch = (sum(train_losses) / len(train_losses)
                                if train_losses else last_logged)
            last_logged = train_loss_epoch
            self.log.info('epoch %d: train_loss=%.4f (%.1fs, %d its)',
                          trained_epoch, train_loss_epoch,
                          time.time() - t0, it - start_it)
            if self.tb_log is not None:
                self.tb_log.add_scalar('train_loss_epoch', train_loss_epoch,
                                       trained_epoch)

            if (trained_epoch % self.ckpt_every == 0
                    or trained_epoch == n_epochs):
                ckpt_name = os.path.join(
                    self.ckpt_dir, 'checkpoint_epoch_%d' % trained_epoch)
                save_checkpoint(checkpoint_state(
                    {'params': self.state.params,
                     'batch_stats': self.state.batch_stats},
                    self.state.opt_state, trained_epoch, it), ckpt_name,
                    writer=self.ckpt_writer)

            if val_loader_fn is not None and (epoch % self.eval_frequency
                                              == 0):
                val_loss_epoch, eval_dict = self.eval_epoch(val_loader_fn(),
                                                            key)
                self.log.info('epoch %d: val_loss=%.4f', trained_epoch,
                              val_loss_epoch)
                if self.tb_log is not None:
                    self.tb_log.add_scalar('val_loss_epoch', val_loss_epoch,
                                           trained_epoch)
                    for k, v in eval_dict.items():
                        self.tb_log.add_scalar('val_' + k, v, trained_epoch)

            # early stopping (train_utils.py:187-195)
            if prev_train_loss != -1 and prev_val_loss != -1:
                if train_loss_epoch < prev_train_loss \
                        and val_loss_epoch > prev_val_loss:
                    counter += 1
                    self.log.info('Bad train')
                    if counter > stop_thres:
                        self.log.info('Early stopping')
                        break
                else:
                    counter = 0
            else:
                prev_train_loss = train_loss_epoch
                prev_val_loss = val_loss_epoch

            # best model snapshot (train_utils.py:200-207)
            if val_loader_fn is not None and val_loss_epoch < min_val_loss:
                min_val_loss = val_loss_epoch
                save_checkpoint(checkpoint_state(
                    {'params': self.state.params,
                     'batch_stats': self.state.batch_stats}),
                    os.path.join(self.ckpt_dir, 'best_model'),
                    writer=self.ckpt_writer)
        if self.ckpt_writer is not None:
            self.ckpt_writer.wait()
        return self.state


def make_loader(dataset, batch_size: int, shuffle: bool = True,
                num_workers: int = 0, seed: int = 0,
                drop_last: bool = True) -> Callable[[], Iterable]:
    """Batched loader factory over a KittiDataset-style object (uses torch's
    DataLoader for multi-process prefetch when workers are requested — the
    reference uses 4 host workers, tools/train.py:69-78)."""
    if num_workers > 0:
        import torch.utils.data as tud

        loader = tud.DataLoader(
            _TorchShim(dataset), batch_size=batch_size, shuffle=shuffle,
            num_workers=num_workers, collate_fn=dataset.collate_batch,
            drop_last=drop_last)
        return lambda: iter(loader)

    rng = np.random.RandomState(seed)

    def gen():
        order = np.arange(len(dataset))
        if shuffle:
            rng.shuffle(order)
        for i in range(0, len(order) - (batch_size - 1 if drop_last else 0),
                       batch_size):
            idx = order[i:i + batch_size]
            yield dataset.collate_batch([dataset[j] for j in idx])

    return gen


class _TorchShim:
    def __init__(self, ds):
        self.ds = ds

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, i):
        return self.ds[i]
