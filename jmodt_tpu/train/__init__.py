"""Training: loss composition, optimizer, train/val steps, checkpointing."""

from jmodt_tpu.train.train_step import (TrainState, compute_losses,
                                        create_train_state, make_optimizer,
                                        make_train_step, trainable_mask)

__all__ = ['TrainState', 'compute_losses', 'create_train_state',
           'make_optimizer', 'make_train_step', 'trainable_mask']
