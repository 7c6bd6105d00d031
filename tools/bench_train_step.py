"""Honest train-step throughput benchmark (fetch-synced slopes).

Round-2 recorded 6.6 ms/step at batch 4 pairs (1,088 frames/s) using
`block_until_ready`, which on this runtime ACKs before execution finishes
(CLAUDE.md round-3 note).  This tool re-measures with a value fetch that
data-depends on the updated parameters, reporting the slope between two
step counts so the constant fetch latency cancels.

Usage: python tools/bench_train_step.py [--pairs 4] [--steps 16] [--small]
Prints one JSON line: ms/step and frames/s for the full joint train step.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--pairs', type=int, default=4)
    ap.add_argument('--steps', type=int, default=16)
    ap.add_argument('--small', action='store_true')
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from jmodt_tpu.config import Config
    from jmodt_tpu.data.synthetic import make_pair_batch
    from jmodt_tpu.models import PointRCNN
    from jmodt_tpu.train import create_train_state, make_train_step
    from jmodt_tpu.utils import (apply_platform_override,
                                 enable_compilation_cache)

    apply_platform_override()
    enable_compilation_cache()
    if args.small:
        import __graft_entry__
        cfg = __graft_entry__._small_config()
    else:
        cfg = Config()

    model = PointRCNN(cfg, mode='TRAIN')
    batch = make_pair_batch(seed=0, cfg=cfg, num_pairs=args.pairs,
                            npoints=cfg.RPN.NUM_POINTS)
    init_key, key = jax.random.split(jax.random.PRNGKey(0))
    variables = jax.jit(lambda k: model.init(
        k, batch['pts_input'][:2], batch['img'][:2], batch['pts_xy'][:2],
        gt_boxes3d=batch['gt_boxes3d'][:2], gt_tids=batch['gt_tids'][:2],
        sample_key=jax.random.PRNGKey(1), train=True))(init_key)
    state, tx = create_train_state(cfg, variables, steps_per_epoch=100)
    step = jax.jit(make_train_step(cfg, model, tx))
    sync = jax.jit(lambda s: sum(
        jnp.sum(jnp.asarray(x, jnp.float32))
        for x in jax.tree_util.tree_leaves(s.params)[:4]))

    state, tb = step(state, batch, key)   # compile
    float(sync(state))

    def run(n):
        s = state
        t0 = time.perf_counter()
        for _ in range(n):
            s, _ = step(s, batch, key)
        float(sync(s))
        return time.perf_counter() - t0

    run(2)  # warm
    n1, n2 = max(2, args.steps // 4), args.steps
    best = 1e9
    for _ in range(2):
        best = min(best, (run(n2) - run(n1)) / (n2 - n1))
    frames = args.pairs * 2
    print(json.dumps({
        'ms_per_step': round(best * 1e3, 2),
        'pairs': args.pairs,
        'frames_per_s': round(frames / best, 1),
        'small': bool(args.small),
    }))


if __name__ == '__main__':
    main()
