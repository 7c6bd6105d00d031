"""Capture a jax.profiler trace of the streaming joint detect+track step.

The reference's only observability is wall-clock timing of the tracker
update (/root/reference/tools/eval.py:387-400); this drives the full fused
per-frame program under the XLA profiler instead — per-op device timelines,
HLO cost attribution, and host/device overlap, viewable in TensorBoard
(`tensorboard --logdir <out>`) or Perfetto.

Usage:
  python tools/profile.py --out /tmp/jmodt-trace [--frames 8] [--small]
  JMODT_PLATFORM=cpu python tools/profile.py --small   # no TPU needed
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--out', type=str, default='output/trace')
    ap.add_argument('--frames', type=int, default=8,
                    help='traced steady-state frames (after compile+warm)')
    ap.add_argument('--small', action='store_true',
                    help='miniature config (CPU-friendly)')
    args = ap.parse_args()

    from jmodt_tpu.utils import (apply_platform_override, annotate,
                                 enable_compilation_cache, profile_trace)
    apply_platform_override()
    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jmodt_tpu.config import Config
    from jmodt_tpu.data.synthetic import make_eval_frame
    from jmodt_tpu.models import PointRCNN
    from jmodt_tpu.models.rcnn import CorrelationHead
    from jmodt_tpu.pipeline import make_joint_step
    from jmodt_tpu.tracking.device_tracker import init_state

    if args.small:
        import __graft_entry__
        cfg = __graft_entry__._small_config()
    else:
        cfg = Config()

    frames = [make_eval_frame(seed=s, cfg=cfg, raw_u8=True)
              for s in range(4)]
    f0 = frames[0]
    feat_dim = cfg.RCNN.SA_CONFIG.MLPS[-1][-1]
    head = CorrelationHead(cfg.REID.LINK_FC, use_bn=cfg.REID.USE_BN)
    link_p = head.init(jax.random.PRNGKey(1),
                       np.zeros((1, feat_dim), np.float32))
    model = PointRCNN(cfg, mode='EVAL')
    variables = jax.jit(lambda k: model.init(
        k, f0['pts_input'],
        (f0['img'].astype(np.float32) / 255.0 - 0.45) / 0.22,
        f0['pts_xy'], train=False))(jax.random.PRNGKey(0))
    joint = make_joint_step(cfg, model, head.apply, det_score_thresh=0.2)
    sync = jax.jit(lambda s: jnp.sum(s.mean) + jnp.sum(s.score))

    # compile + warm OUTSIDE the trace so the capture is steady state
    state = init_state(64, feat_dim)
    state, _ = joint(variables, link_p, state, jnp.asarray(1),
                     f0['pts_input'], f0['img'], f0['pts_xy'])
    float(sync(state))

    os.makedirs(args.out, exist_ok=True)
    with profile_trace(args.out):
        for i in range(args.frames):
            f = frames[i % len(frames)]
            with annotate(f'frame_{i}'):
                state, packed = joint(variables, link_p, state,
                                      jnp.asarray(i + 2), f['pts_input'],
                                      f['img'], f['pts_xy'])
        float(sync(state))  # the fetch that actually waits on this relay

    rows = int((np.asarray(packed)[:, 9] > 0.5).sum())
    print(f'trace written to {args.out} ({args.frames} frames, '
          f'{rows} track rows in the last frame); view with '
          f'tensorboard --logdir {args.out}')


if __name__ == '__main__':
    main()
