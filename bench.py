"""End-to-end per-frame benchmark on the flagship model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Measures the full-size joint-detection forward (16384 points, 384x1280
image, LI-Fusion on, 100 proposals -> RCNN + ReID features) per frame —
the compute-dominant stage of the JMODT pipeline.  The reference's only
published runtime is 0.01 s/frame for `Tracker.update` alone, *excluding*
detection (reference tools/eval.py:387-400, README.md:21-26);
`vs_baseline` reports that 0.01 s budget divided by our full detection
forward time (values > 1 mean the whole detector runs faster than the
reference's tracker-only stage).
"""

from __future__ import annotations

import json
import time

import jax
import numpy as np

BASELINE_S_PER_FRAME = 0.01  # reference README.md:21-26 (tracking only)


def main():
    from jmodt_tpu.config import Config
    from jmodt_tpu.data.synthetic import make_eval_frame
    from jmodt_tpu.models import PointRCNN

    cfg = Config()
    model = PointRCNN(cfg, mode='EVAL')
    frame = make_eval_frame(seed=0, cfg=cfg)
    pts, img, xy = frame['pts_input'], frame['img'], frame['pts_xy']

    variables = jax.jit(
        lambda k: model.init(k, pts, img, xy, train=False)
    )(jax.random.PRNGKey(0))
    fwd = jax.jit(lambda v, p, i, x: model.apply(v, p, i, x, train=False))

    # compile + warmup
    out = fwd(variables, pts, img, xy)
    jax.block_until_ready(out)

    # steady state over distinct frames (defeats any constant folding)
    frames = [make_eval_frame(seed=s, cfg=cfg) for s in range(4)]
    iters = 25
    t0 = time.perf_counter()
    for i in range(iters):
        f = frames[i % len(frames)]
        out = fwd(variables, f['pts_input'], f['img'], f['pts_xy'])
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    assert np.isfinite(np.asarray(out['rcnn_cls'])).all()
    print(json.dumps({
        'metric': 'detection_forward_ms_per_frame',
        'value': round(dt * 1e3, 3),
        'unit': 'ms',
        'vs_baseline': round(BASELINE_S_PER_FRAME / dt, 2),
    }))


if __name__ == '__main__':
    main()
