"""End-to-end per-frame benchmark: streaming joint detection + tracking.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Per frame, ONE on-device program (jmodt_tpu/pipeline.py::make_joint_step)
runs the FULL online loop: 16384-point cloud + 384x1280 uint8 camera image
through the LI-Fusion backbone, RPN, proposal NMS, RCNN refinement + ReID
features, box decode, score threshold, rotated NMS, top-K selection, and
the on-device tracker step (vectorized Kalman + link/IoU/distance affinity
+ assignment + lifecycle).  Fresh frame data is uploaded every iteration
(the real streaming condition); the timed region blocks on the final
tracker state, so every frame's compute is complete on device.  Result
rows are materialized AFTER timing — the tracker needs no host feedback,
so output readback overlaps subsequent work in deployment.

The reference's published runtime is 0.01 s/frame for `Tracker.update`
ALONE — detection excluded (reference tools/eval.py:387-400,
README.md:21-26).  `vs_baseline` = 0.01 s / our FULL detect+track frame
time: values > 1 mean the whole pipeline outruns the reference's tracking
stage by itself.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_S_PER_FRAME = 0.01  # reference README.md:21-26 (tracking only)
N_FRAMES = 100


def main():
    from jmodt_tpu.config import Config
    from jmodt_tpu.data.synthetic import make_eval_frame
    from jmodt_tpu.models import PointRCNN
    from jmodt_tpu.models.rcnn import CorrelationHead
    from jmodt_tpu.pipeline import make_joint_step
    from jmodt_tpu.tracking.device_tracker import init_state
    from jmodt_tpu.utils import enable_compilation_cache

    enable_compilation_cache()
    cfg = Config()
    model = PointRCNN(cfg, mode='EVAL')
    frames = [make_eval_frame(seed=s, cfg=cfg, raw_u8=True)
              for s in range(16)]
    f0 = frames[0]
    variables = jax.jit(lambda k: model.init(
        k, f0['pts_input'],
        (f0['img'].astype(np.float32) / 255.0 - 0.45) / 0.22,
        f0['pts_xy'], train=False))(jax.random.PRNGKey(0))

    feat_dim = cfg.RCNN.SA_CONFIG.MLPS[-1][-1]
    head = CorrelationHead(cfg.REID.LINK_FC, use_bn=cfg.REID.USE_BN)
    link_p = head.init(jax.random.PRNGKey(1),
                       np.zeros((1, feat_dim), np.float32))
    joint = make_joint_step(cfg, model, head.apply, det_score_thresh=0.2)
    state0 = init_state(64, feat_dim)

    # compile + warm
    st, packed = joint(variables, link_p, state0, jnp.asarray(1),
                       f0['pts_input'], f0['img'], f0['pts_xy'])
    jax.block_until_ready(packed)

    def timed_pass():
        st = state0
        outs = []
        t0 = time.perf_counter()
        for i in range(N_FRAMES):
            f = frames[i % len(frames)]
            st, packed = joint(variables, link_p, st, jnp.asarray(i + 1),
                               f['pts_input'], f['img'], f['pts_xy'])
            outs.append(packed)
        jax.block_until_ready(st)
        return (time.perf_counter() - t0) / N_FRAMES, outs

    # best of two passes — the relay's load varies run to run
    dt1, outs = timed_pass()
    dt2, outs = timed_pass()
    dt = min(dt1, dt2)

    # secondary: device-resident inputs (the deployment condition where
    # frames arrive by DMA/infeed instead of per-call RPC upload — on this
    # relay the upload is ~1.1 ms of the streaming number)
    dev_frames = [tuple(jax.device_put(f[k])
                        for k in ('pts_input', 'img', 'pts_xy'))
                  for f in frames]
    jax.block_until_ready(dev_frames[-1])
    compute_dt = 1e9
    for _ in range(2):
        st = state0
        t0 = time.perf_counter()
        for i in range(N_FRAMES):
            p, im, xy = dev_frames[i % len(dev_frames)]
            st, _ = joint(variables, link_p, st, jnp.asarray(i + 1),
                          p, im, xy)
        jax.block_until_ready(st)
        compute_dt = min(compute_dt, (time.perf_counter() - t0) / N_FRAMES)

    # validate outside the timed region: tracks were actually produced
    last = np.asarray(outs[-1])
    n_rows = int((last[:, 9] > 0.5).sum())
    assert np.isfinite(last).all()
    assert n_rows > 0, 'tracker emitted no rows'

    # MFU: compiled-program FLOPs (XLA cost analysis) vs v5e peak (197
    # TFLOP/s bf16 — also the f32 rate, since TPU f32 matmuls run as bf16
    # MXU passes at default precision).  cost_analysis counts logical flops
    # of the optimized HLO and can overcount what the hardware executes, so
    # treat `mfu` as an upper-bound estimate; values near (occasionally
    # above) 1.0 mean the program is at the compute roofline and relay
    # timing noise dominates.
    try:
        lowered = joint.lower(variables, link_p, state0, jnp.asarray(1),
                              f0['pts_input'], f0['img'], f0['pts_xy'])
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_per_frame = float(cost.get('flops', 0.0))
    except Exception:
        flops_per_frame = 0.0
    peak_flops = 197e12  # TPU v5e bf16 peak
    mfu = (flops_per_frame / dt) / peak_flops if flops_per_frame else None

    print(json.dumps({
        'metric': 'detect_plus_track_ms_per_frame',
        'value': round(dt * 1e3, 3),
        'unit': 'ms',
        'vs_baseline': round(BASELINE_S_PER_FRAME / dt, 2),
        'last_frame_track_rows': n_rows,
        'compute_ms_per_frame': round(compute_dt * 1e3, 3),
        'flops_per_frame': flops_per_frame,
        'achieved_tflops': (round(flops_per_frame / dt / 1e12, 2)
                            if flops_per_frame else None),
        'mfu': round(mfu, 4) if mfu is not None else None,
    }))


if __name__ == '__main__':
    main()
