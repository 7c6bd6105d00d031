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
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_S_PER_FRAME = 0.01  # reference README.md:21-26 (tracking only)
N_FRAMES = 100


def _hang_watchdog(seconds=int(os.environ.get('BENCH_WATCHDOG_S', 2400))):
    """The TPU relay tunnel can die silently; jax.devices() then blocks
    forever and the bench emits nothing.  Print a diagnostic JSON line and
    hard-exit if the run exceeds `seconds` (first full compile is
    ~80-120 s; after a box reboot the relay additionally charges ~5-10 min
    of per-process CONNECTION setup — measured 290-611 s round 5 — so the
    bound must cover connect + compile + 3 median samples)."""
    import threading

    def fire():
        print(json.dumps({
            'metric': 'detect_plus_track_ms_per_frame', 'value': None,
            'unit': 'ms', 'vs_baseline': None,
            'error': f'bench exceeded {seconds}s — TPU relay tunnel '
                     'unresponsive?'}), flush=True)
        os._exit(2)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    from jmodt_tpu.config import Config
    from jmodt_tpu.data.synthetic import make_eval_frame
    from jmodt_tpu.models import PointRCNN
    from jmodt_tpu.models.rcnn import CorrelationHead
    from jmodt_tpu.pipeline import make_joint_step
    from jmodt_tpu.tracking.device_tracker import init_state
    from jmodt_tpu.utils import enable_compilation_cache

    watchdog = _hang_watchdog()
    enable_compilation_cache()
    cfg = Config()
    if os.environ.get('BENCH_PALLAS_FPS'):
        # A/B hook: USE_PALLAS_FPS now defaults True, so the useful arm is
        # BENCH_PALLAS_FPS=0 — forces the XLA-scan FPS for on-chip
        # comparison against the default Pallas path
        import dataclasses
        val = os.environ['BENCH_PALLAS_FPS'].lower() not in ('0', 'false')
        cfg = dataclasses.replace(
            cfg, RPN=dataclasses.replace(cfg.RPN, USE_PALLAS_FPS=val))
    frames = [make_eval_frame(seed=s, cfg=cfg, raw_u8=True)
              for s in range(16)]
    f0 = frames[0]
    feat_dim = cfg.RCNN.SA_CONFIG.MLPS[-1][-1]
    head = CorrelationHead(cfg.REID.LINK_FC, use_bn=cfg.REID.USE_BN)
    link_p = head.init(jax.random.PRNGKey(1),
                       np.zeros((1, feat_dim), np.float32))
    state0 = init_state(64, feat_dim)
    sync = jax.jit(lambda s: jnp.sum(s.mean) + jnp.sum(s.score))

    # compile + warm.  IMPORTANT measurement note: on this relay
    # `block_until_ready` ACKs WITHOUT waiting for execution (measured: a
    # chained-matmul loop "completes" at 388 PFLOP/s; with a value fetch it
    # lands at 181 TFLOP/s = 92% of v5e peak).  The only honest sync is
    # fetching a value that depends on the full computation, so every
    # timing below ends with a scalar fetch and the per-frame number is the
    # SLOPE between two loop lengths — the constant fetch latency cancels.
    # The fused-SA program is tried first; if its compile fails on this
    # backend the bench degrades to the plain path rather than reporting
    # nothing (the JSON records which path ran).
    def build(c):
        m = PointRCNN(c, mode='EVAL')
        v = jax.jit(lambda k: m.init(
            k, f0['pts_input'],
            (f0['img'].astype(np.float32) / 255.0 - 0.45) / 0.22,
            f0['pts_xy'], train=False))(jax.random.PRNGKey(0))
        j = make_joint_step(c, m, head.apply, det_score_thresh=0.2)
        st, _ = j(v, link_p, state0, jnp.asarray(1),
                  f0['pts_input'], f0['img'], f0['pts_xy'])
        float(sync(st))
        return m, v, j

    try:
        model, variables, joint = build(cfg)
        fused_sa = cfg.RCNN.FUSED_SA
    except Exception:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, RCNN=dataclasses.replace(cfg.RCNN, FUSED_SA=False))
        model, variables, joint = build(cfg)
        fused_sa = False

    def timed_pass(n_frames, dev_inputs=None):
        st = state0
        t0 = time.perf_counter()
        for i in range(n_frames):
            if dev_inputs is None:
                f = frames[i % len(frames)]
                args = (f['pts_input'], f['img'], f['pts_xy'])
            else:
                args = dev_inputs[i % len(dev_inputs)]
            st, packed = joint(variables, link_p, st, jnp.asarray(i + 1),
                               *args)
        float(sync(st))  # forces the whole chain
        return time.perf_counter() - t0, packed

    # Headline metrics are MEDIANS of >= 3 in-process slope samples with
    # min/max reported alongside (VERDICT r4 weak #3: same-day single-draw
    # artifacts disagreed 2-3.5x under relay noise; only same-process
    # repetition makes cross-round comparisons meaningful).
    N_REPEATS = 3

    def stats(samples):
        s = sorted(samples)
        return {'median': round(s[len(s) // 2] * 1e3, 3),
                'min': round(s[0] * 1e3, 3),
                'max': round(s[-1] * 1e3, 3)}

    def slope(n_small, n_big, dev_inputs=None):
        samples = []
        packed = None
        for _ in range(N_REPEATS):
            t_small, _ = timed_pass(n_small, dev_inputs)
            t_big, packed = timed_pass(n_big, dev_inputs)
            samples.append((t_big - t_small) / (n_big - n_small))
        return samples, packed

    dt_samples, packed_last = slope(N_FRAMES // 4, N_FRAMES)
    dt = sorted(dt_samples)[len(dt_samples) // 2]
    outs = [packed_last]

    # two-slot software pipelining (VERDICT r3 next-step #4): issue frame
    # i+1's host->device transfers while frame i's program executes, so
    # upload latency hides behind compute.  Two flavors:
    #   devput — jax.device_put the next frame's three arrays right after
    #            dispatching the current program (async puts; round-2 found
    #            bare device_put in the CRITICAL path serializes the three
    #            arrays, but here they only need to finish before the NEXT
    #            dispatch)
    #   jitid  — push the next frame through a jitted identity, so the
    #            transfer rides the same overlapped arg-transfer path the
    #            direct call uses (costs one extra ~2.4 ms dispatch)
    jit_id = jax.jit(lambda a, b, c: (a, b, c))

    def timed_pass_pipelined(n_frames, put):
        st = state0
        f = frames[0]
        nxt = put(f['pts_input'], f['img'], f['pts_xy'])
        t0 = time.perf_counter()
        for i in range(n_frames):
            cur = nxt
            f = frames[(i + 1) % len(frames)]
            nxt = put(f['pts_input'], f['img'], f['pts_xy'])
            st, packed = joint(variables, link_p, st, jnp.asarray(i + 1),
                               *cur)
        float(sync(st))
        return time.perf_counter() - t0, packed

    def slope_pipelined(put):
        samples = []
        for _ in range(N_REPEATS):
            t_small, _ = timed_pass_pipelined(N_FRAMES // 4, put)
            t_big, _ = timed_pass_pipelined(N_FRAMES, put)
            samples.append((t_big - t_small) / (N_FRAMES - N_FRAMES // 4))
        return samples

    pipelined_devput = slope_pipelined(
        lambda *a: tuple(jax.device_put(x) for x in a))
    pipelined_jitid = slope_pipelined(jit_id)

    # secondary: device-resident inputs (the deployment condition where
    # frames arrive by DMA/infeed instead of per-call RPC upload)
    dev_frames = [tuple(jax.device_put(f[k])
                        for k in ('pts_input', 'img', 'pts_xy'))
                  for f in frames]
    jax.block_until_ready(dev_frames[-1])
    compute_samples, _ = slope(N_FRAMES // 4, N_FRAMES, dev_frames)
    compute_dt = sorted(compute_samples)[len(compute_samples) // 2]

    # validate outside the timed region: tracks were actually produced
    last = np.asarray(outs[-1])
    n_rows = int((last[:, 9] > 0.5).sum())
    assert np.isfinite(last).all()
    assert n_rows > 0, 'tracker emitted no rows'

    # MFU from ANALYTIC flops (hand-derived per-component MAC counts from
    # the config shapes, jmodt_tpu/utils/flops.py) over the DEVICE-RESIDENT
    # time — the utilization number excludes host->device upload latency
    # (ADVICE r2).  XLA cost_analysis is printed alongside as a cross-check
    # only: it UNDERCOUNTS the executed work here (BENCH_r04: 1.33e11 vs
    # the analytic 2.45e11) because custom-call Pallas kernels (FPS, fused
    # RCNN gather+MLP, three_nn) are invisible to it, while on the other
    # side it tallies worst-case loop bodies and masked lanes.  Treat the
    # analytic number as the MFU basis and both as estimates.
    from jmodt_tpu.utils.flops import detection_flops
    flops_analytic = detection_flops(cfg, track_k=16, max_tracks=64,
                                     feat_dim=feat_dim)['total']
    try:
        lowered = joint.lower(variables, link_p, state0, jnp.asarray(1),
                              f0['pts_input'], f0['img'], f0['pts_xy'])
        cost = lowered.compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_cost_analysis = float(cost.get('flops', 0.0))
    except Exception:
        flops_cost_analysis = 0.0

    # multi-stream throughput: S independent sequences in LOCKSTEP through
    # one fused program (make_batched_joint_step) — the offline-eval /
    # multi-camera serving condition.  Measured: the detection program is
    # bandwidth-bound, so S=4 costs ~3.6x one frame (~10% per-frame saving
    # plus 3 fewer dispatches), not the ~1x a latency-bound program would
    # give.
    from jmodt_tpu.pipeline import make_batched_joint_step
    from jmodt_tpu.tracking.device_tracker import init_batched_state
    S = 4
    bjoint = make_batched_joint_step(cfg, model, head.apply,
                                     det_score_thresh=0.2)
    bstate0 = init_batched_state(S, 64, feat_dim)
    bsync = jax.jit(lambda s: jnp.sum(s.mean) + jnp.sum(s.score))
    bframes = [(np.concatenate([frames[(i + s) % len(frames)]['pts_input']
                                for s in range(S)]),
                np.concatenate([frames[(i + s) % len(frames)]['img']
                                for s in range(S)]),
                np.concatenate([frames[(i + s) % len(frames)]['pts_xy']
                                for s in range(S)]))
               for i in range(8)]

    def bpass(n):
        st = bstate0
        t0 = time.perf_counter()
        for i in range(n):
            p, im, xy = bframes[i % len(bframes)]
            st, _ = bjoint(variables, link_p, st,
                           jnp.full((S,), i + 1, jnp.int32), p, im, xy)
        float(bsync(st))
        return time.perf_counter() - t0

    bpass(2)
    stream_samples = [(bpass(40) - bpass(10)) / 30 / S
                      for _ in range(N_REPEATS)]
    stream_dt = sorted(stream_samples)[N_REPEATS // 2]

    # apples-to-apples vs the reference baseline: its 0.01 s/frame is
    # tracking ONLY (reference tools/eval.py:387-400) — time our tracker
    # step standalone the same way (state-chained, fetch-synced slope)
    from jmodt_tpu.tracking.device_tracker import make_device_tracker_step
    trk = make_device_tracker_step(head.apply)
    db = np.zeros((16, 7), np.float32)
    db[:4, 3:6] = [1.5, 1.6, 3.9]
    db[:4, 2] = [10, 20, 30, 40]
    ds_ = np.zeros((16,), np.float32)
    ds_[:4] = 0.9
    df = np.random.RandomState(0).randn(16, feat_dim).astype(np.float32)
    dm = np.arange(16) < 4
    tsync = jax.jit(lambda s: jnp.sum(s.mean) + jnp.sum(s.score))

    def trk_pass(n):
        s = state0
        t0 = time.perf_counter()
        for i in range(n):
            s, _ = trk(s, jnp.asarray(i + 1), db, ds_, df, dm, link_p)
        float(tsync(s))
        return time.perf_counter() - t0

    trk_pass(2)
    track_samples = [(trk_pass(100) - trk_pass(25)) / 75
                     for _ in range(N_REPEATS)]
    track_dt = sorted(track_samples)[N_REPEATS // 2]

    dev = jax.devices()[0]
    kind = getattr(dev, 'device_kind', 'unknown')
    # bf16 dense peak per chip; f32 matmuls also run as bf16 MXU passes at
    # default precision
    peaks = {'TPU v4': 275e12, 'TPU v5e': 197e12, 'TPU v5 lite': 197e12,
             'TPU v5p': 459e12, 'TPU v5': 459e12, 'TPU v6e': 918e12,
             'TPU v6 lite': 918e12}
    peak_flops = next((v for k, v in peaks.items() if k.lower()
                       in str(kind).lower()), 197e12)
    mfu = (flops_analytic / compute_dt) / peak_flops

    watchdog.cancel()
    print(json.dumps({
        'metric': 'detect_plus_track_ms_per_frame',
        'value': round(dt * 1e3, 3),
        'unit': 'ms',
        'vs_baseline': round(BASELINE_S_PER_FRAME / dt, 2),
        'vs_baseline_note': ('full detect+track vs the reference '
                             'TRACKING-ONLY 10 ms published baseline; '
                             'like-for-like is tracking_vs_baseline'),
        'full_pipeline_streaming_ms': round(dt * 1e3, 3),
        'streaming_ms': stats(dt_samples),
        'last_frame_track_rows': n_rows,
        'compute_ms_per_frame': round(compute_dt * 1e3, 3),
        'compute_ms': stats(compute_samples),
        'pipelined_devput_ms_per_frame': round(
            sorted(pipelined_devput)[N_REPEATS // 2] * 1e3, 3),
        'pipelined_devput_ms': stats(pipelined_devput),
        'pipelined_jitid_ms_per_frame': round(
            sorted(pipelined_jitid)[N_REPEATS // 2] * 1e3, 3),
        'pipelined_jitid_ms': stats(pipelined_jitid),
        'streams4_ms_per_frame': round(stream_dt * 1e3, 3),
        'streams4_ms': stats(stream_samples),
        'streams4_fps': round(1.0 / stream_dt, 1),
        'tracking_only_ms_per_frame': round(track_dt * 1e3, 3),
        'tracking_only_ms': stats(track_samples),
        'tracking_vs_baseline': round(BASELINE_S_PER_FRAME / track_dt, 2),
        'device_kind': str(kind),
        'flops_analytic': flops_analytic,
        'flops_cost_analysis': flops_cost_analysis,
        'achieved_tflops': round(flops_analytic / compute_dt / 1e12, 2),
        'mfu': round(mfu, 4),
        'fused_sa': bool(fused_sa),
    }))


if __name__ == '__main__':
    main()
