"""Per-component on-TPU latency profile of the joint detect+track frame.

Every timing ends with a value fetch that data-depends on the computation
and reports the SLOPE between two loop lengths (this relay's
`block_until_ready` ACKs without waiting; see CLAUDE.md round-3 note).

Usage: python tools/bench_components.py [--pallas_fps] [--iters 24]
Prints one JSON line with ms-per-call for each component.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))


def slope_time(fn, args, iters, chain_arg=None):
    """Time fn(*args) with fetch-synced slope.  If chain_arg is an index,
    the output is fed back into that positional arg to serialize the
    executions; otherwise executions are serialized by the final fetch."""
    sync = jax.jit(lambda o: jnp.sum(
        sum(jnp.sum(jnp.asarray(x, jnp.float32))
            for x in jax.tree_util.tree_leaves(o))))

    def run(n):
        a = list(args)
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*a)
            if chain_arg is not None:
                a[chain_arg] = out
        float(sync(out))
        return time.perf_counter() - t0

    fn(*args)  # compile
    run(2)     # warm
    n1, n2 = max(2, iters // 4), iters
    return (run(n2) - run(n1)) / (n2 - n1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--pallas_fps', action='store_true')
    ap.add_argument('--iters', type=int, default=24)
    args = ap.parse_args()

    from jmodt_tpu.config import Config
    from jmodt_tpu.data.synthetic import make_eval_frame
    from jmodt_tpu.models import PointRCNN
    from jmodt_tpu.models.backbone import PointNet2MSG
    from jmodt_tpu.models.inference import make_detection_step
    from jmodt_tpu.models.rcnn import CorrelationHead
    from jmodt_tpu.ops.grouping import ball_query, ball_query_multi
    from jmodt_tpu.ops.fused_sa import fold_pointwise_mlp, fused_sa_eval
    from jmodt_tpu.ops.sampling import farthest_point_sample
    from jmodt_tpu.tracking.device_tracker import (init_state,
                                                   make_device_tracker_step)
    from jmodt_tpu.utils import (apply_platform_override,
                                 enable_compilation_cache)

    apply_platform_override()
    enable_compilation_cache()
    cfg = Config()
    if args.pallas_fps:
        cfg = dataclasses.replace(
            cfg, RPN=dataclasses.replace(cfg.RPN, USE_PALLAS_FPS=True))
    # NOTE: --pallas_fps only switches the STANDALONE fps_* rows; model-level
    # rows (sa_level*, backbone, detection_step, rcnn_*) follow the config
    # defaults recorded here (USE_PALLAS_FPS / FUSED_SA are default-True)
    res = {'standalone_fps_pallas': bool(args.pallas_fps),
           'cfg_use_pallas_fps': bool(cfg.RPN.USE_PALLAS_FPS),
           'cfg_fused_sa': bool(cfg.RCNN.FUSED_SA)}
    it = args.iters

    f0 = make_eval_frame(seed=0, cfg=cfg, raw_u8=True)
    pts = jnp.asarray(f0['pts_input'])
    img_f32 = jnp.asarray(
        (f0['img'].astype(np.float32) / 255.0 - 0.45) / 0.22)
    xy = jnp.asarray(f0['pts_xy'])

    # ---- FPS per level (RPN shapes) ----
    key = jax.random.PRNGKey(0)
    for n, m in [(16384, 4096), (4096, 1024), (1024, 256), (256, 64)]:
        cloud = jax.random.normal(key, (1, n, 3)) * 30.0
        fn = jax.jit(lambda x, _m=m: farthest_point_sample(
            x, _m, use_pallas=args.pallas_fps))
        res[f'fps_{n}_{m}'] = slope_time(fn, [cloud], it) * 1e3
    # RCNN-shaped batched FPS (100 rois)
    cloud = jax.random.normal(key, (100, 512, 3))
    fn = jax.jit(lambda x: farthest_point_sample(
        x, 128, use_pallas=args.pallas_fps))
    res['fps_roi_100x512_128'] = slope_time(fn, [cloud], it) * 1e3
    # mid-level Pallas FPS below the n>=2048 dispatch threshold (B=1):
    # direct kernel call to decide whether the threshold should drop
    if jax.default_backend() == 'tpu':
        from jmodt_tpu.ops.pallas.fps import (
            farthest_point_sample_batched_pallas, farthest_point_sample_pallas)
        for n, m in [(1024, 256), (256, 64)]:
            cloud = jax.random.normal(key, (1, n, 3)) * 30.0
            fn = jax.jit(lambda x, _m=m: farthest_point_sample_pallas(
                x, _m))
            res[f'fps_pallas_{n}_{m}'] = slope_time(fn, [cloud], it) * 1e3
        # batched row-tiled kernel at the RCNN RoI shape
        cloud = jax.random.normal(key, (100, 512, 3))
        fn = jax.jit(lambda x: farthest_point_sample_batched_pallas(x, 128))
        res['fps_roi_pallas_100x512_128'] = slope_time(fn, [cloud], it) * 1e3
        # batched kernel at the multi-stream / train level-0 shape (B=4,
        # N=16384): one lockstep program vs the single-cloud kernel's four
        # serialized grid rows — validates the b>1 dispatch (sampling.py)
        cloud = jax.random.normal(key, (4, 16384, 3)) * 30.0
        fn = jax.jit(lambda x: farthest_point_sample_batched_pallas(x, 4096))
        res['fps_b4_batched_16384_4096'] = slope_time(fn, [cloud], it) * 1e3
        fn = jax.jit(lambda x: farthest_point_sample_pallas(x, 4096))
        res['fps_b4_single_16384_4096'] = slope_time(fn, [cloud], it) * 1e3

    # ---- ball query level 0 (the largest pairwise matrix) ----
    cloud = jax.random.normal(key, (1, 16384, 3)) * 30.0
    cent = cloud[:, :4096]
    for r, s in [(0.1, 16), (0.5, 32)]:
        fn = jax.jit(lambda x, c, _r=r, _s=s: ball_query(_r, _s, x, c))
        res[f'ballq_16384x4096_r{r}'] = slope_time(fn, [cloud, cent],
                                                   it) * 1e3

    # ---- SA levels standalone (RPN shapes incl. grouped MLPs) ----
    from jmodt_tpu.models.pointnet2 import SAModuleMSG, FPModule
    sa_cfg = cfg.RPN.SA_CONFIG
    counts = [16384] + list(sa_cfg.NPOINTS)
    c_in = 0
    for k in range(len(sa_cfg.NPOINTS)):
        mlps = tuple(tuple(m) for m in sa_cfg.MLPS[k])
        mod = SAModuleMSG(npoint=sa_cfg.NPOINTS[k], radii=sa_cfg.RADIUS[k],
                          nsamples=sa_cfg.NSAMPLE[k], mlps=mlps,
                          use_bn=cfg.RPN.USE_BN,
                          use_pallas_fps=cfg.RPN.USE_PALLAS_FPS)
        cloud = jax.random.normal(key, (1, counts[k], 3)) * 30.0
        feats = (jax.random.normal(key, (1, counts[k], c_in))
                 if c_in else None)
        v = jax.jit(lambda kk, c=cloud, f=feats, m=mod: m.init(
            kk, c, f, False))(jax.random.PRNGKey(k))
        fn = jax.jit(lambda vv, c, f, m=mod: m.apply(vv, c, f, False))
        res[f'sa_level{k}'] = slope_time(fn, [v, cloud, feats], it) * 1e3

        # ---- per-op decomposition of levels 1-3 (round 4): their
        # standalone costs (2-4 ms) exceed any FLOP/traffic bound ~10x;
        # attribute fps vs ball-query vs gather+MLP before considering a
        # whole-level megakernel (PERF_ANALYSIS.md lever #2) ----
        if k >= 1 and feats is not None:
            cent = cloud[:, :sa_cfg.NPOINTS[k]]
            fn = jax.jit(lambda c, m=sa_cfg.NPOINTS[k]: farthest_point_sample(
                c, m, use_pallas=cfg.RPN.USE_PALLAS_FPS))
            res[f'sa{k}_fps'] = slope_time(fn, [cloud], it) * 1e3
            radii = tuple(sa_cfg.RADIUS[k])
            nsamp = tuple(sa_cfg.NSAMPLE[k])
            fn = jax.jit(lambda x, c: ball_query_multi(radii, nsamp, x, c))
            res[f'sa{k}_ballq_multi'] = slope_time(fn, [cloud, cent],
                                                   it) * 1e3
            fn = jax.jit(lambda x, c: ball_query(radii[0], nsamp[0], x, c))
            res[f'sa{k}_ballq_scale0'] = slope_time(fn, [cloud, cent],
                                                    it) * 1e3
            nbr = jax.jit(lambda x, c: ball_query(
                radii[0], nsamp[0], x, c))(cloud, cent)
            folded = fold_pointwise_mlp(
                v['params']['mlp_0'],
                v['batch_stats']['mlp_0'] if cfg.RPN.USE_BN else None)
            fn = jax.jit(lambda x, f, c, n, fl: fused_sa_eval(
                x, f, c, n, fl))
            res[f'sa{k}_fused_gather_mlp'] = slope_time(
                fn, [cloud, feats, cent, nbr, folded], it) * 1e3

            # whole-level megakernel (ops/pallas/sa_level.py): FPS +
            # ball query + gather + MLP + max in one Pallas program —
            # A/B against the fused-eval module path above
            mega_mod = SAModuleMSG(
                npoint=sa_cfg.NPOINTS[k], radii=sa_cfg.RADIUS[k],
                nsamples=sa_cfg.NSAMPLE[k], mlps=mlps,
                use_bn=cfg.RPN.USE_BN,
                use_pallas_fps=cfg.RPN.USE_PALLAS_FPS, mega_eval=True)
            fn = jax.jit(lambda vv, c, f, m=mega_mod: m.apply(vv, c, f,
                                                              False))
            res[f'sa_level{k}_mega'] = slope_time(fn, [v, cloud, feats],
                                                  it) * 1e3
            fused_mod = SAModuleMSG(
                npoint=sa_cfg.NPOINTS[k], radii=sa_cfg.RADIUS[k],
                nsamples=sa_cfg.NSAMPLE[k], mlps=mlps,
                use_bn=cfg.RPN.USE_BN,
                use_pallas_fps=cfg.RPN.USE_PALLAS_FPS, fused_eval=True)
            fn = jax.jit(lambda vv, c, f, m=fused_mod: m.apply(vv, c, f,
                                                               False))
            res[f'sa_level{k}_fusedsa'] = slope_time(fn, [v, cloud, feats],
                                                     it) * 1e3
        c_in = sum(m[-1] for m in mlps)

    # ---- FP level 0 (coarse 4096 -> fine 16384, the big one) ----
    fine = jax.random.normal(key, (1, 16384, 3)) * 30.0
    coarse = jax.random.normal(key, (1, 4096, 3)) * 30.0
    cfeat = jax.random.normal(key, (1, 4096, 128))
    fp = FPModule(mlp=tuple(cfg.RPN.FP_MLPS[0]), use_bn=cfg.RPN.USE_BN)
    v = jax.jit(lambda kk: fp.init(kk, fine, coarse, None, cfeat,
                                   False))(jax.random.PRNGKey(9))
    fn = jax.jit(lambda vv, a, b, c: fp.apply(vv, a, b, None, c, False))
    res['fp_level0'] = slope_time(fn, [v, fine, coarse, cfeat], it) * 1e3

    # ---- three_nn at the FP0 shape: Pallas (default on TPU) vs XLA ----
    from jmodt_tpu.ops.interpolate import three_nn
    fn = jax.jit(lambda a, b: three_nn(a, b))
    res['three_nn_16384x4096'] = slope_time(fn, [fine, coarse], it) * 1e3
    fn = jax.jit(lambda a, b: three_nn(a, b, use_pallas=False))
    res['three_nn_16384x4096_xla'] = slope_time(fn, [fine, coarse],
                                                it) * 1e3

    # ---- greedy rotated NMS at eval shapes (100 keeps over 100 boxes) ----
    from jmodt_tpu.ops.nms import nms_bev
    from jmodt_tpu.ops.geometry import boxes3d_to_bev
    boxes = jax.random.normal(key, (100, 7)) * 5.0 + jnp.asarray(
        [0, 1.6, 30, 1.5, 1.6, 3.9, 0])
    scores = jax.random.uniform(key, (100,))
    fn = jax.jit(lambda b, s: nms_bev(boxes3d_to_bev(b), s, 0.1,
                                      max_keep=100,
                                      valid=jnp.ones(100, bool),
                                      rotated=True))
    res['nms_100'] = slope_time(fn, [boxes, scores], it) * 1e3

    # ---- roipool3d at eval shapes (100 rois x 16384 pts) ----
    from jmodt_tpu.ops.roipool3d import roipool3d
    pts = jax.random.normal(key, (1, 16384, 3)) * 30.0
    feats100 = jax.random.normal(key, (1, 16384, 130))
    rois100 = jax.random.normal(key, (1, 100, 7)) * 5.0 + jnp.asarray(
        [0, 1.6, 30, 1.5, 1.6, 3.9, 0])
    fn = jax.jit(lambda p, f, r: roipool3d(p, f, r, 0.2, 512))
    res['roipool_100x16384'] = slope_time(fn, [pts, feats100, rois100],
                                          it) * 1e3

    # ---- image CNN alone (4 BasicBlocks at 384x1280) ----
    from jmodt_tpu.models.image_backbone import BasicBlock

    class _ImgStack(__import__('flax').linen.Module):
        @__import__('flax').linen.compact
        def __call__(self, x):
            for c in (64, 128, 256, 512):
                x = BasicBlock(c)(x, train=False)
            return x

    stack = _ImgStack()
    im = jax.random.normal(key, (1, 384, 1280, 3))
    ivars = jax.jit(stack.init)(jax.random.PRNGKey(0), im)
    fn = jax.jit(stack.apply)
    res['image_cnn'] = slope_time(fn, [ivars, im], it) * 1e3

    # ---- backbone (SA+FP+fusion) ----
    model = PointRCNN(cfg, mode='EVAL')
    variables = jax.jit(lambda k: model.init(
        k, pts, img_f32, xy, train=False))(jax.random.PRNGKey(0))
    bb = PointNet2MSG(cfg=cfg)
    bvars = jax.jit(lambda k: bb.init(k, pts, img_f32, xy,
                                      train=False))(jax.random.PRNGKey(0))
    fn = jax.jit(lambda v, p, im, x: bb.apply(v, p, im, x, train=False))
    res['backbone'] = slope_time(fn, [bvars, pts, img_f32, xy], it) * 1e3

    # ---- backbone internals attribution (fusion/pyramid/FP-stack) ----
    from jmodt_tpu.models.backbone import AttentionFusion
    from jmodt_tpu.models.image_backbone import (ImagePyramidFusion,
                                                 feature_gather)
    li = cfg.LI_FUSION
    img_levels = [jax.random.normal(key, (1, 384 >> (k + 1),
                                          1280 >> (k + 1),
                                          li.IMG_CHANNELS[k + 1]))
                  for k in range(4)]
    pyr = ImagePyramidFusion(reduce_channels=li.DeConv_Reduce,
                             kernels=li.DeConv_Kernels,
                             out_channels=li.IMG_FEATURES_CHANNEL // 4)
    pvars = jax.jit(lambda k: pyr.init(k, img_levels,
                                       train=False))(jax.random.PRNGKey(5))
    fn = jax.jit(lambda v, a, b, c, d: pyr.apply(v, [a, b, c, d],
                                                 train=False))
    res['img_pyramid'] = slope_time(fn, [pvars] + img_levels, it) * 1e3

    # fused pyramid->gather (cfg.LI_FUSION.FUSED_PYRAMID eval path):
    # replaces img_pyramid + feature_gather_16384 in the frame
    fn = jax.jit(lambda v, a, b, c, d, x: pyr.apply(
        v, [a, b, c, d], train=False, xy=x))
    res['img_pyramid_fused_gather'] = slope_time(
        fn, [pvars] + img_levels + [xy], it) * 1e3

    full_img = jax.random.normal(
        key, (1, 384, 1280, li.IMG_FEATURES_CHANNEL // 4))
    fn = jax.jit(lambda im, x: feature_gather(im, x))
    res['feature_gather_16384'] = slope_time(fn, [full_img, xy], it) * 1e3

    p_feats = jax.random.normal(key, (1, 16384, li.IMG_FEATURES_CHANNEL))
    i_feats = jax.random.normal(key, (1, 16384,
                                      li.IMG_FEATURES_CHANNEL // 4))
    af = AttentionFusion(point_channels=li.IMG_FEATURES_CHANNEL,
                         out_channels=li.IMG_FEATURES_CHANNEL)
    avars = jax.jit(lambda k: af.init(k, p_feats, i_feats,
                                      train=False))(jax.random.PRNGKey(6))
    fn = jax.jit(lambda v, a, b: af.apply(v, a, b, train=False))
    res['final_fusion_16384'] = slope_time(fn, [avars, p_feats, i_feats],
                                           it) * 1e3

    # ---- proposal layer alone (decode 16384 bins + two-zone NMS) ----
    from jmodt_tpu.models.proposal import pool_rois_for_eval, proposal_layer
    reg_ch = 76 if cfg.RPN.LOC_XZ_FINE else 52
    rpn_scores = jax.random.normal(key, (1, 16384))
    rpn_reg = jax.random.normal(key, (1, 16384, reg_ch))
    fn = jax.jit(lambda s, r, x: proposal_layer(cfg, 'EVAL', s, r, x))
    res['proposal_layer'] = slope_time(fn, [rpn_scores, rpn_reg, pts],
                                       it) * 1e3

    # ---- RCNN forward alone (100 rois through the 3-level SA stack).
    # FUSED_SA defaults True, so the UNFUSED baseline must be forced
    # explicitly or both A/B rows silently measure the fused program ----
    from jmodt_tpu.models.rcnn import RCNN
    rc_ch = 3 + 1 + (1 if cfg.RCNN.USE_DEPTH else 0) + 128
    rcnn_in = jax.random.normal(key, (100, cfg.RCNN.NUM_POINTS, rc_ch))
    rcnn = RCNN(dataclasses.replace(
        cfg, RCNN=dataclasses.replace(cfg.RCNN, FUSED_SA=False)))
    rvars = jax.jit(lambda k: rcnn.init(k, rcnn_in, gt_tids=None,
                                        train=False))(jax.random.PRNGKey(2))
    fn = jax.jit(lambda v, x: rcnn.apply(v, x, gt_tids=None, train=False))
    res['rcnn_forward_100'] = slope_time(fn, [rvars, rcnn_in], it) * 1e3

    # ---- RCNN sa_0 attribution: gather vs grouped-MLP vs ball query ----
    # (sa_0 carries ~70% of the RCNN's analytic FLOPs; these split its
    # wall-clock between the ball query, the neighbor gather, and the
    # 131->128x3 grouped MLP to target the fused-kernel work)
    from jmodt_tpu.models.layers import PointwiseMLP
    from jmodt_tpu.ops.grouping import group_points_fl
    rxyz = jax.random.normal(key, (100, 512, 3)) * 2.0
    rfeat = jax.random.normal(key, (100, 512, 128))
    rnew = rxyz[:, :128]
    fn = jax.jit(lambda a, b: ball_query(0.2, 64, a, b))
    res['rcnn_ballq_0'] = slope_time(fn, [rxyz, rnew], it) * 1e3
    nbr = jax.jit(lambda a, b: ball_query(0.2, 64, a, b))(rxyz, rnew)
    fn = jax.jit(lambda f, i: group_points_fl(f, i))
    res['rcnn_gather_0'] = slope_time(fn, [rfeat, nbr], it) * 1e3
    grouped = jax.random.normal(key, (100, 128, 64, 131))
    pm = PointwiseMLP((128, 128, 128), use_bn=True)
    pv = jax.jit(lambda k: pm.init(k, grouped, False))(jax.random.PRNGKey(3))
    fn = jax.jit(lambda v, g: jnp.max(pm.apply(v, g, False), axis=2))
    res['rcnn_grouped_mlp_0'] = slope_time(fn, [pv, grouped], it) * 1e3

    # ---- fused eval SA A/B (cfg.RCNN.FUSED_SA): sa_0 level + full RCNN ----
    from jmodt_tpu.ops.fused_sa import fused_sa_eval
    sa0w = [(jax.random.normal(jax.random.PRNGKey(10 + i), shp) * 0.2,
             jax.random.normal(jax.random.PRNGKey(20 + i), (shp[1],)) * 0.1)
            for i, shp in enumerate([(131, 128), (128, 128), (128, 128)])]
    fn = jax.jit(lambda a, f, c, i: fused_sa_eval(a, f, c, i, sa0w,
                                                  use_pallas=True))
    res['rcnn_sa0_fused_pallas'] = slope_time(
        fn, [rxyz, rfeat, rnew, nbr], it) * 1e3
    fn = jax.jit(lambda a, f, c, i: fused_sa_eval(a, f, c, i, sa0w,
                                                  use_pallas=False))
    res['rcnn_sa0_fused_xla'] = slope_time(
        fn, [rxyz, rfeat, rnew, nbr], it) * 1e3
    rcnn_f = RCNN(dataclasses.replace(
        cfg, RCNN=dataclasses.replace(cfg.RCNN, FUSED_SA=True)))
    fn = jax.jit(lambda v, x: rcnn_f.apply(v, x, gt_tids=None, train=False))
    res['rcnn_forward_100_fused'] = slope_time(fn, [rvars, rcnn_in], it) * 1e3

    # ---- eval pooling (roipool + canonical rotate) ----
    seg = jax.random.uniform(key, (1, 16384))
    depth = jnp.linalg.norm(pts, axis=2)
    feats128 = jax.random.normal(key, (1, 16384, 128))
    fn = jax.jit(lambda f, r: pool_rois_for_eval(cfg, pts, f, seg, depth, r))
    res['pool_rois_eval_100'] = slope_time(fn, [feats128, rois100], it) * 1e3

    # ---- full detection step ----
    det = make_detection_step(cfg, model)
    res['detection_step'] = slope_time(
        det, [variables, pts, jnp.asarray(f0['img']), xy], it) * 1e3

    # ---- detection-step-level A/B of the round-4 eval fusions.  The
    # standalone component rows above don't attribute marginal cost
    # inside the fused program (XLA schedules/fuses across components:
    # their sum exceeds detection_step), so config knobs are judged by
    # flipping them on the WHOLE program.  Param trees are identical
    # across these flips — `variables` is shared. ----
    cfg_nofsa = dataclasses.replace(
        cfg, RPN=dataclasses.replace(cfg.RPN, FUSED_SA=False))
    det_nofsa = make_detection_step(cfg_nofsa, PointRCNN(cfg_nofsa,
                                                         mode='EVAL'))
    res['detection_step_rpn_unfused'] = slope_time(
        det_nofsa, [variables, pts, jnp.asarray(f0['img']), xy], it) * 1e3
    cfg_nofp = dataclasses.replace(
        cfg, LI_FUSION=dataclasses.replace(cfg.LI_FUSION,
                                           FUSED_PYRAMID=False))
    det_nofp = make_detection_step(cfg_nofp, PointRCNN(cfg_nofp,
                                                       mode='EVAL'))
    res['detection_step_full_pyramid'] = slope_time(
        det_nofp, [variables, pts, jnp.asarray(f0['img']), xy], it) * 1e3
    # FUSED_PYRAMID=True ('preconv' wide gather — the surviving alternate;
    # the pruned round-4 formulations live in tools/bench_pyramid.py)
    cfg_fp = dataclasses.replace(
        cfg, LI_FUSION=dataclasses.replace(cfg.LI_FUSION,
                                           FUSED_PYRAMID=True))
    det_fp = make_detection_step(cfg_fp, PointRCNN(cfg_fp, mode='EVAL'))
    res['detection_step_pyramid_preconv'] = slope_time(
        det_fp, [variables, pts, jnp.asarray(f0['img']), xy], it) * 1e3

    # SA megakernel A/B at the step level (cfg.RPN.MEGA_SA)
    cfg_mega = dataclasses.replace(
        cfg, RPN=dataclasses.replace(cfg.RPN, MEGA_SA=True))
    det_mega = make_detection_step(cfg_mega, PointRCNN(cfg_mega,
                                                       mode='EVAL'))
    res['detection_step_mega_sa'] = slope_time(
        det_mega, [variables, pts, jnp.asarray(f0['img']), xy], it) * 1e3

    # ---- batched detection step (4 frames per program: the lockstep
    # multi-stream / offline-eval condition; near-1x cost means the
    # per-frame time is latency- not FLOP-bound) ----
    pts4 = jnp.concatenate([pts] * 4)
    img4 = jnp.concatenate([jnp.asarray(f0['img'])] * 4)
    xy4 = jnp.concatenate([xy] * 4)
    res['detection_step_b4'] = slope_time(det, [variables, pts4, img4, xy4],
                                          it) * 1e3

    # ---- tracker step (state-chained) ----
    head = CorrelationHead(cfg.REID.LINK_FC, use_bn=cfg.REID.USE_BN)
    feat_dim = cfg.RCNN.SA_CONFIG.MLPS[-1][-1]
    lp = head.init(jax.random.PRNGKey(1),
                   np.zeros((1, feat_dim), np.float32))
    trk = make_device_tracker_step(head.apply)
    st = init_state(64, feat_dim)
    db = np.zeros((16, 7), np.float32)
    db[:4, 3:6] = [1.5, 1.6, 3.9]
    db[:4, 2] = [10, 20, 30, 40]
    ds = np.zeros((16,), np.float32)
    ds[:4] = 0.9
    df = np.random.RandomState(0).randn(16, feat_dim).astype(np.float32)
    dm = np.arange(16) < 4

    def trk_fn(state):
        s, _ = trk(state, jnp.asarray(5), db, ds, df, dm, lp)
        return s

    res['tracker_step'] = slope_time(jax.jit(trk_fn), [st], it,
                                     chain_arg=0) * 1e3

    res = {k: (round(v, 3) if isinstance(v, float) else v)
           for k, v in res.items()}
    print(json.dumps(res))


if __name__ == '__main__':
    main()
