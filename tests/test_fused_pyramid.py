"""Fused pyramid->gather eval path (config.py LIFusionConfig.FUSED_PYRAMID)
== materialize-then-feature_gather, on random params — including points
projecting outside the image (zero-padding corners) and batch > 1."""

import jax
import jax.numpy as jnp
import numpy as np

from jmodt_tpu.models.image_backbone import (ImagePyramidFusion,
                                             feature_gather)

KERNELS = (2, 4, 8, 16)
CHANNELS = (8, 16, 32, 64)
REDUCE = (4, 4, 4, 4)
OUT = 8


def _setup(rng, b=2, h=32, w=64):
    levels = [jnp.asarray(rng.randn(b, h // k, w // k, c).astype(np.float32))
              for k, c in zip(KERNELS, CHANNELS)]
    # xy range beyond [-1, 1] exercises the zero-padding corner masks
    xy = jnp.asarray((rng.rand(b, 50, 2) * 2.4 - 1.2).astype(np.float32))
    mod = ImagePyramidFusion(reduce_channels=REDUCE, kernels=KERNELS,
                             out_channels=OUT)
    variables = mod.init(jax.random.PRNGKey(0), levels, train=False)
    # randomize BN running stats so the fold is non-trivial
    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.rand(*a.shape).astype(np.float32) + 0.25),
        variables)
    return mod, variables, levels, xy


def test_fused_gather_matches_materialized(rng):
    mod, variables, levels, xy = _setup(rng)
    full = mod.apply(variables, levels, train=False)
    want = feature_gather(full, xy)
    got = mod.apply(variables, levels, train=False, xy=xy)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_param_trees_identical(rng):
    """Both call modes must create the same parameter tree, or checkpoints
    would depend on which path initialized the model."""
    mod, variables, levels, xy = _setup(rng)
    v2 = mod.init(jax.random.PRNGKey(0), levels, train=False,
                  xy=xy)
    a = {jax.tree_util.keystr(k): v.shape
         for k, v in jax.tree_util.tree_leaves_with_path(variables)}
    b = {jax.tree_util.keystr(k): v.shape
         for k, v in jax.tree_util.tree_leaves_with_path(v2)}
    assert a == b, set(a.items()) ^ set(b.items())


def test_backbone_eval_uses_fused_path(rng):
    """End-to-end: full backbone eval forward agrees between
    FUSED_PYRAMID on/off (the knob only changes the compute schedule)."""
    import dataclasses

    from jmodt_tpu.config import Config
    from tests.test_models import small_config

    cfg = small_config()
    from jmodt_tpu.models import PointRCNN
    model_on = PointRCNN(cfg, mode='EVAL')
    cfg_off = dataclasses.replace(
        cfg, LI_FUSION=dataclasses.replace(cfg.LI_FUSION,
                                           FUSED_PYRAMID=False))
    model_off = PointRCNN(cfg_off, mode='EVAL')

    from jmodt_tpu.data.synthetic import make_eval_frame
    frame = make_eval_frame(seed=0, cfg=cfg, img_hw=(64, 128),
                            npoints=cfg.RPN.NUM_POINTS)
    variables = model_on.init(jax.random.PRNGKey(0), frame['pts_input'],
                              frame['img'], frame['pts_xy'], train=False)
    out_on = model_on.apply(variables, frame['pts_input'], frame['img'],
                            frame['pts_xy'], train=False)
    out_off = model_off.apply(variables, frame['pts_input'], frame['img'],
                              frame['pts_xy'], train=False)
    for k in out_on:
        np.testing.assert_allclose(np.asarray(out_on[k]),
                                   np.asarray(out_off[k]),
                                   rtol=2e-4, atol=2e-4, err_msg=k)


def test_d2s_supported_gate():
    """Mosaic support matrix discovered on chip (round 4): the kernel
    lowers only when k*r is lane-aligned (128-divisible) — k=8/16 of the
    production levels — and the blocking needs h0 % 8 == 0 or a
    full-h0 block that fits VMEM."""
    from jmodt_tpu.ops.pallas.depth_to_space import supported
    # production pyramid levels (r=16)
    assert not supported(2, 16, 192, 640)   # k*r=32: Mosaic crash
    assert not supported(4, 16, 96, 320)    # k*r=64: Mosaic crash
    assert supported(8, 16, 48, 160)        # k*r=128: bit-exact on chip
    assert supported(16, 16, 24, 80)        # k*r=256: bit-exact on chip


def test_pallas_d2s_kernel_interpret(rng):
    """ops/pallas/depth_to_space == the XLA 6-D transpose, all pyramid
    level shapes, batch 1 and 2 (interpret mode; Mosaic compilation is
    exercised by tools/verify_pallas.py on the real chip)."""
    from jmodt_tpu.ops.pallas.depth_to_space import (depth_to_space_pallas,
                                                     depth_to_space_xla)
    for b in (1, 2):
        for k, r, h0, w0 in ((2, 4, 16, 32), (4, 4, 8, 16),
                             (8, 4, 4, 8), (16, 4, 2, 4)):
            taps = jnp.asarray(
                rng.randn(b, h0 * w0, k * k * r).astype(np.float32))
            want = depth_to_space_xla(taps, k, r, h0, w0)
            got = depth_to_space_pallas(taps, k, r, h0, w0,
                                        interpret=True)
            np.testing.assert_array_equal(np.asarray(got),
                                          np.asarray(want))


