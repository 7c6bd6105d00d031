"""Fused eval SA path (ops/fused_sa.py + ops/pallas/grouped_gather_mlp.py)
vs the plain flax module: BN folding, hoisted first Dense, Pallas kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jmodt_tpu.models.pointnet2 import SAModuleMSG
from jmodt_tpu.ops.fused_sa import fold_pointwise_mlp, fused_sa_eval
from jmodt_tpu.ops.grouping import ball_query
from jmodt_tpu.ops.pallas.grouped_gather_mlp import grouped_gather_mlp_max
from jmodt_tpu.ops.sampling import farthest_point_sample, gather_xyz


def _random_level(key, b=3, n=64, c=16, m=16, s=8, mlp=(24, 24, 32),
                  use_bn=True):
    kx, kf, ki, kbn = jax.random.split(key, 4)
    xyz = jax.random.normal(kx, (b, n, 3), jnp.float32)
    feats = jax.random.normal(kf, (b, n, c), jnp.float32)
    mod = SAModuleMSG(npoint=m, radii=(1.5,), nsamples=(s,),
                      mlps=(mlp,), use_xyz=True, use_bn=use_bn)
    variables = mod.init(ki, xyz, feats, False)
    if use_bn:
        # init leaves mean=0/var=1; randomize so the fold is non-trivial
        stats = jax.tree.map(
            lambda x: jax.random.uniform(kbn, x.shape, minval=0.3,
                                         maxval=1.7),
            variables['batch_stats'])
        variables = {'params': variables['params'], 'batch_stats': stats}
    return mod, variables, xyz, feats


@pytest.mark.parametrize('use_bn', [True, False])
def test_fold_matches_module(use_bn):
    """Folded (W, b) chain == PointwiseMLP eval apply (BN running stats)."""
    mod, variables, xyz, feats = _random_level(jax.random.PRNGKey(0),
                                               use_bn=use_bn)
    ref_xyz, ref_out, ref_idx = mod.apply(variables, xyz, feats, False)

    idx = farthest_point_sample(xyz, 16)
    new_xyz = gather_xyz(xyz, idx)
    nbr = ball_query(1.5, 8, xyz, new_xyz)
    folded = fold_pointwise_mlp(
        variables['params']['mlp_0'],
        variables['batch_stats']['mlp_0'] if use_bn else None)
    out = fused_sa_eval(xyz, feats, new_xyz, nbr, folded, use_pallas=False)
    np.testing.assert_allclose(out, ref_out, rtol=2e-4, atol=2e-5)


def test_pallas_kernel_matches_xla_fallback():
    """grouped_gather_mlp_max (interpret) == the XLA fallback math, at the
    real RCNN sa_0 tile geometry (S=64 so TMI subtiling engages)."""
    key = jax.random.PRNGKey(1)
    kx, kf, kw = jax.random.split(key, 3)
    b, n, m, s, c = 2, 256, 128, 64, 16
    xyz = jax.random.normal(kx, (b, n, 3), jnp.float32)
    feats = jax.random.normal(kf, (b, n, c), jnp.float32)
    idx = farthest_point_sample(xyz, m)
    new_xyz = gather_xyz(xyz, idx)
    nbr = ball_query(2.5, s, xyz, new_xyz)

    ks = jax.random.split(kw, 6)
    widths = [(3 + c, 24), (24, 24), (24, 32)]
    layers = tuple(
        (jax.random.normal(ks[2 * i], wshape, jnp.float32) * 0.2,
         jax.random.normal(ks[2 * i + 1], (wshape[1],), jnp.float32) * 0.1)
        for i, wshape in enumerate(widths))

    ref = fused_sa_eval(xyz, feats, new_xyz, nbr, layers, use_pallas=False)

    (w1, b1) = layers[0]
    catf = jnp.concatenate([xyz, feats], axis=-1)
    out = grouped_gather_mlp_max(catf @ w1, nbr, new_xyz @ w1[:3], b1,
                                 layers[1:], interpret=True)
    # tolerance floor: the kernel's one-hot gather reconstructs f1 from a
    # bf16 hi/lo split (~2^-17 relative), not bit-exactly
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize('use_bn', [True, False])
def test_module_fused_eval_flag(use_bn):
    """SAModuleMSG(fused_eval=True) eval apply == plain module apply."""
    mod, variables, xyz, feats = _random_level(jax.random.PRNGKey(2),
                                               use_bn=use_bn)
    _, ref_out, _ = mod.apply(variables, xyz, feats, False)
    fmod = SAModuleMSG(npoint=16, radii=(1.5,), nsamples=(8,),
                       mlps=((24, 24, 32),), use_xyz=True, use_bn=use_bn,
                       fused_eval=True)
    new_xyz, out, idx = fmod.apply(variables, xyz, feats, False)
    np.testing.assert_allclose(out, ref_out, rtol=2e-4, atol=2e-5)
    # with BN, train still takes the plain path (batch-stats semantics)
    if use_bn:
        _, tr_out, _ = fmod.apply(variables, xyz, feats, True,
                                  mutable=['batch_stats'])[0]


def test_fused_train_gradients_match():
    """Without BN the fused path is train-eligible: forward AND parameter
    gradients match the plain module (XLA fallback, autodiff)."""
    mod, variables, xyz, feats = _random_level(jax.random.PRNGKey(5),
                                               use_bn=False)
    fmod = SAModuleMSG(npoint=16, radii=(1.5,), nsamples=(8,),
                       mlps=((24, 24, 32),), use_xyz=True, use_bn=False,
                       fused_eval=True)

    def loss(params, m):
        _, out, _ = m.apply({'params': params}, xyz, feats, True)
        return jnp.sum(out * out)

    ref_l, ref_g = jax.value_and_grad(loss)(variables['params'], mod)
    fl, fg = jax.value_and_grad(loss)(variables['params'], fmod)
    np.testing.assert_allclose(fl, ref_l, rtol=1e-4)
    jax.tree.map(lambda a, b: np.testing.assert_allclose(
        a, b, rtol=5e-4, atol=1e-4), fg, ref_g)


def test_module_fused_eval_msg_two_scales():
    """MSG (two radii/nsamples/mlps) fused eval == plain module apply —
    the RPN-backbone levels-1..3 shape of the feature (reference
    pointnet2_modules.py:356-390 multi-scale grouping)."""
    key = jax.random.PRNGKey(7)
    kx, kf, ki = jax.random.split(key, 3)
    b, n, c, m = 2, 96, 12, 24
    xyz = jax.random.normal(kx, (b, n, 3), jnp.float32)
    feats = jax.random.normal(kf, (b, n, c), jnp.float32)
    kw = dict(npoint=m, radii=(0.8, 1.6), nsamples=(8, 16),
              mlps=((16, 16, 24), (16, 24, 32)), use_xyz=True, use_bn=True)
    mod = SAModuleMSG(**kw)
    variables = mod.init(ki, xyz, feats, False)
    _, ref_out, _ = mod.apply(variables, xyz, feats, False)
    assert ref_out.shape == (b, m, 24 + 32)
    _, out, _ = SAModuleMSG(fused_eval=True, **kw).apply(
        variables, xyz, feats, False)
    np.testing.assert_allclose(out, ref_out, rtol=2e-4, atol=2e-5)


def test_module_fused_eval_features_none():
    """Fused eval on an xyz-only level (features=None — the RPN backbone's
    first SA level) == plain module apply."""
    key = jax.random.PRNGKey(8)
    kx, ki = jax.random.split(key)
    xyz = jax.random.normal(kx, (2, 64, 3), jnp.float32)
    kw = dict(npoint=16, radii=(1.0,), nsamples=(8,), mlps=((16, 16, 24),),
              use_xyz=True, use_bn=True)
    mod = SAModuleMSG(**kw)
    variables = mod.init(ki, xyz, None, False)
    _, ref_out, _ = mod.apply(variables, xyz, None, False)
    _, out, _ = SAModuleMSG(fused_eval=True, **kw).apply(
        variables, xyz, None, False)
    np.testing.assert_allclose(out, ref_out, rtol=2e-4, atol=2e-5)


def test_pallas_kernel_onehot_cap_geometry():
    """grouped_gather_mlp_max (interpret) at a backbone-level-1-like
    geometry where the one-hot VMEM cap forces TMI below the 512-row
    target (n large, s=32)."""
    key = jax.random.PRNGKey(9)
    kx, kf, kw = jax.random.split(key, 3)
    b, n, m, s, c1 = 1, 4096, 256, 32, 16
    feats1 = jax.random.normal(kf, (b, n, c1), jnp.float32)
    idx = jax.random.randint(kx, (b, m, s), 0, n)
    cxw = jax.random.normal(kw, (b, m, c1), jnp.float32) * 0.1
    b1 = jnp.linspace(-0.5, 0.5, c1)
    w2 = jax.random.normal(kw, (c1, 24), jnp.float32) * 0.2
    b2 = jnp.zeros((24,), jnp.float32)

    g = jnp.take_along_axis(feats1, idx.reshape(b, m * s, 1), axis=1)
    h = jnp.maximum(g.reshape(b, m, s, c1) + b1 - cxw[:, :, None, :], 0.0)
    ref = jnp.max(jnp.maximum(h @ w2 + b2, 0.0), axis=2)

    out = grouped_gather_mlp_max(feats1, idx, cxw, b1, ((w2, b2),),
                                 interpret=True)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_backbone_fused_flag_matches():
    """Miniature PointNet2MSG backbone (no image): RPN.FUSED_SA on == off
    at eval; level-0 keeps the plain path by the N>8192 gate only at full
    size, so here every level exercises the fused branch incl.
    features=None at level 0."""
    import dataclasses

    from jmodt_tpu.config import Config, SAConfig
    from jmodt_tpu.models.backbone import PointNet2MSG

    sa = SAConfig(NPOINTS=(32, 16), RADIUS=((0.5, 1.0), (1.0, 2.0)),
                  NSAMPLE=((8, 8), (8, 8)),
                  MLPS=(((8, 8, 16), (8, 8, 16)),
                        ((16, 16, 24), (16, 16, 24))))
    mk = lambda fused: dataclasses.replace(
        Config(),
        RPN=dataclasses.replace(Config().RPN, SA_CONFIG=sa,
                                FP_MLPS=((16, 16), (24, 24)),
                                NUM_POINTS=128, FUSED_SA=fused),
        LI_FUSION=dataclasses.replace(Config().LI_FUSION, ENABLED=False))
    key = jax.random.PRNGKey(11)
    pc = jax.random.normal(key, (2, 128, 3), jnp.float32)
    model = PointNet2MSG(cfg=mk(False))
    variables = model.init(jax.random.PRNGKey(12), pc, train=False)
    _, ref = model.apply(variables, pc, train=False)
    _, out = PointNet2MSG(cfg=mk(True)).apply(variables, pc, train=False)
    np.testing.assert_allclose(out, ref, rtol=3e-4, atol=3e-5)


def test_rcnn_forward_fused_flag_matches():
    """Full RCNN forward: FUSED_SA on == off (eval, no gt_tids)."""
    import dataclasses

    from jmodt_tpu.config import Config, RCNNSAConfig
    from jmodt_tpu.models.rcnn import RCNN

    base = Config()
    rcnn_sa = RCNNSAConfig(NPOINTS=(16, 8, -1), NSAMPLE=(8, 8, 8),
                           MLPS=((16, 16, 16), (16, 16, 24), (24, 24, 32)))
    mk = lambda fused: dataclasses.replace(base, RCNN=dataclasses.replace(
        base.RCNN, NUM_POINTS=64, SA_CONFIG=rcnn_sa, XYZ_UP_LAYER=(16, 16),
        CLS_FC=(16,), REG_FC=(16,), FUSED_SA=fused))
    key = jax.random.PRNGKey(3)
    rc_ch = 3 + 1 + 1 + 16
    x = jax.random.normal(key, (4, 64, rc_ch), jnp.float32)
    model = RCNN(mk(False))
    variables = model.init(jax.random.PRNGKey(4), x, gt_tids=None,
                           train=False)
    ref = model.apply(variables, x, gt_tids=None, train=False)
    out = RCNN(mk(True)).apply(variables, x, gt_tids=None, train=False)
    for k in ('rcnn_cls', 'rcnn_reg', 'rcnn_feat'):
        np.testing.assert_allclose(out[k], ref[k], rtol=2e-4, atol=2e-5)
