"""A/B microbench of image-pyramid formulations (VERDICT r3 weak #1).

bench_components r4 attributes 5.1 ms of the 20.3 ms detection frame to
`img_pyramid` (4 NonOverlapDeconvs -> concat -> 1x1 conv + BN + ReLU,
reference backbone.py:130-139/187-196) — yet the op is ~17 GFLOP and
~700 MB of HBM traffic, i.e. well under 1 ms at speed of light, and the
full-resolution 384x1280 map it produces is only ever consumed by ONE
bilinear sample at 16384 points (feature_gather).  This tool measures
semantics-identical reformulations on the real chip:

  base         NonOverlapDeconv as shipped (matmul + 6-D depth-to-space
               transpose) + concat + 1x1 conv + BN + ReLU + feature_gather
  merged       depth-to-space with the trailing (dx, r) dims pre-merged
               (bigger contiguous copy units for the transpose)
  stack        depth-to-space as k row-slices stacked on a new axis
               (concat instead of transpose)
  fused_gather never materializes full resolution: per-level tap-major
               matmul outputs (H*W*k^2, r) stay in HBM; the four bilinear
               corners gather per-level rows directly (tap index computed
               from the full-res pixel), then 1x1-conv + BN + ReLU apply
               to the 4*N gathered rows only

Every variant is asserted equal to base (atol 1e-3) before timing;
timings are fetch-synced slopes (see CLAUDE.md).  Run on CPU
(JMODT_PLATFORM=cpu) as a parity smoke; numbers only mean anything on
the TPU.  Prints one JSON line.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))

from jmodt_tpu.utils.runtime import apply_platform_override  # noqa: E402

apply_platform_override()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


H, W = 384, 1280
CHANNELS = (64, 128, 256, 512)   # cfg.LI_FUSION.IMG_CHANNELS[1:]
KERNELS = (2, 4, 8, 16)          # cfg.LI_FUSION.DeConv_Kernels
REDUCE = 16                      # cfg.LI_FUSION.DeConv_Reduce[i]
OUT = 32                         # IMG_FEATURES_CHANNEL // 4
N_PTS = 16384
EPS = 1e-5


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    levels = [rng.randn(1, H // k, W // k, c).astype(np.float32)
              for k, c in zip(KERNELS, CHANNELS)]
    params = {}
    for i, (k, c) in enumerate(zip(KERNELS, CHANNELS)):
        params[f'w{i}'] = (rng.randn(k, k, c, REDUCE) * 0.05).astype(
            np.float32)
        params[f'b{i}'] = (rng.randn(REDUCE) * 0.1).astype(np.float32)
    params['vw'] = (rng.randn(4 * REDUCE, OUT) * 0.1).astype(np.float32)
    params['vb'] = (rng.randn(OUT) * 0.1).astype(np.float32)
    params['bn_scale'] = (rng.rand(OUT) + 0.5).astype(np.float32)
    params['bn_bias'] = (rng.randn(OUT) * 0.1).astype(np.float32)
    params['bn_mean'] = (rng.randn(OUT) * 0.1).astype(np.float32)
    params['bn_var'] = (rng.rand(OUT) + 0.5).astype(np.float32)
    xy = (rng.rand(1, N_PTS, 2) * 2.2 - 1.1).astype(np.float32)
    return levels, params, xy


def wmat(kern):
    """NonOverlapDeconv weight layout: cols ordered (dy, dx, r) with the
    double spatial flip (image_backbone.py:99-116)."""
    k, _, c, r = kern.shape
    return jnp.transpose(kern[::-1, ::-1], (2, 0, 1, 3)).reshape(
        c, k * k * r)


def bn_relu(x, p):
    s = p['bn_scale'] / jnp.sqrt(p['bn_var'] + EPS)
    return jnp.maximum(x * s + (p['bn_bias'] - p['bn_mean'] * s), 0.0)


def corner_data(xy, h, w):
    u = (xy[..., 0] + 1.0) * 0.5 * (w - 1)
    v = (xy[..., 1] + 1.0) * 0.5 * (h - 1)
    u0f, v0f = jnp.floor(u), jnp.floor(v)
    au, av = (u - u0f)[..., None], (v - v0f)[..., None]
    cl = lambda x, hi: jnp.clip(x, 0, hi).astype(jnp.int32)  # noqa: E731
    uu = (cl(u0f, w - 1), cl(u0f + 1, w - 1))
    vv = (cl(v0f, h - 1), cl(v0f + 1, h - 1))
    inu = (u0f >= 0) & (u0f <= w - 1), (u0f + 1 >= 0) & (u0f + 1 <= w - 1)
    inv = (v0f >= 0) & (v0f <= h - 1), (v0f + 1 >= 0) & (v0f + 1 <= h - 1)
    return uu, vv, inu, inv, au, av


def bilinear_from_corners(f, au, av):
    (f00, f01), (f10, f11) = f
    top = f00 * (1 - au) + f01 * au
    bot = f10 * (1 - au) + f11 * au
    return top * (1 - av) + bot * av


def sample_map(fmap, xy):
    """feature_gather (image_backbone.py:34-84) on an explicit map."""
    b, h, w, c = fmap.shape
    uu, vv, inu, inv, au, av = corner_data(xy, h, w)
    flat = fmap.reshape(b, h * w, c)

    def take(vi, ui, ok):
        t = jnp.take_along_axis(flat, (vi * w + ui)[..., None], axis=1)
        return t * ok[..., None].astype(fmap.dtype)

    f = tuple(tuple(take(vv[i], uu[j], inv[i] & inu[j])
                    for j in range(2)) for i in range(2))
    return bilinear_from_corners(f, au, av)


# ---------------------------------------------------------------- variants


def deconv_base(x, kern, bias):
    k, _, c, r = kern.shape
    b, h, w, _ = x.shape
    y = x.reshape(b * h * w, c) @ wmat(kern)
    y = y.reshape(b, h, w, k, k, r)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(b, h * k, w * k, r)
    return y + bias


def deconv_merged(x, kern, bias):
    k, _, c, r = kern.shape
    b, h, w, _ = x.shape
    y = x.reshape(b * h * w, c) @ wmat(kern)
    y = y.reshape(b, h, w, k, k * r)
    y = jnp.transpose(y, (0, 1, 3, 2, 4)).reshape(b, h * k, w * k, r)
    return y + bias


def deconv_stack(x, kern, bias):
    k, _, c, r = kern.shape
    b, h, w, _ = x.shape
    y = x.reshape(b * h * w, c) @ wmat(kern)
    y = y.reshape(b, h, w, k, k * r)
    rows = [y[:, :, :, dy, :].reshape(b, h, w * k, r) for dy in range(k)]
    y = jnp.stack(rows, axis=2)          # (b, h, k, w*k, r)
    return y.reshape(b, h * k, w * k, r) + bias


def deconv_stack_mm(x, kern, bias):
    """Row-major deconv (the model's `rowmajor=True` / 'stack_mm' eval
    mode): one matmul per kernel row dy — each lands its full-res rows
    contiguously, so the dy-stack interleave moves whole w*k*r rows
    instead of the k*r-element runs every post-matmul slice/transpose
    variant above is stuck with."""
    k, _, c, r = kern.shape
    b, h, w, _ = x.shape
    wk = wmat(kern).reshape(c, k, k * r)
    xf = x.reshape(b * h * w, c)
    rows = [(xf @ wk[:, dy]).reshape(b, h, w * k, r) for dy in range(k)]
    y = jnp.stack(rows, axis=2)          # (b, h, k, w*k, r)
    return y.reshape(b, h * k, w * k, r) + bias


def pyramid_full(levels, params, xy, deconv):
    ups = [deconv(levels[i], params[f'w{i}'], params[f'b{i}'])
           for i in range(4)]
    x = jnp.concatenate(ups, axis=-1) @ params['vw'] + params['vb']
    return sample_map(bn_relu(x, params), xy)


def pyramid_fused_gather(levels, params, xy):
    """Tap-major per-level tables + direct corner gathers; the 1x1 conv,
    BN and ReLU run on the 4*N gathered rows only.  relu(BN(.)) applies
    per PIXEL before the bilinear blend and out-of-map corners contribute
    zero AFTER the relu — identical to sampling the materialized map."""
    tabs = []
    for i, (k, c) in enumerate(zip(KERNELS, CHANNELS)):
        x = levels[i]
        b, h, w, _ = x.shape
        y = x.reshape(b * h * w, c) @ wmat(params[f'w{i}'])
        tabs.append(y.reshape(b, h * w * k * k, REDUCE)
                    + params[f'b{i}'])     # rows: (pix, dy, dx)
    uu, vv, inu, inv, au, av = corner_data(xy, H, W)

    def corner(vi, ui, ok):
        per = []
        for i, k in enumerate(KERNELS):
            wi = W // k
            row = ((vi // k) * wi + ui // k) * (k * k) \
                + (vi % k) * k + (ui % k)
            per.append(jnp.take_along_axis(tabs[i], row[..., None], axis=1))
        g = jnp.concatenate(per, axis=-1) @ params['vw'] + params['vb']
        return bn_relu(g, params) * ok[..., None].astype(g.dtype)

    f = tuple(tuple(corner(vv[i], uu[j], inv[i] & inu[j])
                    for j in range(2)) for i in range(2))
    return bilinear_from_corners(f, au, av)


def pyramid_pallas_d2s(levels, params, xy, interpret=False):
    """Pallas depth-to-space per level (jmodt_tpu/ops/pallas/
    depth_to_space.py — the kernel the model's 'pallas_d2s' eval mode
    uses) + ONE wide 4-corner gather of the pre-conv concat map +
    conv/BN/ReLU on the 4N gathered rows only."""
    from jmodt_tpu.ops.pallas.depth_to_space import (depth_to_space_pallas,
                                                     supported)
    ups = []
    for i in range(4):
        x, kern = levels[i], params[f'w{i}']
        k, _, c, r = kern.shape
        b, h0, w0, _ = x.shape
        if interpret or supported(k, r, h0, w0):
            y = x.reshape(b * h0 * w0, c) @ wmat(kern)
            fr = depth_to_space_pallas(y.reshape(1, h0 * w0, k * k * r),
                                       k, r, h0, w0, interpret=interpret)
            fr = fr + params[f'b{i}']
        else:
            # Mosaic gate (k*r < 128): rowmajor fallback, as in the model
            fr = deconv_stack_mm(x, kern, params[f'b{i}']).reshape(
                1, H * W, r)
        ups.append(fr)
    flat = jnp.concatenate(ups, axis=-1)             # (1, H*W, 4*REDUCE)

    uu, vv, inu, inv, au, av = corner_data(xy, H, W)

    def corner(vi, ui, ok):
        g = jnp.take_along_axis(flat, (vi * W + ui)[..., None], axis=1)
        g = bn_relu(g @ params['vw'] + params['vb'], params)
        return g * ok[..., None].astype(g.dtype)

    f = tuple(tuple(corner(vv[i], uu[j], inv[i] & inu[j])
                    for j in range(2)) for i in range(2))
    return bilinear_from_corners(f, au, av)


def pyramid_gather_preconv(levels, params, xy, deconv=deconv_base):
    """Materialize the PRE-conv concat map with the stock depth-to-space,
    gather the four corners once (wide 64-ch rows), conv/BN/ReLU on the
    4N rows.  Isolates 'one wide gather + row-conv' from the d2s form."""
    ups = [deconv(levels[i], params[f'w{i}'], params[f'b{i}'])
           for i in range(4)]
    flat = jnp.concatenate(ups, axis=-1).reshape(1, H * W, 4 * REDUCE)
    uu, vv, inu, inv, au, av = corner_data(xy, H, W)

    def corner(vi, ui, ok):
        g = jnp.take_along_axis(flat, (vi * W + ui)[..., None], axis=1)
        g = bn_relu(g @ params['vw'] + params['vb'], params)
        return g * ok[..., None].astype(g.dtype)

    f = tuple(tuple(corner(vv[i], uu[j], inv[i] & inu[j])
                    for j in range(2)) for i in range(2))
    return bilinear_from_corners(f, au, av)


# ---------------------------------------------------------------- driver


def slope_time(fn, args, iters=16):
    sync = jax.jit(lambda o: jnp.sum(o.astype(jnp.float32)))

    def run(n):
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = fn(*args)
        float(sync(out))
        return time.perf_counter() - t0

    fn(*args)
    run(2)
    n1, n2 = max(2, iters // 4), iters
    return (run(n2) - run(n1)) / (n2 - n1)


def main():
    on_tpu = jax.default_backend() == 'tpu'
    levels, params, xy = make_inputs()
    levels = [jnp.asarray(x) for x in levels]
    params = {k: jnp.asarray(v) for k, v in params.items()}
    xy = jnp.asarray(xy)

    variants = {
        'base': jax.jit(functools.partial(pyramid_full, deconv=deconv_base)),
        'merged': jax.jit(functools.partial(pyramid_full,
                                            deconv=deconv_merged)),
        'stack': jax.jit(functools.partial(pyramid_full,
                                           deconv=deconv_stack)),
        'stack_mm': jax.jit(functools.partial(pyramid_full,
                                              deconv=deconv_stack_mm)),
        'fused_gather': jax.jit(pyramid_fused_gather),
        'gather_preconv': jax.jit(pyramid_gather_preconv),
        'gather_stack_mm': jax.jit(functools.partial(
            pyramid_gather_preconv, deconv=deconv_stack_mm)),
        'pallas_d2s': jax.jit(functools.partial(
            pyramid_pallas_d2s, interpret=not on_tpu)),
    }
    ref = np.asarray(variants['base'](levels, params, xy))
    out = {'metric': 'pyramid_variants', 'backend': jax.default_backend()}
    for name, fn in variants.items():
        got = np.asarray(fn(levels, params, xy))
        err = float(np.abs(got - ref).max())
        assert err < 1e-3, (name, err)
        out[f'{name}_maxerr'] = round(err, 7)
        if on_tpu:
            out[f'{name}_ms'] = round(
                slope_time(fn, (levels, params, xy)) * 1e3, 3)
    print(json.dumps(out))


if __name__ == '__main__':
    main()
