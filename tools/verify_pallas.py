"""On-chip Pallas kernel parity driver (VERDICT r3 next-step #3).

The interpret-mode pytest suite (tests/test_pallas_fps.py,
tests/test_fused_sa.py) pins the kernels' MATH on CPU, but Mosaic
compilation behavior differs from the interpreter (the round-3
dynamic-lane-store bug compiled in interpret mode and only failed on
chip).  This driver runs every Pallas kernel COMPILED on the real TPU
against its XLA twin at production-like shapes, asserts parity, and
prints one JSON line:

  {"metric": "pallas_on_chip_parity", "pass": true/false,
   "<kernel>": "ok" | "<failure detail>", ...}

Exit 0 on full parity, 1 on any mismatch, 2 on relay hang (watchdog).
Runs anywhere via JMODT_PLATFORM=cpu (kernels then run in interpret
mode — useful for a smoke check of the driver itself, not a Mosaic
test).

Usage: python tools/verify_pallas.py
"""

from __future__ import annotations

import json
import os
import sys
import threading

sys.path.insert(
    0, os.path.abspath(os.path.join(os.path.dirname(__file__), '..')))


def _watchdog(seconds=int(os.environ.get('BENCH_WATCHDOG_S', 1200))):
    def fire():
        print(json.dumps({'metric': 'pallas_on_chip_parity', 'pass': None,
                          'error': f'exceeded {seconds}s — TPU relay '
                                   'unresponsive?'}), flush=True)
        os._exit(2)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    return t


def main():
    from jmodt_tpu.utils.runtime import apply_platform_override
    apply_platform_override()
    watchdog = _watchdog()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from jmodt_tpu.ops.fused_sa import fused_sa_eval
    from jmodt_tpu.ops.grouping import ball_query
    from jmodt_tpu.ops.interpolate import three_nn
    from jmodt_tpu.ops.pallas.fps import (
        farthest_point_sample_batched_pallas, farthest_point_sample_pallas)
    from jmodt_tpu.ops.pallas.grouped_gather_mlp import grouped_gather_mlp_max
    from jmodt_tpu.ops.pallas.three_nn import three_nn_pallas
    from jmodt_tpu.ops.sampling import farthest_point_sample, gather_xyz
    from jmodt_tpu.utils.runtime import enable_compilation_cache

    enable_compilation_cache()
    interpret = jax.default_backend() != 'tpu'
    rng = np.random.RandomState(2333)
    results: dict = {}

    def check(name, fn):
        try:
            fn()
            results[name] = 'ok'
        except Exception as e:  # noqa: BLE001 — report, don't crash
            results[name] = f'{type(e).__name__}: {e}'[:300]

    # ---- FPS single-cloud kernel (the RPN level-0 shape) ----------------
    def fps_single():
        xyz = rng.randn(1, 4096, 3).astype(np.float32) * 5
        want = np.asarray(jax.jit(
            lambda a: farthest_point_sample(a, 1024))(xyz))
        got = np.asarray(jax.jit(lambda a: farthest_point_sample_pallas(
            a, 1024, interpret=interpret))(xyz))
        np.testing.assert_array_equal(got, want)

    # ---- FPS batched lockstep kernel (the RCNN RoI shape) ---------------
    def fps_batched():
        xyz = rng.randn(100, 512, 3).astype(np.float32) * 5
        want = np.asarray(jax.jit(
            lambda a: farthest_point_sample(a, 128))(xyz))
        got = np.asarray(jax.jit(
            lambda a: farthest_point_sample_batched_pallas(
                a, 128, interpret=interpret))(xyz))
        np.testing.assert_array_equal(got, want)

    # ---- FPS batched at the VMEM row-tile cap (grid > 1, row padding) ---
    def fps_batched_tilecap():
        xyz = rng.randn(8, 16384, 3).astype(np.float32) * 5
        want = np.asarray(jax.jit(
            lambda a: farthest_point_sample(a, 64))(xyz))
        got = np.asarray(jax.jit(
            lambda a: farthest_point_sample_batched_pallas(
                a, 64, interpret=interpret))(xyz))
        np.testing.assert_array_equal(got, want)

    # ---- fused three-NN (the FP level-0 shape, with M padding) ----------
    def three_nn_check():
        # NOT an index-exact check: the Pallas kernel computes d2 by
        # direct subtract/square (VPU) while the XLA twin uses the matmul
        # identity — both f32-accurate (the twin at HIGHEST precision
        # since the round-4 fix), but rounded differently, so near-tied
        # neighbors can legitimately swap rank or even swap a set-boundary
        # tie.  The consumer (three_interpolate, inverse-distance
        # weights) is tie-invariant, so validate each path against a HOST
        # f64 oracle: every chosen neighbor's true distance must be
        # within a rounding band of the true 3rd-nearest, and the
        # reported distances must match the true ones.
        u = rng.randn(1, 2048, 3).astype(np.float32) * 10
        k = rng.randn(1, 1000, 3).astype(np.float32) * 10
        d_true = np.sqrt(((u[0][:, None].astype(np.float64)
                           - k[0][None].astype(np.float64)) ** 2).sum(-1))
        third = np.sort(d_true, axis=1)[:, 2]

        def oracle_check(d, i, label):
            d, i = np.asarray(d)[0], np.asarray(i)[0]
            chosen = np.take_along_axis(d_true, i.astype(np.int64), axis=1)
            worst = (chosen - third[:, None]).max()
            assert worst <= 1e-3, f'{label}: non-3NN pick, slack {worst}'
            np.testing.assert_allclose(d, chosen, atol=1e-3,
                                       err_msg=label)

        d_ref, i_ref = jax.jit(
            lambda a, b: three_nn(a, b, use_pallas=False))(u, k)
        d_p, i_p = jax.jit(lambda a, b: three_nn_pallas(
            a, b, interpret=interpret))(u, k)
        oracle_check(d_ref, i_ref, 'xla_twin')
        oracle_check(d_p, i_p, 'pallas')

    # ---- grouped gather+MLP+max (the RCNN sa_0 tile geometry) -----------
    def grouped_mlp():
        key = jax.random.PRNGKey(1)
        kx, kf, kw = jax.random.split(key, 3)
        b, n, m, s, c = 2, 1024, 128, 64, 128
        xyz = jax.random.normal(kx, (b, n, 3), jnp.float32)
        feats = jax.random.normal(kf, (b, n, c), jnp.float32)
        idx = farthest_point_sample(xyz, m)
        new_xyz = gather_xyz(xyz, idx)
        nbr = ball_query(2.5, s, xyz, new_xyz)
        ks = jax.random.split(kw, 6)
        widths = [(3 + c, 128), (128, 128), (128, 128)]
        layers = tuple(
            (jax.random.normal(ks[2 * i], w, jnp.float32) * 0.1,
             jax.random.normal(ks[2 * i + 1], (w[1],), jnp.float32) * 0.1)
            for i, w in enumerate(widths))
        twin = jax.jit(lambda *a: fused_sa_eval(*a, use_pallas=False))(
            xyz, feats, new_xyz, nbr, layers)

        def pal(xyz, feats, new_xyz, nbr, layers):
            (w1, b1), rest = layers[0], layers[1:]
            catf = jnp.concatenate([xyz, feats], axis=-1)
            return grouped_gather_mlp_max(catf @ w1, nbr, new_xyz @ w1[:3],
                                          b1, tuple(rest),
                                          interpret=interpret)

        out = jax.jit(pal)(xyz, feats, new_xyz, nbr, layers)

        # Parity criterion: NOT kernel == twin elementwise.  On chip both
        # paths run their matmuls at default MXU precision (bf16 operand
        # truncation), so each carries ~1e-2 noise vs the exact f64 math
        # and they legitimately disagree with each other at that level
        # (round-4 isolation: Mosaic dot == XLA dot bit-exact on equal
        # inputs; the divergence is rounding-boundary amplification of the
        # kernel's 3e-5-exact hi/lo gather).  A real Mosaic BUG (wrong
        # index, tile misalignment) shows up as error far above the
        # twin's own noise floor — so compare BOTH to a host f64 oracle
        # and require the kernel's error in the same class as the twin's.
        catf64 = np.concatenate([np.asarray(xyz), np.asarray(feats)],
                                axis=-1).astype(np.float64)
        h64 = np.take_along_axis(
            catf64, np.asarray(nbr).reshape(2, -1, 1).astype(np.int64),
            axis=1).reshape(2, 128, 64, 3 + 128)
        h64 -= np.concatenate(
            [np.asarray(new_xyz), np.zeros((2, 128, 128))],
            axis=-1).astype(np.float64)[:, :, None, :]
        for li, (w, bias) in enumerate(layers):
            h64 = np.maximum(
                h64 @ np.asarray(w, np.float64)
                + np.asarray(bias, np.float64), 0.0)
        oracle = h64.max(axis=2)
        err_twin = np.abs(np.asarray(twin) - oracle).max()
        err_kern = np.abs(np.asarray(out) - oracle).max()
        assert err_kern <= max(2e-4, 3.0 * err_twin), \
            f'kernel err {err_kern} vs twin err {err_twin}'

    # ---- ball query on-chip numerics (XLA op, host-f64 oracle) ----------
    # guards the round-4 precision bug class: at default MXU precision the
    # matmul-identity d2 carried ~unit-scale error against r^2 gates as
    # small as 0.01, silently corrupting every SA neighborhood on chip
    def ball_query_oracle():
        xyz = rng.randn(1, 2048, 3).astype(np.float32) * 15
        ctr = xyz[:, ::16].copy()                       # (1, 128, 3)
        r, s = 1.5, 16
        idx = np.asarray(jax.jit(
            lambda a, b: ball_query(r, s, a, b))(xyz, ctr))[0]
        d_true = np.sqrt(((ctr[0][:, None].astype(np.float64)
                           - xyz[0][None].astype(np.float64)) ** 2
                          ).sum(-1))                    # (128, 2048)
        tol = 1e-3
        for m in range(idx.shape[0]):
            row = idx[m]
            picked = d_true[m, row]
            assert (picked <= r + tol).all(), \
                f'center {m}: picked point {picked.max() - r} beyond r'
            # first-s-in-index-order semantics: every unpicked point
            # strictly inside (r - tol) and with index below the row's
            # max must appear, unless the row already holds s distinct
            distinct = len(set(row.tolist()))
            if distinct < s:
                inside = np.where(d_true[m] < r - tol)[0]
                missing = set(inside.tolist()) - set(row.tolist())
                assert not missing, f'center {m}: missed {missing}'

    def depth_to_space():
        from jmodt_tpu.ops.pallas.depth_to_space import (
            depth_to_space_pallas, depth_to_space_xla, supported)
        # production level shapes (k, r, h0, w0) Mosaic supports (k*r
        # must be lane-aligned: k=8/16; the model's pallas_d2s mode
        # falls back to the rowmajor deconv below that)
        checked = []
        for k, r, h0, w0 in ((2, 16, 192, 640), (4, 16, 96, 320),
                             (8, 16, 48, 160), (16, 16, 24, 80)):
            if not (interpret or supported(k, r, h0, w0)):
                continue
            checked.append(k)
            taps = jnp.asarray(rng.randn(
                1, h0 * w0, k * k * r).astype(np.float32))
            want = np.asarray(jax.jit(
                lambda t: depth_to_space_xla(t, k, r, h0, w0))(taps))
            got = np.asarray(depth_to_space_pallas(
                taps, k, r, h0, w0, interpret=interpret))
            # a pure data movement must be bit-exact
            assert (got == want).all(), \
                f'k={k}: {np.abs(got - want).max()} max diff'
        assert checked, 'no supported d2s level shape — gate broken?'

    # ---- whole-SA-level megakernel at all 3 production levels ----------
    def sa_level_mega():
        from jmodt_tpu.ops.pallas.sa_level import (sa_level_fused,
                                                   sa_level_fused_xla)
        shapes = [
            ('sa1', 4096, 1024, 96, (0.5, 1.0), (16, 32),
             ((64, 64, 128), (64, 96, 128))),
            ('sa2', 1024, 256, 256, (1.0, 2.0), (16, 32),
             ((128, 196, 256), (128, 196, 256))),
            ('sa3', 256, 64, 512, (2.0, 4.0), (16, 32),
             ((256, 256, 512), (256, 384, 512))),
        ]
        for name, n, m, c, radii, nsamples, mlps in shapes:
            xyz = jnp.asarray(rng.randn(1, n, 3).astype(np.float32) * 3)
            feats = jnp.asarray(rng.randn(1, n, c).astype(np.float32))
            folded = []
            for mlp in mlps:
                layers, cin = [], c + 3
                for cout in mlp:
                    layers.append((jnp.asarray(
                        rng.randn(cin, cout).astype(np.float32) * 0.2),
                        jnp.asarray(
                            rng.randn(cout).astype(np.float32) * 0.1)))
                    cin = cout
                folded.append(tuple(layers))
            got = jax.jit(lambda a, f, fo: sa_level_fused(
                a, f, m, radii, nsamples, fo,
                interpret=interpret))(xyz, feats, folded)
            want = jax.jit(lambda a, f, fo: sa_level_fused_xla(
                a, f, m, radii, nsamples, fo))(xyz, feats, folded)
            np.testing.assert_array_equal(np.asarray(got[2]),
                                          np.asarray(want[2]), err_msg=name)
            np.testing.assert_array_equal(np.asarray(got[0]),
                                          np.asarray(want[0]), err_msg=name)
            scale = float(np.abs(np.asarray(want[1])).max())
            err = float(np.abs(np.asarray(got[1])
                               - np.asarray(want[1])).max()) / scale
            # same error class as the bf16 hi/lo gather + default-
            # precision MLP dots (CLAUDE.md: twin-noise is ~1e-2 class)
            assert err < 2e-2, f'{name}: rel err vs scale {err}'

    check('ball_query_2048x128_oracle', ball_query_oracle)
    check('depth_to_space_all_levels', depth_to_space)
    check('sa_level_mega_all_levels', sa_level_mega)
    check('fps_single_4096_1024', fps_single)
    check('fps_batched_100x512_128', fps_batched)
    check('fps_batched_tilecap_8x16384_64', fps_batched_tilecap)
    check('three_nn_2048x1000', three_nn_check)
    check('grouped_gather_mlp_rcnn_sa0', grouped_mlp)

    ok = all(v == 'ok' for v in results.values())
    watchdog.cancel()
    print(json.dumps({
        'metric': 'pallas_on_chip_parity',
        'pass': ok,
        'backend': jax.default_backend(),
        'interpret_mode': bool(interpret),
        **results,
    }))
    sys.exit(0 if ok else 1)


if __name__ == '__main__':
    main()
