"""Pallas FPS kernel parity vs the XLA scan implementation (interpret mode
on the CPU test backend; the real kernel path is exercised on TPU by
/verify and bench)."""

import numpy as np
import pytest

from jmodt_tpu.ops.pallas.fps import farthest_point_sample_pallas
from jmodt_tpu.ops.sampling import farthest_point_sample


@pytest.mark.parametrize('n,npoint', [(256, 64), (512, 128)])
def test_matches_xla_scan(rng, n, npoint):
    xyz = rng.randn(2, n, 3).astype(np.float32) * 5
    want = np.asarray(farthest_point_sample(xyz, npoint))
    got = np.asarray(farthest_point_sample_pallas(xyz, npoint,
                                                  interpret=True))
    np.testing.assert_array_equal(got, want)


def test_first_index_is_zero(rng):
    xyz = rng.randn(1, 256, 3).astype(np.float32)
    got = np.asarray(farthest_point_sample_pallas(xyz, 32, interpret=True))
    assert got[0, 0] == 0
    assert len(set(got[0].tolist())) == 32  # distinct picks


def test_pallas_three_nn_matches_xla():
    """Fused Pallas 3-NN (interpret mode) is index-exact vs the XLA
    matmul+top_k path, including the M-padding sentinel branch."""
    import jax.numpy as jnp
    from jmodt_tpu.ops.interpolate import three_nn
    from jmodt_tpu.ops.pallas.three_nn import three_nn_pallas
    rng = np.random.RandomState(3)
    for n, m in ((256, 100), (512, 256), (128, 64)):
        u = jnp.asarray(rng.randn(2, n, 3).astype(np.float32) * 10)
        k = jnp.asarray(rng.randn(2, m, 3).astype(np.float32) * 10)
        d_ref, i_ref = three_nn(u, k, use_pallas=False)
        d_p, i_p = three_nn_pallas(u, k, interpret=True)
        assert (np.asarray(i_ref) == np.asarray(i_p)).all()
        np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_p),
                                   atol=1e-4)


@pytest.mark.parametrize('b,n,npoint', [(100, 512, 128), (20, 256, 64),
                                        (3, 128, 32), (4, 2048, 128)])
def test_batched_matches_xla_scan(rng, b, n, npoint):
    """Row-tiled batched FPS kernel (interpret) == the vmapped XLA scan,
    including non-multiple-of-8 batch sizes (row padding)."""
    from jmodt_tpu.ops.pallas.fps import farthest_point_sample_batched_pallas
    xyz = rng.randn(b, n, 3).astype(np.float32) * 5
    want = np.asarray(farthest_point_sample(xyz, npoint))
    got = np.asarray(farthest_point_sample_batched_pallas(
        xyz, npoint, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_batched_vmem_tile_cap(rng):
    """At n=16384 the VMEM budget caps the row tile at 24, so b=32 splits
    into a 2-step grid with row padding — indices must still match the
    scan exactly across the tile boundary."""
    from jmodt_tpu.ops.pallas.fps import farthest_point_sample_batched_pallas
    xyz = rng.randn(32, 16384, 3).astype(np.float32) * 5
    want = np.asarray(farthest_point_sample(xyz, 16))
    got = np.asarray(farthest_point_sample_batched_pallas(
        xyz, 16, interpret=True))
    np.testing.assert_array_equal(got, want)
