"""Test configuration: run the suite on a virtual 8-device CPU mesh so every
sharding/collective path compiles and executes without TPU hardware — the TPU
analog of testing multi-node code without a cluster (SURVEY.md §4)."""

import os

# Force CPU for the suite.  The ambient environment sets JAX_PLATFORMS=axon
# (remote TPU with a remote compile service, where eager dispatch is
# pathologically slow) and its sitecustomize imports jax at interpreter
# startup, so env-var overrides are too late — but backends initialize
# lazily, so flipping the config knob here still works.
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

# f32 for the suite: emulated bf16 on CPU nearly doubles wall time and the
# semantics under test are dtype-agnostic; tests/test_bf16.py opts back in
# explicitly.  Must happen before jmodt_tpu.config is imported anywhere.
os.environ.setdefault('JMODT_DTYPE', 'float32')

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

# NOTE: do NOT enable the persistent compilation cache here.  Measured on
# this image (jax 0.9, 2026-08-18): warm reruns are ~3x faster (5:47 ->
# 1:55 on test_points_parallel), but the CPU backend persists AOT MACHINE
# CODE whose target-feature check fails on reload ("+prefer-no-scatter ...
# not supported on the host machine ... could lead to execution errors
# such as SIGILL", cpu_aot_loader.cc) and the big sharded train-step
# executable then hard-aborts the process (Fatal Python error: Aborted in
# block_until_ready).  enable_compilation_cache() is therefore TPU-only.

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The compile-heavy files (full-size model builds, sharded train-step
# compiles, end-to-end ladders) account for ~35 of the suite's ~43 quiet
# minutes on this 1-core host.  Auto-mark them `slow` so
# `pytest -m "not slow"` is the supported ~10-minute quick gate
# (VERDICT r3 weak #6); the full suite stays the pre-merge bar.
_SLOW_FILES = {
    'test_points_parallel',  # three sharded train-step compiles (~16 min)
    'test_bf16',             # emulated bf16 on CPU (~8 min)
    'test_models',
    'test_train_step',
    'test_eval_batch_seqs',
    'test_pipeline',
    'test_overfit',
    'test_full_ladder',
    'test_multihost',
    'test_lidar_only',
}


def pytest_collection_modifyitems(items):
    for item in items:
        if item.module.__name__ in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)


@pytest.fixture
def rng():
    return np.random.RandomState(2333)  # seed matches tools/eval.py:36
