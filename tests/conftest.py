"""Test configuration: run the suite on a virtual 8-device CPU mesh so every
sharding/collective path compiles and executes without TPU hardware — the TPU
analog of testing multi-node code without a cluster (SURVEY.md §4)."""

import os

os.environ.setdefault('JAX_PLATFORMS', 'cpu')
flags = os.environ.get('XLA_FLAGS', '')
if '--xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(2333)  # seed matches tools/eval.py:36
