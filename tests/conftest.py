"""Test configuration: run the suite on a virtual 8-device CPU mesh so
sharding/collective paths are exercised without TPU hardware; Pallas kernels
auto-switch to interpret mode on the CPU backend.

Set DGT_TEST_PLATFORM=tpu to run the same suite on real TPU chips.
"""

import os

_platform = os.environ.get('DGT_TEST_PLATFORM', 'cpu')
if _platform == 'cpu':
    flags = os.environ.get('XLA_FLAGS', '')
    if '--xla_force_host_platform_device_count' not in flags:
        os.environ['XLA_FLAGS'] = (flags + ' --xla_force_host_platform_device_count=8').strip()
    os.environ['JAX_PLATFORMS'] = 'cpu'

import jax

if _platform == 'cpu':
    # Some environments force-register a TPU plugin via sitecustomize and
    # override jax_platforms; force it back to CPU before any backend init.
    jax.config.update('jax_platforms', 'cpu')

import numpy as np
import pytest


@pytest.fixture(autouse=True)
def _seed():
    np.random.seed(0)
