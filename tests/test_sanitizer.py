"""Sanitizer-analog harness.

The reference re-runs its suite under NVIDIA compute-sanitizer
(memcheck/synccheck) and asserts zero local-mem spills
(/root/reference/tests/test_sanitizer.py:50-79). The TPU analog:

  * run representative kernels in Pallas INTERPRET mode (python-level
    bounds/shape checking — the memcheck analog),
  * assert bitwise determinism across repeated runs (the reference's 21x
    bitwise self-consistency, tests/test_attention.py:205-209 — the
    synccheck/race analog on a statically scheduled machine).
"""

import numpy as np
import jax
import jax.numpy as jnp

import deepgemm_tpu as dg
from deepgemm_tpu.testing import assert_bitwise_equal

from generators import generate_normal


def _make_inputs():
    rng = np.random.RandomState(7)
    a, b, _, _ = generate_normal(64, 128, 256)
    g, mm, n, k = 2, 32, 64, 128
    am = jnp.asarray(rng.randn(g, mm, k), jnp.bfloat16)
    bm = jnp.asarray(rng.randn(g, n, k), jnp.bfloat16)
    masked = jnp.asarray([17, 32], jnp.int32)
    return a, b, am, bm, masked


def _run_all_once(inputs):
    """One pass over a representative op set on FIXED inputs."""
    a, b, am, bm, masked = inputs
    return [
        dg.fp8_gemm_nt(a, b, disable_ue8m0_cast=True),
        dg.bf16_gemm_nt(a[0].astype(jnp.bfloat16),
                        b[0].astype(jnp.bfloat16)),
        dg.m_grouped_bf16_gemm_nt_masked(am, bm, masked_m=masked),
    ]


def test_interpret_mode_bounds():
    """Interpret mode executes with python-level index checking (memcheck
    analog); on CPU the suite already runs interpreted — this asserts the
    representative set completes and is finite."""
    for o in _run_all_once(_make_inputs()):
        assert np.isfinite(np.asarray(o, np.float32)).all()


def test_bitwise_determinism():
    """Repeated runs on identical inputs must be bit-identical
    (race-detection analog)."""
    inputs = _make_inputs()
    first = _run_all_once(inputs)
    for _ in range(4):
        for x, y in zip(first, _run_all_once(inputs)):
            assert_bitwise_equal(x, y)
