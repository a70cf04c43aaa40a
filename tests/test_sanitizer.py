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


def test_rdma_kernels_deterministic():
    """The RDMA/semaphore kernels — the riskiest code — under the
    interpret+determinism harness (round-1 gap: the sanitizer set skipped
    them): the Pallas all-to-all and the fully-fused mega kernel must be
    bit-identical across repeated runs on a 2-device distributed
    interpreter mesh."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P
    from deepgemm_tpu.parallel.dist import make_mesh
    from deepgemm_tpu.parallel.collectives import pallas_all_to_all
    from deepgemm_tpu.kernels.fused_moe import fused_mega_moe

    mesh = make_mesh([('ep', 2)])
    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(2 * 2, 16, 128), jnp.bfloat16)

    def a2a(v):
        return pallas_all_to_all(v, 'ep', collective_id=3)
    run_a2a = shard_map(a2a, mesh=mesh, check_vma=False,
                        in_specs=P('ep'), out_specs=P('ep'))

    EL, cap, H, I = 2, 16, 128, 128
    send = jnp.asarray(rng.randn(2 * 2, EL, cap, H), jnp.bfloat16)
    rw = jnp.asarray(rng.rand(2 * 2, EL, cap), jnp.float32)
    w1 = jnp.asarray(rng.randn(2 * EL, 2 * I, H) * 0.1, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(2 * EL, H, I) * 0.1, jnp.bfloat16)

    def mega(s, r, w1l, w2l):
        return fused_mega_moe(s, r, w1l, w2l, 'ep')
    run_mega = shard_map(mega, mesh=mesh, check_vma=False,
                         in_specs=(P('ep'),) * 4, out_specs=P('ep'))

    first_a2a = run_a2a(x)
    first_mega = run_mega(send, rw, w1, w2)
    for _ in range(3):
        assert_bitwise_equal(run_a2a(x), first_a2a)
        assert_bitwise_equal(run_mega(send, rw, w1, w2), first_mega)


def test_collective_watchdog():
    """Failure-detection analog of the reference's 60s barrier watchdogs:
    fast sections pass silently; a stalled section fires the diagnostic (and
    optionally raises) without killing the process."""
    import time
    from deepgemm_tpu.parallel.dist import CollectiveWatchdog, blocking_collective

    fired = blocking_collective(jnp.ones((8,)), timeout_s=30.0, label='fast')
    assert not fired

    events = []
    with CollectiveWatchdog(0.05, label='slow',
                            on_timeout=lambda: events.append('t')) as wd:
        time.sleep(0.2)
    assert wd.fired and events == ['t']

    try:
        with CollectiveWatchdog(0.05, label='slow-fatal', fatal=True):
            time.sleep(0.2)
        raised = False
    except TimeoutError:
        raised = True
    assert raised
