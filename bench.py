"""Headline benchmark: FP8 block-scaled GEMM vs XLA's bf16 dot, geomean over
a compute-bound shape (4096^3) and a serving/decode shape (128x4096x7168 —
BASELINE.json config 1). Mirrors the reference's geomean-speedup-vs-cuBLASLt
reporting (/root/reference/tests/test_fp8_fp4.py:60-68) with XLA's dot as the
TPU vendor engine.

Prints ONE JSON line:
  {"metric": ..., "value": <geomean TFLOPS>, "unit": "TFLOPS",
   "vs_baseline": <geomean speedup over the bf16 dot>}

Methodology: N GEMMs inside one jitted fori_loop (inputs rolled per iteration
so nothing hoists), timed from jax.profiler device-trace events (wall-clock
through the axon relay is unreliable); numerics asserted in-run against the
FP32 host oracle.
"""

import glob
import gzip
import json
import math
import os
import shutil
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

SHAPES = [(4096, 4096, 4096), (128, 4096, 7168)]
N_ITERS = 16


def _device_time_of(fn, args, trace_dir: str) -> float:
    """Seconds per loop iteration, from a device trace (fallback: wall)."""
    jax.block_until_ready(fn(*args))             # compile
    float(np.asarray(fn(*args)))                 # warm
    shutil.rmtree(trace_dir, ignore_errors=True)
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        float(np.asarray(fn(*args)))
    wall = time.perf_counter() - t0
    best = 0.0
    try:
        paths = sorted(glob.glob(os.path.join(trace_dir, '**', '*.trace.json.gz'),
                                 recursive=True), key=os.path.getmtime)
        with gzip.open(paths[-1], 'rt') as f:
            trace = json.load(f)
        for ev in trace.get('traceEvents', []):
            if ev.get('ph') == 'X' and ev.get('name', '').startswith('jit_loop'):
                best = max(best, ev['dur'] / 1e6)
    except Exception:
        pass
    return (best or wall) / N_ITERS


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import deepgemm_tpu as dg
    from deepgemm_tpu.testing import calc_diff

    rng = np.random.RandomState(0)
    tflops, speedups = [], []
    for si, (m, n, k) in enumerate(SHAPES):
        a = jnp.asarray(rng.randn(m, k), dtype=jnp.bfloat16)
        b = jnp.asarray(rng.randn(n, k), dtype=jnp.bfloat16)
        aq, asf = dg.per_token_cast_to_fp8(a, use_ue8m0=False)
        bq, bsf = dg.per_block_cast_to_fp8(b, use_ue8m0=False)

        # in-run numerics gate (exact f32 promote semantics)
        ref = np.asarray(a, np.float32) @ np.asarray(b, np.float32).T
        d = dg.fp8_gemm_nt((aq, asf), (bq, bsf))
        diff = calc_diff(d, ref)
        assert diff < 1e-3, (m, n, k, diff)

        @jax.jit
        def loop_ours(av_, asf_, bv_, bsf_):
            def body(i, acc):
                dd = dg.fp8_gemm_nt((jnp.roll(av_, i, axis=0), asf_),
                                    (bv_, bsf_))
                return acc + dd[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, N_ITERS, body, 0.0)

        @jax.jit
        def loop_xla(a_, b_):
            def body(i, acc):
                dd = jnp.dot(jnp.roll(a_, i, axis=0), b_.T,
                             preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16)
                return acc + dd[0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, N_ITERS, body, 0.0)

        t_ours = _device_time_of(loop_ours, (aq, asf, bq, bsf),
                                 f'/tmp/dgt_bench_trace_{si}a')
        t_xla = _device_time_of(loop_xla, (a, b),
                                f'/tmp/dgt_bench_trace_{si}b')
        tflops.append(2 * m * n * k / t_ours / 1e12)
        speedups.append(t_xla / t_ours)

    geo_tf = math.exp(sum(math.log(x) for x in tflops) / len(tflops))
    geo_sp = math.exp(sum(math.log(x) for x in speedups) / len(speedups))
    print(json.dumps({
        'metric': 'fp8_scaled_gemm_geomean_tflops',
        'value': round(geo_tf, 2),
        'unit': 'TFLOPS',
        'vs_baseline': round(geo_sp, 4),
    }))


if __name__ == '__main__':
    main()
