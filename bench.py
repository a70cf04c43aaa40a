"""Headline benchmark: dense FP8 block-scaled GEMM throughput on one chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "TFLOPS", "vs_baseline": N}

`vs_baseline` is the speedup over XLA's own bf16 `jnp.dot` on the same shape
(the TPU stand-in for the reference's cuBLASLt comparison,
/root/reference/tests/test_fp8_fp4.py:60-68).

Methodology: N GEMMs inside one jitted fori_loop (inputs rolled per iteration
so no loop hoisting / result caching can occur), timed from a jax.profiler
device trace; falls back to host wall-clock when no trace is available.
"""

import glob
import gzip
import json
import os
import shutil
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

M = N_DIM = K = 4096
N_ITERS = 16


def _device_time_of(fn, args, name_prefix: str, trace_dir: str):
    """Seconds per loop-iteration, from a device trace (fallback: wall)."""
    # compile + warm
    jax.block_until_ready(fn(*args))
    float(np.asarray(fn(*args)))
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
            if ev.get('ph') == 'X' and ev.get('name', '').startswith(name_prefix):
                best = max(best, ev['dur'] / 1e6)
    except Exception:
        pass
    return (best or wall) / N_ITERS


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import deepgemm_tpu as dg
    from deepgemm_tpu.kernels.dense import dense_gemm

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(M, K), dtype=jnp.bfloat16)
    b = jnp.asarray(rng.randn(N_DIM, K), dtype=jnp.bfloat16)
    av, asf = dg.per_token_cast_to_fp8(a, use_ue8m0=False)
    bv, bsf = dg.per_block_cast_to_fp8(b, use_ue8m0=False)
    sfb_t = jnp.repeat(bsf.T, 128, axis=1)[:, :N_DIM]

    @jax.jit
    def loop_ours(av_, asf_, bv_, bsf_):
        def body(i, acc):
            av_i = jnp.roll(av_, i, axis=0)
            d = dense_gemm(av_i, bv_, sfa=asf_, sfb_t=bsf_,
                           scale_strategy='promote')
            return acc + d[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, N_ITERS, body, 0.0)

    @jax.jit
    def loop_xla(a_, b_):
        def body(i, acc):
            a_i = jnp.roll(a_, i, axis=0)
            d = jnp.dot(a_i, b_.T,
                        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            return acc + d[0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, N_ITERS, body, 0.0)

    t_ours = _device_time_of(loop_ours, (av, asf, bv, sfb_t), 'jit_loop_ours',
                             '/tmp/dgt_bench_trace')
    t_xla = _device_time_of(loop_xla, (a, b), 'jit_loop_xla',
                            '/tmp/dgt_bench_trace2')

    tflops = 2 * M * N_DIM * K / t_ours / 1e12
    print(json.dumps({
        'metric': 'fp8_scaled_gemm_4096_tflops',
        'value': round(tflops, 2),
        'unit': 'TFLOPS',
        'vs_baseline': round(t_xla / t_ours, 4),
    }))


if __name__ == '__main__':
    main()
