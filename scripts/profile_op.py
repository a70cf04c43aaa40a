#!/usr/bin/env python
"""Per-kernel profiling harness — the TPU analog of the reference's NCU
scripts (/root/reference/scripts/run_ncu_mega_moe.sh + quick_plot_pm.py):
runs a named op under jax.profiler, prints a per-kernel device-time table,
and optionally keeps the trace directory for xprof/tensorboard.

Usage:
  python scripts/profile_op.py fp8_gemm [m n k] [--keep-trace DIR]
  python scripts/profile_op.py bf16_gemm [m n k]
  python scripts/profile_op.py grouped [groups m_per_group n k]
"""

import argparse
import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _run(op, shape):
    import deepgemm_tpu as dg
    rng = np.random.RandomState(0)
    if op == 'fp8_gemm':
        m, n, k = shape or (4096, 4096, 4096)
        a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
        b = jnp.asarray(rng.randn(n, k), jnp.bfloat16)
        aq = dg.per_token_cast_to_fp8(a, use_ue8m0=False)
        bq = dg.per_block_cast_to_fp8(b, use_ue8m0=False)
        return lambda: dg.fp8_gemm_nt(aq, bq), 2 * m * n * k
    if op == 'bf16_gemm':
        m, n, k = shape or (4096, 4096, 4096)
        a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
        b = jnp.asarray(rng.randn(n, k), jnp.bfloat16)
        return lambda: dg.bf16_gemm_nt(a, b), 2 * m * n * k
    if op == 'grouped':
        g, mpg, n, k = shape or (8, 512, 4096, 7168)
        m = g * mpg
        a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
        b = jnp.asarray(rng.randn(g, n, k), jnp.bfloat16)
        ids = jnp.repeat(jnp.arange(g, dtype=jnp.int32), mpg)
        return (lambda: dg.m_grouped_bf16_gemm_nt_contiguous(
            a, b, grouped_layout=ids), 2 * m * n * k)
    raise SystemExit(f'unknown op {op}')


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('op')
    ap.add_argument('dims', nargs='*', type=int)
    ap.add_argument('--keep-trace', default=None)
    ap.add_argument('--iters', type=int, default=8)
    args = ap.parse_args()

    fn, flops = _run(args.op, tuple(args.dims) or None)
    jax.block_until_ready(fn())            # compile + warm

    tdir = args.keep_trace or '/tmp/dgt_profile_trace'
    shutil.rmtree(tdir, ignore_errors=True)
    with jax.profiler.trace(tdir):
        out = None
        for _ in range(args.iters):
            out = fn()
        jax.block_until_ready(out)

    rows = {}
    for path in glob.glob(os.path.join(tdir, '**', '*.trace.json.gz'),
                          recursive=True):
        with gzip.open(path, 'rt') as f:
            trace = json.load(f)
        for ev in trace.get('traceEvents', []):
            if ev.get('ph') == 'X' and 'dur' in ev:
                name = ev.get('name', '?')[:60]
                tot, cnt = rows.get(name, (0.0, 0))
                rows[name] = (tot + ev['dur'], cnt + 1)

    print(f'{"kernel":62s} {"count":>6s} {"total_ms":>10s} {"mean_us":>10s}')
    for name, (tot, cnt) in sorted(rows.items(), key=lambda kv: -kv[1][0])[:25]:
        print(f'{name:62s} {cnt:6d} {tot / 1e3:10.3f} {tot / cnt:10.1f}')
    top = max(rows.values(), key=lambda v: v[0])[0] / args.iters / 1e6 \
        if rows else 0
    if top:
        print(f'\nheadline: {flops / top / 1e12:.1f} TFLOPS '
              f'(top kernel, {args.iters} iters)')
    if args.keep_trace:
        print(f'trace kept at {tdir} (load with xprof/tensorboard)')


if __name__ == '__main__':
    main()
