"""Benchmark timing helpers (TPU analog of
/root/reference/deep_gemm/testing/bench.py).

On TPU there is no L2 cache to flush and kernel launch overhead is amortized by
``jax.block_until_ready``; per-kernel attribution uses ``jax.profiler`` traces
instead of kineto."""

import contextlib
import glob
import gzip
import json
import os
import time
from typing import Callable, Optional

import jax


def bench(fn: Callable, num_warmups: int = 5, num_tests: int = 10) -> float:
    """Wall-clock seconds per call of `fn` (which must return jax arrays or
    have side effects that block_until_ready can track).

    Mirrors /root/reference/deep_gemm/testing/bench.py:8-36 with
    device-synchronized timing.
    """
    out = None
    for _ in range(num_warmups):
        out = fn()
    jax.block_until_ready(out)

    start = time.perf_counter()
    for _ in range(num_tests):
        out = fn()
    jax.block_until_ready(out)
    end = time.perf_counter()
    return (end - start) / num_tests


def bench_profiled(fn: Callable, kernel_name_filter: Optional[str] = None,
                   num_tests: int = 10, trace_dir: Optional[str] = None) -> float:
    """Per-kernel timing via a jax.profiler trace (analog of ``bench_kineto``,
    /root/reference/deep_gemm/testing/bench.py:79-146).

    Falls back to :func:`bench` when trace parsing finds nothing.
    """
    trace_dir = trace_dir or '/tmp/dgt_trace'
    wall = bench(fn, num_warmups=3, num_tests=2)
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(num_tests):
            out = fn()
        jax.block_until_ready(out)

    try:
        total_ns, count = _sum_trace_events(trace_dir, kernel_name_filter)
        if count:
            return total_ns / count / 1e9
    except Exception:
        pass
    return wall


def _sum_trace_events(trace_dir: str, name_filter: Optional[str]):
    paths = sorted(glob.glob(os.path.join(trace_dir, '**', '*.trace.json.gz'),
                             recursive=True), key=os.path.getmtime)
    if not paths:
        return 0, 0
    with gzip.open(paths[-1], 'rt') as f:
        trace = json.load(f)
    total_ns, count = 0, 0
    for event in trace.get('traceEvents', []):
        name = event.get('name', '')
        if event.get('ph') != 'X' or 'dur' not in event:
            continue
        if name_filter is not None and name_filter not in name:
            continue
        total_ns += event['dur'] * 1e3   # dur is in us
        count += 1
    return total_ns, count


@contextlib.contextmanager
def empty_suppress():
    yield
