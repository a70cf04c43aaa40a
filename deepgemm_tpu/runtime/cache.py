"""Traced-kernel cache.

TPU replacement for the reference's NVCC/NVRTC JIT + disk cubin cache
(/root/reference/csrc/jit/compiler.hpp:100-149, csrc/jit/cache.hpp:11-29):
kernels are Pallas/XLA programs traced once per *spec* (op kind + static dims +
dtypes + layout majors + recipe + tile config) and cached in-process; across
processes the JAX persistent compilation cache plays the role of the on-disk
cubin cache (shared-filesystem safe, content addressed).
"""

import functools
import os
import threading
from typing import Any, Callable, Dict, Hashable

import jax


class KernelCache:
    """spec -> compiled callable, built on miss (thread-safe)."""

    def __init__(self):
        self._cache: Dict[Hashable, Any] = {}
        self._lock = threading.Lock()

    def get_or_build(self, spec: Hashable, builder: Callable[[], Any]):
        fn = self._cache.get(spec)
        if fn is not None:
            return fn
        with self._lock:
            fn = self._cache.get(spec)
            if fn is None:
                from .config import get_bool_env, runtime
                runtime().maybe_print_config(spec, getattr(spec, 'cfg', None))
                fn = builder()
                if os.environ.get('DGT_DUMP_DIR'):
                    fn = _wrap_dump(spec, fn)
                # DGT_DISABLE_KERNEL_CACHE=1: rebuild per call (the analog
                # of DG_JIT_DISABLE_CACHE, for cache-coherence debugging).
                if not get_bool_env('DGT_DISABLE_KERNEL_CACHE'):
                    self._cache[spec] = fn
        return fn

    def __len__(self):
        return len(self._cache)

    def specs(self):
        """Snapshot of cached kernel specs (introspection/tests)."""
        with self._lock:
            return list(self._cache.keys())

    def clear(self):
        with self._lock:
            self._cache.clear()


def _spec_dir_name(spec: Hashable) -> str:
    """Stable, filesystem-safe directory name for a kernel spec.

    Content-hash of the spec repr (process-stable, unlike ``hash()`` which
    PYTHONHASHSEED randomizes) — same naming scheme as the native kernel
    cache (runtime/native.py)."""
    from .native import fnv1a
    base = type(spec).__name__
    return f'{base}_{fnv1a(repr(spec).encode()) & 0xFFFFFFFF:08x}'


def _wrap_dump(spec: Hashable, fn):
    """First-call artifact dump — the TPU analog of the reference's
    ``DG_JIT_DUMP`` kernel-source dump and ``DG_JIT_DUMP_ASM/PTX/SASS``
    (/root/reference/csrc/jit/compiler.hpp:116-127,151-161).

    With ``DGT_DUMP_DIR`` set, the first invocation of each cached kernel
    writes under ``$DGT_DUMP_DIR/<SpecClass>_<hash>/``:

    - ``spec.txt``              — the full spec repr (dims, dtypes, tiles)
    - ``lowered_stablehlo.mlir``— ``jax.jit(...).lower`` text; for Pallas
      kernels the Mosaic kernel module rides inside the ``tpu_custom_call``
      backend config (the "ASM"-adjacent artifact on TPU)
    - ``optimized_hlo.txt``     — post-XLA-optimization HLO, only when
      ``DGT_DUMP_HLO=1`` too (it forces an extra compile, which is
      expensive through the remote-compile relay)

    Dump failures never break compute (best-effort, like the reference's)."""
    state = {'done': False}

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if not state['done']:
            state['done'] = True
            try:
                _dump_artifacts(spec, fn, args, kwargs)
            except Exception as e:  # pragma: no cover - best effort
                print(f'[deepgemm_tpu] DGT_DUMP_DIR dump failed for '
                      f'{type(spec).__name__}: {e}')
        return fn(*args, **kwargs)

    return wrapper


def _dump_artifacts(spec, fn, args, kwargs):
    from .config import get_bool_env
    out = os.path.join(os.environ['DGT_DUMP_DIR'], _spec_dir_name(spec))
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, 'spec.txt'), 'w') as f:
        f.write(repr(spec) + '\n')
    lower = getattr(fn, 'lower', None)
    if lower is None:
        return
    lowered = lower(*args, **kwargs)
    with open(os.path.join(out, 'lowered_stablehlo.mlir'), 'w') as f:
        f.write(lowered.as_text())
    if get_bool_env('DGT_DUMP_HLO'):
        compiled = lowered.compile()
        with open(os.path.join(out, 'optimized_hlo.txt'), 'w') as f:
            f.write(compiled.as_text())


_kernel_cache = KernelCache()


def kernel_cache() -> KernelCache:
    return _kernel_cache


@functools.lru_cache(maxsize=1)
def init_persistent_cache(cache_dir: str = None) -> str:
    """Enable JAX's persistent compilation cache (cross-process analog of the
    reference's ``$HOME/.deep_gemm`` cubin cache dir,
    /root/reference/csrc/jit/compiler.hpp:49-51). Safe to call repeatedly."""
    cache_dir = cache_dir or os.environ.get(
        'DGT_JIT_CACHE_DIR', os.path.expanduser('~/.deepgemm_tpu/jit_cache'))
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update('jax_compilation_cache_dir', cache_dir)
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.5)
    return cache_dir
