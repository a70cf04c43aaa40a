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
                # DGT_DISABLE_KERNEL_CACHE=1: rebuild per call (the analog
                # of DG_JIT_DISABLE_CACHE, for cache-coherence debugging).
                if not get_bool_env('DGT_DISABLE_KERNEL_CACHE'):
                    self._cache[spec] = fn
        return fn

    def __len__(self):
        return len(self._cache)

    def clear(self):
        with self._lock:
            self._cache.clear()


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
