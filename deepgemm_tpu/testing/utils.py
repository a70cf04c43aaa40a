"""Test helpers — parity with /root/reference/deep_gemm/testing/utils.py:6-22
(``get_arch_major``, ``get_device_sm_count``, ``test_filter``), re-targeted at
TPU generations."""

import functools
import os

import jax


@functools.lru_cache(maxsize=1)
def get_arch_major() -> int:
    """TPU generation number (e.g. 5 for v5e/v5p), or 0 on CPU — the analog
    of the CUDA SM major (/root/reference/deep_gemm/testing/utils.py:6-8)."""
    if jax.default_backend() != 'tpu':
        return 0
    kind = jax.devices()[0].device_kind.lower()   # e.g. 'tpu v5 lite'
    for tok in kind.replace('v', ' ').split():
        if tok.isdigit():
            return int(tok)
    return 0


def get_device_core_count() -> int:
    """Analog of ``get_device_sm_count``."""
    return jax.local_device_count()


def test_filter(fn):
    """Run a test callable only when DGT_TEST_FILTER is unset or matches the
    function name (/root/reference/deep_gemm/testing/utils.py:14-22)."""
    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        flt = os.environ.get('DGT_TEST_FILTER')
        if flt and flt not in fn.__name__:
            print(f'Skipping {fn.__name__} (filtered)')
            return None
        return fn(*args, **kwargs)
    return wrapper
