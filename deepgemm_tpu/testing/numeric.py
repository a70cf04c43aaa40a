"""Numeric comparison helpers, mirroring the reference testing contract
(/root/reference/deep_gemm/testing/numeric.py:1-44). Comparisons run on host
in float64 numpy (TPU has no native f64)."""

import numpy as np
import jax


def _to_numpy(x) -> np.ndarray:
    return np.asarray(jax.device_get(x))


def calc_diff(x, y) -> float:
    """1 - cosine-similarity in f64 (/root/reference/deep_gemm/testing/numeric.py:5-11)."""
    x = _to_numpy(x).astype(np.float64)
    y = _to_numpy(y).astype(np.float64)
    denominator = (x * x + y * y).sum()
    if denominator == 0:    # all elements in x and y are 0
        return 0.0
    sim = 2 * (x * y).sum() / denominator
    return float(1 - sim)


def count_bytes(*tensors) -> int:
    """Total bytes across (nested) arrays
    (/root/reference/deep_gemm/testing/numeric.py:14-21)."""
    total = 0
    for t in tensors:
        if isinstance(t, (tuple, list)):
            total += count_bytes(*t)
        elif t is not None:
            total += t.size * t.dtype.itemsize
    return total


def assert_bitwise_equal(x, y, label: str = ''):
    """Byte-exact equality with first-mismatch diagnostics
    (/root/reference/deep_gemm/testing/numeric.py:24-44)."""
    x_np, y_np = _to_numpy(x), _to_numpy(y)
    assert x_np.shape == y_np.shape
    assert x_np.dtype == y_np.dtype
    x_bytes = np.ascontiguousarray(x_np).view(np.uint8).ravel()
    y_bytes = np.ascontiguousarray(y_np).view(np.uint8).ravel()
    if np.array_equal(x_bytes, y_bytes):
        return

    mismatch = x_bytes != y_bytes
    mismatch_idx = int(np.flatnonzero(mismatch)[0])
    elem_size = x_np.dtype.itemsize
    elem_idx = mismatch_idx // elem_size
    byte_in_elem = mismatch_idx % elem_size
    coord = tuple(int(v) for v in np.unravel_index(elem_idx, x_np.shape))
    raise AssertionError(
        f'bitwise mismatch{f" ({label})" if label else ""}: '
        f'num_bytes={mismatch.size}, num_mismatch={int(mismatch.sum())}, '
        f'first_byte={mismatch_idx}, elem={elem_idx}, coord={coord}, byte_in_elem={byte_in_elem}, '
        f'x_byte={int(x_bytes[mismatch_idx])}, y_byte={int(y_bytes[mismatch_idx])}, '
        f'x_val={x_np.reshape(-1)[elem_idx]}, y_val={y_np.reshape(-1)[elem_idx]}'
    )
