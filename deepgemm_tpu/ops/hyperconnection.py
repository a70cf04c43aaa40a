"""HyperConnection API (/root/reference/csrc/apis/hyperconnection.hpp:13-58):
``tf32_hc_prenorm_gemm(a, b, d, sqr_sum, num_splits)`` — f32 GEMM
``d = a @ b^T`` (a bf16, b f32) that also emits the per-row RMSNorm statistic
``sum(a^2)``, optionally split-K into ``num_splits`` partial outputs whose sum
equals the full result."""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..kernels.hc_prenorm import hc_prenorm_gemm
from ..utils.math import align, ceil_div


def tf32_hc_prenorm_gemm(a: jnp.ndarray, b: jnp.ndarray, d=None, sqr_sum=None,
                         num_splits: Optional[int] = None
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns ``(d, sqr_sum)``: [m,n]/[m] f32, or [S,m,n]/[S,m] when
    ``num_splits`` is given (partials over contiguous k chunks; callers sum
    over dim 0, /root/reference/tests/test_hyperconnection.py:30-32)."""
    assert a.dtype == jnp.bfloat16 and b.dtype == jnp.float32
    m, k = a.shape
    n = b.shape[0]
    if m == 0:
        if num_splits is None:
            return jnp.zeros((0, n), jnp.float32), jnp.zeros((0,), jnp.float32)
        return (jnp.zeros((num_splits, 0, n), jnp.float32),
                jnp.zeros((num_splits, 0), jnp.float32))

    if num_splits is None:
        return hc_prenorm_gemm(a, b)

    # Split-K partials: pad k to a multiple of num_splits, reshape, and let
    # XLA batch the chunked matmuls + square-sums in one pass over `a`.
    s = num_splits
    kc = ceil_div(k, s)
    pad = s * kc - k
    a_p = jnp.pad(a, ((0, 0), (0, pad)))
    b_p = jnp.pad(b, ((0, 0), (0, pad)))
    a_s = a_p.reshape(m, s, kc).transpose(1, 0, 2).astype(jnp.float32)
    b_s = b_p.reshape(n, s, kc).transpose(1, 0, 2)
    d_s = jax.lax.dot_general(
        a_s, b_s, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)        # (S, m, n)
    sqr = jnp.sum(a_s * a_s, axis=2)                # (S, m)
    return d_s, sqr
