"""Legacy (pure-XLA fallback) grouped GEMM tests — generator-driven golden
checks mirroring /root/reference/tests/test_legacy.py."""

import numpy as np
import jax.numpy as jnp
import pytest

from deepgemm_tpu import legacy
from deepgemm_tpu.testing import calc_diff


def _make_contiguous(rng, num_groups, rows_per_group, pad_rows, n, k):
    """Contiguous layout with -1 padding rows after each group."""
    ids, blocks = [], []
    for g in range(num_groups):
        ids += [g] * rows_per_group + [-1] * pad_rows
    ids = np.asarray(ids, np.int32)
    m = ids.size
    a = rng.randn(m, k).astype(np.float32)
    b = rng.randn(num_groups, n, k).astype(np.float32) * 0.1
    ref = np.zeros((m, n), np.float32)
    for i, g in enumerate(ids):
        if g >= 0:
            ref[i] = a[i] @ b[g].T
    return (jnp.asarray(a, jnp.bfloat16), jnp.asarray(b, jnp.bfloat16),
            jnp.asarray(ids), ref)


def test_m_grouped_nt_contiguous_tl():
    rng = np.random.RandomState(0)
    a, b, ids, ref = _make_contiguous(rng, 3, 32, 8, 64, 128)
    d = legacy.m_grouped_bf16_gemm_nt_contiguous_tl(a, b, m_indices=ids)
    # padding rows must be exactly zero
    assert not np.asarray(d)[np.asarray(ids) < 0].any()
    a32 = np.asarray(a, np.float32)
    ref2 = np.zeros_like(ref)
    for i, g in enumerate(np.asarray(ids)):
        if g >= 0:
            ref2[i] = a32[i] @ np.asarray(b, np.float32)[g].T
    assert calc_diff(d, ref2) < 1e-5


def test_m_grouped_nn_contiguous_tl():
    rng = np.random.RandomState(1)
    a, b, ids, _ = _make_contiguous(rng, 2, 16, 0, 32, 64)
    d_nt = legacy.m_grouped_bf16_gemm_nt_contiguous_tl(a, b, m_indices=ids)
    d_nn = legacy.m_grouped_bf16_gemm_nn_contiguous_tl(
        a, jnp.swapaxes(b, 1, 2), m_indices=ids)
    np.testing.assert_array_equal(np.asarray(d_nt), np.asarray(d_nn))


def test_a_fused_m_grouped_tl():
    rng = np.random.RandomState(2)
    num_groups, n, k = 2, 32, 64
    src = jnp.asarray(rng.randn(10, k), jnp.bfloat16)   # source token table
    b = jnp.asarray(rng.randn(num_groups, n, k) * 0.1, jnp.bfloat16)
    ids = jnp.asarray([0, 0, 0, 0, 1, 1, 1, 1], jnp.int32)
    rows = jnp.asarray([3, 1, 4, -1, 1, 5, 9, -1], jnp.int32)
    d = legacy.a_fused_m_grouped_bf16_gemm_nt_contiguous_tl(
        src, b, m_indices=ids, m_row_indices=rows)
    src32, b32 = np.asarray(src, np.float32), np.asarray(b, np.float32)
    for i, (g, r) in enumerate(zip(np.asarray(ids), np.asarray(rows))):
        expect = np.zeros(n, np.float32) if r < 0 else src32[r] @ b32[g].T
        assert calc_diff(np.asarray(d)[i], expect) < 1e-4, i


@pytest.mark.parametrize('acc', [False, True])
@pytest.mark.parametrize('which', ['a', 'b'])
def test_fused_k_grouped_tl(acc, which):
    rng = np.random.RandomState(3)
    num_groups, m, n, k_total = 3, 16, 24, 96
    k_start = jnp.asarray([0, 32, 32], jnp.int32)       # group 1 empty
    k_end = jnp.asarray([32, 32, 96], jnp.int32)
    k_indices = jnp.asarray(
        np.where(rng.rand(k_total) < 0.2, -1,
                 rng.randint(0, k_total, k_total)).astype(np.int32))
    a = jnp.asarray(rng.randn(k_total, m), jnp.bfloat16)
    b = jnp.asarray(rng.randn(k_total, n), jnp.bfloat16)
    d0 = jnp.asarray(rng.randn(num_groups, m, n).astype(np.float32))

    fn = (legacy.a_fused_k_grouped_bf16_gemm_tn_contiguous_tl if which == 'a'
          else legacy.b_fused_k_grouped_bf16_gemm_tn_contiguous_tl)
    d = fn(a, b, d0, (k_indices, k_start, k_end), acc)

    a32, b32 = np.asarray(a, np.float32), np.asarray(b, np.float32)
    ki = np.asarray(k_indices)
    ref = np.zeros((num_groups, m, n), np.float32)
    for g in range(num_groups):
        for k in range(int(k_start[g]), int(k_end[g])):
            if ki[k] >= 0:
                if which == 'a':
                    ref[g] += np.outer(a32[ki[k]], b32[k])
                else:
                    ref[g] += np.outer(a32[k], b32[ki[k]])
    if acc:
        ref += np.asarray(d0)
    for g in range(num_groups):
        if not acc and int(k_start[g]) >= int(k_end[g]):
            assert not np.asarray(d)[g].any()
        else:
            assert calc_diff(np.asarray(d)[g], ref[g]) < 1e-4, (g, which, acc)
