"""Einsum + HyperConnection-prenorm + skip-head-mid tests
(TPU analogs of /root/reference/tests/test_einsum.py and
test_hyperconnection.py, test_attention.py:34-63)."""

import numpy as np
import jax.numpy as jnp
import pytest

import deepgemm_tpu as dg
from deepgemm_tpu.testing import calc_diff

from generators import rand_bf16, f32, generate_normal


def test_einsum_bmk_bnk_mn():
    b, m, n, k = 4, 64, 96, 128
    a = rand_bf16(b, m, k)
    bb = rand_bf16(b, n, k)
    ref = np.einsum('bmk,bnk->mn', f32(a), f32(bb))
    # BF16 out (internal f32 accumulation)
    d = dg.einsum('bmk,bnk->mn', a, bb, d=jnp.zeros((), jnp.bfloat16))
    assert calc_diff(d, ref) < 1e-5
    # FP32 out with accumulation (c == d contract)
    c = jnp.asarray(np.random.randn(m, n).astype(np.float32))
    d2 = dg.einsum('bmk,bnk->mn', a, bb, d=c, c=c)
    assert calc_diff(d2, ref + np.asarray(c)) < 1e-6


@pytest.mark.parametrize('expr', ['bhr,hdr->bhd', 'bhd,hdr->bhr'])
def test_einsum_head_projections(expr):
    b, h, r, d_dim = 8, 4, 64, 32
    if expr == 'bhr,hdr->bhd':
        a = rand_bf16(b, h, r)
        bb = rand_bf16(h, d_dim, r)
        ref = np.einsum('bhr,hdr->bhd', f32(a), f32(bb))
    else:
        a = rand_bf16(b, h, d_dim)
        bb = rand_bf16(h, d_dim, r)
        ref = np.einsum('bhd,hdr->bhr', f32(a), f32(bb))
    out = dg.einsum(expr, a, bb)
    assert out.dtype == jnp.bfloat16
    assert calc_diff(out, ref) < 1e-5


def test_fp8_bmm():
    b, m, n, k = 3, 64, 128, 256
    a = rand_bf16(b, m, k)
    bb = rand_bf16(b, n, k)
    ref = np.einsum('bmk,bnk->bmn', f32(a), f32(bb))
    a_q = [dg.per_token_cast_to_fp8(a[i], use_ue8m0=False) for i in range(b)]
    b_q = [dg.per_block_cast_to_fp8(bb[i], use_ue8m0=False) for i in range(b)]
    av, asf = jnp.stack([x[0] for x in a_q]), jnp.stack([x[1] for x in a_q])
    bv, bsf = jnp.stack([x[0] for x in b_q]), jnp.stack([x[1] for x in b_q])
    d = dg.fp8_bmm(av, asf, bv, bsf)
    assert calc_diff(d, ref) < 1e-3


def test_fp8_einsum_bhr_hdr_bhd():
    b, h, r, d_dim = 64, 4, 256, 128
    a = rand_bf16(b, h, r)
    bb = rand_bf16(h, d_dim, r)
    ref = np.einsum('bhr,hdr->bhd', f32(a), f32(bb))
    # quantize: a per-token over r (per (b,h) rows), b per-block per head
    a_q = [dg.per_token_cast_to_fp8(a[:, i, :], use_ue8m0=False) for i in range(h)]
    av = jnp.stack([x[0] for x in a_q], axis=1)            # [b, h, r]
    asf = jnp.stack([x[1] for x in a_q], axis=1)           # [b, h, rsf]
    b_q = [dg.per_block_cast_to_fp8(bb[i], use_ue8m0=False) for i in range(h)]
    bv, bsf = jnp.stack([x[0] for x in b_q]), jnp.stack([x[1] for x in b_q])
    d = dg.fp8_einsum('bhr,hdr->bhd', (av, asf), (bv, bsf),
                      d=jnp.zeros((b, h, d_dim), jnp.bfloat16))
    assert calc_diff(d, ref) < 1e-3


@pytest.mark.parametrize('num_splits', [None, 4])
def test_tf32_hc_prenorm_gemm(num_splits):
    m, n, k = 128, 192, 384
    a = rand_bf16(m, k)
    b = jnp.asarray(np.random.randn(n, k).astype(np.float32))
    d, s = dg.tf32_hc_prenorm_gemm(a, b, num_splits=num_splits)
    if num_splits is not None:
        assert d.shape == (num_splits, m, n) and s.shape == (num_splits, m)
        d, s = d.sum(0), s.sum(0)
    ref_d = f32(a) @ np.asarray(b).T
    ref_s = (f32(a) ** 2).sum(-1)
    assert calc_diff(d, ref_d) < 1e-5, calc_diff(d, ref_d)
    assert calc_diff(s, ref_s) < 1e-6


def test_fp8_gemm_nt_skip_head_mid():
    """Head-split epilogue (/root/reference/tests/test_attention.py:19-62)."""
    m, k = 64, 256
    head_splits = (32, 16, 32)
    num_heads = 4
    n = num_heads * (head_splits[0] + head_splits[2])
    a, b, _, ref_d = generate_normal(m, n, k)
    d = dg.fp8_gemm_nt_skip_head_mid(a, b, head_splits=head_splits,
                                     disable_ue8m0_cast=True)
    left, mid, right = head_splits
    ref3 = np.asarray(ref_d, np.float32).reshape(m, num_heads, left + right)
    expected = np.concatenate(
        [ref3[:, :, :left], np.zeros((m, num_heads, mid), np.float32),
         ref3[:, :, left:]], axis=2).reshape(m, -1)
    assert d.shape == (m, num_heads * (left + mid + right))
    # zero-mid columns exactly zero
    d3 = np.asarray(d, np.float32).reshape(m, num_heads, left + mid + right)
    assert not d3[:, :, left:left + mid].any()
    assert calc_diff(d, expected) < 1e-3


def test_tf32_hc_prenorm_gemm_deep_k_multi_step():
    """k > block_k (gk > 1) exercises the accumulator-scratch branch of the
    HC prenorm kernel (the shallow-k tests now take the gk==1 direct-write
    branch)."""
    m, n, k = 128, 192, 1024   # bk = min(512, k) -> gk = 2
    a = rand_bf16(m, k)
    b = jnp.asarray(np.random.randn(n, k).astype(np.float32))
    d, s = dg.tf32_hc_prenorm_gemm(a, b)
    af = np.asarray(a, np.float32)
    assert calc_diff(d, af @ np.asarray(b, np.float32).T) < 1e-5
    assert calc_diff(s[:, 0] if s.ndim == 2 else s, (af * af).sum(1)) < 1e-5
