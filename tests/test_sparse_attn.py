"""Fused post-gather sparse attention (kernels/sparse_attn.py) vs a
float64 host oracle: arbitrary validity masks, all-masked rows (defined 0,
vs the XLA path's NaN), block_rows batching, and the indexer integration
(fused vs XLA path tolerance)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepgemm_tpu.kernels.sparse_attn import (gathered_attention,
                                              fused_eligible, _block_rows)
from deepgemm_tpu.testing import calc_diff


def _oracle(q, k_sel, v_sel, valid, scale):
    q, k_sel, v_sel = (np.asarray(x, np.float64) for x in (q, k_sel, v_sel))
    scores = np.einsum('bhd,bthd->bth', q, k_sel) * scale
    scores = np.where(np.asarray(valid)[:, :, None], scores, -np.inf)
    m = np.max(scores, axis=1, keepdims=True)
    e = np.exp(scores - np.where(np.isfinite(m), m, 0.0))
    e = np.where(np.asarray(valid)[:, :, None], e, 0.0)
    den = e.sum(axis=1)
    out = np.einsum('bth,bthd->bhd', e, v_sel)
    return out / np.where(den > 0, den, 1.0)[:, :, None]


@pytest.mark.parametrize('rows,t,h,d', [(8, 64, 8, 128), (5, 24, 4, 128),
                                        (16, 8, 1, 256)])
def test_gathered_attention_vs_oracle(rows, t, h, d):
    rng = np.random.RandomState(11)
    q = jnp.asarray(rng.randn(rows, h, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(rows, t, h, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(rows, t, h, d), jnp.bfloat16)
    valid = jnp.asarray(rng.rand(rows, t) > 0.3)
    valid = valid.at[:, 0].set(True)          # >= 1 valid per row
    scale = 1.0 / np.sqrt(d)
    out = gathered_attention(q, k, v, valid, scale)
    assert out.shape == (rows, h, d) and out.dtype == jnp.bfloat16
    ref = _oracle(q, k, v, valid, scale)
    assert calc_diff(out.astype(jnp.float32), ref) < 2e-3


def test_gathered_attention_all_masked_row_is_zero():
    rng = np.random.RandomState(12)
    rows, t, h, d = 4, 16, 2, 128
    q = jnp.asarray(rng.randn(rows, h, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(rows, t, h, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(rows, t, h, d), jnp.bfloat16)
    valid = jnp.asarray(rng.rand(rows, t) > 0.5).at[2, :].set(False)
    out = np.asarray(gathered_attention(q, k, v, valid, 0.1), np.float32)
    assert np.all(out[2] == 0.0)              # defined (XLA path: NaN)
    assert np.isfinite(out).all()
    ref = _oracle(q, k, v, valid, 0.1)
    ok = np.asarray([0, 1, 3])
    assert calc_diff(jnp.asarray(out[ok]), ref[ok]) < 2e-3


def test_block_rows_and_eligibility():
    # one row per grid step ALWAYS (batched rows would need middle-dim
    # multi_reductions with a leading unit dim — device Mosaic rejects)
    assert _block_rows(16, 8, 1, 256) == 1
    assert _block_rows(64, 512, 8, 128) == 1
    assert fused_eligible(512, 8, 128)
    assert not fused_eligible(512, 8, 64)         # d % 128 rule
    assert not fused_eligible(500, 8, 128)        # t % 8 rule


def test_indexer_decode_fused_matches_xla(monkeypatch):
    """The indexer decode path through the fused kernel matches the XLA
    attention tail within bf16-input tolerance."""
    from deepgemm_tpu.models.indexer import indexer_sparse_decode
    rng = np.random.RandomState(13)
    B, h, d, hi, di, topk = 4, 2, 128, 2, 32, 16
    bkv, mps = 16, 4
    nbs = B * mps
    mcl = bkv * mps
    kp = jnp.asarray(rng.randn(nbs, bkv, h, d) * 0.2, jnp.bfloat16)
    vp = jnp.asarray(rng.randn(nbs, bkv, h, d) * 0.2, jnp.bfloat16)
    ikp = jnp.clip(jnp.asarray(rng.randn(nbs, bkv, di), jnp.float32),
                   -448, 448).astype(jnp.float8_e4m3fn)
    isfp = jnp.asarray(rng.rand(nbs, bkv).astype(np.float32))
    btab = jnp.asarray(rng.permutation(nbs).reshape(B, mps), jnp.int32)
    ctx = jnp.asarray(rng.randint(topk + 1, mcl, B), jnp.int32)
    q = jnp.asarray(rng.randn(B, 1, h, d), jnp.bfloat16)
    iq = jnp.asarray(rng.randn(B, 1, hi, di), jnp.bfloat16)
    iw = jnp.asarray(rng.rand(B, hi).astype(np.float32))

    args = (q, (kp, vp), (ikp, isfp), iq, iw, ctx, btab, mcl, topk)
    monkeypatch.setenv('DGT_SPARSE_ATTN', 'fused')
    out_fused = indexer_sparse_decode(*args)
    monkeypatch.setenv('DGT_SPARSE_ATTN', 'xla')
    out_xla = indexer_sparse_decode(*args)
    assert calc_diff(out_fused.astype(jnp.float32),
                     out_xla.astype(jnp.float32)) < 1e-5


@pytest.mark.parametrize('rows,t,h,d,n', [(4, 64, 8, 128, 256),
                                          (3, 24, 2, 128, 100)])
def test_sparse_attention_paged_vs_gathered(rows, t, h, d, n):
    """The gather-fused paged kernel must match the gathered kernel (same
    math, different data movement) and the f64 oracle."""
    from deepgemm_tpu.kernels.sparse_attn import sparse_attention_paged
    rng = np.random.RandomState(21)
    q = jnp.asarray(rng.randn(rows, h, d), jnp.bfloat16)
    cache = jnp.asarray(rng.randn(n, h, d), jnp.bfloat16)
    tok = jnp.asarray(rng.randint(0, n, (rows, t)), jnp.int32)
    valid = jnp.asarray(rng.rand(rows, t) > 0.3).at[:, 0].set(True)
    scale = 1.0 / np.sqrt(d)
    out_p = sparse_attention_paged(q, cache, cache, tok, valid, scale)
    k_sel = cache[tok]
    out_g = gathered_attention(q, k_sel, k_sel, valid, scale)
    assert calc_diff(out_p.astype(jnp.float32),
                     np.asarray(out_g, np.float32)) < 1e-6
    ref = _oracle(q, k_sel, k_sel, valid, scale)
    assert calc_diff(out_p.astype(jnp.float32), ref) < 2e-3


def test_indexer_decode_pallas_gather_matches_flat(monkeypatch):
    """DGT_SPARSE_GATHER=pallas end-to-end through the indexer decode."""
    from deepgemm_tpu.models.indexer import indexer_sparse_decode
    rng = np.random.RandomState(23)
    B, h, d, hi, di, topk = 4, 2, 128, 2, 32, 16
    bkv, mps = 16, 4
    nbs = B * mps
    mcl = bkv * mps
    kp = jnp.asarray(rng.randn(nbs, bkv, h, d) * 0.2, jnp.bfloat16)
    vp = jnp.asarray(rng.randn(nbs, bkv, h, d) * 0.2, jnp.bfloat16)
    ikp = jnp.clip(jnp.asarray(rng.randn(nbs, bkv, di), jnp.float32),
                   -448, 448).astype(jnp.float8_e4m3fn)
    isfp = jnp.asarray(rng.rand(nbs, bkv).astype(np.float32))
    btab = jnp.asarray(rng.permutation(nbs).reshape(B, mps), jnp.int32)
    ctx = jnp.asarray(rng.randint(topk + 1, mcl, B), jnp.int32)
    q = jnp.asarray(rng.randn(B, 1, h, d), jnp.bfloat16)
    iq = jnp.asarray(rng.randn(B, 1, hi, di), jnp.bfloat16)
    iw = jnp.asarray(rng.rand(B, hi).astype(np.float32))
    args = (q, (kp, vp), (ikp, isfp), iq, iw, ctx, btab, mcl, topk)
    monkeypatch.setenv('DGT_SPARSE_GATHER', 'pallas')
    out_p = indexer_sparse_decode(*args)
    monkeypatch.setenv('DGT_SPARSE_GATHER', 'flat')
    monkeypatch.setenv('DGT_SPARSE_ATTN', 'fused')
    out_f = indexer_sparse_decode(*args)
    assert calc_diff(out_p.astype(jnp.float32),
                     out_f.astype(jnp.float32)) < 1e-5
