"""Lightning-indexer sparse attention (models/indexer.py) — the consuming
pattern of the MQA logits kernels (DeepSeek-style score -> top-k -> sparse
attention), checked against a dense numpy oracle restricted to the same
selected positions."""

import numpy as np
import jax
import jax.numpy as jnp

from deepgemm_tpu.models.indexer import (indexer_sparse_attention,
                                         indexer_sparse_decode)
from deepgemm_tpu.testing import calc_diff

import deepgemm_tpu as dg


def _oracle_select(logits_np, topk):
    sel = np.argsort(-logits_np, axis=-1, kind='stable')[:, :topk]
    vals = np.take_along_axis(logits_np, sel, axis=-1)
    return sel, np.isfinite(vals)


def _oracle_attention(q, k_sel, v_sel, valid, scale):
    scores = np.einsum('qhd,qthd->qht', q, k_sel) * scale
    scores = np.where(valid[:, None, :], scores, -np.inf)
    e = np.exp(scores - scores.max(axis=-1, keepdims=True))
    e = np.where(valid[:, None, :], e, 0.0)
    probs = e / np.clip(e.sum(axis=-1, keepdims=True), 1e-30, None)
    return np.einsum('qht,qthd->qhd', probs, v_sel)


def test_indexer_sparse_attention_prefill():
    rng = np.random.RandomState(31)
    sq, skv, h, d, hi, di, topk = 32, 256, 4, 64, 2, 32, 16
    q = jnp.asarray(rng.randn(sq, h, d), jnp.bfloat16)
    k = jnp.asarray(rng.randn(skv, h, d), jnp.bfloat16)
    v = jnp.asarray(rng.randn(skv, h, d), jnp.bfloat16)
    iq = jnp.asarray(rng.randn(sq, hi, di), jnp.bfloat16)
    ikv = jnp.asarray(rng.randn(skv, di), jnp.bfloat16)
    iw = jnp.asarray(rng.rand(sq, hi).astype(np.float32))
    ks = np.zeros(sq, np.int32)
    ke = (np.arange(sq) + (skv - sq)).astype(np.int32)

    out = indexer_sparse_attention(q, k, v, iq, ikv, iw,
                                   jnp.asarray(ks), jnp.asarray(ke), topk)
    assert out.shape == (sq, h, d)

    # oracle: recompute the kernel's logits via the public op, then replay
    # the selection + attention in numpy
    iq8 = jnp.clip(iq.astype(jnp.float32), -448, 448).astype(jnp.float8_e4m3fn)
    ikv8, isf = dg.per_custom_dims_cast_to_fp8(ikv, (0,), use_ue8m0=False)
    logits = np.asarray(dg.fp8_mqa_logits((iq8, None), (ikv8, isf), iw,
                                          jnp.asarray(ks), jnp.asarray(ke)))
    sel, valid = _oracle_select(logits, topk)
    k_np = np.asarray(k, np.float32)
    v_np = np.asarray(v, np.float32)
    ref = _oracle_attention(np.asarray(q, np.float32),
                            k_np[np.clip(sel, 0, skv - 1)],
                            v_np[np.clip(sel, 0, skv - 1)],
                            valid, 1.0 / np.sqrt(d))
    # ties in top-k may order differently between lax.top_k and argsort;
    # softmax over the same set is order-invariant, so results still match
    assert calc_diff(out, ref) < 1e-3


def test_indexer_sparse_decode_paged():
    rng = np.random.RandomState(32)
    B, h, d, hi, di, topk = 3, 4, 64, 2, 32, 8
    block_kv, bps = 64, 3
    max_ctx = block_kv * bps
    nb = B * bps
    k_pages = jnp.asarray(rng.randn(nb, block_kv, h, d), jnp.bfloat16)
    v_pages = jnp.asarray(rng.randn(nb, block_kv, h, d), jnp.bfloat16)
    ivals = jnp.clip(jnp.asarray(rng.randn(nb, block_kv, di), jnp.float32),
                     -448, 448).astype(jnp.float8_e4m3fn)
    isf = jnp.asarray(rng.rand(nb, block_kv).astype(np.float32))
    bt = rng.permutation(nb).reshape(B, bps).astype(np.int32)
    ctx = rng.randint(topk + 1, max_ctx, B).astype(np.int32)
    q = jnp.asarray(rng.randn(B, 1, h, d), jnp.bfloat16)
    iq = jnp.asarray(rng.randn(B, 1, hi, di), jnp.bfloat16)
    iw = jnp.asarray(rng.rand(B, hi).astype(np.float32))

    out = indexer_sparse_decode(q, (k_pages, v_pages), (ivals, isf), iq, iw,
                                jnp.asarray(ctx), jnp.asarray(bt),
                                max_ctx, topk)
    assert out.shape == (B, 1, h, d)

    iq8 = jnp.clip(iq.astype(jnp.float32), -448, 448).astype(jnp.float8_e4m3fn)
    logits = np.asarray(dg.fp8_fp4_paged_mqa_logits(
        (iq8, None), (ivals, isf), iw, jnp.asarray(ctx), jnp.asarray(bt),
        None, max_ctx))
    kp = np.asarray(k_pages, np.float32)
    vp = np.asarray(v_pages, np.float32)
    for i in range(B):
        sel, valid = _oracle_select(logits[i:i + 1], topk)
        pages = np.clip(sel, 0, max_ctx - 1) // block_kv
        offs = np.clip(sel, 0, max_ctx - 1) % block_kv
        blocks = bt[i][np.clip(pages, 0, bps - 1)]
        ref = _oracle_attention(np.asarray(q, np.float32)[i],
                                kp[blocks[0], offs[0]][None],
                                vp[blocks[0], offs[0]][None],
                                valid, 1.0 / np.sqrt(d))
        assert calc_diff(out[i], ref) < 1e-3, i


def test_topk_select_matches_lax_top_k():
    """topk_select (the r5 no-sort exact selection, models/topk.py) must
    pick the SAME set as jax.lax.top_k — including tie runs and rows with
    fewer than k finite entries."""
    from deepgemm_tpu.models.topk import topk_select
    rng = np.random.RandomState(41)
    b, n, k = 8, 512, 96
    logits = rng.randn(b, n).astype(np.float32)
    # tie runs (duplicate values straddling the k-th place)
    logits[1, :] = np.repeat(rng.randn(n // 8), 8)
    logits[2, 5:200] = logits[2, 4]
    # -inf tails of varying lengths, incl. one row with < k finite
    logits[3, 50:] = -np.inf
    logits[4, 300:] = -np.inf
    logits[5, :] = -np.inf
    lj = jnp.asarray(logits)
    idx, valid = jax.jit(topk_select, static_argnums=1)(lj, k)
    idx, valid = np.asarray(idx), np.asarray(valid)
    vals_ref, idx_ref = jax.lax.top_k(lj, k)
    vals_ref = np.asarray(vals_ref)
    idx_ref = np.asarray(idx_ref)
    for r in range(b):
        n_fin = int(np.isfinite(vals_ref[r]).sum())
        assert valid[r, :n_fin].all() and not valid[r, n_fin:].any(), r
        # same selected set (values multiset identical; ties may pick
        # different positions BUT both break toward lower positions ->
        # identical index sets too)
        assert set(idx[r, :n_fin]) == set(idx_ref[r, :n_fin]), r
        # ascending-position order contract
        assert (np.diff(idx[r, :n_fin]) > 0).all() if n_fin > 1 else True


def test_topk_select_env_pin(monkeypatch):
    """DGT_TOPK_METHOD=sort routes _topk_indices through lax.top_k."""
    from deepgemm_tpu.models.indexer import _topk_indices
    rng = np.random.RandomState(43)
    lj = jnp.asarray(rng.randn(4, 256).astype(np.float32))
    monkeypatch.setenv('DGT_TOPK_METHOD', 'sort')
    i_sort, v_sort = _topk_indices(lj, 32)
    monkeypatch.setenv('DGT_TOPK_METHOD', 'select')
    i_sel, v_sel = _topk_indices(lj, 32)
    for r in range(4):
        assert set(np.asarray(i_sort)[r].tolist()) \
            == set(np.asarray(i_sel)[r].tolist())
    assert np.asarray(v_sort).all() and np.asarray(v_sel).all()
