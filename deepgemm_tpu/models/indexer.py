"""Lightning-indexer sparse attention — the consuming pattern the MQA
logits kernels exist for (DeepSeek-V3.2-style: score every KV position with
a cheap quantized indexer, keep the top-k, run exact attention over only
those positions).

The reference ships the scoring kernels (csrc/apis/attention.hpp) and leaves
the selection + sparse attention to the serving stack; this module provides
that consumer end-to-end on TPU so the kernels are exercised the way a
server would:

  prefill:  fp8_mqa_logits  -> top-k per query row -> gathered attention
  decode:   fp8_fp4_paged_mqa_logits over the paged cache -> top-k ->
            gathered attention over the selected cache slots

Selection and the sparse gather are XLA (top_k + take_along_axis — both
efficient on TPU); the FLOP-heavy scoring rides the Pallas kernels.
"""

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.attention import fp8_fp4_mqa_logits, fp8_fp4_paged_mqa_logits
from ..utils.math import per_custom_dims_cast_to_fp8

NEG_INF = float('-inf')


def _topk_indices(logits: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row top-k kv positions + validity mask (rows may have fewer than
    k in-range positions; those slots are invalid).

    Method is pinnable via ``DGT_TOPK_METHOD``: ``sort`` (default —
    ``lax.top_k``'s fused per-row sort, measured 126 us at [64, 4096]->512)
    or ``select`` (models/topk.topk_select, the no-sort bisection +
    scatter-compaction tier — measured 1476 us at the same shape, kept for
    very-large-n/small-k regimes). Both return the same selected SET;
    ``sort`` orders by score, ``select`` by ascending position — consumers
    here are order-insensitive (softmax over the selected set)."""
    import os
    if os.environ.get('DGT_TOPK_METHOD', 'sort') == 'select':
        from .topk import topk_select
        return topk_select(logits, k)
    vals, idx = jax.lax.top_k(logits, k)
    return idx.astype(jnp.int32), jnp.isfinite(vals)


def indexer_sparse_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                             index_q: jnp.ndarray, index_kv: jnp.ndarray,
                             index_weights: jnp.ndarray,
                             ks: jnp.ndarray, ke: jnp.ndarray,
                             topk: int,
                             scale: Optional[float] = None) -> jnp.ndarray:
    """Prefill-side sparse attention.

    q/k/v [sq|skv, h, d] bf16 (the attention streams); index_q [sq, hi, di],
    index_kv [skv, di], index_weights [sq, hi] — the indexer streams (hi, di
    are the small indexer head count/dim). ks/ke int32 [sq]: each query row
    may only attend within [ks, ke) (causal/CP windows). Returns [sq, h, d].
    """
    sq, h, d = q.shape
    skv = k.shape[0]
    scale = scale or (1.0 / np.sqrt(d))

    # 1. quantized indexer scoring on the Pallas kernel (fp8 q, per-token
    #    scaled fp8 kv — the serving recipe)
    iq = jnp.clip(index_q.astype(jnp.float32), -448, 448).astype(jnp.float8_e4m3fn)
    ikv, ikv_sf = per_custom_dims_cast_to_fp8(index_kv, (0,), use_ue8m0=False)
    logits = fp8_fp4_mqa_logits((iq, None), (ikv, ikv_sf), index_weights,
                                ks, ke)

    # 2. top-k selection + sparse gather
    sel, valid = _topk_indices(logits, topk)               # [sq, topk]
    k_sel = k[jnp.clip(sel, 0, skv - 1)]                   # [sq, topk, h, d]
    v_sel = v[jnp.clip(sel, 0, skv - 1)]

    # 3. exact attention over the selected positions only — fused Pallas
    #    when the shape qualifies (kernels/sparse_attn.py: one program for
    #    score/softmax/weighted-sum, intermediates never leave VMEM)
    from ..kernels.sparse_attn import gathered_attention, use_fused
    if use_fused(topk, h, d):
        return gathered_attention(q, k_sel, v_sel, valid, scale)
    scores = jnp.einsum('qhd,qthd->qht', q.astype(jnp.float32),
                        k_sel.astype(jnp.float32)) * scale
    scores = jnp.where(valid[:, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum('qht,qthd->qhd', probs, v_sel.astype(jnp.float32))
    return out.astype(q.dtype)


def indexer_sparse_decode(q: jnp.ndarray,
                          kv_cache, index_cache,
                          index_q: jnp.ndarray, index_weights: jnp.ndarray,
                          context_lens: jnp.ndarray, block_table: jnp.ndarray,
                          max_context_len: int, topk: int,
                          scale: Optional[float] = None) -> jnp.ndarray:
    """Decode-side sparse attention over a paged cache.

    q [B, 1, h, d] bf16; kv_cache = (k_pages, v_pages) each
    [num_blocks, block_kv, h, d] bf16; index_cache = (fp8 values
    [num_blocks, block_kv, di], f32 SF [num_blocks, block_kv]) — the indexer
    cache in the kernel's pre-split layout; index_q [B, 1, hi, di];
    index_weights [B, hi]. Returns [B, 1, h, d].
    """
    b, nn, h, d = q.shape
    assert nn == 1
    k_pages, v_pages = kv_cache
    num_blocks, block_kv = k_pages.shape[0], k_pages.shape[1]
    mb = block_table.shape[1]
    scale = scale or (1.0 / np.sqrt(d))

    iq = jnp.clip(index_q.astype(jnp.float32), -448, 448).astype(jnp.float8_e4m3fn)
    logits = fp8_fp4_paged_mqa_logits(
        (iq, None), index_cache, index_weights, context_lens, block_table,
        None, max_context_len)                              # [B, max_ctx]

    sel, valid = _topk_indices(logits, topk)                # [B, topk]
    # paged position -> (page, offset) -> global cache slot
    pages = jnp.clip(sel, 0, max_context_len - 1) // block_kv
    offs = jnp.clip(sel, 0, max_context_len - 1) % block_kv
    rows = jnp.arange(b)[:, None]
    blocks = jnp.clip(block_table, 0, num_blocks - 1)[rows, jnp.clip(pages, 0, mb - 1)]
    import os
    gather_mode = os.environ.get('DGT_SPARSE_GATHER', 'flat')
    if gather_mode == 'pallas':
        # GATHER-FUSED Pallas path: no XLA gather at all — the kernel
        # streams each row's selected tokens from the in-HBM cache with
        # per-token async copies under an online softmax
        # (kernels/sparse_attn.py:sparse_attention_paged). The XLA gather
        # is the measured bound of the decode compute step (~2x846 us of
        # 2121 at the serving shape; the attention tail rides in its
        # shadow — fused-vs-XLA attention measured a wash, 2026-08-20).
        from ..kernels.sparse_attn import (sparse_attention_paged,
                                           paged_eligible)
        if paged_eligible(topk, h, d):
            tok = blocks * block_kv + offs                  # [B, topk]
            return sparse_attention_paged(
                q[:, 0], k_pages.reshape(-1, *k_pages.shape[2:]),
                v_pages.reshape(-1, *v_pages.shape[2:]), tok, valid,
                scale)[:, None].astype(q.dtype)
        gather_mode = 'flat'
    if gather_mode == 'flat':
        # FLAT token index into the (free) [nb*bkv, h, d] view — one
        # 1-level XLA gather instead of the 2-level [blocks, offs] form
        # (same rows; A/B'd on chip via DGT_SPARSE_GATHER=2level: a wash)
        tok = blocks * block_kv + offs                      # [B, topk]
        k_sel = k_pages.reshape(-1, *k_pages.shape[2:])[tok]
        v_sel = v_pages.reshape(-1, *v_pages.shape[2:])[tok]
    else:
        k_sel = k_pages[blocks, offs]                       # [B, topk, h, d]
        v_sel = v_pages[blocks, offs]

    from ..kernels.sparse_attn import gathered_attention, use_fused
    if use_fused(topk, h, d):
        return gathered_attention(q[:, 0], k_sel, v_sel, valid,
                                  scale)[:, None]
    scores = jnp.einsum('bhd,bthd->bht', q[:, 0].astype(jnp.float32),
                        k_sel.astype(jnp.float32)) * scale
    scores = jnp.where(valid[:, None, :], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum('bht,bthd->bhd', probs, v_sel.astype(jnp.float32))
    return out[:, None].astype(q.dtype)
