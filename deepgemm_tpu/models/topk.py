"""Exact top-k selection without a sort (the r5 `topk_select` tier).

``jax.lax.top_k`` on TPU lowers to a fused per-row sort — measured 126 us
at the serving shape [64, 4096] -> 512 (fine).  This module provides the
bisection alternative the serving literature uses for much larger k/n
(count-based threshold refinement + scatter compaction): 32 count passes
find the exact k-th value through the *ordered-bits* view of f32, then one
scatter compacts the selected positions in ascending order.

Measured on v5e (scripts/measure_serving_donate.py, r5): 1476 us at the
serving shape — it LOSES to the fused sort there (the 32 count passes and
the 256K-update scatter both stream [B, n] repeatedly), so the default
selection method stays ``'sort'``; ``DGT_TOPK_METHOD=select`` pins this
path (models/indexer._topk_indices) for shapes where a sort is the bound
(very large n with small k).

Contract (tests/test_indexer.py::test_topk_select_matches_lax_top_k):
  * the selected SET equals ``lax.top_k``'s, including tie runs — both
    break ties toward LOWER positions;
  * returned indices are in ascending position order (not score order);
  * ``valid`` is prefix-true: exactly ``min(k, finite_count)`` leading
    True entries (non-finite logits are never valid selections).
"""

from typing import Tuple

import jax
import jax.numpy as jnp


def _ordered_bits(x: jnp.ndarray) -> jnp.ndarray:
    """f32 -> uint32 keys with the same total order (IEEE-754 trick: flip
    the sign bit for non-negatives, all bits for negatives). NaNs are
    mapped below every finite value (treated as never-selectable)."""
    x = jnp.where(jnp.isnan(x), -jnp.inf, x)
    bits = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    neg = (bits >> 31).astype(jnp.bool_)
    return jnp.where(neg, ~bits, bits ^ jnp.uint32(0x80000000))


def topk_select(logits: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k via bit-wise threshold bisection (no sort).

    logits [b, n] (any float dtype; compared in f32). Returns
    ``(idx [b, k] int32 ascending-position, valid [b, k] bool prefix)``.
    Rows with fewer than k finite entries get that many valid slots; the
    padding indices are in-range (n-1) but marked invalid.
    """
    b, n = logits.shape
    k = min(k, n)
    keys = _ordered_bits(logits)                             # [b, n] uint32
    finite = jnp.isfinite(logits.astype(jnp.float32))

    # 32 count passes build the largest threshold T with count(key>=T) >= k
    # (then the k-th largest key == T exactly).
    def bit_step(i, prefix):
        bit = jnp.uint32(1) << jnp.uint32(31 - i)
        cand = prefix | bit                                  # [b] uint32
        cnt = jnp.sum((keys >= cand[:, None]).astype(jnp.int32), axis=1)
        return jnp.where(cnt >= k, cand, prefix)

    thresh = jax.lax.fori_loop(0, 32, bit_step,
                               jnp.zeros((b,), jnp.uint32))  # [b]

    gt = keys > thresh[:, None]
    eq = keys == thresh[:, None]
    n_gt = jnp.sum(gt.astype(jnp.int32), axis=1, keepdims=True)
    # ties break toward LOWER positions (lax.top_k's rule): take the first
    # (k - n_gt) equal-to-threshold entries in position order
    eq_rank = jnp.cumsum(eq.astype(jnp.int32), axis=1)       # 1-based
    sel = gt | (eq & (eq_rank <= (k - n_gt)))
    sel_fin = sel & finite                                   # [b, n]

    # scatter compaction: position j of row r lands at slot rank(r, j)
    rank = jnp.cumsum(sel_fin.astype(jnp.int32), axis=1) - 1
    tgt = jnp.where(sel_fin, rank, k)                        # k == dropped
    cols = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None], (b, n))
    rows = jnp.broadcast_to(jnp.arange(b, dtype=jnp.int32)[:, None], (b, n))
    idx = jnp.full((b, k), n - 1, jnp.int32).at[
        rows.reshape(-1), tgt.reshape(-1)].set(cols.reshape(-1), mode='drop')
    n_fin = jnp.sum(sel_fin.astype(jnp.int32), axis=1)       # [b]
    valid = jnp.arange(k, dtype=jnp.int32)[None] < n_fin[:, None]
    return idx, valid
