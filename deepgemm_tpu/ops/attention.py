"""Attention (MQA lightning-indexer) public APIs, mirroring
/root/reference/csrc/apis/attention.hpp:

  * ``fp8_fp4_mqa_logits`` / legacy ``fp8_mqa_logits`` — prefill scoring with
    per-token [ks, ke) ranges (context-parallel window contract)
  * ``clean_logits_`` — standalone -inf range fill
    (/root/reference/csrc/jit_kernels/impls/smxx_clean_logits.hpp); the main
    kernels fuse this, so it exists for API parity and for external buffers
  * paged decode variants live in ops/paged_attention.py
"""

from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..kernels.mqa_logits import mqa_logits
from ..utils.math import cast_back_from_fp4, ceil_div, unpack_ue8m0_from_int
from .gemm import _split_pair


def _decode_fp4_rows(packed: jnp.ndarray, sf: jnp.ndarray,
                     head_dim: int) -> jnp.ndarray:
    """Exact decode of packed e2m1 rows [..., d/2] with per-32 UE8M0 SF into
    bf16 [..., d]: every e2m1 magnitude times a power-of-two scale is exactly
    representable in bf16, so the fold is lossless — the TPU analog of the
    reference's in-kernel FP4 pipeline (impls/sm100_mqa_logits.cuh), which on
    v5e is VPU-bound in-kernel (see kernels/dense.py planar decode notes)."""
    lead = packed.shape[:-1]
    flat = packed.reshape(-1, packed.shape[-1])
    sf_flat = sf.reshape(flat.shape[0], -1)
    out = cast_back_from_fp4(flat, sf_flat, gran_k=32,
                             use_packed_ue8m0=(sf.dtype == jnp.int32))
    return out.astype(jnp.bfloat16).reshape(*lead, head_dim)


def fp8_fp4_mqa_logits(q, kv, weights, cu_seq_len_k_start, cu_seq_len_k_end,
                       clean_logits: bool = True, max_seqlen_k: int = 0,
                       logits_dtype=jnp.float32):
    """Indexer scoring (/root/reference/csrc/apis/attention.hpp:233-402 API
    family): ``logits[i, j] = sum_h w[i,h] * relu(q[i,h,:] . kv[j,:])`` for
    ``j in [ks[i], ke[i])``; -inf elsewhere (the fused clean). With
    ``max_seqlen_k > 0`` returns the compressed [sq, max_seqlen_k] layout
    where row i starts at its own ks.

    FP4 mode (/root/reference/tests/test_attention.py:170-180 contract):
    ``q = (packed e2m1 [sq, h, d//2] int8, per-32 packed-UE8M0 SF [sq, h])``
    and ``kv = (packed [skv, d//2], SF [skv])``; both decode exactly into
    bf16 before the MXU pass."""
    q_val, q_sf = _split_pair(q)
    kv_val, kv_sf = _split_pair(kv)
    if q_val.dtype in (jnp.int8, jnp.uint8):
        assert q_sf is not None, 'packed FP4 q requires its per-32 SF'
        head_dim = 2 * q_val.shape[-1]
        q_val = _decode_fp4_rows(q_val, q_sf, head_dim)
        if kv_val.dtype in (jnp.int8, jnp.uint8):
            kv_val = _decode_fp4_rows(kv_val, kv_sf, head_dim)
            kv_sf = None
    del clean_logits  # range cleaning is fused into the kernel
    return mqa_logits(q_val, kv_val, weights,
                      cu_seq_len_k_start, cu_seq_len_k_end,
                      kv_sf=kv_sf, max_seqlen_k=max_seqlen_k,
                      logits_dtype=logits_dtype)


def fp8_mqa_logits(q, kv, weights, cu_seqlen_ks, cu_seqlen_ke,
                   clean_logits: bool = True):
    """Legacy SM90 entry (/root/reference/csrc/apis/attention.hpp legacy
    exports): FP32 logits, full [sq, skv] layout."""
    return fp8_fp4_mqa_logits(q, kv, weights, cu_seqlen_ks, cu_seqlen_ke,
                              clean_logits=clean_logits, max_seqlen_k=0,
                              logits_dtype=jnp.float32)


def split_fused_kv_cache(fused_kv_cache: jnp.ndarray, head_dim: int):
    """Split the fused byte cache [num_blocks, block_kv, 1, head_dim+4]
    (values bytes then f32 SF bytes per block,
    /root/reference/csrc/apis/attention.hpp:283-328 and
    tests/test_attention.py:293-305) into (fp8 values [nb, bkv, d],
    f32 SF [nb, bkv])."""
    nb = fused_kv_cache.shape[0]
    bkv = fused_kv_cache.shape[1]
    flat = fused_kv_cache.reshape(nb, -1)
    assert flat.shape[1] == bkv * (head_dim + 4), flat.shape
    values_u8 = flat[:, :bkv * head_dim].reshape(nb, bkv, head_dim)
    values = jax.lax.bitcast_convert_type(values_u8, jnp.float8_e4m3fn)
    sf_u8 = flat[:, bkv * head_dim:].reshape(nb, bkv, 4)
    sf = jax.lax.bitcast_convert_type(sf_u8, jnp.float32)
    return values, sf


def get_paged_mqa_logits_metadata(context_lens: jnp.ndarray, block_kv: int,
                                  num_sms: int) -> jnp.ndarray:
    """Balanced (batch, kv-split) work schedule — parity with the reference's
    metadata kernel ([num_sms+1, 2] int32 cursors,
    /root/reference/deep_gemm/include/deep_gemm/scheduler/sm90_paged_mqa_logits.cuh:10-100),
    computed by the native C++ scheduler (csrc/dgt_runtime.cpp:
    dgt_paged_mqa_schedule). On TPU the Pallas grid is hardware-scheduled,
    so the schedule's role shifts: the decode op consumes the total active
    split count to size its kv tile for skewed context lengths (see
    ``fp8_fp4_paged_mqa_logits``). Traced lens pass through unscheduled."""
    if isinstance(context_lens, jax.core.Tracer):
        return context_lens.astype(jnp.int32)
    from ..runtime import native
    num_units = max(int(num_sms) if num_sms else 8, 1)
    lens = np.asarray(context_lens, np.int32).reshape(-1)
    out, _total = native.paged_mqa_schedule(lens, int(block_kv), num_units)
    return jnp.asarray(out, jnp.int32)


def split_fused_kv_cache_fp4(fused_kv_cache: jnp.ndarray, head_dim: int):
    """Split the FP4 fused byte cache [num_blocks, block_kv, 1, head_dim//2+4]
    (packed e2m1 nibbles then a packed-UE8M0 int32 of per-32 scales per token,
    /root/reference/tests/test_attention.py:307-316) into
    (packed int8 [nb, bkv, d//2], packed SF int32 [nb, bkv])."""
    nb = fused_kv_cache.shape[0]
    bkv = fused_kv_cache.shape[1]
    half = head_dim // 2
    flat = fused_kv_cache.reshape(nb, -1)
    assert flat.shape[1] == bkv * (half + 4), flat.shape
    values = jax.lax.bitcast_convert_type(
        flat[:, :bkv * half].reshape(nb, bkv, half), jnp.int8)
    sf = jax.lax.bitcast_convert_type(
        flat[:, bkv * half:].reshape(nb, bkv, 4), jnp.int32)
    return values, sf


def _varlen_group(indices) -> Tuple[np.ndarray, np.ndarray, int, int]:
    """Host-side varlen token pairing: group flat query rows by sequence id.
    The TPU analog of the reference's pairing scheduler
    (/root/reference/deep_gemm/include/deep_gemm/scheduler/sm100_paged_mqa_logits.cuh),
    which pairs same-sequence tokens so they share one KV stream; here a
    sequence's tokens become one batch row of a 2D-context-lens kernel call,
    so its KV pages stream exactly once for all of its tokens."""
    idx = np.asarray(indices)
    assert idx.ndim == 1, idx.shape
    raw_batch = int(idx.max()) + 1 if idx.size else 0
    order = np.argsort(idx, kind='stable')
    pos = np.empty(idx.shape[0], np.int64)
    rank_sorted = np.arange(idx.shape[0]) - np.searchsorted(idx[order], idx[order])
    pos[order] = rank_sorted
    t_max = int(np.bincount(idx, minlength=max(raw_batch, 1)).max()) if idx.size else 0
    return idx.astype(np.int64), pos, raw_batch, t_max


def _varlen_group_traced(indices: jnp.ndarray, max_batch: int, t_max: int):
    """Traced varlen pairing with STATIC (max_batch, t_max) bounds — the
    device-side analog of the reference's in-kernel pairing scheduler
    (/root/reference/deep_gemm/include/deep_gemm/scheduler/sm100_paged_mqa_logits.cuh):
    all shapes are fixed by the bounds, so the grouping runs under jit with
    no host sync. The caller guarantees indices < max_batch and at most
    t_max rows per sequence; rows beyond a bound are silently dropped by the
    scatters (same as out-of-capacity MoE slots)."""
    idx = indices.astype(jnp.int32).reshape(-1)
    b = idx.shape[0]
    order = jnp.argsort(idx, stable=True)
    idx_sorted = idx[order]
    # rank within the sequence = position in the sorted run
    rank_sorted = jnp.arange(b, dtype=jnp.int32) - \
        jnp.searchsorted(idx_sorted, idx_sorted, side='left').astype(jnp.int32)
    pos = jnp.zeros((b,), jnp.int32).at[order].set(rank_sorted)
    # first flat row of each sequence: reversed scatter keeps the earliest
    first_row = jnp.zeros((max_batch,), jnp.int32) \
        .at[idx[::-1]].set(jnp.arange(b - 1, -1, -1, dtype=jnp.int32),
                           mode='drop')
    return idx, pos, first_row


def fp8_fp4_paged_mqa_logits(q, fused_kv_cache, weights, context_lens,
                             block_table, schedule_meta=None,
                             max_context_len: int = 0,
                             clean_logits: bool = True,
                             logits_dtype=jnp.float32, indices=None,
                             strategy: str = 'gather',
                             max_batch: int = 0,
                             max_tokens_per_seq: int = 0):
    """Decode-side paged indexer scoring
    (/root/reference/csrc/apis/attention.hpp:233-402). ``fused_kv_cache`` may
    be the reference byte layout (FP8 ``d+4`` or FP4 ``d//2+4`` per token) or
    a pre-split ``(values, sf)`` pair (the zero-copy production path on TPU).

    FP4 mode: ``q = (packed e2m1 [b, nn, h, d//2], per-32 packed-UE8M0 SF
    [b, nn, h])``; both q and the cache decode exactly into bf16.

    Varlen mode (``indices`` [batch] = sequence id per flat query row,
    next_n == 1, /root/reference/csrc/apis/attention.hpp:347-391): rows of
    the same sequence are grouped into one kernel batch row so the
    sequence's KV pages stream once — the reference's token-pairing
    scheduler expressed as a host-side regrouping. ``indices`` must be a
    concrete (host) array: the grouping determines array shapes."""
    from ..kernels.paged_mqa import paged_mqa_logits

    q_val, q_sf = _split_pair(q)
    b, nn, h, dq = q_val.shape
    is_fp4_q = q_val.dtype in (jnp.int8, jnp.uint8)
    d = 2 * dq if is_fp4_q else dq
    if is_fp4_q:
        assert q_sf is not None, 'packed FP4 q requires its per-32 SF'
        q_val = _decode_fp4_rows(q_val, q_sf, d)
    del clean_logits, schedule_meta

    # Skew-aware kv tiling: with host-concrete context lengths, size tile_kv
    # so that padding waste (inactive grid-step block fetches past each
    # row's context) stays bounded — the TPU use of the native scheduler's
    # active-split accounting (results are bitwise-identical across tile
    # widths; this is purely a bandwidth knob).
    tile_kv = 4096
    if not isinstance(context_lens, jax.core.Tracer):
        from ..runtime import native
        lens = np.asarray(context_lens, np.int32).reshape(-1)
        if lens.size and lens.max() > 0:
            for cand in (8192, 4096, 2048, 1024, 512, 256, 128):
                _, total = native.paged_mqa_schedule(lens, cand, 1)
                padded = total * cand
                if padded <= 1.3 * int(lens.sum()):
                    tile_kv = cand
                    break
            else:
                tile_kv = 128

    if isinstance(fused_kv_cache, (tuple, list)):
        kv_cache, kv_sf = fused_kv_cache
        if kv_cache.dtype in (jnp.int8, jnp.uint8) and \
                kv_cache.shape[-1] == d // 2:
            kv_cache = _decode_fp4_rows(kv_cache, kv_sf, d)
            kv_sf = jnp.ones(kv_cache.shape[:2], jnp.float32)
    else:
        per_token = fused_kv_cache.shape[-1]
        if per_token == d // 2 + 4:                       # FP4 byte layout
            packed, sf = split_fused_kv_cache_fp4(fused_kv_cache, d)
            kv_cache = _decode_fp4_rows(packed, sf, d)
            kv_sf = jnp.ones(kv_cache.shape[:2], jnp.float32)
        else:
            kv_cache, kv_sf = split_fused_kv_cache(fused_kv_cache, d)

    if indices is not None:
        assert nn == 1, 'varlen requires next_n == 1 (reference contract)'
        if isinstance(indices, jax.core.Tracer):
            # Traced varlen: shapes come from the static bounds, the pairing
            # runs in jnp — serving graphs can jit over varying batches
            # (matching the device-side spirit of the reference pairing
            # scheduler, csrc/apis/attention.hpp:347-391).
            if max_batch <= 0 or max_tokens_per_seq <= 0:
                raise ValueError(
                    'traced varlen `indices` requires static bounds: pass '
                    'max_batch (> max sequence id) and max_tokens_per_seq '
                    '(>= rows of the largest sequence); with host-concrete '
                    'indices the exact shapes are derived instead')
            raw_batch, t_max = max_batch, max_tokens_per_seq
            idx, pos, first_row = _varlen_group_traced(indices, raw_batch,
                                                       t_max)
        else:
            idx, pos, raw_batch, t_max = _varlen_group(indices)
            if max_batch > 0:
                raw_batch = max(raw_batch, max_batch)
            if max_tokens_per_seq > 0:
                t_max = max(t_max, max_tokens_per_seq)
            assert idx.shape[0] == b, (idx.shape, b)
            # first flat row of each sequence carries its block-table row
            first_row = np.zeros(raw_batch, np.int64)
            first_row[idx[::-1]] = np.arange(b - 1, -1, -1)
        q_pad = jnp.zeros((raw_batch, t_max, h, d), q_val.dtype)
        q_pad = q_pad.at[idx, pos].set(q_val[:, 0], mode='drop')
        w_pad = jnp.zeros((raw_batch * t_max, h), weights.dtype)
        w_pad = w_pad.at[idx * t_max + pos].set(weights, mode='drop')
        ctx2d = jnp.zeros((raw_batch, t_max), jnp.int32)
        ctx2d = ctx2d.at[idx, pos].set(
            context_lens.astype(jnp.int32).reshape(-1), mode='drop')
        bt_seq = block_table[first_row]
        out = paged_mqa_logits(q_pad, kv_cache, kv_sf, w_pad, ctx2d,
                               bt_seq, max_context_len,
                               logits_dtype=logits_dtype, strategy=strategy,
                               tile_kv=tile_kv)
        return out[idx * t_max + pos]

    return paged_mqa_logits(q_val, kv_cache, kv_sf, weights, context_lens,
                            block_table, max_context_len,
                            logits_dtype=logits_dtype, strategy=strategy,
                            tile_kv=tile_kv)


def fp8_paged_mqa_logits(q, fused_kv_cache, weights, context_lens, block_table,
                         schedule_meta=None, max_model_len: int = 0,
                         clean_logits: bool = True):
    """Legacy SM90 entry: FP32 logits."""
    return fp8_fp4_paged_mqa_logits(q, fused_kv_cache, weights, context_lens,
                                    block_table, schedule_meta, max_model_len,
                                    clean_logits, jnp.float32)


def clean_logits_(logits: jnp.ndarray, cu_seq_len_k_start: jnp.ndarray,
                  cu_seq_len_k_end: jnp.ndarray) -> jnp.ndarray:
    """Fill logits outside each row's [ks, ke) with -inf
    (/root/reference/deep_gemm/include/deep_gemm/impls/smxx_clean_logits.cuh:11-74).
    Functional: returns the cleaned array (XLA fuses the mask into one pass)."""
    sq, skv = logits.shape
    col = jnp.arange(skv, dtype=jnp.int32)[None, :]
    valid = (col >= cu_seq_len_k_start[:, None]) & (col < cu_seq_len_k_end[:, None])
    return jnp.where(valid, logits, jnp.asarray(float('-inf'), logits.dtype))
