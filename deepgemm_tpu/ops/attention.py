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

import jax
import jax.numpy as jnp

from ..kernels.mqa_logits import mqa_logits
from ..utils.math import ceil_div, unpack_ue8m0_from_int
from .gemm import _split_pair


def fp8_fp4_mqa_logits(q, kv, weights, cu_seq_len_k_start, cu_seq_len_k_end,
                       clean_logits: bool = True, max_seqlen_k: int = 0,
                       logits_dtype=jnp.float32):
    """Indexer scoring (/root/reference/csrc/apis/attention.hpp:233-402 API
    family): ``logits[i, j] = sum_h w[i,h] * relu(q[i,h,:] . kv[j,:])`` for
    ``j in [ks[i], ke[i])``; -inf elsewhere (the fused clean). With
    ``max_seqlen_k > 0`` returns the compressed [sq, max_seqlen_k] layout
    where row i starts at its own ks."""
    q_val, q_sf = _split_pair(q)
    kv_val, kv_sf = _split_pair(kv)
    if q_val.dtype == jnp.int8 or (q_sf is not None and q_val.dtype != jnp.float8_e4m3fn):
        raise NotImplementedError('FP4 MQA logits lands with the FP4 kernel family')
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
    """API-parity shim for the reference's SM load-balancing metadata kernel
    (/root/reference/deep_gemm/include/deep_gemm/scheduler/sm90_paged_mqa_logits.cuh:10-100).
    On TPU the Pallas grid is scheduled by the hardware/Mosaic, so no
    schedule tensor is needed; the context lengths pass through as the
    opaque schedule handle."""
    del block_kv, num_sms
    return context_lens.astype(jnp.int32)


def fp8_fp4_paged_mqa_logits(q, fused_kv_cache, weights, context_lens,
                             block_table, schedule_meta=None,
                             max_context_len: int = 0,
                             clean_logits: bool = True,
                             logits_dtype=jnp.float32, indices=None,
                             strategy: str = 'gather'):
    """Decode-side paged indexer scoring
    (/root/reference/csrc/apis/attention.hpp:233-402). ``fused_kv_cache`` may
    be the reference byte layout or a pre-split ``(values, sf)`` pair (the
    zero-copy production path on TPU)."""
    from ..kernels.paged_mqa import paged_mqa_logits

    q_val, q_sf = _split_pair(q)
    if q_sf is not None:
        raise NotImplementedError('FP4 paged MQA logits lands with the FP4 kernel family')
    if indices is not None:
        raise NotImplementedError('sparse `indices` gathering is not implemented yet')
    del clean_logits, schedule_meta
    b, nn, h, d = q_val.shape
    if isinstance(fused_kv_cache, (tuple, list)):
        kv_cache, kv_sf = fused_kv_cache
    else:
        kv_cache, kv_sf = split_fused_kv_cache(fused_kv_cache, d)
    return paged_mqa_logits(q_val, kv_cache, kv_sf, weights, context_lens,
                            block_table, max_context_len,
                            logits_dtype=logits_dtype, strategy=strategy)


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
