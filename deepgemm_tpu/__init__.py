"""deepgemm_tpu — a TPU-native block-scaled GEMM engine.

Brand-new JAX/Pallas framework with the capabilities of DeepGEMM
(reference at /root/reference): dense + grouped FP8/FP4/BF16 GEMMs with
fine-grained blockwise scaling, MoE grouped kernels (contiguous / masked /
k-grouped), MQA lightning-indexer scoring, einsum and HyperConnection-prenorm
kernels — built on Pallas MXU kernels, a traced-kernel cache, and
pjit/shard_map distribution instead of a CUDA JIT + NVLink symmetric memory.

Public surface mirrors /root/reference/deep_gemm/__init__.py:16-95.
"""

# Runtime knobs (parity with csrc/apis/runtime.hpp)
from .runtime.config import (
    set_num_sms, get_num_sms,
    set_tc_util, get_tc_util,
    set_pdl, get_pdl,
    set_ignore_compile_dims,
    set_block_size_multiple_of,
    set_mk_alignment_for_contiguous_layout,
    get_mk_alignment_for_contiguous_layout,
)
from .runtime.cache import kernel_cache, init_persistent_cache

# Dense GEMMs
from .ops.gemm import (
    fp8_fp4_gemm_nt, fp8_fp4_gemm_nn, fp8_fp4_gemm_tn, fp8_fp4_gemm_tt,
    fp8_gemm_nt, fp8_gemm_nn, fp8_gemm_tn, fp8_gemm_tt,
    bf16_gemm_nt, bf16_gemm_nn, bf16_gemm_tn, bf16_gemm_tt,
    cublaslt_gemm, cublaslt_gemm_nt, cublaslt_gemm_nn,
    cublaslt_gemm_tn, cublaslt_gemm_tt,
)


def init(library_root=None, cache_dir=None):
    """Library init — parity with ``_C.init(pkg_dir, cuda_home)``
    (/root/reference/csrc/apis/runtime.hpp:42-48 via deep_gemm/__init__.py:122-125).
    Optional on TPU: enables the persistent compilation cache; everything
    else initializes lazily (fork-safe)."""
    del library_root
    from .runtime.cache import init_persistent_cache
    return init_persistent_cache(cache_dir)

# M-grouped GEMMs (MoE prefill / decode)
from .ops.m_grouped import (
    m_grouped_fp8_fp4_gemm_nt_contiguous, m_grouped_fp8_fp4_gemm_nn_contiguous,
    m_grouped_fp8_fp4_gemm_nt_masked,
    m_grouped_fp8_gemm_nt_contiguous, m_grouped_fp8_gemm_nn_contiguous,
    m_grouped_fp8_gemm_nt_masked,
    m_grouped_bf16_gemm_nt_contiguous, m_grouped_bf16_gemm_nn_contiguous,
    m_grouped_bf16_gemm_nt_masked,
)

# Einsum kernels
from .ops.einsum import einsum, fp8_einsum, fp8_bmm

# Differentiable FP8 ops (forward fp8 GEMM, dgrad fp8, wgrad FP32-accum)
from .ops.autograd import fp8_matmul, fp8_dense

# HyperConnection kernels
from .ops.hyperconnection import tf32_hc_prenorm_gemm

# Attention kernels
from .ops.attention import (
    fp8_fp4_mqa_logits, fp8_mqa_logits, clean_logits_,
    fp8_fp4_paged_mqa_logits, fp8_paged_mqa_logits,
    get_paged_mqa_logits_metadata, split_fused_kv_cache,
)
from .ops.gemm import fp8_gemm_nt_skip_head_mid

# K-grouped GEMMs (MoE weight gradients)
from .ops.k_grouped import (
    k_grouped_fp8_gemm_tn_contiguous, k_grouped_fp8_gemm_nt_contiguous,
    k_grouped_bf16_gemm_tn_contiguous,
)

# Legacy aliases (/root/reference/deep_gemm/__init__.py:77-78)
fp8_m_grouped_gemm_nt_masked = m_grouped_fp8_gemm_nt_masked
bf16_m_grouped_gemm_nt_masked = m_grouped_bf16_gemm_nt_masked

# Layout / SF transforms
from .ops.sf_layout import transform_sf_into_required_layout

# Utils (quantization contract)
from .utils.math import (
    align, ceil_div,
    ceil_to_ue8m0, pack_ue8m0_to_int, unpack_ue8m0_from_int,
    per_token_cast_to_fp8, per_channel_cast_to_fp8, per_block_cast_to_fp8,
    per_custom_dims_cast_to_fp8,
    per_token_cast_to_fp4, transpose_packed_fp4, cast_back_from_fp4,
    pack_fp4_planar, unpack_fp4_planar, repack_fp4_to_planar,
)

# Legacy pure-XLA fallback tier (parity with deep_gemm.legacy)
from . import legacy
from .legacy import (
    m_grouped_bf16_gemm_nt_contiguous_tl, m_grouped_bf16_gemm_nn_contiguous_tl,
)

# Mega MoE (overlapped EP pipeline; parity with deep_gemm.mega)
from .parallel import mega
from .parallel.mega import (
    fp8_fp4_mega_moe, bf16_mega_moe, SymmBuffer,
    transform_weights_for_mega_moe,
    get_symm_buffer_size_for_mega_moe,
    get_token_alignment_for_mega_moe, get_ring_limit_for_mega_moe,
)
from .kernels.fused_moe import pack_mega_weights, MegaPackedWeights
# reference Python-level name (deep_gemm/__init__.py:85-91)
get_symm_buffer_for_mega_moe = SymmBuffer

from . import testing
from . import utils

__version__ = '0.1.0'
