"""Differentiable FP8 matmuls (custom VJP).

The reference is a kernel library: trainers call its forward GEMMs and wire
the k-grouped / FP32-accumulate kernels into their backward passes themselves
(the wgrad contract, /root/reference/csrc/apis/gemm.hpp:328-390). This module
is that wiring, packaged: a `jax.custom_vjp` scaled matmul whose

  * forward runs the FP8 block-scaled Pallas GEMM
    (activations per-token 1x128, weights per-block 128x128 — the
    DeepSeek-V3 recipe),
  * dgrad runs the FP8 GEMM against the transposed weights
    (g per-token 1x128, w^T per-block),
  * wgrad runs the FP8 1D1D path with mandatory FP32 accumulation
    (both operands per-channel 1x128 along the token contraction — the
    reference's `k_grouped_fp8_gemm_tn_contiguous` semantics with one group).

Quantization happens inside the op, so callers differentiate ordinary bf16
tensors; straight-through estimation applies (the quantizer's rounding is
treated as identity for gradients — standard FP8-training practice).
"""

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from ..utils.math import per_token_cast_to_fp8, per_block_cast_to_fp8
from .gemm import fp8_gemm_nt


def _quantize_w(w: jnp.ndarray):
    return per_block_cast_to_fp8(w, use_ue8m0=False)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def fp8_matmul(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """d [m, n] = x [m, k] @ w [n, k]^T through FP8 quantization (bf16 in/out,
    differentiable)."""
    return _fwd_impl(x, w)


def _fwd_impl(x, w):
    xq = per_token_cast_to_fp8(x.astype(jnp.bfloat16), use_ue8m0=False)
    wq = _quantize_w(w.astype(jnp.bfloat16))
    return fp8_gemm_nt(xq, wq)


def _fwd(x, w):
    return _fwd_impl(x, w), (x, w)


def _bwd(res, g):
    x, w = res
    g = g.astype(jnp.bfloat16)
    # dgrad: dx [m, k] = g [m, n] @ w [n, k] — FP8 NT against w^T
    gq, g_sf = per_token_cast_to_fp8(g, use_ue8m0=False)
    wtq = _quantize_w(jnp.swapaxes(w, 0, 1).astype(jnp.bfloat16))
    dx = fp8_gemm_nt((gq, g_sf), wtq)

    # wgrad: dw [n, k] = g^T [n, m] @ x [m, k] — contraction over tokens m,
    # per-channel (1x128 along m) scales on both operands, FP32 accumulate
    # (the reference wgrad recipe (1,1,128), csrc/apis/gemm.hpp:328).
    gt = jnp.swapaxes(g, 0, 1)                          # [n, m]
    xt = x.astype(jnp.bfloat16)                         # [m, k] (b, k-major=False)
    gtq, gt_sf = per_token_cast_to_fp8(gt, use_ue8m0=False)
    # quantize x per-channel along m: cast x^T per-token, keep [k, m] view
    xtq, xt_sf = per_token_cast_to_fp8(jnp.swapaxes(xt, 0, 1),
                                       use_ue8m0=False)  # [k, m], sf [k, mf]
    dw32 = fp8_gemm_nt((gtq, gt_sf), (xtq, xt_sf),
                       d=jnp.zeros((), jnp.float32),
                       recipe=(1, 1, 128))               # [n, k] f32
    return dx.astype(x.dtype), dw32.astype(w.dtype)


fp8_matmul.defvjp(_fwd, _bwd)


def fp8_dense(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Dense layer over arbitrary leading dims: x [..., k] @ w [n, k]^T."""
    lead = x.shape[:-1]
    out = fp8_matmul(x.reshape(-1, x.shape[-1]), w)
    return out.reshape(*lead, w.shape[0])


# ---------------------------------------------------------------------------
# Grouped (MoE expert) differentiable matmul: forward = contiguous grouped
# FP8 GEMM, wgrad = the k-grouped FP32-accumulate kernel — the exact pairing
# the reference's kernels exist for (csrc/apis/gemm.hpp grouped + k-grouped).
# ---------------------------------------------------------------------------

def _quantize_w_groups(w: jnp.ndarray):
    """[G, n, k] per-expert 128x128 block quantization."""
    qs, sfs = [], []
    for g in range(w.shape[0]):
        q, s = per_block_cast_to_fp8(w[g], use_ue8m0=False)
        qs.append(q)
        sfs.append(s)
    return jnp.stack(qs), jnp.stack(sfs)


@jax.custom_vjp
def fp8_grouped_matmul(x: jnp.ndarray, w: jnp.ndarray,
                       ids: jnp.ndarray) -> jnp.ndarray:
    """d [m, n] = x [m, k] @ w[ids] [n, k]^T through FP8 (bf16 in/out,
    differentiable in x and w).

    ``ids`` is the contiguous grouped layout (per-row expert ids, -1 for
    padding rows; group starts aligned to
    ``get_mk_alignment_for_contiguous_layout()``, which must be a multiple
    of 128 for the wgrad SF compaction). Padding rows produce zero output
    and contribute nothing to dw.
    """
    return _grouped_fwd_impl(x, w, ids)


def _grouped_fwd_impl(x, w, ids):
    from .m_grouped import m_grouped_fp8_gemm_nt_contiguous
    xq = per_token_cast_to_fp8(x.astype(jnp.bfloat16), use_ue8m0=False)
    wq = _quantize_w_groups(w.astype(jnp.bfloat16))
    d = m_grouped_fp8_gemm_nt_contiguous(xq, wq, grouped_layout=ids)
    return jnp.where(ids[:, None] >= 0, d, 0)


def _grouped_fwd(x, w, ids):
    return _grouped_fwd_impl(x, w, ids), (x, w, ids)


def _grouped_bwd(res, g):
    from .m_grouped import m_grouped_fp8_gemm_nt_contiguous
    from .k_grouped import k_grouped_fp8_gemm_tn_contiguous
    from ..utils.math import per_channel_cast_to_fp8
    x, w, ids = res
    num_groups, n, k = w.shape
    m = x.shape[0]
    g = jnp.where(ids[:, None] >= 0, g, 0).astype(jnp.bfloat16)

    # dgrad: dx_i = g_i @ w[ids_i] — grouped NT against w^T [G, k, n]
    gq = per_token_cast_to_fp8(g, use_ue8m0=False)
    wtq = _quantize_w_groups(jnp.swapaxes(w, 1, 2).astype(jnp.bfloat16))
    dx = m_grouped_fp8_gemm_nt_contiguous(gq, wtq, grouped_layout=ids)
    dx = jnp.where(ids[:, None] >= 0, dx, 0)

    # wgrad: dw[e] = sum_{ids_i == e} g_i (x) x_i — the k-grouped TN kernel
    # with the token dim as the grouped contraction (FP32 accumulate).
    # Group sizes from the contiguous layout (padding rows attach to the
    # preceding group; their g rows are zeroed above).
    carried = jnp.maximum(jax.lax.associative_scan(jnp.maximum,
                                                   ids.astype(jnp.int32)), 0)
    sizes = jnp.bincount(carried, length=num_groups).astype(jnp.int32)
    gq2, g_sf2 = per_channel_cast_to_fp8(g, use_ue8m0=False)       # along m
    xq2, x_sf2 = per_channel_cast_to_fp8(x.astype(jnp.bfloat16),
                                         use_ue8m0=False)
    zeros = jnp.zeros((num_groups, n, k), jnp.float32)
    dw = k_grouped_fp8_gemm_tn_contiguous(
        (gq2, g_sf2), (xq2, x_sf2), grouped_layout=sizes, c=zeros)
    return dx.astype(x.dtype), dw.astype(w.dtype), None


fp8_grouped_matmul.defvjp(_grouped_fwd, _grouped_bwd)
