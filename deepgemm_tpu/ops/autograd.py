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
