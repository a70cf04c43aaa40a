"""Einsum kernels, mirroring /root/reference/csrc/apis/einsum.hpp:22-230.

Supported expressions (same hardcoded set as the reference):
  * ``bmk,bnk->mn``  — batched-reduce GEMM, FP32 accumulation across batch
  * ``bhr,hdr->bhd`` — per-head projection
  * ``bhd,hdr->bhr`` — transposed per-head projection

TPU-first note: the BF16 paths compile to single XLA ``dot_general`` ops with
multi-dim contractions/batching — XLA's batched matmul emitter is already at
the MXU roofline for these shapes, so a hand-written Pallas kernel would only
re-derive the same schedule. The FP8 path (``fp8_bmm``/``fp8_einsum``) needs
fused per-block dequant, so it rides the batched Pallas scaled-GEMM
(kernels/grouped.py with a full mask).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..kernels.grouped import m_grouped_gemm_masked
from ..utils.math import ceil_div
from .gemm import _split_pair, _out_dtype_of
from .m_grouped import _grouped_sfb_t
from .sf_layout import resolve_recipes, unpack_ue8m0_from_int


def _bmk_bnk_mn(a, b, d, c):
    """(/root/reference/csrc/apis/einsum.hpp:24-61): FP32 out requires c==d
    accumulation; BF16 out accumulates in an FP32 workspace internally."""
    out = jax.lax.dot_general(
        a, b, dimension_numbers=(((0, 2), (0, 2)), ((), ())),
        preferred_element_type=jnp.float32)
    out_dtype = _out_dtype_of(d)
    if out_dtype == jnp.float32:
        assert c is not None, 'FP32 bmk,bnk->mn requires accumulation (c = d)'
        return out + c
    assert c is None
    return out.astype(jnp.bfloat16)


def _bhr_hdr_bhd(a, b):
    # (b,h,r) x (h,d,r) -> (b,h,d); batch over h, contract r
    out = jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (2,)), ((1,), (0,))),
        preferred_element_type=jnp.float32)     # (h, b, d)
    return out.transpose(1, 0, 2).astype(jnp.bfloat16)


def _bhd_hdr_bhr(a, b):
    # (b,h,d) x (h,d,r) -> (b,h,r); batch over h, contract d
    out = jax.lax.dot_general(
        a, b, dimension_numbers=(((2,), (1,)), ((1,), (0,))),
        preferred_element_type=jnp.float32)     # (h, b, r)
    return out.transpose(1, 0, 2).astype(jnp.bfloat16)


def einsum(expr: str, a, b, d=None, c=None, use_cublaslt: bool = False):
    """BF16 einsum over the reference's hardcoded expression set
    (/root/reference/csrc/apis/einsum.hpp:113-135). ``use_cublaslt`` is
    accepted for parity (XLA is the baseline engine on TPU)."""
    del use_cublaslt
    if expr == 'bmk,bnk->mn':
        return _bmk_bnk_mn(a, b, d, c)
    if expr == 'bhr,hdr->bhd':
        assert c is None
        return _bhr_hdr_bhd(a, b)
    if expr == 'bhd,hdr->bhr':
        assert c is None
        return _bhd_hdr_bhr(a, b)
    raise ValueError(f'Unsupported einsum expression: {expr}')


def fp8_bmm(a, sfa, b, sfb, d=None, c=None, recipe=None, compiled_dims='nk'):
    """Batched FP8 scaled GEMM ``[B,m,k] @ [B,n,k]^T``
    (/root/reference/csrc/apis/einsum.hpp:138-179). Runs the batched Pallas
    scaled kernel (the masked grouped kernel with a full mask)."""
    del compiled_dims
    batch, m, k = a.shape
    n = b.shape[1]
    out_dtype = _out_dtype_of(d)
    recipe_a, recipe_b = resolve_recipes(recipe, None, None)

    if sfa.dtype == jnp.int32:
        sfa = unpack_ue8m0_from_int(sfa)[..., :ceil_div(k, recipe_a[1])]
    sfa = sfa.astype(jnp.float32)
    sfb_t = _grouped_sfb_t(sfb, batch, n, k, recipe_b, b_kmajor=True)
    full = jnp.full((batch,), m, dtype=jnp.int32)
    out = m_grouped_gemm_masked(a, b, full, sfa=sfa, sfb_t=sfb_t,
                                gran_k_a=recipe_a[1], gran_k_b=recipe_b[1],
                                out_dtype=jnp.float32 if c is not None else out_dtype)
    if c is not None:
        out = (out + c).astype(out_dtype)
    return out


def fp8_einsum(expr: str, a, b, d=None, c=None, recipe=(1, 128, 128)):
    """FP8 einsum via permuted ``fp8_bmm``
    (/root/reference/csrc/apis/einsum.hpp:181-215)."""
    a_val, sfa = _split_pair(a)
    b_val, sfb = _split_pair(b)
    if expr == 'bhr,hdr->bhd':
        # (batch, m, n, k) = (h, b, d, r)
        out = fp8_bmm(a_val.transpose(1, 0, 2), sfa.transpose(1, 0, 2),
                      b_val, sfb,
                      d=d.transpose(1, 0, 2) if hasattr(d, 'transpose') else d,
                      c=c.transpose(1, 0, 2) if c is not None else None,
                      recipe=recipe)
        return out.transpose(1, 0, 2)
    if expr == 'bhd,hdr->bhr':
        # (batch, m, n, k) = (h, b, r, d)
        out = fp8_bmm(a_val.transpose(1, 0, 2), sfa.transpose(1, 0, 2),
                      b_val.transpose(0, 2, 1), sfb.transpose(0, 2, 1),
                      d=d.transpose(1, 0, 2) if hasattr(d, 'transpose') else d,
                      c=c.transpose(1, 0, 2) if c is not None else None,
                      recipe=recipe)
        return out.transpose(1, 0, 2)
    if expr == 'bhd,bhr->hdr':
        # (batch, m, n, k) = (h, d, r, b)
        out = fp8_bmm(a_val.transpose(1, 2, 0), sfa.transpose(1, 2, 0),
                      b_val.transpose(1, 2, 0), sfb.transpose(1, 2, 0),
                      d=d, c=c, recipe=recipe)
        return out
    raise ValueError(f'Unsupported fp8 einsum expression: {expr}')
