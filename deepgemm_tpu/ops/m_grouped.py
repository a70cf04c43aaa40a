"""M-grouped GEMM public APIs (MoE prefill / decode), mirroring
/root/reference/csrc/apis/gemm.hpp:166-320:

  * ``m_grouped_fp8_gemm_{nt,nn}_contiguous`` (+ ``fp8_fp4`` aliases)
  * ``m_grouped_fp8_gemm_nt_masked``
  * ``m_grouped_bf16_gemm_{nt,nn}_contiguous``, ``m_grouped_bf16_gemm_nt_masked``

Contiguous contract: ``a`` is [m, k] k-major with m the concatenation of
per-group row blocks aligned to ``get_mk_alignment_for_contiguous_layout()``;
``grouped_layout`` is per-row group ids with -1 padding, or per-group psum end
offsets when ``use_psum_layout`` (/root/reference/csrc/apis/gemm.hpp:196-205).

Masked contract: ``a``/``d`` are [G, max_m, .]; only rows < masked_m[g] are
meaningful; ``masked_m`` is never read on host (graph-safe decode).
"""

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..kernels.grouped import m_grouped_gemm_contiguous, m_grouped_gemm_masked
from ..runtime.config import runtime
from ..utils.math import align, ceil_div
from .gemm import _split_pair, _out_dtype_of
from .sf_layout import resolve_recipes, unpack_ue8m0_from_int


def _ragged_contiguous_bf16(a, b_kn, grouped_layout, num_groups: int,
                            use_psum_layout: bool, ensure_zero_padding: bool,
                            out_dtype):
    """BF16 contiguous grouped GEMM on XLA's native ``jax.lax.ragged_dot``
    (the megablox-gmm emitter) — the ``DGT_BF16_GROUPED=ragged`` fallback.

    History: this was the default while the Pallas tiling was pinned to the
    128-row alignment (ragged_dot 143 vs 90 TFLOPS at G=8, 8192x4096x7168 on
    v5e). With the adaptive gcd block_m lift + the prefetch-free static path
    the unscaled Pallas kernel now measures 160.8 vs ragged_dot's 144.9 on
    the same shape, so the kernel is the default for BF16 too."""
    m = a.shape[0]
    rows = jnp.arange(m, dtype=jnp.int32)
    if use_psum_layout:
        ends = grouped_layout.astype(jnp.int32)
        prev = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
        k_align = runtime().mk_alignment
        starts = (prev + k_align - 1) // k_align * k_align
        starts = jnp.where(jnp.arange(num_groups) == 0, 0, starts)
        next_starts = jnp.concatenate([starts[1:],
                                       jnp.full((1,), m, jnp.int32)])
        sizes = next_starts - starts
        gid = jnp.clip(jnp.searchsorted(starts, rows, side='right') - 1,
                       0, num_groups - 1)
        valid = rows < ends[gid]
    else:
        ids = grouped_layout.astype(jnp.int32)
        carried = jnp.maximum(jax.lax.associative_scan(jnp.maximum, ids), 0)
        sizes = jnp.bincount(carried, length=num_groups)
        valid = ids >= 0
    out = jax.lax.ragged_dot(a, b_kn, sizes.astype(jnp.int32),
                             preferred_element_type=jnp.float32)
    if ensure_zero_padding or not use_psum_layout:
        out = jnp.where(valid[:, None], out, 0.0)
    return out.astype(out_dtype)


def _grouped_sfb_t(sfb, num_groups: int, n: int, k: int,
                   recipe_b: Tuple[int, int], b_kmajor: bool) -> jnp.ndarray:
    """[G, nsf, ksf] (k-major b) or [G, ksf, nsf] -> expanded [G, ksf, n]."""
    gran_mn, gran_k = recipe_b
    ksf = ceil_div(k, gran_k)
    nsf = n if gran_mn == 1 else ceil_div(n, gran_mn)
    if sfb.dtype == jnp.int32:
        if b_kmajor:
            sfb = unpack_ue8m0_from_int(sfb)[..., :ksf]
        else:
            # MN-major B: packed SF arrives [G, ceil(ksf/4), nsf] — k packed
            # along the LEADING SF dim (same convention as the dense path's
            # _maybe_unpack(k_last=False), ops/sf_layout.py:41-48, mirroring
            # the reference recipe engine's per-major handling,
            # /root/reference/csrc/apis/layout.hpp:14-61). Swap so the byte
            # view unpacks along k, then swap back.
            sfb = jnp.swapaxes(
                unpack_ue8m0_from_int(jnp.swapaxes(sfb, -1, -2))[..., :ksf],
                -1, -2)
    sfb = sfb.astype(jnp.float32)
    if b_kmajor:
        assert sfb.shape == (num_groups, nsf, ksf), sfb.shape
        sfb = sfb.transpose(0, 2, 1)
    else:
        assert sfb.shape == (num_groups, ksf, nsf), sfb.shape
    if gran_mn > 1:
        sfb = jnp.repeat(sfb, gran_mn, axis=2)[:, :, :n]
    return sfb


def _m_grouped_contiguous_impl(a, b, d, grouped_layout, *, b_kmajor: bool,
                               recipe=None, recipe_a=None, recipe_b=None,
                               disable_ue8m0_cast: bool = False,
                               use_psum_layout: bool = False,
                               ensure_zero_padding: bool = False,
                               compiled_dims: str = 'nk'):
    del compiled_dims
    a_val, sfa = _split_pair(a)
    b_val, sfb = _split_pair(b)
    m, k = a_val.shape
    num_groups = b_val.shape[0]
    n = b_val.shape[1] if b_kmajor else b_val.shape[2]
    out_dtype = _out_dtype_of(d)

    if sfa is None:
        # BF16: the same Pallas kernel, unscaled — measured 160.8 TFLOPS vs
        # ragged_dot's 144.9 at G8 8192x4096x7168 on v5e (scripts/
        # r3_onchip_ab.py leg 3b; bitwise contract identical on the
        # reference fixtures, whose alignment-padding rows are zeroed).
        # DGT_BF16_GROUPED=ragged pins the XLA delegation for A/B or as an
        # escape hatch.
        if os.environ.get('DGT_BF16_GROUPED', 'pallas') == 'ragged':
            b_kn = jnp.swapaxes(b_val, 1, 2) if b_kmajor else b_val
            return _ragged_contiguous_bf16(
                a_val, b_kn, grouped_layout, num_groups, use_psum_layout,
                ensure_zero_padding, out_dtype)
        return m_grouped_gemm_contiguous(
            a_val, b_val, grouped_layout, use_psum_layout=use_psum_layout,
            b_kmajor=b_kmajor, out_dtype=out_dtype,
            ensure_zero_padding=ensure_zero_padding)

    recipe_a, recipe_b = resolve_recipes(recipe, recipe_a, recipe_b)
    if sfa.dtype == jnp.int32:
        sfa = unpack_ue8m0_from_int(sfa)[:, :ceil_div(k, recipe_a[1])]
    sfa = sfa.astype(jnp.float32)
    assert sfa.shape == (m, ceil_div(k, recipe_a[1])), sfa.shape
    sfb_t = _grouped_sfb_t(sfb, num_groups, n, k, recipe_b, b_kmajor)

    return m_grouped_gemm_contiguous(
        a_val, b_val, grouped_layout, use_psum_layout=use_psum_layout,
        sfa=sfa, sfb_t=sfb_t, b_kmajor=b_kmajor,
        gran_k_a=recipe_a[1], gran_k_b=recipe_b[1], out_dtype=out_dtype,
        ensure_zero_padding=ensure_zero_padding)


def m_grouped_fp8_fp4_gemm_nt_contiguous(a, b, d=None, grouped_layout=None,
                                         recipe=None, recipe_a=None, recipe_b=None,
                                         compiled_dims='nk', disable_ue8m0_cast=False,
                                         use_psum_layout=False,
                                         ensure_zero_padding=False):
    return _m_grouped_contiguous_impl(
        a, b, d, grouped_layout, b_kmajor=True, recipe=recipe,
        recipe_a=recipe_a, recipe_b=recipe_b,
        disable_ue8m0_cast=disable_ue8m0_cast, use_psum_layout=use_psum_layout,
        ensure_zero_padding=ensure_zero_padding, compiled_dims=compiled_dims)


def m_grouped_fp8_fp4_gemm_nn_contiguous(a, b, d=None, grouped_layout=None,
                                         recipe=None, recipe_a=None, recipe_b=None,
                                         compiled_dims='nk', disable_ue8m0_cast=False,
                                         use_psum_layout=False,
                                         ensure_zero_padding=False):
    return _m_grouped_contiguous_impl(
        a, b, d, grouped_layout, b_kmajor=False, recipe=recipe,
        recipe_a=recipe_a, recipe_b=recipe_b,
        disable_ue8m0_cast=disable_ue8m0_cast, use_psum_layout=use_psum_layout,
        ensure_zero_padding=ensure_zero_padding, compiled_dims=compiled_dims)


def m_grouped_fp8_fp4_gemm_nt_masked(a, b, d=None, masked_m=None, expected_m=None,
                                     recipe=None, recipe_a=None, recipe_b=None,
                                     compiled_dims='nk', disable_ue8m0_cast=False,
                                     use_psum_layout=False):
    a_val, sfa = _split_pair(a)
    b_val, sfb = _split_pair(b)
    num_groups, max_m, k = a_val.shape
    n = b_val.shape[1]
    out_dtype = _out_dtype_of(d)

    if sfa is None:
        return m_grouped_gemm_masked(a_val, b_val, masked_m, out_dtype=out_dtype,
                                     expected_m=expected_m)

    recipe_a, recipe_b = resolve_recipes(recipe, recipe_a, recipe_b)
    if sfa.dtype == jnp.int32:
        sfa = unpack_ue8m0_from_int(sfa)[..., :ceil_div(k, recipe_a[1])]
    sfa = sfa.astype(jnp.float32)
    sfb_t = _grouped_sfb_t(sfb, num_groups, n, k, recipe_b, b_kmajor=True)
    return m_grouped_gemm_masked(
        a_val, b_val, masked_m, sfa=sfa, sfb_t=sfb_t,
        gran_k_a=recipe_a[1], gran_k_b=recipe_b[1],
        out_dtype=out_dtype, expected_m=expected_m)


# FP8-only aliases (/root/reference/deep_gemm/__init__.py:47-49)
m_grouped_fp8_gemm_nt_contiguous = m_grouped_fp8_fp4_gemm_nt_contiguous
m_grouped_fp8_gemm_nn_contiguous = m_grouped_fp8_fp4_gemm_nn_contiguous
m_grouped_fp8_gemm_nt_masked = m_grouped_fp8_fp4_gemm_nt_masked


def m_grouped_bf16_gemm_nt_contiguous(a, b, d=None, grouped_layout=None,
                                      compiled_dims='nk', use_psum_layout=False,
                                      ensure_zero_padding=False):
    return _m_grouped_contiguous_impl(
        a, b, d, grouped_layout, b_kmajor=True, use_psum_layout=use_psum_layout,
        ensure_zero_padding=ensure_zero_padding, compiled_dims=compiled_dims)


def m_grouped_bf16_gemm_nn_contiguous(a, b, d=None, grouped_layout=None,
                                      compiled_dims='nk', use_psum_layout=False,
                                      ensure_zero_padding=False):
    return _m_grouped_contiguous_impl(
        a, b, d, grouped_layout, b_kmajor=False, use_psum_layout=use_psum_layout,
        ensure_zero_padding=ensure_zero_padding, compiled_dims=compiled_dims)


def m_grouped_bf16_gemm_nt_masked(a, b, d=None, masked_m=None, expected_m=None,
                                  compiled_dims='nk'):
    return m_grouped_fp8_fp4_gemm_nt_masked(a, b, d, masked_m, expected_m,
                                            compiled_dims=compiled_dims)
