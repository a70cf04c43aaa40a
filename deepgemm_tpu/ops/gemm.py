"""Dense GEMM public APIs (BF16 + FP8/FP4 scaled), mirroring the reference
API surface (/root/reference/csrc/apis/gemm.hpp:73-164):

  * ``fp8_gemm_{nt,nn,tn,tt}`` / ``fp8_fp4_gemm_*`` aliases,
  * ``bf16_gemm_{nt,nn,tn,tt}``,

with the same "canonicalize everything to NT" trick — except on TPU no
operand is ever materially transposed: the layout flags flow into BlockSpec
index maps and dot_general dimension numbers.

JAX is functional: instead of writing into a caller-provided ``d``, every
function returns the result. ``d`` may still be passed (array or
ShapeDtypeStruct) purely as a shape/dtype template, and ``c`` is the optional
accumulator input (the reference's C-copy semantics,
/root/reference/csrc/apis/gemm.hpp:19-46).
"""

from typing import Optional, Tuple, Union

import jax
import jax.numpy as jnp

from ..kernels.dense import dense_gemm, required_sf_orientation
from ..utils.math import ceil_div
from .sf_layout import resolve_recipes, transform_sfa, transform_sfb


def _out_dtype_of(d, default=jnp.bfloat16):
    if d is None:
        return jnp.dtype(default)
    return jnp.dtype(getattr(d, 'dtype', d))


def _split_pair(x) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Accept either a bare array (bf16) or an (array, sf) pair (fp8/fp4)."""
    if isinstance(x, (tuple, list)):
        return x[0], x[1]
    return x, None


def _decode_packed_fp4(v: jnp.ndarray) -> jnp.ndarray:
    """Packed-FP4 operand (int8, two e2m1 codes per byte along the minor dim
    — the reference's ``kPackedFP4 = torch::kInt8`` convention,
    /root/reference/csrc/utils/math.hpp:11) -> exact bf16 values with the
    minor dim doubled. e2m1 magnitudes {0, .5, 1, 1.5, 2, 3, 4, 6} are exact
    in bf16, so this decode is lossless; scales apply downstream."""
    from ..utils.math import unpack_fp4_codes, _dequantize_from_fp4_e2m1
    codes = unpack_fp4_codes(v)
    return _dequantize_from_fp4_e2m1(codes).astype(jnp.bfloat16)


def _gemm_impl(a, b, d, c, *, a_kmajor: bool, b_kmajor: bool,
               recipe=None, recipe_a=None, recipe_b=None,
               compiled_dims: str = 'nk', disable_ue8m0_cast: bool = False,
               fp4_layout: str = 'interleaved'):
    del compiled_dims  # all dims are static under jit; kept for API parity
    a_val, sfa = _split_pair(a)
    b_val, sfb = _split_pair(b)

    # In-kernel FP4 path: planar-128-packed B decodes INSIDE the Pallas
    # kernel (4x less weight HBM traffic); scales apply exactly through the
    # f32 promote epilogue at (1, 128) granularity. Whether that trade wins
    # is a per-generation roofline (VPU decode rate vs HBM saving) carried
    # by the arch table: fp4_layout='planar' lets the arch decide
    # (in-kernel only in the HBM-bound small-m decode regime, m <~ 21 on
    # v5e); 'planar_in_kernel'/'planar_fold' force a strategy. Numerics are
    # identical either way (both apply exact f32 scales).
    fp4_planar_b = (b_val.dtype == jnp.int8 and fp4_layout.startswith('planar')
                    and b_kmajor and a_val.dtype != jnp.int8)
    if fp4_planar_b and fp4_layout == 'planar':
        from ..heuristics.arch import detect_arch, fp4_inkernel_profitable
        _m = a_val.shape[0] if a_kmajor else a_val.shape[1]
        _k = a_val.shape[1] if a_kmajor else a_val.shape[0]
        fp4_layout = ('planar_in_kernel'
                      if fp4_inkernel_profitable(detect_arch(), _m,
                                                 b_val.shape[0], _k)
                      else 'planar_fold')
    if fp4_planar_b and fp4_layout == 'planar_fold':
        # Route to the exact bf16 fold below: planar -> interleaved-packed
        # codes (the layout _fold_fp4 consumes; low nibble = even k index).
        from ..utils.math import unpack_fp4_planar
        codes = unpack_fp4_planar(b_val)
        c2 = codes.reshape(codes.shape[0], codes.shape[1] // 2, 2)
        b_val = ((c2[..., 0] & 0x0F) | ((c2[..., 1] & 0x0F) << 4)).astype(
            jnp.int8)
    fp4_in_kernel = fp4_planar_b and fp4_layout == 'planar_in_kernel'
    if fp4_in_kernel:
        m = a_val.shape[0] if a_kmajor else a_val.shape[1]
        k = a_val.shape[1] if a_kmajor else a_val.shape[0]
        recipe_a = recipe_a or (1, 128)
        recipe_b = recipe_b or (1, 128)
        assert recipe_b[1] == 128, 'planar FP4 path uses (1, 128) B scales'
        sfa_t = transform_sfa(sfa, m, k, recipe_a[1], a_kmajor,
                              want_m_major=True)
        sfb_t = transform_sfb(sfb, b_val.shape[0], k, recipe_b, b_kmajor=True,
                              want_n_major=False)
        return dense_gemm(a_val, b_val, sfa=sfa_t, sfb_t=sfb_t, c=c,
                          a_kmajor=a_kmajor, b_kmajor=True,
                          gran_k_a=recipe_a[1], gran_k_b=128,
                          out_dtype=_out_dtype_of(d),
                          scale_strategy='promote', b_packed_fp4=True)

    # FP4 operands: decode the packed e2m1 codes to exact bf16 AND fold the
    # operand's own scales in (exact: the FP4 contract is UE8M0/po2 scales —
    # e2m1 mantissas survive po2 scaling in bf16 losslessly). The operand
    # then flows through the fp8/bf16 scaled path with unit scales at
    # (1, 128) granularity. In-kernel nibble decode is a future bandwidth
    # optimization; numerics are identical.
    def _derive_fp4_gran(sf, k):
        """Default FP4 scale granularity derived from the SF tensor's width:
        gran = ceil(k / sf_width) snapped to a supported quantum. The library
        quantizer defaults to gran_k=128 while SM100-style recipes use 32, so
        a fixed default here disagrees with one of them (ADVICE r1); deriving
        from the shape makes library-default quantization Just Work."""
        cands = (128, 64, 32, 16)
        if sf.dtype == jnp.int32:  # packed UE8M0: 4 exponents per int32
            matches = [g for g in cands
                       if ceil_div(ceil_div(k, g), 4) == sf.shape[-1]]
        else:
            matches = [g for g in cands if ceil_div(k, g) == sf.shape[-1]]
        if matches:
            # Multiple candidates are harmless only when they imply the SAME
            # number of real scales (one scale covering all of k). Packed
            # int32 SFs at small k collide materially — ceil(ceil(k/g)/4) is
            # 1 for both g=128 and g=64 at k=256 — and guessing mis-scales
            # every block silently (ADVICE r2), so raise there.
            if len({ceil_div(k, g) for g in matches}) > 1:
                raise ValueError(
                    f'FP4 scale granularity is ambiguous from packed SF width '
                    f'{sf.shape[-1]} at k={k} (candidates {matches}); pass '
                    f'recipe/recipe_a/recipe_b explicitly')
            return matches[0]
        raise ValueError(
            f'cannot derive FP4 scale granularity from SF width '
            f'{sf.shape[-1]} at k={k}; pass recipe/recipe_a/recipe_b')

    def _fold_fp4(v, sf, sub_recipe, kmajor):
        assert kmajor, ('packed-FP4 operands must be k-major; repack T '
                        'layouts with transpose_packed_fp4 first')
        gran = (sub_recipe[1] if sub_recipe else
                (recipe[-1] if recipe else None))
        vals = _decode_packed_fp4(v)                     # [dim, k] bf16
        if sf is None:
            return vals
        if gran is None:
            gran = _derive_fp4_gran(sf, vals.shape[1])
        if sf.dtype == jnp.int32:
            from ..utils.math import unpack_ue8m0_from_int
            sf = unpack_ue8m0_from_int(sf)
        reps = jnp.repeat(sf.astype(jnp.float32), gran, axis=1)[:, :vals.shape[1]]
        return (vals.astype(jnp.float32) * reps).astype(jnp.bfloat16)

    folded_a = a_val.dtype == jnp.int8
    folded_b = b_val.dtype == jnp.int8
    if folded_a:
        a_val = _fold_fp4(a_val, sfa, recipe_a, a_kmajor)
    if folded_b:
        b_val = _fold_fp4(b_val, sfb, recipe_b, b_kmajor)
    if folded_a or folded_b:
        k_dim = a_val.shape[1] if a_kmajor else a_val.shape[0]
        ksf = ceil_div(k_dim, 128)
        recipe = None
        if folded_a:
            sfa = jnp.ones((a_val.shape[0], ksf), jnp.float32)
            recipe_a = (1, 128)
        if folded_b:
            sfb = jnp.ones((b_val.shape[0], ksf), jnp.float32)
            recipe_b = (1, 128)
        recipe_a = recipe_a or (1, 128)
        recipe_b = recipe_b or (128, 128)

    m = a_val.shape[0] if a_kmajor else a_val.shape[1]
    k = a_val.shape[1] if a_kmajor else a_val.shape[0]
    n = b_val.shape[0] if b_kmajor else b_val.shape[1]
    out_dtype = _out_dtype_of(d)

    if k == 0 or m == 0 or n == 0:
        # Early-return semantics (/root/reference/csrc/apis/gemm.hpp:19-46)
        base = jnp.zeros((m, n), dtype=out_dtype)
        return base + c if c is not None else base

    if sfa is None:
        # BF16 NoSF path: XLA's native dot IS the speed-of-light kernel here
        # (no fusion needed — measured 188 vs 163 TFLOPS for a hand-rolled
        # Pallas matmul at 4096^3 on v5e). Pallas kernels are reserved for
        # where the compiler can't fuse: scales, grouping, masking.
        ca = 1 if a_kmajor else 0
        cb = 1 if b_kmajor else 0
        d_val = jax.lax.dot_general(
            a_val, b_val, dimension_numbers=(((ca,), (cb,)), ((), ())),
            preferred_element_type=jnp.float32)
        if c is not None:
            d_val = d_val + c.astype(jnp.float32)
        return d_val.astype(out_dtype)

    recipe_a, recipe_b = resolve_recipes(recipe, recipe_a, recipe_b)
    gran_k_a, gran_k_b = recipe_a[1], recipe_b[1]

    # TPU-native scale handling. The canonical SF format is exact f32, the
    # SM90-style contract: f32 scales are consumed AS-IS
    # (/root/reference/csrc/apis/layout.hpp — on SM90 no UE8M0 cast happens,
    # with or without `disable_ue8m0_cast`). The reference only ceil-rounds
    # f32 scales to UE8M0 on SM100 because that *hardware* requires packed-po2
    # SF; rounding scales the data was not quantized with inflates each block
    # by up to 2x, so a software port of that behavior would be a silent
    # correctness bug — TPU has no such requirement and never rounds.
    #
    # Strategy: the fast 'dequant' path folds scales into the bf16 operands,
    # which is bit-exact only for power-of-two scales — selected when scales
    # are provably po2 (packed-UE8M0 int32 input, the SM100-style flow).
    # Otherwise the exact f32 promotion epilogue runs
    # (impls/sm90_fp8_gemm_1d2d.cuh:332-347 semantics).
    from ..runtime.config import runtime
    # Folded-FP4 sides carry exact unit scales, so they count as po2.
    scales_pow2 = ((folded_a or sfa.dtype == jnp.int32) and
                   (folded_b or sfb.dtype == jnp.int32))
    strategy = runtime().force_scale_strategy or \
        ('dequant' if scales_pow2 else 'promote')
    sfa_mmaj, sfb_kmaj_like = required_sf_orientation(strategy, a_kmajor, b_kmajor)

    sfa = transform_sfa(sfa, m, k, gran_k_a, a_kmajor, want_m_major=sfa_mmaj)
    sfb_t = transform_sfb(sfb, n, k, recipe_b, b_kmajor,
                          want_n_major=sfb_kmaj_like)

    return dense_gemm(a_val, b_val, sfa=sfa, sfb_t=sfb_t, c=c,
                      a_kmajor=a_kmajor, b_kmajor=b_kmajor,
                      sf_kind_b='pertoken', gran_k_a=gran_k_a, gran_k_b=gran_k_b,
                      out_dtype=out_dtype, scale_strategy=strategy)


# ---------------------------------------------------------------------------
# FP8 / FP4 GEMMs. Layout contract (matching the reference alias trick,
# /root/reference/csrc/apis/gemm.hpp:126-164):
#   nt: a[m, k], b[n, k];  nn: a[m, k], b[k, n]
#   tn: a[k, m], b[k, n];  tt: a[k, m], b[n, k]
# SF tensors follow their operand's orientation.
# ---------------------------------------------------------------------------

def fp8_fp4_gemm_nt(a, b, d=None, c=None, recipe=None, recipe_a=None, recipe_b=None,
                    compiled_dims='nk', disable_ue8m0_cast=False,
                    fp4_layout='interleaved'):
    return _gemm_impl(a, b, d, c, a_kmajor=True, b_kmajor=True,
                      recipe=recipe, recipe_a=recipe_a, recipe_b=recipe_b,
                      compiled_dims=compiled_dims,
                      disable_ue8m0_cast=disable_ue8m0_cast,
                      fp4_layout=fp4_layout)


def fp8_fp4_gemm_nn(a, b, d=None, c=None, recipe=None, recipe_a=None, recipe_b=None,
                    compiled_dims='nk', disable_ue8m0_cast=False):
    return _gemm_impl(a, b, d, c, a_kmajor=True, b_kmajor=False,
                      recipe=recipe, recipe_a=recipe_a, recipe_b=recipe_b,
                      compiled_dims=compiled_dims, disable_ue8m0_cast=disable_ue8m0_cast)


def fp8_fp4_gemm_tn(a, b, d=None, c=None, recipe=None, recipe_a=None, recipe_b=None,
                    compiled_dims='nk', disable_ue8m0_cast=False):
    return _gemm_impl(a, b, d, c, a_kmajor=False, b_kmajor=False,
                      recipe=recipe, recipe_a=recipe_a, recipe_b=recipe_b,
                      compiled_dims=compiled_dims, disable_ue8m0_cast=disable_ue8m0_cast)


def fp8_fp4_gemm_tt(a, b, d=None, c=None, recipe=None, recipe_a=None, recipe_b=None,
                    compiled_dims='nk', disable_ue8m0_cast=False):
    return _gemm_impl(a, b, d, c, a_kmajor=False, b_kmajor=True,
                      recipe=recipe, recipe_a=recipe_a, recipe_b=recipe_b,
                      compiled_dims=compiled_dims, disable_ue8m0_cast=disable_ue8m0_cast)


# FP8-only aliases (/root/reference/deep_gemm/__init__.py:44-45)
fp8_gemm_nt = fp8_fp4_gemm_nt
fp8_gemm_nn = fp8_fp4_gemm_nn
fp8_gemm_tn = fp8_fp4_gemm_tn
fp8_gemm_tt = fp8_fp4_gemm_tt


# ---------------------------------------------------------------------------
# XLA-native baseline entries — parity with the reference's cuBLASLt baseline
# family (/root/reference/csrc/jit_kernels/impls/smxx_cublaslt.hpp:14-151),
# used by tests/benches as the vendor-library yardstick. On TPU the vendor
# engine is XLA's own dot emitter.
# ---------------------------------------------------------------------------

def cublaslt_gemm_nt(a, b, d=None, c=None):
    out_dtype = _out_dtype_of(d)
    r = jax.lax.dot_general(a, b, dimension_numbers=(((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if c is not None:
        r = r + c.astype(jnp.float32)
    return r.astype(out_dtype)


def cublaslt_gemm_nn(a, b, d=None, c=None):
    out_dtype = _out_dtype_of(d)
    r = jax.lax.dot_general(a, b, dimension_numbers=(((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if c is not None:
        r = r + c.astype(jnp.float32)
    return r.astype(out_dtype)


def cublaslt_gemm_tn(a, b, d=None, c=None):
    out_dtype = _out_dtype_of(d)
    r = jax.lax.dot_general(a, b, dimension_numbers=(((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if c is not None:
        r = r + c.astype(jnp.float32)
    return r.astype(out_dtype)


def cublaslt_gemm_tt(a, b, d=None, c=None):
    out_dtype = _out_dtype_of(d)
    r = jax.lax.dot_general(a, b, dimension_numbers=(((0,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if c is not None:
        r = r + c.astype(jnp.float32)
    return r.astype(out_dtype)


cublaslt_gemm = cublaslt_gemm_nt


def fp8_gemm_nt_skip_head_mid(a, b, d=None, head_splits=None, c=None,
                              recipe=None, recipe_a=None, recipe_b=None,
                              compiled_dims='nk', disable_ue8m0_cast=False):
    """NT GEMM whose per-head output columns are scattered into a wider
    [left | zero-mid | right] per-head layout — the head-split epilogue
    (/root/reference/csrc/apis/attention.hpp:19-74, EpilogueHeadSplits in
    deep_gemm/include/deep_gemm/epilogue/transform.cuh:7-22). On TPU the
    column remap is a pad+reshape XLA fuses into the kernel's consumer."""
    left, mid, right = head_splits
    dd = _gemm_impl(a, b, d, c, a_kmajor=True, b_kmajor=True,
                    recipe=recipe, recipe_a=recipe_a, recipe_b=recipe_b,
                    compiled_dims=compiled_dims,
                    disable_ue8m0_cast=disable_ue8m0_cast)
    m, n = dd.shape
    assert n % (left + right) == 0
    num_heads = n // (left + right)
    dd = dd.reshape(m, num_heads, left + right)
    zeros = jnp.zeros((m, num_heads, mid), dtype=dd.dtype)
    out = jnp.concatenate([dd[:, :, :left], zeros, dd[:, :, left:]], axis=2)
    return out.reshape(m, num_heads * (left + mid + right))


# ---------------------------------------------------------------------------
# BF16 GEMMs (/root/reference/csrc/apis/gemm.hpp + impls/sm90_bf16_gemm.cuh)
# ---------------------------------------------------------------------------

def bf16_gemm_nt(a, b, d=None, c=None, compiled_dims='nk'):
    return _gemm_impl(a, b, d, c, a_kmajor=True, b_kmajor=True,
                      compiled_dims=compiled_dims)


def bf16_gemm_nn(a, b, d=None, c=None, compiled_dims='nk'):
    return _gemm_impl(a, b, d, c, a_kmajor=True, b_kmajor=False,
                      compiled_dims=compiled_dims)


def bf16_gemm_tn(a, b, d=None, c=None, compiled_dims='nk'):
    return _gemm_impl(a, b, d, c, a_kmajor=False, b_kmajor=False,
                      compiled_dims=compiled_dims)


def bf16_gemm_tt(a, b, d=None, c=None, compiled_dims='nk'):
    return _gemm_impl(a, b, d, c, a_kmajor=False, b_kmajor=True,
                      compiled_dims=compiled_dims)
