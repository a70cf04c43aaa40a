"""Scale-factor layout transforms — the recipe engine.

TPU analog of ``transform_sf_into_required_layout``
(/root/reference/csrc/apis/layout.hpp:14-90). On TPU the canonical SF format
is plain float32 (UE8M0 values are exact powers of two, losslessly held in
f32), so the transforms reduce to:
  * unpacking packed-UE8M0 int32 scales into f32,
  * orienting SFs into the layout the Pallas kernels consume
    (SFA m-major ``[m, ksf]``, SFB k-major ``[ksf, ...]``),
  * recipe defaulting (/root/reference/csrc/utils/layout.hpp:64-77).
"""

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..utils.math import (align, ceil_div, ceil_to_ue8m0, pack_ue8m0_to_int,
                          unpack_ue8m0_from_int)


def resolve_recipes(recipe, recipe_a, recipe_b) -> Tuple[Tuple[int, int], Tuple[int, int]]:
    """Resolve (recipe, recipe_a, recipe_b) kwargs into per-operand 2-tuples
    (gran_mn, gran_k). Default recipe: A (1, 128), B (128, 128)
    (/root/reference/csrc/utils/layout.hpp:64-77)."""
    if recipe is not None:
        assert recipe_a is None and recipe_b is None
        if len(recipe) == 3:
            # (gran_m, gran_n, gran_k): A (gran_m, gran_k), B (gran_n, gran_k)
            # (/root/reference/csrc/apis/gemm.hpp:110-114)
            gm_a, gm_b, gk = recipe
            return (gm_a, gk), (gm_b, gk)
        assert len(recipe) == 2
        return tuple(recipe), tuple(recipe)
    if recipe_a is None and recipe_b is None:
        return (1, 128), (128, 128)
    assert recipe_a is not None and recipe_b is not None
    return tuple(recipe_a), tuple(recipe_b)


def _maybe_unpack(sf: jnp.ndarray, want_ksf: int, k_last: bool) -> jnp.ndarray:
    """Unpack packed-UE8M0 int32 scales (4 per int32 along the k dim)."""
    if sf.dtype == jnp.int32:
        if k_last:
            sf = unpack_ue8m0_from_int(sf)[..., :want_ksf]
        else:
            sf = unpack_ue8m0_from_int(sf.T)[..., :want_ksf].T
    return sf.astype(jnp.float32)


def transform_sfa(sfa: jnp.ndarray, m: int, k: int, gran_k: int,
                  a_kmajor: bool, want_m_major: bool = True) -> jnp.ndarray:
    """Return SFA as f32 ``[m, ksf]`` (want_m_major) or ``[ksf, m]``."""
    ksf = ceil_div(k, gran_k)
    if not a_kmajor:       # operand given as [k, m] -> sf given as [ksf, m]
        sfa = _maybe_unpack(sfa, ksf, k_last=False)
        assert sfa.shape == (ksf, m), f'{sfa.shape} != {(ksf, m)}'
        return sfa.T if want_m_major else sfa
    sfa = _maybe_unpack(sfa, ksf, k_last=True)
    assert sfa.shape == (m, ksf), f'{sfa.shape} != {(m, ksf)}'
    return sfa if want_m_major else sfa.T


def transform_sfb(sfb: jnp.ndarray, n: int, k: int, recipe_b: Tuple[int, int],
                  b_kmajor: bool, want_n_major: bool = False) -> jnp.ndarray:
    """Return SFB with per-token granularity along n: ``[ksf, n]`` (default)
    or ``[n, ksf]`` (want_n_major, for the dequant strategy).

    Block-granular SF (gran_mn > 1) is broadcast to rows — the analog of the
    reference's 128x128 -> 1x128 row ``index_select``
    (/root/reference/csrc/apis/layout.hpp:49-53)."""
    gran_mn, gran_k = recipe_b
    ksf = ceil_div(k, gran_k)
    nsf = n if gran_mn == 1 else ceil_div(n, gran_mn)
    if b_kmajor:           # operand [n, k] -> sf [nsf, ksf]
        sfb = _maybe_unpack(sfb, ksf, k_last=True)
        sfb = sfb.T
    else:                  # operand [k, n] -> sf [ksf, nsf]
        sfb = _maybe_unpack(sfb, ksf, k_last=False)
    assert sfb.shape == (ksf, nsf), f'{sfb.shape} != {(ksf, nsf)}'
    if gran_mn > 1:
        sfb = jnp.repeat(sfb, gran_mn, axis=1)[:, :n]
    return sfb.T if want_n_major else sfb


def transform_sf_into_required_layout(sf: jnp.ndarray, mn: Optional[int] = None,
                                      k: Optional[int] = None,
                                      recipe: Tuple[int, int] = (1, 128),
                                      is_sfa: bool = True,
                                      disable_ue8m0_cast: bool = True) -> jnp.ndarray:
    """Public parity API (/root/reference/csrc/apis/layout.hpp:14-61): returns
    the f32 canonical SF, optionally rounded up to UE8M0 powers of two.

    NOTE: the UE8M0 rounding is only meaningful when the data was quantized
    with po2 scales (or will be requantized); rounding scales after the fact
    changes the dequantized values (see ops/gemm.py)."""
    if sf.dtype == jnp.int32:
        sf = unpack_ue8m0_from_int(sf)
    sf = sf.astype(jnp.float32)
    if not disable_ue8m0_cast:
        sf = ceil_to_ue8m0(sf)
    return sf


def transform_sf_pair_into_required_layout(sfa: jnp.ndarray, sfb: jnp.ndarray,
                                           m: int, n: int, k: int,
                                           recipe=None, recipe_a=None,
                                           recipe_b=None,
                                           disable_ue8m0_cast: bool = True):
    """Pair transform (/root/reference/csrc/apis/layout.hpp:63-90): resolves
    the recipes and canonicalizes both SFs; returns
    (sfa, sfb, gran_k_a, gran_k_b)."""
    recipe_a, recipe_b = resolve_recipes(recipe, recipe_a, recipe_b)
    sfa = transform_sf_into_required_layout(
        sfa, m, k, recipe_a, True, disable_ue8m0_cast)
    sfb = transform_sf_into_required_layout(
        sfb, n, k, recipe_b, False, disable_ue8m0_cast)
    return sfa, sfb, recipe_a[1], recipe_b[1]


# ---------------------------------------------------------------------------
# SF layout kernels — parity with the reference's smxx_layout family
# (/root/reference/csrc/jit_kernels/impls/smxx_layout.hpp:15-353 and the
# device kernels in deep_gemm/include/deep_gemm/impls/smxx_layout.cuh).
#
# On GPU these are real kernels because the SF must be physically MN-major
# with TMA-aligned strides for the tensor-map loads. On TPU, XLA owns
# physical layouts, so "MN-major" is expressed logically as a [ksf, mn]
# array (mn contiguous in the minor dim); alignment padding uses the same
# 16-byte rule (/root/reference/csrc/utils/math.hpp:23-27).
# ---------------------------------------------------------------------------

def get_tma_aligned_size(x: int, element_size: int) -> int:
    """Align to 16 bytes (/root/reference/csrc/utils/math.hpp:23-27)."""
    alignment = 16 // element_size
    return align(x, alignment)


def get_mn_major_tma_aligned_tensor(sf: jnp.ndarray) -> jnp.ndarray:
    """FP32 SF transpose into MN-major: ``[mn, ksf] -> [ksf, mn]`` (batched
    ``[g, mn, ksf] -> [g, ksf, mn]``) — the TPU analog of ``transpose_fp32``
    (/root/reference/deep_gemm/include/deep_gemm/impls/smxx_layout.cuh) /
    ``get_mn_major_tma_aligned_tensor`` (smxx_layout.hpp:15-120). No stride
    padding is materialized: XLA pads physically as needed."""
    assert sf.dtype == jnp.float32 and sf.ndim in (2, 3)
    return jnp.swapaxes(sf, -1, -2)


def get_mn_major_tma_aligned_packed_ue8m0_tensor(
        sf: jnp.ndarray, psum_layout: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Extract UE8M0 exponents from f32 SF ``[.., mn, ksf]`` and pack 4 per
    int32 along k: ``[.., mn, ceil(ksf / 4)]`` — the analog of
    ``transpose_and_pack_fp32_into_ue8m0`` (impls/smxx_layout.cuh). The
    scales must be powers of two (exponent-only extraction, like the device
    kernel). ``psum_layout`` (per-group end rows) zeroes the padding-gap rows
    the reference kernel skips."""
    assert sf.dtype == jnp.float32 and sf.ndim in (2, 3)
    ksf = sf.shape[-1]
    pad = align(ksf, 4) - ksf
    if pad:
        sf = jnp.pad(sf, [(0, 0)] * (sf.ndim - 1) + [(0, pad)],
                     constant_values=1.0)
    if psum_layout is not None:
        rows = jax.lax.broadcasted_iota(jnp.int32, sf.shape[:-1] + (1,),
                                        sf.ndim - 2)
        valid = rows < psum_layout[-1]
        sf = jnp.where(valid, sf, 1.0)
    return pack_ue8m0_to_int(sf)


def get_k_grouped_mn_major_tma_aligned_packed_ue8m0_tensor(
        sf: jnp.ndarray, ks: Sequence[int], gran_k: int = 128,
        k_alignment: int = 128) -> jnp.ndarray:
    """K-grouped packed-UE8M0 transform
    (/root/reference/csrc/jit_kernels/impls/smxx_layout.hpp k-grouped +
    ``pack_fp32_into_ue8m0``): ``sf`` is [mn, total_ksf] where total_ksf is
    the concatenation of per-group ``ceil(k_g / gran_k)`` segments; each
    group's segment is padded to ``k_alignment / gran_k`` entries before
    packing, so group starts stay aligned in the packed tensor."""
    assert sf.dtype == jnp.float32 and sf.ndim == 2
    seg = max(k_alignment // gran_k, 1)
    pieces, off = [], 0
    for k_g in ks:
        n_g = ceil_div(k_g, gran_k)
        piece = sf[:, off:off + n_g]
        pad = align(max(n_g, 1), seg) - n_g if k_g > 0 else 0
        if k_g > 0 and pad:
            piece = jnp.pad(piece, ((0, 0), (0, pad)), constant_values=1.0)
        if k_g > 0:
            pieces.append(piece)
        off += n_g
    packed = jnp.concatenate(pieces, axis=1) if pieces else sf[:, :0]
    return get_mn_major_tma_aligned_packed_ue8m0_tensor(packed)


def check_k_grouped_packed_ue8m0_tensor(sf: jnp.ndarray, ks: Sequence[int],
                                        gran_k: int = 128,
                                        k_alignment: int = 128) -> bool:
    """Validate a k-grouped packed-UE8M0 SF tensor's shape
    (/root/reference/csrc/jit_kernels/impls/smxx_layout.hpp:
    ``check_k_grouped_packed_ue8m0_tensor``)."""
    assert sf.dtype == jnp.int32 and sf.ndim == 2
    assert k_alignment % 32 == 0
    seg = max(k_alignment // gran_k, 1)
    total = sum(align(ceil_div(k_g, gran_k), seg) for k_g in ks if k_g > 0)
    expected = ceil_div(total, 4)
    assert sf.shape[-1] == expected, (sf.shape, expected)
    return True
