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

from typing import Optional, Tuple

import jax.numpy as jnp

from ..utils.math import ceil_div, unpack_ue8m0_from_int, ceil_to_ue8m0


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
    the f32 canonical SF, optionally rounded up to UE8M0 powers of two."""
    if sf.dtype == jnp.int32:
        sf = unpack_ue8m0_from_int(sf)
    sf = sf.astype(jnp.float32)
    if not disable_ue8m0_cast:
        sf = ceil_to_ue8m0(sf)
    return sf
