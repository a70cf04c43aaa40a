"""Quantization / numerics utilities (the numerics contract).

TPU-native re-implementation of the quantization contract defined by the
reference library's ``deep_gemm/utils/math.py`` (/root/reference/deep_gemm/utils/math.py:1-153).
All functions are pure jax.numpy and usable eagerly or under ``jax.jit``.

Conventions:
  * FP8 is ``jnp.float8_e4m3fn`` with torch-style *saturating* casts
    (values are clamped to +-448 before the convert so that overflow
    saturates instead of producing NaN, matching ``tensor.to(torch.float8_e4m3fn)``).
  * Scale factors (SF) are canonical float32. UE8M0 scales are f32 values whose
    mantissa bits are zero (exact powers of two).
  * FP4 (e2m1) has no TPU dtype; codes are stored two-per-int8 (low nibble first),
    exactly mirroring the reference packing
    (/root/reference/deep_gemm/utils/math.py:85-111).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

FP8_MAX = 448.0     # max finite magnitude of e4m3fn
FP4_MAX = 6.0       # max magnitude of e2m1
FP8_AMAX_EPS = 1e-4


def ceil_div(x: int, y: int) -> int:
    return (x + y - 1) // y


def align(x: int, y: int) -> int:
    return ceil_div(x, y) * y


def ceil_to_ue8m0(x: jnp.ndarray) -> jnp.ndarray:
    """Round |x| up to the next power of two (UE8M0 scale rounding).

    Bit-for-bit port of the reference exponent-bump trick
    (/root/reference/deep_gemm/utils/math.py:13-16): bump the biased exponent
    when any mantissa bit is set, clamp the exponent to [1, 254].
    """
    bits = jax.lax.bitcast_convert_type(jnp.abs(x).astype(jnp.float32), jnp.int32)
    exp = ((bits >> 23) & 0xFF) + ((bits & 0x7FFFFF) != 0).astype(jnp.int32)
    exp = jnp.clip(exp, 1, 254)
    return jax.lax.bitcast_convert_type(exp << 23, jnp.float32)


def pack_ue8m0_to_int(x: jnp.ndarray) -> jnp.ndarray:
    """Pack 4 UE8M0 (power-of-two f32) scales into one int32 along the last dim.

    Matches /root/reference/deep_gemm/utils/math.py:19-23 (little-endian byte
    packing via a uint8 view).
    """
    assert x.dtype == jnp.float32 and x.shape[-1] % 4 == 0
    x_int = jax.lax.bitcast_convert_type(x, jnp.int32)
    exp_u8 = (x_int >> 23).astype(jnp.uint8)
    grouped = exp_u8.reshape(*x.shape[:-1], x.shape[-1] // 4, 4)
    return jax.lax.bitcast_convert_type(grouped, jnp.int32)


def unpack_ue8m0_from_int(packed_sf: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_ue8m0_to_int`
    (/root/reference/deep_gemm/utils/math.py:137-138)."""
    assert packed_sf.dtype == jnp.int32
    u8 = jax.lax.bitcast_convert_type(packed_sf, jnp.uint8)   # (..., n, 4)
    exp = u8.astype(jnp.int32).reshape(*packed_sf.shape[:-1], packed_sf.shape[-1] * 4)
    return jax.lax.bitcast_convert_type(exp << 23, jnp.float32)


def cast_to_fp8(x: jnp.ndarray) -> jnp.ndarray:
    """Saturating f32/bf16 -> e4m3fn cast (torch semantics)."""
    return jnp.clip(x, -FP8_MAX, FP8_MAX).astype(jnp.float8_e4m3fn)


def per_token_cast_to_fp8(x: jnp.ndarray, use_ue8m0: bool, gran_k: int = 128,
                          use_packed_ue8m0: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """1 x gran_k activation quantization: SF shape [m, ceil(n / gran_k)].

    Contract: /root/reference/deep_gemm/utils/math.py:26-38.
    """
    assert x.ndim == 2
    m, n = x.shape
    padded_n = align(n, gran_k)
    x_padded = jnp.pad(x, ((0, 0), (0, padded_n - n)))
    x_view = x_padded.reshape(m, padded_n // gran_k, gran_k)
    x_amax = jnp.clip(jnp.max(jnp.abs(x_view).astype(jnp.float32), axis=2), FP8_AMAX_EPS, None)
    sf = x_amax / FP8_MAX
    sf = ceil_to_ue8m0(sf) if use_ue8m0 else sf
    x_fp8 = cast_to_fp8(x_view * (1.0 / sf)[:, :, None]).reshape(m, padded_n)[:, :n]
    return x_fp8, pack_ue8m0_to_int(sf) if use_packed_ue8m0 else sf


def per_channel_cast_to_fp8(x: jnp.ndarray, use_ue8m0: bool,
                            gran_k: int = 128) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """gran_k x 1 quantization along rows: SF shape [m / gran_k, n].

    Contract: /root/reference/deep_gemm/utils/math.py:41-48.
    """
    assert x.ndim == 2 and x.shape[0] % gran_k == 0
    m, n = x.shape
    x_view = x.reshape(-1, gran_k, n)
    x_amax = jnp.clip(jnp.max(jnp.abs(x_view).astype(jnp.float32), axis=1), FP8_AMAX_EPS, None)
    sf = x_amax / FP8_MAX
    sf = ceil_to_ue8m0(sf) if use_ue8m0 else sf
    return cast_to_fp8(x_view * (1.0 / sf)[:, None, :]).reshape(m, n), sf


def per_block_cast_to_fp8(x: jnp.ndarray, use_ue8m0: bool,
                          gran_k: int = 128) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """gran_k x gran_k (weight) quantization: SF [ceil(m/g), ceil(n/g)].

    Contract: /root/reference/deep_gemm/utils/math.py:51-61.
    """
    assert x.ndim == 2
    m, n = x.shape
    pm, pn = align(m, gran_k), align(n, gran_k)
    x_padded = jnp.pad(x, ((0, pm - m), (0, pn - n)))
    x_view = x_padded.reshape(pm // gran_k, gran_k, pn // gran_k, gran_k)
    x_amax = jnp.clip(jnp.max(jnp.abs(x_view).astype(jnp.float32), axis=(1, 3), keepdims=True),
                      FP8_AMAX_EPS, None)
    sf = x_amax / FP8_MAX
    sf = ceil_to_ue8m0(sf) if use_ue8m0 else sf
    x_scaled = cast_to_fp8(x_view * (1.0 / sf))
    return (x_scaled.reshape(pm, pn)[:m, :n],
            sf.reshape(pm // gran_k, pn // gran_k))


def per_custom_dims_cast_to_fp8(x: jnp.ndarray, dims: Tuple,
                                use_ue8m0: bool) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Keep `dims`, reduce amax over all other dims.

    Contract: /root/reference/deep_gemm/utils/math.py:64-70.
    """
    excluded_dims = tuple(i for i in range(x.ndim) if i not in set(dims))
    x_amax = jnp.clip(jnp.max(jnp.abs(x).astype(jnp.float32), axis=excluded_dims, keepdims=True),
                      FP8_AMAX_EPS, None)
    sf = x_amax / FP8_MAX
    sf = ceil_to_ue8m0(sf) if use_ue8m0 else sf
    return cast_to_fp8(x * (1.0 / sf)), jnp.squeeze(sf)


# ---------------------------------------------------------------------------
# FP4 (e2m1) emulation: codes packed two-per-int8
# ---------------------------------------------------------------------------

_FP4_VALUES = (0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0)
# Midpoints between consecutive e2m1 magnitudes (round-to-nearest-even boundaries)
_FP4_BOUNDARIES = (0.25, 0.75, 1.25, 1.75, 2.5, 3.5, 5.0)


def _quantize_to_fp4_e2m1(x: jnp.ndarray) -> jnp.ndarray:
    """f32 -> e2m1 4-bit codes (sign bit 3, magnitude bits 0-2).

    Contract: /root/reference/deep_gemm/utils/math.py:73-82.
    """
    ax = jnp.abs(x)
    code = jnp.zeros(x.shape, dtype=jnp.int32)
    for boundary in _FP4_BOUNDARIES:
        code += (ax > boundary).astype(jnp.int32)
    sign = (x < 0) & (code != 0)
    code = code | (sign.astype(jnp.int32) << 3)
    return code.astype(jnp.int8)


def _dequantize_from_fp4_e2m1(codes: jnp.ndarray) -> jnp.ndarray:
    """4-bit e2m1 codes (int) -> f32 values
    (/root/reference/deep_gemm/utils/math.py:130-134)."""
    codes = codes.astype(jnp.int32)
    value_idx = codes & 0x07
    sign = (codes & 0x08) != 0
    table = jnp.asarray(_FP4_VALUES, dtype=jnp.float32)
    value = table[value_idx]
    return jnp.where(sign & (value_idx != 0), -value, value)


def per_token_cast_to_fp4(x: jnp.ndarray, use_ue8m0: bool, gran_k: int = 128,
                          use_packed_ue8m0: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """1 x gran_k FP4 quantization; codes packed 2-per-int8 along n.

    Contract: /root/reference/deep_gemm/utils/math.py:85-111.
    """
    m, n = x.shape
    assert n % 2 == 0
    assert not use_packed_ue8m0 or use_ue8m0
    padded_n = align(n, gran_k)
    x_padded = jnp.pad(x, ((0, 0), (0, padded_n - n)))
    x_view = x_padded.reshape(m, -1, gran_k)
    x_amax = jnp.clip(jnp.max(jnp.abs(x_view).astype(jnp.float32), axis=2), FP8_AMAX_EPS, None)
    sf = x_amax / FP4_MAX
    sf = ceil_to_ue8m0(sf) if use_ue8m0 else sf
    x_scaled = x_view * (1.0 / sf)[:, :, None]
    codes = _quantize_to_fp4_e2m1(x_scaled).reshape(m, padded_n).astype(jnp.int32)
    codes2 = codes.reshape(m, padded_n // 2, 2)
    packed = ((codes2[:, :, 0] & 0x0F) | ((codes2[:, :, 1] & 0x0F) << 4)).astype(jnp.int8)
    if use_packed_ue8m0:
        # Pad the SF count to a multiple of 4 with 1.0 (= 2^0) so the int32
        # packing is well-formed; padding scales cover no real elements.
        num_sf = sf.shape[-1]
        if num_sf % 4 != 0:
            pad = align(num_sf, 4) - num_sf
            sf = jnp.pad(sf, ((0, 0), (0, pad)), constant_values=1.0)
        return packed[:, :n // 2], pack_ue8m0_to_int(sf)
    return packed[:, :n // 2], sf


def transpose_packed_fp4(a: jnp.ndarray) -> jnp.ndarray:
    """Transpose a 2D packed-FP4 code matrix (repack nibbles along the new rows).

    Contract: /root/reference/deep_gemm/utils/math.py:114-127.
    """
    assert a.dtype == jnp.int8 and a.ndim == 2
    m, n2 = a.shape
    n = n2 * 2
    assert m % 2 == 0
    ai = a.astype(jnp.int32)
    lo, hi = ai & 0x0F, (ai >> 4) & 0x0F
    codes = jnp.stack([lo, hi], axis=-1).reshape(m, n)   # interleave along n
    codes_t = codes.T                                     # (n, m)
    codes2 = codes_t.reshape(n, m // 2, 2)
    out = (codes2[:, :, 0] & 0x0F) | ((codes2[:, :, 1] & 0x0F) << 4)
    return out.astype(jnp.int8)


def pack_fp4_planar(codes: jnp.ndarray) -> jnp.ndarray:
    """Pack e2m1 codes [.., k] (k % 256 == 0) into the TPU 'planar-128'
    int8 layout [.., k/2]: within each 256-code group, byte j holds codes
    (base+j, base+128+j). In-kernel decode then splits nibbles into two
    128-wide lane vectors and concatenates — no sub-lane interleave (which
    Mosaic cannot lower). The reference's layout interleaves adjacent codes
    per byte (deep_gemm/utils/math.py:85-111); use
    :func:`repack_fp4_to_planar` to convert."""
    k = codes.shape[-1]
    assert k % 256 == 0, k
    c = codes.astype(jnp.int32).reshape(*codes.shape[:-1], k // 256, 2, 128)
    lo, hi = c[..., 0, :], c[..., 1, :]
    return ((lo & 0x0F) | ((hi & 0x0F) << 4)).reshape(
        *codes.shape[:-1], k // 2).astype(jnp.int8)


def unpack_fp4_planar(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`pack_fp4_planar` -> int32 codes [.., k]."""
    k2 = packed.shape[-1]
    p = packed.astype(jnp.int32).reshape(*packed.shape[:-1], k2 // 128, 128)
    lo, hi = p & 0x0F, (p >> 4) & 0x0F
    return jnp.stack([lo, hi], axis=-2).reshape(*packed.shape[:-1], k2 * 2)


def repack_fp4_to_planar(packed_interleaved: jnp.ndarray) -> jnp.ndarray:
    """Reference interleaved packing -> TPU planar-128 packing."""
    codes = unpack_fp4_codes(packed_interleaved)
    return pack_fp4_planar(codes)


def unpack_fp4_codes(packed: jnp.ndarray) -> jnp.ndarray:
    """int8 packed codes [.., n/2] -> int32 codes [.., n] (low nibble first)."""
    pi = packed.astype(jnp.int32)
    lo, hi = pi & 0x0F, (pi >> 4) & 0x0F
    return jnp.stack([lo, hi], axis=-1).reshape(*packed.shape[:-1], packed.shape[-1] * 2)


def cast_back_from_fp4(packed: jnp.ndarray, sf: jnp.ndarray, gran_k: int = 128,
                       use_packed_ue8m0: bool = False) -> jnp.ndarray:
    """Dequantize packed FP4 + SF back to f32
    (/root/reference/deep_gemm/utils/math.py:141-153)."""
    m, n2 = packed.shape
    n = n2 * 2
    if use_packed_ue8m0:
        sf = unpack_ue8m0_from_int(sf)
    codes = unpack_fp4_codes(packed)
    x_dequantized = _dequantize_from_fp4_e2m1(codes)
    group_idx = jnp.arange(n) // gran_k
    return x_dequantized * sf[:, group_idx]
