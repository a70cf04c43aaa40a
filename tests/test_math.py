"""Tests for the quantization/numerics contract (deepgemm_tpu/utils/math.py),
mirroring the semantics of /root/reference/deep_gemm/utils/math.py.

Validation is against independent numpy/ml_dtypes references, plus structural
properties (power-of-two-ness, roundtrips, shapes)."""

import numpy as np
import ml_dtypes
import jax.numpy as jnp
import pytest

import deepgemm_tpu as dg
from deepgemm_tpu.testing import assert_bitwise_equal, calc_diff


def np_f32(x):
    return np.asarray(x).astype(np.float32)


def test_ceil_to_ue8m0():
    x = jnp.asarray([0.1, 0.25, 0.26, 1.0, 1.5, 3.9, 448.0, 1e-30, 7e37], dtype=jnp.float32)
    out = np.asarray(dg.ceil_to_ue8m0(x))
    expected = 2.0 ** np.ceil(np.log2(np.abs(np_f32(x))))
    # exact powers of two stay put; everything else rounds up
    np.testing.assert_allclose(out[:7], expected[:7], rtol=0)
    # all outputs are exact powers of two
    bits = out.view(np.int32)
    assert (bits & 0x7FFFFF == 0).all()


def test_pack_unpack_ue8m0_roundtrip():
    x = np.asarray(2.0 ** np.random.randint(-20, 20, size=(16, 8)), dtype=np.float32)
    packed = dg.pack_ue8m0_to_int(jnp.asarray(x))
    assert packed.shape == (16, 2) and packed.dtype == jnp.int32
    unpacked = dg.unpack_ue8m0_from_int(packed)
    assert_bitwise_equal(unpacked, jnp.asarray(x))


def test_per_token_cast_to_fp8():
    x = jnp.asarray(np.random.randn(64, 300).astype(np.float32), dtype=jnp.bfloat16)
    q, sf = dg.per_token_cast_to_fp8(x, use_ue8m0=False)
    assert q.shape == (64, 300) and q.dtype == jnp.float8_e4m3fn
    assert sf.shape == (64, 3) and sf.dtype == jnp.float32
    # dequantized result approximates input
    group = np.arange(300) // 128
    deq = np_f32(q) * np_f32(sf)[:, group]
    assert calc_diff(deq, np_f32(x)) < 5e-4
    # scaled values fit in fp8 range
    assert np.abs(np_f32(q)).max() <= 448.0

    # ue8m0 variant: scales are powers of two
    q2, sf2 = dg.per_token_cast_to_fp8(x, use_ue8m0=True)
    bits = np.asarray(sf2).view(np.int32)
    assert (bits & 0x7FFFFF == 0).all()
    deq2 = np_f32(q2) * np.asarray(sf2)[:, group]
    assert calc_diff(deq2, np_f32(x)) < 1e-3


def test_per_token_cast_matches_mldtypes_rounding():
    # jnp's e4m3 cast must round like ml_dtypes (RNE)
    x = jnp.asarray(np.random.randn(32, 128).astype(np.float32), dtype=jnp.bfloat16)
    q, sf = dg.per_token_cast_to_fp8(x, use_ue8m0=False)
    scaled = np_f32(x) / np.asarray(sf)[:, np.arange(128) // 128]
    expected = scaled.astype(ml_dtypes.float8_e4m3fn)
    assert_bitwise_equal(np.asarray(q).view(np.uint8), expected.view(np.uint8))


def test_per_channel_cast_to_fp8():
    x = jnp.asarray(np.random.randn(256, 96).astype(np.float32), dtype=jnp.bfloat16)
    q, sf = dg.per_channel_cast_to_fp8(x, use_ue8m0=False)
    assert q.shape == (256, 96) and sf.shape == (2, 96)
    deq = np_f32(q) * np.repeat(np_f32(sf), 128, axis=0)
    assert calc_diff(deq, np_f32(x)) < 5e-4


def test_per_block_cast_to_fp8():
    x = jnp.asarray(np.random.randn(200, 300).astype(np.float32), dtype=jnp.bfloat16)
    q, sf = dg.per_block_cast_to_fp8(x, use_ue8m0=False)
    assert q.shape == (200, 300) and sf.shape == (2, 3)
    rg, cg = np.arange(200) // 128, np.arange(300) // 128
    deq = np_f32(q) * np_f32(sf)[np.ix_(rg, cg)]
    assert calc_diff(deq, np_f32(x)) < 6e-4


def test_per_custom_dims_cast_to_fp8():
    x = jnp.asarray(np.random.randn(8, 64, 32).astype(np.float32))
    q, sf = dg.per_custom_dims_cast_to_fp8(x, dims=(0,), use_ue8m0=False)
    assert q.shape == x.shape and sf.shape == (8,)


def test_fp4_quant_roundtrip():
    x = jnp.asarray(np.random.randn(64, 256).astype(np.float32), dtype=jnp.bfloat16)
    packed, sf = dg.per_token_cast_to_fp4(x, use_ue8m0=False)
    assert packed.shape == (64, 128) and packed.dtype == jnp.int8
    assert sf.shape == (64, 2)
    deq = dg.cast_back_from_fp4(packed, sf)
    # e2m1 is coarse: ~2-3% cosine error on gaussian data
    assert calc_diff(deq, np_f32(x)) < 0.03

    # packed ue8m0 path
    packed2, sf_packed = dg.per_token_cast_to_fp4(x, use_ue8m0=True, use_packed_ue8m0=True)
    assert sf_packed.dtype == jnp.int32
    deq2 = dg.cast_back_from_fp4(packed2, sf_packed, use_packed_ue8m0=True)
    assert calc_diff(deq2, np_f32(x)) < 0.03


def test_fp4_code_values():
    # All 16 code points decode to the e2m1 value table
    vals = [0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0]
    x = jnp.asarray(vals + [-v for v in vals[1:]] + [0.0], dtype=jnp.float32).reshape(1, -1)
    packed, sf = dg.per_token_cast_to_fp4(x, use_ue8m0=False, gran_k=16)
    deq = np.asarray(dg.cast_back_from_fp4(packed, sf, gran_k=16)).ravel()
    np.testing.assert_allclose(deq, np.asarray(x).ravel(), rtol=1e-6)


def test_transpose_packed_fp4():
    x = jnp.asarray(np.random.randn(32, 64).astype(np.float32), dtype=jnp.bfloat16)
    packed, sf = dg.per_token_cast_to_fp4(x, use_ue8m0=False, gran_k=64)
    packed_t = dg.transpose_packed_fp4(packed)
    assert packed_t.shape == (64, 16)
    codes = np.asarray(dg.utils.unpack_fp4_codes(packed))
    codes_t = np.asarray(dg.utils.unpack_fp4_codes(packed_t))
    np.testing.assert_array_equal(codes.T, codes_t)


def test_fp8_saturating_cast():
    x = jnp.asarray([500.0, -500.0, 448.0, 1e9], dtype=jnp.float32)
    q = np.asarray(dg.utils.cast_to_fp8(x)).astype(np.float32)
    np.testing.assert_array_equal(q, [448.0, -448.0, 448.0, 448.0])
