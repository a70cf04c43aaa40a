"""SF layout transform tests — bit-exact vs pure-numpy reimplementations,
mirroring /root/reference/tests/test_layout.py:20-60."""

import numpy as np
import jax.numpy as jnp
import pytest

import deepgemm_tpu as dg
from deepgemm_tpu.ops.sf_layout import (
    get_tma_aligned_size, get_mn_major_tma_aligned_tensor,
    get_mn_major_tma_aligned_packed_ue8m0_tensor,
    get_k_grouped_mn_major_tma_aligned_packed_ue8m0_tensor,
    check_k_grouped_packed_ue8m0_tensor,
    transform_sf_pair_into_required_layout, resolve_recipes)
from deepgemm_tpu.testing import assert_bitwise_equal


def _pow2_sf(rng, shape):
    exp = rng.randint(-20, 20, size=shape)
    return jnp.asarray(np.ldexp(1.0, exp).astype(np.float32))


def _pack_ref(sf_np):
    """numpy reimplementation of exponent-extract + 4-pack along k."""
    ksf = sf_np.shape[-1]
    pad = (-ksf) % 4
    if pad:
        sf_np = np.pad(sf_np, [(0, 0)] * (sf_np.ndim - 1) + [(0, pad)],
                       constant_values=1.0)
    exps = (sf_np.view(np.int32) >> 23).astype(np.uint8)
    return exps.reshape(*sf_np.shape[:-1], -1, 4).view(np.int32).squeeze(-1)


def test_tma_aligned_size():
    assert get_tma_aligned_size(5, 4) == 8      # f32: align to 4 elements
    assert get_tma_aligned_size(8, 4) == 8
    assert get_tma_aligned_size(3, 1) == 16     # bytes: align to 16


@pytest.mark.parametrize('shape', [(64, 4), (3, 64, 4)])
def test_mn_major_transpose(shape):
    rng = np.random.RandomState(0)
    sf = jnp.asarray(rng.rand(*shape).astype(np.float32))
    out = get_mn_major_tma_aligned_tensor(sf)
    assert_bitwise_equal(out, jnp.swapaxes(sf, -1, -2))


@pytest.mark.parametrize('ksf', [4, 6, 8])
def test_packed_ue8m0(ksf):
    rng = np.random.RandomState(1)
    sf = _pow2_sf(rng, (32, ksf))
    out = get_mn_major_tma_aligned_packed_ue8m0_tensor(sf)
    ref = _pack_ref(np.asarray(sf))
    assert out.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(out), ref)
    # round trip through the unpack util
    unpacked = dg.unpack_ue8m0_from_int(out)[:, :ksf]
    assert_bitwise_equal(unpacked, sf)


def test_packed_ue8m0_psum_gaps():
    rng = np.random.RandomState(2)
    sf = _pow2_sf(rng, (16, 4))
    ends = jnp.asarray([8, 12], jnp.int32)      # rows >= 12 are padding gaps
    out = get_mn_major_tma_aligned_packed_ue8m0_tensor(sf, psum_layout=ends)
    unpacked = dg.unpack_ue8m0_from_int(out)
    assert_bitwise_equal(unpacked[:12], sf[:12])
    assert np.all(np.asarray(unpacked[12:]) == 1.0)


def test_k_grouped_packed_ue8m0():
    rng = np.random.RandomState(3)
    ks = [256, 0, 130, 128]                     # includes empty + ragged group
    gran_k, k_alignment = 128, 256
    ksfs = [-(-k // gran_k) for k in ks]
    sf = _pow2_sf(rng, (8, sum(ksfs)))
    out = get_k_grouped_mn_major_tma_aligned_packed_ue8m0_tensor(
        sf, ks, gran_k, k_alignment)
    check_k_grouped_packed_ue8m0_tensor(out, ks, gran_k, k_alignment)
    # each non-empty group segment padded to k_alignment/gran_k entries of 1.0
    unpacked = np.asarray(dg.unpack_ue8m0_from_int(out))
    seg = k_alignment // gran_k
    src_off = dst_off = 0
    for k_g, n_g in zip(ks, ksfs):
        if k_g == 0:
            continue
        padded = -(-n_g // seg) * seg
        np.testing.assert_array_equal(
            unpacked[:, dst_off:dst_off + n_g],
            np.asarray(sf)[:, src_off:src_off + n_g])
        assert np.all(unpacked[:, dst_off + n_g:dst_off + padded] == 1.0)
        src_off += n_g
        dst_off += padded


def test_transform_sf_pair():
    rng = np.random.RandomState(4)
    m, n, k = 32, 64, 256
    sfa = jnp.asarray(rng.rand(m, 2).astype(np.float32))
    sfb = jnp.asarray(rng.rand(1, 2).astype(np.float32))
    a_out, b_out, gka, gkb = transform_sf_pair_into_required_layout(
        sfa, sfb, m, n, k)
    assert (gka, gkb) == (128, 128)
    assert_bitwise_equal(a_out, sfa)
    assert_bitwise_equal(b_out, sfb)


def test_resolve_recipes():
    assert resolve_recipes(None, None, None) == ((1, 128), (128, 128))
    assert resolve_recipes((1, 1, 128), None, None) == ((1, 128), (1, 128))
    assert resolve_recipes((1, 32), None, None) == ((1, 32), (1, 32))
    assert resolve_recipes(None, (1, 128), (128, 128)) == ((1, 128), (128, 128))
