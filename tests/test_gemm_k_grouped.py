"""K-grouped (wgrad) GEMM tests, the TPU analog of
/root/reference/tests/test_fp8_fp4.py:193-241."""

import numpy as np
import jax.numpy as jnp
import pytest

import deepgemm_tpu as dg
from deepgemm_tpu.testing import calc_diff

from generators import generate_k_grouped_contiguous


@pytest.fixture(autouse=True)
def _alignment():
    dg.set_mk_alignment_for_contiguous_layout(128)
    yield
    dg.set_mk_alignment_for_contiguous_layout(128)


@pytest.mark.parametrize('ks', [[256, 384, 128], [128, 0, 256]])
@pytest.mark.parametrize('use_fp8', [True, False])
def test_k_grouped_tn(ks, use_fp8):
    num_groups, m, n = len(ks), 128, 256
    if use_fp8:
        k, a, b, c, ref_d, ks_arr = generate_k_grouped_contiguous(
            num_groups, m, n, ks, use_fp8=True)
        d = dg.k_grouped_fp8_gemm_tn_contiguous(a, b, ks=ks, grouped_layout=ks_arr, c=c)
    else:
        k, a, b, c, ref_d, ks_arr = generate_k_grouped_contiguous(
            num_groups, m, n, ks, use_fp8=False)
        d = dg.k_grouped_bf16_gemm_tn_contiguous(a, b, ks=ks, grouped_layout=ks_arr, c=c)
    assert d.dtype == jnp.float32
    tol = 1e-3 if use_fp8 else 1e-5
    for g in range(num_groups):
        diff = calc_diff(d[g], ref_d[g])
        assert diff < tol, f'{g=}, {ks[g]=}, {diff=}'


def test_k_grouped_tn_psum_layout():
    """psum end-offset layout with aligned gaps: groups [200, 300] at
    alignment 128 -> ends [200, 556], total_k = 640."""
    dg.set_mk_alignment_for_contiguous_layout(128)
    rng = np.random.RandomState(3)
    real_ks = [200, 300]
    ends, prev = [], 0
    for kg in real_ks:
        start = dg.align(prev, 128)
        ends.append(start + kg)
        prev = ends[-1]
    total_k = dg.align(ends[-1], 128)
    m, n, G = 128, 256, len(real_ks)

    a = np.zeros((total_k, m), np.float32)
    b = np.zeros((total_k, n), np.float32)
    c = rng.randn(G, m, n).astype(np.float32) * 32
    ref_d = np.empty_like(c)
    for g, kg in enumerate(real_ks):
        start = ends[g] - kg
        a[start:ends[g]] = rng.randn(kg, m)
        b[start:ends[g]] = rng.randn(kg, n)
    a_j = jnp.asarray(a, dtype=jnp.bfloat16)
    b_j = jnp.asarray(b, dtype=jnp.bfloat16)
    for g, kg in enumerate(real_ks):
        start = ends[g] - kg
        ref_d[g] = c[g] + (np.asarray(a_j[start:ends[g]], np.float32).T
                           @ np.asarray(b_j[start:ends[g]], np.float32))

    d = dg.k_grouped_bf16_gemm_tn_contiguous(
        a_j, b_j, grouped_layout=jnp.asarray(ends, dtype=jnp.int32),
        c=jnp.asarray(c), use_psum_layout=True)
    for g in range(G):
        assert calc_diff(d[g], ref_d[g]) < 1e-5, g


def test_k_grouped_nt_flattened():
    """SM90 flattened k-major layout roundtrips through the tn path."""
    ks = [128, 256]
    num_groups, m, n = len(ks), 64, 128
    k, a, b, c, ref_d, ks_arr = generate_k_grouped_contiguous(
        num_groups, m, n, ks, use_fp8=True)
    # Flatten to the k-major per-group layout
    (a_v, a_sf), (b_v, b_sf) = a, b

    def flatten(x, dim):
        segs, off = [], 0
        for kg in ks:
            segs.append(np.asarray(x[off:off + kg]).T.reshape(-1))
            off += kg
        return jnp.asarray(np.concatenate(segs)).view(x.dtype)

    a_flat = jnp.asarray(np.concatenate(
        [np.ascontiguousarray(np.asarray(a_v[sum(ks[:i]):sum(ks[:i + 1])]).T).reshape(-1)
         for i in range(len(ks))]))
    b_flat = jnp.asarray(np.concatenate(
        [np.ascontiguousarray(np.asarray(b_v[sum(ks[:i]):sum(ks[:i + 1])]).T).reshape(-1)
         for i in range(len(ks))]))
    d = dg.k_grouped_fp8_gemm_nt_contiguous(
        (a_flat, a_sf.T), (b_flat, b_sf.T), ks=ks, grouped_layout=ks_arr, c=c)
    for g in range(num_groups):
        assert calc_diff(d[g], ref_d[g]) < 1e-3, g


def test_k_grouped_rejects_transposed_sf():
    """The SF shape gate must reject MN-first (transposed) scale tensors
    loudly — a transposed SF otherwise slips through the kernel BlockSpecs
    and computes garbage silently (caught live by scripts/tpu_smoke.py)."""
    import numpy as np
    rng = np.random.RandomState(0)
    tk, mm, nn = 512, 256, 384
    ak = jnp.asarray(rng.randn(tk, mm) * 0.1, jnp.bfloat16)
    bk_ = jnp.asarray(rng.randn(tk, nn) * 0.1, jnp.bfloat16)
    akq, aksf = dg.per_channel_cast_to_fp8(ak, use_ue8m0=False)
    bkq, bksf = dg.per_channel_cast_to_fp8(bk_, use_ue8m0=False)
    c = jnp.zeros((2, mm, nn), jnp.float32)
    with pytest.raises(AssertionError, match='k-first'):
        dg.k_grouped_fp8_gemm_tn_contiguous((akq, aksf.T), (bkq, bksf.T),
                                            ks=[256, 256], c=c)


@pytest.mark.parametrize('use_fp8', [True, False])
def test_k_grouped_c_none_equals_zero_c(use_fp8):
    """c=None (known-zero accumulator) must be bitwise-equal to passing an
    explicit zero c — the kernel zero-inits instead of streaming G*m*n FP32
    zeros from HBM (the wgrad HBM-boundness lever, VERDICT r2 #2). Includes
    an empty group (its d block must come out zero, not garbage)."""
    ks = [256, 0, 384]
    num_groups, m, n = len(ks), 128, 256
    k, a, b, c, ref_d, ks_arr = generate_k_grouped_contiguous(
        num_groups, m, n, ks, use_fp8=use_fp8)
    zc = jnp.zeros_like(c)
    fn = (dg.k_grouped_fp8_gemm_tn_contiguous if use_fp8
          else dg.k_grouped_bf16_gemm_tn_contiguous)
    d_zero = fn(a, b, ks=ks, grouped_layout=ks_arr, c=zc)
    d_none = fn(a, b, ks=ks, grouped_layout=ks_arr, c=None)
    np.testing.assert_array_equal(np.asarray(d_none), np.asarray(d_zero))
    assert not np.asarray(d_none[1]).any()   # empty group stays zero


@pytest.mark.parametrize('use_fp8', [True, False])
@pytest.mark.parametrize('ks', [[256, 256, 256, 256], [384, 384, 384, 384]])
def test_k_grouped_static_equals_prefetch(monkeypatch, ks, use_fp8):
    """Equal host-concrete groups take the prefetch-free static path
    (gid = s // static_spg baked into the index maps); it must be
    bitwise-equal to the dynamic scalar-prefetch kernel. The 384-case
    exercises a non-power-of-two slab (bk 384 = 3 SF rows per tile)."""
    num_groups, m, n = len(ks), 128, 256
    k, a, b, c, ref_d, ks_arr = generate_k_grouped_contiguous(
        num_groups, m, n, ks, use_fp8=use_fp8)
    fn = (dg.k_grouped_fp8_gemm_tn_contiguous if use_fp8
          else dg.k_grouped_bf16_gemm_tn_contiguous)
    d_static = fn(a, b, ks=ks, grouped_layout=ks_arr, c=c)
    monkeypatch.setenv('DGT_KG_FORCE_PREFETCH', '1')
    d_prefetch = fn(a, b, ks=ks, grouped_layout=ks_arr, c=c)
    np.testing.assert_array_equal(np.asarray(d_static),
                                  np.asarray(d_prefetch))
    tol = 1e-3 if use_fp8 else 1e-5
    for g in range(num_groups):
        assert calc_diff(d_static[g], ref_d[g]) < tol

    # the default path must actually have built the static spec — and for
    # these gran-aligned slabs, the stepped-SF variant (dense-style BlockSpec
    # scale delivery) when scaled
    from deepgemm_tpu.runtime.cache import kernel_cache
    specs = [s for s in kernel_cache().specs()
             if getattr(s, 'static_spg', None)]
    assert specs, 'equal-group layout did not take the static path'
    if use_fp8:
        assert any(getattr(s, 'static_sf_stepped', False) for s in specs), \
            'gran-aligned equal groups did not take the stepped-SF path'


def test_k_grouped_static_unstepped_sf(monkeypatch):
    """Equal groups whose slab depth is NOT a multiple of the scale
    granularity (192 with gran 128, alignment 64): the static index-map path
    still applies but scales stay in the dynamic-sublane layout — bitwise vs
    the prefetch kernel."""
    import deepgemm_tpu as dg2
    old = dg2.get_mk_alignment_for_contiguous_layout()
    dg2.set_mk_alignment_for_contiguous_layout(64)
    try:
        ks = [192, 192, 192, 192]
        num_groups, m, n = len(ks), 128, 256
        k, a, b, c, ref_d, ks_arr = generate_k_grouped_contiguous(
            num_groups, m, n, ks, use_fp8=True)
        d_static = dg.k_grouped_fp8_gemm_tn_contiguous(
            a, b, ks=ks, grouped_layout=ks_arr, c=c)
        monkeypatch.setenv('DGT_KG_FORCE_PREFETCH', '1')
        d_prefetch = dg.k_grouped_fp8_gemm_tn_contiguous(
            a, b, ks=ks, grouped_layout=ks_arr, c=c)
        np.testing.assert_array_equal(np.asarray(d_static),
                                      np.asarray(d_prefetch))
        for g in range(num_groups):
            assert calc_diff(d_static[g], ref_d[g]) < 1e-3
        from deepgemm_tpu.runtime.cache import kernel_cache
        assert any(getattr(s, 'static_spg', None)
                   and not getattr(s, 'static_sf_stepped', False)
                   and s.is_scaled for s in kernel_cache().specs()), \
            'expected a static-but-unstepped scaled spec'
    finally:
        dg2.set_mk_alignment_for_contiguous_layout(old)


def test_k_grouped_psum_equal_static_equals_prefetch(monkeypatch):
    """Equal FULL psum groups (ends = [256, 512, 768]) also take the static
    path (the psum->sizes diff gives equal aligned sizes); bitwise vs the
    prefetch kernel."""
    import jax
    G, kpg, m, n = 3, 256, 128, 256
    total_k = G * kpg
    rng = np.random.RandomState(7)
    a = jnp.asarray(rng.randn(total_k, m) * .1, jnp.bfloat16)
    b = jnp.asarray(rng.randn(total_k, n) * .1, jnp.bfloat16)
    c = jnp.asarray(rng.randn(G, m, n).astype(np.float32))
    ends = jnp.asarray(np.arange(1, G + 1, dtype=np.int32) * kpg)
    run = lambda: dg.k_grouped_bf16_gemm_tn_contiguous(
        a, b, grouped_layout=ends, c=c, use_psum_layout=True)
    d_static = run()
    monkeypatch.setenv('DGT_KG_FORCE_PREFETCH', '1')
    d_pf = run()
    np.testing.assert_array_equal(np.asarray(d_static), np.asarray(d_pf))


def test_k_grouped_traced_layout_stays_graph_safe():
    """A TRACED grouped_layout (no ks_cpu) must use the dynamic
    scalar-prefetch kernel — group sizes are read on device only, the
    CUDA-graph-safety analog (/root/reference/csrc/apis/gemm.hpp masked
    contract). The call must trace/compile without host sync."""
    import jax
    G, kpg, m, n = 2, 256, 128, 256
    total_k = G * kpg
    rng = np.random.RandomState(9)
    a = jnp.asarray(rng.randn(total_k, m) * .1, jnp.bfloat16)
    b = jnp.asarray(rng.randn(total_k, n) * .1, jnp.bfloat16)
    from deepgemm_tpu.kernels.k_grouped import k_grouped_gemm

    @jax.jit
    def f(a_, b_, lay):
        return k_grouped_gemm(a_, b_, None, lay, use_psum_layout=False)

    d = f(a, b, jnp.asarray([kpg, kpg], jnp.int32))
    ref = np.stack([
        np.asarray(a[g * kpg:(g + 1) * kpg], np.float32).T
        @ np.asarray(b[g * kpg:(g + 1) * kpg], np.float32)
        for g in range(G)])
    assert calc_diff(d, ref) < 1e-5
