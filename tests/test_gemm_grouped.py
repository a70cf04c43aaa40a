"""M-grouped GEMM tests (MoE prefill contiguous + decode masked), the TPU
analog of /root/reference/tests/test_fp8_fp4.py:75-160 and test_bf16.py."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import deepgemm_tpu as dg
from deepgemm_tpu.testing import calc_diff

from generators import generate_m_grouped_contiguous, generate_m_grouped_masked


@pytest.fixture(autouse=True)
def _small_alignment():
    # Keep interpret-mode shapes small: group alignment 128 (the default).
    dg.set_mk_alignment_for_contiguous_layout(128)
    yield


@pytest.mark.parametrize('num_groups,expected_m', [(4, 128), (3, 200)])
@pytest.mark.parametrize('use_psum_layout', [False, True])
def test_m_grouped_contiguous_bf16(num_groups, expected_m, use_psum_layout):
    n, k = 256, 384
    m, a, b, layout, ref_d = generate_m_grouped_contiguous(
        num_groups, expected_m, n, k, use_fp8=False, use_psum_layout=use_psum_layout)
    d = dg.m_grouped_bf16_gemm_nt_contiguous(a, b, grouped_layout=layout,
                                             use_psum_layout=use_psum_layout)
    diff = calc_diff(d, ref_d)
    assert diff < 1e-5, f'{num_groups=}, {m=}, {use_psum_layout=}, {diff=}'


@pytest.mark.parametrize('num_groups,expected_m', [(4, 128)])
@pytest.mark.parametrize('use_psum_layout', [False, True])
def test_m_grouped_contiguous_fp8(num_groups, expected_m, use_psum_layout):
    n, k = 256, 384
    m, a, b, layout, ref_d = generate_m_grouped_contiguous(
        num_groups, expected_m, n, k, use_fp8=True, use_psum_layout=use_psum_layout)
    d = dg.m_grouped_fp8_gemm_nt_contiguous(a, b, grouped_layout=layout,
                                            use_psum_layout=use_psum_layout)
    diff = calc_diff(d, ref_d)
    assert diff < 1e-3, f'{num_groups=}, {m=}, {use_psum_layout=}, {diff=}'


def test_m_grouped_contiguous_nn():
    """MN-major B plumbing (b given as [G, k, n])."""
    num_groups, n, k = 4, 256, 384
    m, a, b, layout, ref_d = generate_m_grouped_contiguous(
        num_groups, 128, n, k, use_fp8=True)
    b_nn = (b[0].transpose(0, 2, 1), b[1].transpose(0, 2, 1))
    d = dg.m_grouped_fp8_gemm_nn_contiguous(a, b_nn, grouped_layout=layout)
    assert calc_diff(d, ref_d) < 1e-3


def test_m_grouped_contiguous_ensure_zero_padding():
    """psum-layout padding rows must come out exactly zero
    (/root/reference/tests/test_fp8_fp4.py:22-30)."""
    num_groups, n, k = 3, 256, 256
    m, a, b, layout, ref_d = generate_m_grouped_contiguous(
        num_groups, 200, n, k, use_fp8=True, use_psum_layout=True)
    d = dg.m_grouped_fp8_gemm_nt_contiguous(a, b, grouped_layout=layout,
                                            use_psum_layout=True,
                                            ensure_zero_padding=True)
    assert calc_diff(d, ref_d) < 1e-3
    ends = np.asarray(layout)
    alignment = dg.get_mk_alignment_for_contiguous_layout()
    d_np = np.asarray(d, dtype=np.float32)
    for end in ends:
        aligned = dg.align(int(end), alignment)
        assert not d_np[end:aligned].any(), f'nonzero padding after row {end}'


@pytest.mark.parametrize('num_groups,max_m,expected_m', [(4, 256, 96), (3, 128, 20)])
@pytest.mark.parametrize('use_fp8', [False, True])
def test_m_grouped_masked(num_groups, max_m, expected_m, use_fp8):
    n, k = 256, 384
    a, b, masked_m, ref_d = generate_m_grouped_masked(
        num_groups, max_m, expected_m, n, k, use_fp8=use_fp8)
    fn = dg.m_grouped_fp8_gemm_nt_masked if use_fp8 else dg.m_grouped_bf16_gemm_nt_masked
    d = fn(a, b, masked_m=masked_m, expected_m=expected_m)
    tol = 1e-3 if use_fp8 else 1e-5
    m_np = np.asarray(masked_m)
    for g in range(num_groups):
        mg = int(m_np[g])
        diff = calc_diff(d[g, :mg], ref_d[g, :mg])
        assert diff < tol, f'{g=}, {mg=}, {diff=}'


@pytest.mark.parametrize('use_fp8', [False, True])
def test_m_grouped_masked_full_occupancy_reroute(monkeypatch, use_fp8):
    """expected_m >= max_m with 128-aligned max_m reroutes through the
    contiguous STATIC kernel (equal psum groups of max_m rows — measured
    175.0 vs 171.1 TFLOPS for the masked kernel at the bench shape); it must
    agree bitwise with the predicated masked kernel on ALL meaningful rows
    even when the runtime masked_m is far below max_m — rows past masked_m
    are never meaningful, so computing them instead of skipping is legal.
    (Bitwise holds because both paths pick the same single-k-step block_k
    here; rows/columns are independent of bm/bn.)"""
    num_groups, max_m, n, k = 3, 128, 256, 384
    a, b, masked_m, ref_d = generate_m_grouped_masked(
        num_groups, max_m, 40, n, k, use_fp8=use_fp8)
    fn = (dg.m_grouped_fp8_gemm_nt_masked if use_fp8
          else dg.m_grouped_bf16_gemm_nt_masked)
    d_noexit = fn(a, b, masked_m=masked_m, expected_m=max_m)
    monkeypatch.setenv('DGT_MASKED_FORCE_EXIT', '1')
    d_exit = fn(a, b, masked_m=masked_m, expected_m=max_m)
    tol = 1e-3 if use_fp8 else 1e-5
    m_np = np.asarray(masked_m)
    for g in range(num_groups):
        mg = int(m_np[g])
        np.testing.assert_array_equal(
            np.asarray(d_noexit[g, :mg]), np.asarray(d_exit[g, :mg]))
        assert calc_diff(d_noexit[g, :mg], ref_d[g, :mg]) < tol
    from deepgemm_tpu.runtime.cache import kernel_cache
    specs = kernel_cache().specs()
    assert any(getattr(s, 'kind', None) == 'contiguous'
               and s.static_tpg == max_m // s.cfg.block_m
               for s in specs), 'reroute must build the static contiguous kernel'
    assert any(getattr(s, 'kind', None) == 'masked'
               and not s.no_early_exit for s in specs)


@pytest.mark.parametrize('use_fp8', [False, True])
def test_m_grouped_masked_pf_skip_bitwise(monkeypatch, use_fp8):
    """LOW-occupancy pf-skip masked variant (masked_m as scalar prefetch;
    inactive m-tiles' operand index maps clamp so their DMAs dedupe): must
    be bitwise with the plain predicated kernel on ALL meaningful rows —
    including RAGGED masked_m where a group's last active tile is partial,
    and a zero-count group."""
    num_groups, max_m, n, k = 4, 256, 256, 384
    a, b, _, ref_d = generate_m_grouped_masked(
        num_groups, max_m, 64, n, k, use_fp8=use_fp8)
    masked_m = jnp.asarray([64, 130, 0, 256], jnp.int32)
    fn = (dg.m_grouped_fp8_gemm_nt_masked if use_fp8
          else dg.m_grouped_bf16_gemm_nt_masked)
    monkeypatch.setenv('DGT_MASKED_PF_SKIP', '1')
    d_skip = fn(a, b, masked_m=masked_m, expected_m=64)
    monkeypatch.setenv('DGT_MASKED_PF_SKIP', '0')
    d_plain = fn(a, b, masked_m=masked_m, expected_m=64)
    m_np = np.asarray(masked_m)
    for g in range(num_groups):
        mg = int(m_np[g])
        np.testing.assert_array_equal(
            np.asarray(d_skip[g, :mg]), np.asarray(d_plain[g, :mg]))
        if mg:
            tol = 1e-3 if use_fp8 else 1e-5
            assert calc_diff(d_skip[g, :mg], ref_d[g, :mg]) < tol
    from deepgemm_tpu.runtime.cache import kernel_cache
    assert any(getattr(s, 'pf_skip', False) for s in kernel_cache().specs())


@pytest.mark.parametrize('use_fp8', [False, True])
def test_m_grouped_contiguous_swap_ab_bitwise(monkeypatch, use_fp8):
    """Swap-AB grouped body (weights as the MXU LHS + one final transpose;
    reference analog: sm100.hpp:31-43 makes swap-AB MANDATORY for m-grouped
    GEMMs) is bitwise vs the plain body — on the static path AND the
    prefetch path (uneven groups, dynamic gids)."""
    num_groups, n, k = 4, 256, 384
    m, a, b, layout, ref_d = generate_m_grouped_contiguous(
        num_groups, 128, n, k, use_fp8=use_fp8)
    fn = (dg.m_grouped_fp8_gemm_nt_contiguous if use_fp8
          else dg.m_grouped_bf16_gemm_nt_contiguous)
    outs = {}
    for sw in ('0', '1'):
        monkeypatch.setenv('DGT_GROUPED_SWAP_AB', sw)
        outs[sw] = fn(a, b, grouped_layout=layout, use_psum_layout=False)
    np.testing.assert_array_equal(np.asarray(outs['0']),
                                  np.asarray(outs['1']))
    assert calc_diff(outs['1'], ref_d) < (1e-3 if use_fp8 else 1e-5)
    # prefetch path: force it so the swapped SF specs with dynamic gids run
    monkeypatch.setenv('DGT_GROUPED_FORCE_PREFETCH', '1')
    for sw in ('0', '1'):
        monkeypatch.setenv('DGT_GROUPED_SWAP_AB', sw)
        outs[f'pf{sw}'] = fn(a, b, grouped_layout=layout,
                             use_psum_layout=False)
    np.testing.assert_array_equal(np.asarray(outs['pf0']),
                                  np.asarray(outs['pf1']))
    np.testing.assert_array_equal(np.asarray(outs['pf1']),
                                  np.asarray(outs['1']))


@pytest.mark.parametrize('use_fp8', [False, True])
@pytest.mark.parametrize('n,k', [(256, 384), (256, 200)])
def test_m_grouped_contiguous_dual_b_bitwise(monkeypatch, use_fp8, n, k):
    """DUAL-B straddle path (r5 align128 fix): 128-aligned-but-not-256
    group starts run bm=256 tiles with a second dedup-clamped B operand;
    straddle tiles compute two half dots. Must be BITWISE vs the plain
    bm=128 static path (same per-row dot/promote order) and match the
    host oracle. Covers a k tail and a group boundary at the half line."""
    import numpy as np_
    from deepgemm_tpu.runtime.cache import kernel_cache
    rng = np_.random.RandomState(31)
    sizes = [128, 384, 256]                    # starts 0, 128, 512
    m = sum(sizes)
    ids = np_.repeat(np_.arange(3, dtype=np_.int32), sizes)
    a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    b = jnp.asarray(rng.randn(3, n, k) * 0.1, jnp.bfloat16)
    if use_fp8:
        aq, asf = dg.per_token_cast_to_fp8(a, use_ue8m0=False)
        bs = [dg.per_block_cast_to_fp8(b[g], use_ue8m0=False)
              for g in range(3)]
        arg_a = (aq, asf)
        arg_b = (jnp.stack([x[0] for x in bs]),
                 jnp.stack([x[1] for x in bs]))
        fn = lambda: dg.m_grouped_fp8_gemm_nt_contiguous(
            arg_a, arg_b, grouped_layout=jnp.asarray(ids),
            use_psum_layout=False)
    else:
        fn = lambda: dg.m_grouped_bf16_gemm_nt_contiguous(
            a, b, grouped_layout=jnp.asarray(ids), use_psum_layout=False)
    monkeypatch.setenv('DGT_GROUPED_DUAL_B', '1')
    kernel_cache().clear()
    d_dual = fn()
    assert any(getattr(s, 'dual_b_row_starts', None) is not None
               for s in kernel_cache().specs()), 'dual-B path must build'
    monkeypatch.setenv('DGT_GROUPED_DUAL_B', '0')
    d_plain = fn()
    np.testing.assert_array_equal(np.asarray(d_dual), np.asarray(d_plain))
    ref = np_.vstack([np_.asarray(a[s:e], np_.float32)
                      @ np_.asarray(b[g], np_.float32).T
                      for g, (s, e) in enumerate(
                          zip(np_.cumsum([0] + sizes[:-1]),
                              np_.cumsum(sizes)))])
    assert calc_diff(d_dual, ref) < (1e-3 if use_fp8 else 1e-5)


def test_dual_b_config_pick_bench_shape(monkeypatch):
    """The dual-B chooser at the bench align128 shape must land on
    (256, 512, 3584): the plain-budget (256, 256, 7168) single-step pick
    RESOURCE_EXHAUSTED on real Mosaic (chipless AOT r5) — the 2.5 MiB
    safety margin pins the shipping config. Host-only logic, regression
    for the VMEM-margin constant."""
    import numpy as np_
    from deepgemm_tpu.runtime.cache import kernel_cache
    monkeypatch.setenv('DGT_GROUPED_DUAL_B', '1')
    kernel_cache().clear()
    G, n, k = 8, 4096, 7168
    mpg = [896 if g % 2 == 0 else 1152 for g in range(G)]
    ids = np_.repeat(np_.arange(G, dtype=np_.int32), mpg)
    m = sum(mpg)
    rng = np_.random.RandomState(5)
    # jit-traced shapes only — never RUN (interpret at this size is
    # minutes); trace via jax.eval_shape
    import deepgemm_tpu as dg_
    from deepgemm_tpu.kernels.grouped import m_grouped_gemm_contiguous
    a = jax.ShapeDtypeStruct((m, k), jnp.float8_e4m3fn)
    sfa = jax.ShapeDtypeStruct((m, k // 128), jnp.float32)
    b = jax.ShapeDtypeStruct((G, n, k), jnp.float8_e4m3fn)
    sfb = jax.ShapeDtypeStruct((G, k // 128, n), jnp.float32)
    jax.eval_shape(lambda a_, b_, s1, s2: m_grouped_gemm_contiguous(
        a_, b_, ids, use_psum_layout=False, sfa=s1, sfb_t=s2,
        out_dtype=jnp.bfloat16), a, b, sfa, sfb)
    dual = [s for s in kernel_cache().specs()
            if getattr(s, 'dual_b_row_starts', None) is not None]
    assert dual, 'bench align128 shape must route to dual-B'
    cfg = dual[0].cfg
    assert (cfg.block_m, cfg.block_n, cfg.block_k) == (256, 512, 3584), cfg


@pytest.mark.parametrize('use_fp8', [False, True])
def test_m_grouped_masked_swap_ab_bitwise(monkeypatch, use_fp8):
    """Swap-AB masked body bitwise vs plain on meaningful rows, on both the
    predicated and the pf-skip variants (ragged masked_m + zero group)."""
    num_groups, max_m, n, k = 4, 256, 256, 384
    a, b, _, ref_d = generate_m_grouped_masked(
        num_groups, max_m, 64, n, k, use_fp8=use_fp8)
    masked_m = jnp.asarray([64, 130, 0, 256], jnp.int32)
    fn = (dg.m_grouped_fp8_gemm_nt_masked if use_fp8
          else dg.m_grouped_bf16_gemm_nt_masked)
    outs = {}
    for pf in ('0', '1'):
        monkeypatch.setenv('DGT_MASKED_PF_SKIP', pf)
        for sw in ('0', '1'):
            monkeypatch.setenv('DGT_MASKED_SWAP_AB', sw)
            outs[pf + sw] = fn(a, b, masked_m=masked_m, expected_m=64)
    m_np = np.asarray(masked_m)
    tol = 1e-3 if use_fp8 else 1e-5
    for g in range(num_groups):
        mg = int(m_np[g])
        for key in ('01', '10', '11'):
            np.testing.assert_array_equal(
                np.asarray(outs[key][g, :mg]), np.asarray(outs['00'][g, :mg]))
        if mg:
            assert calc_diff(outs['11'][g, :mg], ref_d[g, :mg]) < tol


def test_m_grouped_masked_no_early_exit_unaligned(monkeypatch):
    """max_m NOT 128-aligned cannot reroute (group starts misalign the lane
    tiles); it must build the unpredicated masked kernel instead and stay
    bitwise with the predicated one on meaningful rows."""
    num_groups, max_m, n, k = 3, 96, 256, 384
    a, b, masked_m, ref_d = generate_m_grouped_masked(
        num_groups, max_m, 40, n, k, use_fp8=False)
    fn = dg.m_grouped_bf16_gemm_nt_masked
    d_noexit = fn(a, b, masked_m=masked_m, expected_m=max_m)
    monkeypatch.setenv('DGT_MASKED_FORCE_EXIT', '1')
    d_exit = fn(a, b, masked_m=masked_m, expected_m=max_m)
    m_np = np.asarray(masked_m)
    for g in range(num_groups):
        mg = int(m_np[g])
        np.testing.assert_array_equal(
            np.asarray(d_noexit[g, :mg]), np.asarray(d_exit[g, :mg]))
        assert calc_diff(d_noexit[g, :mg], ref_d[g, :mg]) < 1e-5
    from deepgemm_tpu.runtime.cache import kernel_cache
    kinds = {(s.kind, getattr(s, 'no_early_exit', None))
             for s in kernel_cache().specs()
             if getattr(s, 'kind', None) == 'masked'}
    assert ('masked', True) in kinds and ('masked', False) in kinds


def test_m_grouped_contiguous_ids_zero_padding():
    """ids-layout padding rows (id == -1) must come out exactly zero with
    ensure_zero_padding — the reference zero-fills them
    (/root/reference/deep_gemm/legacy/m_grouped_gemm.py:36-41). Round-1 gap:
    the flag was silently ignored for the ids layout."""
    num_groups, n, k = 3, 256, 256
    m, a, b, layout, ref_d = generate_m_grouped_contiguous(
        num_groups, 200, n, k, use_fp8=True, use_psum_layout=False)
    ids = np.asarray(layout)
    d = dg.m_grouped_fp8_gemm_nt_contiguous(a, b, grouped_layout=layout,
                                            use_psum_layout=False,
                                            ensure_zero_padding=True)
    d_np = np.asarray(d, np.float32)
    pad_rows = ids < 0
    assert pad_rows.any(), 'fixture produced no padding rows'
    assert not d_np[pad_rows].any(), 'id=-1 rows must be zero'
    assert calc_diff(d_np[~pad_rows], np.asarray(ref_d, np.float32)[~pad_rows]) < 1e-3


def test_m_grouped_contiguous_gcd_lift_divisor():
    """The adaptive block_m lift must DIVIDE the gcd of group starts
    (ADVICE r2): equal groups of 384 rows have gcd 384, and a naive
    min(256, g) lift made m-tiles straddle group boundaries — rows 384-511
    multiplied against the wrong expert's B."""
    num_groups, rows, n, k = 4, 384, 256, 256
    m = num_groups * rows
    rng = np.random.RandomState(23)
    a = jnp.asarray(rng.randn(m, k).astype(np.float32), jnp.bfloat16)
    b = jnp.asarray(rng.randn(num_groups, n, k).astype(np.float32),
                    jnp.bfloat16)
    ref = np.concatenate([
        np.asarray(a[g * rows:(g + 1) * rows], np.float32)
        @ np.asarray(b[g], np.float32).T
        for g in range(num_groups)])
    ids = jnp.asarray(np.repeat(np.arange(num_groups, dtype=np.int32), rows))
    d = dg.m_grouped_bf16_gemm_nt_contiguous(a, b, grouped_layout=ids,
                                             use_psum_layout=False)
    assert calc_diff(d, ref) < 1e-5
    ends = jnp.asarray(np.arange(1, num_groups + 1, dtype=np.int32) * rows)
    d2 = dg.m_grouped_bf16_gemm_nt_contiguous(a, b, grouped_layout=ends,
                                              use_psum_layout=True)
    assert calc_diff(d2, ref) < 1e-5


@pytest.mark.parametrize('use_fp8', [True, False])
def test_m_grouped_contiguous_static_equals_prefetch(monkeypatch, use_fp8):
    """Equal full host-concrete groups (layout == repeat(arange(G), mpg))
    take the prefetch-free static path (gid = i // static_tpg in the index
    maps); it must be bitwise-equal to the scalar-prefetch kernel, for both
    the ids and the psum layout forms."""
    num_groups, rows, n, k = 4, 256, 256, 384
    m = num_groups * rows
    rng = np.random.RandomState(31)
    a = jnp.asarray(rng.randn(m, k).astype(np.float32), jnp.bfloat16)
    b = jnp.asarray(rng.randn(num_groups, n, k).astype(np.float32),
                    jnp.bfloat16)
    ids = jnp.asarray(np.repeat(np.arange(num_groups, dtype=np.int32), rows))
    ends = jnp.asarray(np.arange(1, num_groups + 1, dtype=np.int32) * rows)
    if use_fp8:
        aq = dg.per_token_cast_to_fp8(a, use_ue8m0=False)
        bvs, bss = zip(*[dg.per_block_cast_to_fp8(b[g], use_ue8m0=False)
                         for g in range(num_groups)])
        bq = (jnp.stack(bvs), jnp.stack(bss))
        run = lambda lay, psum: dg.m_grouped_fp8_gemm_nt_contiguous(
            aq, bq, grouped_layout=lay, use_psum_layout=psum)
    else:
        run = lambda lay, psum: dg.m_grouped_bf16_gemm_nt_contiguous(
            a, b, grouped_layout=lay, use_psum_layout=psum)
    d_static = run(ids, False)
    d_static_psum = run(ends, True)
    monkeypatch.setenv('DGT_GROUPED_FORCE_PREFETCH', '1')
    d_pf = run(ids, False)
    np.testing.assert_array_equal(np.asarray(d_static), np.asarray(d_pf))
    np.testing.assert_array_equal(np.asarray(d_static_psum), np.asarray(d_pf))

    from deepgemm_tpu.runtime.cache import kernel_cache
    assert any(getattr(s, 'static_tpg', None) for s in kernel_cache().specs()), \
        'equal-group layout did not take the static path'


@pytest.mark.parametrize('use_fp8', [True, False])
def test_m_grouped_contiguous_static_uneven_equals_prefetch(monkeypatch,
                                                            use_fp8):
    """UNEVEN host-concrete groups whose starts are block_m-aligned take the
    prefetch-free compare-chain path (static_tile_starts — VERDICT r3 #4;
    the r3 A/B proved the prefetch machinery itself costs ~4 TFLOPS). Must be
    bitwise-equal to the scalar-prefetch kernel for both layout forms, and
    with an ABSENT group (zero rows) in the middle."""
    num_groups, n, k = 4, 256, 384
    sizes = [128, 256, 0, 128]               # group 2 absent
    m = sum(sizes)
    rng = np.random.RandomState(41)
    a = jnp.asarray(rng.randn(m, k).astype(np.float32), jnp.bfloat16)
    b = jnp.asarray(rng.randn(num_groups, n, k).astype(np.float32),
                    jnp.bfloat16)
    ids = jnp.asarray(np.repeat(np.arange(num_groups, dtype=np.int32),
                                sizes))
    ends = jnp.asarray(np.cumsum(sizes).astype(np.int32))
    if use_fp8:
        aq = dg.per_token_cast_to_fp8(a, use_ue8m0=False)
        bvs, bss = zip(*[dg.per_block_cast_to_fp8(b[g], use_ue8m0=False)
                         for g in range(num_groups)])
        bq = (jnp.stack(bvs), jnp.stack(bss))
        run = lambda lay, psum: dg.m_grouped_fp8_gemm_nt_contiguous(
            aq, bq, grouped_layout=lay, use_psum_layout=psum)
    else:
        run = lambda lay, psum: dg.m_grouped_bf16_gemm_nt_contiguous(
            a, b, grouped_layout=lay, use_psum_layout=psum)
    d_static = run(ids, False)
    d_static_psum = run(ends, True)
    monkeypatch.setenv('DGT_GROUPED_FORCE_PREFETCH', '1')
    d_pf = run(ids, False)
    np.testing.assert_array_equal(np.asarray(d_static), np.asarray(d_pf))
    np.testing.assert_array_equal(np.asarray(d_static_psum), np.asarray(d_pf))

    from deepgemm_tpu.runtime.cache import kernel_cache
    assert any(getattr(s, 'static_tile_starts', None) is not None
               for s in kernel_cache().specs()), \
        'uneven aligned layout did not take the compare-chain static path'


def test_m_grouped_contiguous_numpy_layout_under_jit(monkeypatch):
    """A host-side NUMPY grouped_layout on the scalar-prefetch path, called
    inside a jit trace: compute_tile_gids indexes the layout with `starts`,
    which under jit is a STAGED constant (a tracer) — indexing a numpy array
    with it raised TracerArrayConversionError until round 4 (hit by the
    forced-prefetch A/B leg of scripts/r4_onchip_ab.py)."""
    import jax
    monkeypatch.setenv('DGT_GROUPED_FORCE_PREFETCH', '1')
    num_groups, n, k = 4, 256, 384
    sizes = [128, 256, 128, 128]
    m = sum(sizes)
    rng = np.random.RandomState(43)
    a = jnp.asarray(rng.randn(m, k).astype(np.float32), jnp.bfloat16)
    b = jnp.asarray(rng.randn(num_groups, n, k).astype(np.float32),
                    jnp.bfloat16)
    ids_np = np.repeat(np.arange(num_groups, dtype=np.int32), sizes)

    @jax.jit
    def run(a_, b_):
        return dg.m_grouped_bf16_gemm_nt_contiguous(
            a_, b_, grouped_layout=ids_np, use_psum_layout=False)

    d = run(a, b)
    ref = jnp.concatenate([
        (a[s - sz:s].astype(jnp.float32)
         @ b[g].astype(jnp.float32).T).astype(jnp.bfloat16)
        for g, (s, sz) in enumerate(zip(np.cumsum(sizes), sizes))])
    assert calc_diff(d, ref) < 1e-5


def test_m_grouped_contiguous_packed_sf_both_majors():
    """Packed-UE8M0 SF through the grouped ops for BOTH B majors — the
    reference's recipe engine handles every major
    (/root/reference/csrc/apis/layout.hpp:14-61); until round 4 the MN-major
    case raised NotImplementedError (ops/m_grouped.py). Packed K-major SF is
    [G, nsf, ceil(ksf/4)] (k packed along the LAST dim); packed MN-major SF
    is [G, ceil(ksf/4), nsf] (k packed along the LEADING SF dim) — each int32
    holds 4 consecutive k-granule exponents either way. Data quantized with
    po2 (UE8M0) scales so pack/unpack is exact: the packed runs must be
    BITWISE equal to the f32-SF runs."""
    from deepgemm_tpu.utils.math import pack_ue8m0_to_int
    num_groups, rows, n, k = 4, 128, 256, 384
    m = num_groups * rows
    rng = np.random.RandomState(7)
    a = jnp.asarray(rng.randn(m, k).astype(np.float32), jnp.bfloat16)
    b = jnp.asarray(rng.randn(num_groups, n, k).astype(np.float32) * 0.1,
                    jnp.bfloat16)
    ids = jnp.asarray(np.repeat(np.arange(num_groups, dtype=np.int32), rows))
    aq, asf = dg.per_token_cast_to_fp8(a, use_ue8m0=True)
    bvs, bss = zip(*[dg.per_block_cast_to_fp8(b[g], use_ue8m0=True)
                     for g in range(num_groups)])
    bq, bsf = jnp.stack(bvs), jnp.stack(bss)       # bsf [G, nsf, ksf]
    d_f32 = dg.m_grouped_fp8_gemm_nt_contiguous(
        (aq, asf), (bq, bsf), grouped_layout=ids)

    def _pack_k_last(sf):
        ksf = sf.shape[-1]
        pad = (-ksf) % 4
        if pad:
            sf = jnp.pad(sf, [(0, 0)] * (sf.ndim - 1) + [(0, pad)],
                         constant_values=1.0)
        return pack_ue8m0_to_int(sf.astype(jnp.float32))

    asf_p = _pack_k_last(asf)                      # [m, ksfp] int32
    bsf_p = _pack_k_last(bsf)                      # [G, nsf, ksfp] int32
    d_kmaj = dg.m_grouped_fp8_gemm_nt_contiguous(
        (aq, asf_p), (bq, bsf_p), grouped_layout=ids)
    np.testing.assert_array_equal(np.asarray(d_kmaj), np.asarray(d_f32))

    b_nn = bq.transpose(0, 2, 1)                   # [G, k, n]
    bsf_mn = bsf_p.transpose(0, 2, 1)              # [G, ksfp, nsf]
    d_mnmaj = dg.m_grouped_fp8_gemm_nn_contiguous(
        (aq, asf_p), (b_nn, bsf_mn), grouped_layout=ids)
    np.testing.assert_array_equal(np.asarray(d_mnmaj), np.asarray(d_f32))


@pytest.mark.parametrize('use_psum_layout', [False, True])
def test_bf16_contiguous_pallas_matches_ragged(monkeypatch, use_psum_layout):
    """BF16 contiguous routes through the (unscaled) Pallas kernel by default
    (measured 160.8 vs ragged_dot's 144.9 TFLOPS at the G8 bench shape);
    DGT_BF16_GROUPED=ragged pins the XLA delegation. Both must agree on the
    reference fixture — including its alignment-padding rows, which the
    generator zeroes in `a` so 0 @ B^T == 0 on either path."""
    num_groups, expected_m, n, k = 3, 200, 256, 384
    dg.set_mk_alignment_for_contiguous_layout(128)
    m, a, b, layout, ref_d = generate_m_grouped_contiguous(
        num_groups, expected_m, n, k, use_fp8=False,
        use_psum_layout=use_psum_layout)
    d_pal = dg.m_grouped_bf16_gemm_nt_contiguous(
        a, b, grouped_layout=layout, use_psum_layout=use_psum_layout)
    monkeypatch.setenv('DGT_BF16_GROUPED', 'ragged')
    d_rag = dg.m_grouped_bf16_gemm_nt_contiguous(
        a, b, grouped_layout=layout, use_psum_layout=use_psum_layout)
    assert calc_diff(d_pal, ref_d) < 1e-5
    assert calc_diff(d_rag, ref_d) < 1e-5
    assert calc_diff(d_pal, np.asarray(d_rag, np.float32)) < 1e-6
