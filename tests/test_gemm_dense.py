"""Dense GEMM golden tests (TPU analog of /root/reference/tests/test_bf16.py
and tests/test_fp8_fp4.py dense paths): FP32 reference matmul, quantized
inputs through the library's cast utils, cosine-diff thresholds matching the
reference (1e-3 FP8, tighter for BF16), and transpose-alias plumbing checks."""

import numpy as np
import jax.numpy as jnp
import pytest

import deepgemm_tpu as dg
from deepgemm_tpu.testing import calc_diff

from generators import generate_normal, f32


# Modest shapes (interpret mode on CPU); includes ragged n and odd k tails.
DENSE_SHAPES = [
    (128, 256, 384),
    (33, 128, 256),
    (256, 192, 320),     # n not a multiple of 128
    (64, 384, 200),      # k tail (k % 128 != 0)
]


@pytest.mark.parametrize('m,n,k', DENSE_SHAPES)
@pytest.mark.parametrize('accumulate', [False, True])
@pytest.mark.parametrize('out_dtype', [jnp.bfloat16, jnp.float32])
def test_bf16_gemm_nt(m, n, k, accumulate, out_dtype):
    a, b, c, ref_d = generate_normal(m, n, k, accumulate, out_dtype, use_fp8=False)
    d = dg.bf16_gemm_nt(a, b, d=jnp.zeros((), out_dtype), c=c)
    assert d.dtype == jnp.dtype(out_dtype)
    diff = calc_diff(d, ref_d)
    assert diff < 1e-5, f'{m=}, {n=}, {k=}, {accumulate=}, {diff=}'


def test_bf16_gemm_layout_aliases():
    m, n, k = 128, 256, 384
    a, b, _, ref_d = generate_normal(m, n, k, use_fp8=False)
    for name, args in {
        'nn': (a, b.T), 'tn': (a.T, b.T), 'tt': (a.T, b),
    }.items():
        d = getattr(dg, f'bf16_gemm_{name}')(*args)
        diff = calc_diff(d, ref_d)
        assert diff < 1e-5, f'{name}: {diff}'


@pytest.mark.parametrize('m,n,k', DENSE_SHAPES)
@pytest.mark.parametrize('use_ue8m0', [False, True])
def test_fp8_gemm_nt(m, n, k, use_ue8m0):
    a, b, c, ref_d = generate_normal(m, n, k, use_ue8m0=use_ue8m0)
    # mirror the reference: disable the UE8M0 cast iff inputs were quantized
    # without it (/root/reference/tests/test_fp8_fp4.py:42-43)
    d = dg.fp8_gemm_nt(a, b, disable_ue8m0_cast=not use_ue8m0)
    diff = calc_diff(d, ref_d)
    assert diff < 1e-3, f'{m=}, {n=}, {k=}, {use_ue8m0=}, {diff=}'


def test_fp8_gemm_layout_aliases():
    """Transpose plumbing, mirroring /root/reference/tests/test_fp8_fp4.py:45-55."""
    m, n, k = 128, 256, 384
    a, b, _, ref_d = generate_normal(m, n, k)
    cases = {
        'nn': (a, (b[0].T, b[1].T)),
        'tn': ((a[0].T, a[1].T), (b[0].T, b[1].T)),
        'tt': ((a[0].T, a[1].T), b),
    }
    for name, args in cases.items():
        d = getattr(dg, f'fp8_gemm_{name}')(*args, disable_ue8m0_cast=True)
        diff = calc_diff(d, ref_d)
        assert diff < 1e-3, f'{name}: {diff}'


@pytest.mark.parametrize('out_dtype', [jnp.float32, jnp.bfloat16])
def test_fp8_gemm_wgrad_recipe(out_dtype):
    """1D1D (both per-token) recipe with FP32 accumulation — the wgrad path
    (/root/reference/csrc/apis/gemm.hpp:328)."""
    m, n, k = 128, 256, 384
    a, b, c, ref_d = generate_normal(m, n, k, accumulate=True, out_dtype=out_dtype,
                                     b_pertoken=True)
    d = dg.fp8_gemm_nt(a, b, d=c, c=c, recipe=(1, 1, 128), disable_ue8m0_cast=True)
    diff = calc_diff(d, ref_d)
    assert diff < 1e-3, f'{diff=}'


def test_fp8_gemm_packed_ue8m0_sf():
    """Packed int32 UE8M0 scales are unpacked by the layout transform
    (analog of SM100 packed-SF handling, /root/reference/csrc/apis/layout.hpp:27-43)."""
    m, n, k = 128, 256, 512
    a = jnp.asarray(np.random.randn(m, k).astype(np.float32), dtype=jnp.bfloat16)
    b = jnp.asarray(np.random.randn(n, k).astype(np.float32), dtype=jnp.bfloat16)
    ref_d = np.asarray(jnp.asarray(f32(a) @ f32(b).T).astype(jnp.bfloat16))
    a_q = dg.per_token_cast_to_fp8(a, use_ue8m0=True, use_packed_ue8m0=True)
    b_q = dg.per_token_cast_to_fp8(b, use_ue8m0=True, use_packed_ue8m0=True)
    assert a_q[1].dtype == jnp.int32
    d = dg.fp8_gemm_nt(a_q, b_q, recipe=(1, 1, 128))
    assert calc_diff(d, ref_d) < 1e-3


def test_fp8_fp4_gemm_nt():
    """FP8 activations x packed-FP4 weights (the reference's SM100 FP8xFP4
    path, csrc/apis/gemm.hpp fp8_fp4_* with kPackedFP4 int8 operands).
    The packed int8 B is decoded to exact bf16 in the ops layer; UE8M0
    scales make the dequant fold exact."""
    rng = np.random.RandomState(11)
    m, n, k = 64, 128, 256
    a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    b = jnp.asarray(rng.randn(n, k), jnp.bfloat16)
    aq, asf = dg.per_token_cast_to_fp8(a, use_ue8m0=True)
    bq, bsf = dg.per_token_cast_to_fp4(b, use_ue8m0=True, gran_k=32)
    assert bq.dtype == jnp.int8 and bq.shape == (n, k // 2)

    d = dg.fp8_fp4_gemm_nt((aq, asf), (bq, bsf))   # default FP4 recipes
    # quantized oracle (exact: po2 scales)
    a_deq = f32(aq) * np.repeat(np.asarray(asf), 128, axis=1)[:, :k]
    b_deq = np.asarray(dg.cast_back_from_fp4(bq, bsf, gran_k=32))
    qref = a_deq @ b_deq.T
    assert calc_diff(d, qref) < 1e-4
    # and within FP4 tolerance of the unquantized reference
    # (/root/reference/tests/generators.py:65-70 uses 0.01-0.02 with FP4)
    ref = f32(a) @ f32(b).T
    assert calc_diff(d, ref) < 2e-2

    # explicit recipes give the same result
    d2 = dg.fp8_fp4_gemm_nt((aq, asf), (bq, bsf),
                            recipe_a=(1, 128), recipe_b=(1, 32))
    np.testing.assert_array_equal(np.asarray(d), np.asarray(d2))


def test_fp8_fp4_gemm_default_gran_from_sf_shape():
    """Quantizing with the library-default gran_k=128 and calling the GEMM
    with NO recipe must work: the fold granularity is derived from the SF
    width (ADVICE r1: quantizer default 128 vs GEMM default 32 disagreed)."""
    rng = np.random.RandomState(13)
    m, n, k = 64, 128, 256
    a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    b = jnp.asarray(rng.randn(n, k), jnp.bfloat16)
    aq, asf = dg.per_token_cast_to_fp8(a, use_ue8m0=True)
    for gran in (128, 32):
        bq, bsf = dg.per_token_cast_to_fp4(b, use_ue8m0=True, gran_k=gran)
        d = dg.fp8_fp4_gemm_nt((aq, asf), (bq, bsf))     # no recipe at all
        d2 = dg.fp8_fp4_gemm_nt((aq, asf), (bq, bsf),
                                recipe_a=(1, 128), recipe_b=(1, gran))
        np.testing.assert_array_equal(np.asarray(d), np.asarray(d2))


def test_fp8_fp4_gemm_planar_in_kernel():
    """Planar-128-packed FP4 B decoded IN-KERNEL must match the ops-layer
    decode path bit-for-bit at (1, 128) scales (both end in the exact f32
    promote epilogue on identical decoded values)."""
    rng = np.random.RandomState(12)
    m, n, k = 64, 128, 512
    a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    b = jnp.asarray(rng.randn(n, k), jnp.bfloat16)
    aq, asf = dg.per_token_cast_to_fp8(a, use_ue8m0=False)
    bq, bsf = dg.per_token_cast_to_fp4(b, use_ue8m0=False, gran_k=128)

    planar = dg.repack_fp4_to_planar(bq)
    d_planar = dg.fp8_fp4_gemm_nt((aq, asf), (planar, bsf),
                                  recipe_a=(1, 128), recipe_b=(1, 128),
                                  fp4_layout='planar_in_kernel')
    # oracle
    b_deq = np.asarray(dg.cast_back_from_fp4(bq, bsf, gran_k=128))
    a_deq = f32(aq) * np.repeat(np.asarray(asf), 128, axis=1)[:, :k]
    qref = a_deq @ b_deq.T
    assert calc_diff(d_planar, qref) < 1e-4
    # planar pack round-trips
    codes = dg.unpack_fp4_planar(planar)
    from deepgemm_tpu.utils.math import unpack_fp4_codes
    np.testing.assert_array_equal(np.asarray(codes),
                                  np.asarray(unpack_fp4_codes(bq)))
    # the forced FOLD route on the same planar data is bitwise-identical to
    # handing the interleaved codes straight to the fold path
    d_fold = dg.fp8_fp4_gemm_nt((aq, asf), (planar, bsf),
                                recipe_a=(1, 128), recipe_b=(1, 128),
                                fp4_layout='planar_fold')
    d_interleaved = dg.fp8_fp4_gemm_nt((aq, asf), (bq, bsf),
                                       recipe_a=(1, 128), recipe_b=(1, 128))
    np.testing.assert_array_equal(np.asarray(d_fold),
                                  np.asarray(d_interleaved))


def test_fp4_inkernel_arch_policy():
    """The in-kernel-vs-fold FP4 strategy is a per-arch roofline (VERDICT r2
    missing #5): in-kernel only wins the HBM-bound small-m decode regime."""
    from deepgemm_tpu.heuristics.arch import get_arch, fp4_inkernel_profitable
    v5e = get_arch('v5e')
    assert fp4_inkernel_profitable(v5e, 1, 7168, 2048)       # GEMV decode
    assert fp4_inkernel_profitable(v5e, 16, 7168, 2048)
    assert not fp4_inkernel_profitable(v5e, 4096, 7168, 2048)  # compute-bound
    assert not fp4_inkernel_profitable(v5e, 512, 4096, 4096)
    # crossover scales with the decode-rate column, not a module constant:
    # m=32 flips between generations (v5e crossover ~21, v6e ~50)
    v6e = get_arch('v6e')
    assert not fp4_inkernel_profitable(v5e, 32, 7168, 2048)
    assert fp4_inkernel_profitable(v6e, 32, 7168, 2048)


def test_fp8_gemm_exact_f32_scales_default_flags():
    """REGRESSION (found on real TPU): non-power-of-two f32 scales with
    DEFAULT kwargs must be applied exactly — the SM90-style contract
    (/root/reference/csrc/apis/layout.hpp f32 rows). The old behavior
    ceil-rounded scales to UE8M0 (an SM100 *hardware* requirement) while the
    data was quantized with the unrounded scales, inflating every block by up
    to 2x (observed calc_diff 0.27)."""
    m, n, k = 128, 256, 512
    a, b, _, ref_d = generate_normal(m, n, k, use_ue8m0=False)
    dg.kernel_cache().clear()   # isolate this call's spec
    d = dg.fp8_gemm_nt(a, b)                      # default flags
    assert calc_diff(d, ref_d) < 1e-3
    # and the ops layer must route these to the exact 'promote' strategy
    from deepgemm_tpu.kernels.dense import DenseGemmSpec
    specs = [s for s in dg.kernel_cache()._cache
             if isinstance(s, DenseGemmSpec) and s.is_scaled
             and (s.m, s.n, s.k) == (m, n, k)]
    assert specs and all(s.cfg.scale_strategy == 'promote' for s in specs)


@pytest.mark.parametrize('m,n,k', [(128, 256, 384), (64, 384, 200),
                                   (33, 128, 256)])
@pytest.mark.parametrize('scaled', [False, True])
def test_dense_swap_ab_bitwise(m, n, k, scaled):
    """The swap-AB kernel body (weights as the MXU LHS + one final
    transpose; reference analog sm100.hpp:31-43 mandatory swap-AB layouts)
    is BITWISE-equal to the plain kernel: each output element is the same
    dot with the same accumulation and scale-multiply order (see
    common.promote_block_swapped)."""
    from deepgemm_tpu.kernels.dense import dense_gemm
    rng = np.random.RandomState(23)
    a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    b = jnp.asarray(rng.randn(n, k), jnp.bfloat16)
    if scaled:
        aq, asf = dg.per_token_cast_to_fp8(a, use_ue8m0=False)
        bq, bsf = dg.per_token_cast_to_fp8(b, use_ue8m0=False)
        args = dict(sfa=asf, sfb_t=bsf.T, gran_k_a=128, gran_k_b=128)
        a_in, b_in = aq, bq
    else:
        args, (a_in, b_in) = {}, (a, b)
    d_plain = dense_gemm(a_in, b_in, swap_ab=False, **args)
    d_swap = dense_gemm(a_in, b_in, swap_ab=True, **args)
    np.testing.assert_array_equal(np.asarray(d_plain), np.asarray(d_swap))


def test_dense_swap_ab_bitwise_multistep_accumulate():
    """swap-AB with gk > 1 (acc scratch lives transposed) + c accumulate."""
    from deepgemm_tpu.heuristics.configs import GemmConfig
    from deepgemm_tpu.kernels.dense import dense_gemm
    rng = np.random.RandomState(29)
    m, n, k = 64, 128, 512
    a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    b = jnp.asarray(rng.randn(n, k), jnp.bfloat16)
    c = jnp.asarray(rng.randn(m, n), jnp.float32)
    aq, asf = dg.per_token_cast_to_fp8(a, use_ue8m0=False)
    bq, bsf = dg.per_token_cast_to_fp8(b, use_ue8m0=False)
    cfg = GemmConfig(block_m=64, block_n=128, block_k=256)  # gk = 2
    outs = [dense_gemm(aq, bq, sfa=asf, sfb_t=bsf.T, c=c, out_dtype=jnp.float32,
                       swap_ab=s, cfg=cfg) for s in (False, True)]
    np.testing.assert_array_equal(np.asarray(outs[0]), np.asarray(outs[1]))


def test_gemm_early_return():
    """k == 0 early-return semantics (/root/reference/csrc/apis/gemm.hpp:19-46)."""
    a = jnp.zeros((16, 0), jnp.bfloat16)
    b = jnp.zeros((32, 0), jnp.bfloat16)
    c = jnp.asarray(np.random.randn(16, 32).astype(np.float32)).astype(jnp.bfloat16)
    d = dg.bf16_gemm_nt(a, b, d=c, c=c)
    np.testing.assert_array_equal(np.asarray(d), np.asarray(c))
    d0 = dg.bf16_gemm_nt(a, b)
    assert not np.asarray(d0).any()


def test_kernel_cache_reuse():
    """Same spec -> same compiled kernel object (traced-kernel cache, the
    analog of /root/reference/csrc/jit/cache.hpp:11-29)."""
    before = len(dg.kernel_cache())
    a, b, _, _ = generate_normal(128, 256, 384, use_fp8=False)
    dg.bf16_gemm_nt(a, b)
    mid = len(dg.kernel_cache())
    dg.bf16_gemm_nt(a, b)
    assert len(dg.kernel_cache()) == mid >= before


def test_fp8_gemm_fp64_emulation_oracle():
    """North-star numerics gate (BASELINE.json): the kernel must match an
    FP64 emulation oracle that applies the SAME per-block scale rounding —
    dequantize the exact fp8 codes and f32 scales into float64, accumulate
    in float64. The only remaining differences are the kernel's f32
    accumulation and bf16 output rounding."""
    rng = np.random.RandomState(17)
    m, n, k = 128, 256, 512
    a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    b = jnp.asarray(rng.randn(n, k), jnp.bfloat16)
    aq, asf = dg.per_token_cast_to_fp8(a, use_ue8m0=False)
    bq, bsf = dg.per_block_cast_to_fp8(b, use_ue8m0=False)

    d = np.asarray(dg.fp8_gemm_nt((aq, asf), (bq, bsf)), np.float64)

    # float64 emulation with identical scale layout
    a64 = np.asarray(aq, np.float64) * np.repeat(
        np.asarray(asf, np.float64), 128, axis=1)[:, :k]
    b64 = np.asarray(bq, np.float64) * np.repeat(np.repeat(
        np.asarray(bsf, np.float64), 128, axis=0), 128, axis=1)[:n, :k]
    ref64 = a64 @ b64.T

    # error budget: f32 accumulation of k=512 terms + bf16 output rounding
    rel = np.abs(d - ref64) / np.maximum(np.abs(ref64), 1.0)
    assert rel.max() < 2 ** -7, rel.max()        # within bf16 ulp
    assert calc_diff(d, ref64.astype(np.float32)) < 5e-6


def test_fp8_fp4_gemm_ambiguous_packed_gran_raises():
    """Packed int32 UE8M0 SFs at small k are ambiguous (ceil(ceil(k/g)/4)
    collides for g in {128, 64} at k=256); silently guessing 128 mis-scales
    every block when the data was quantized at 64 (ADVICE r2) — the GEMM must
    demand an explicit recipe instead."""
    rng = np.random.RandomState(19)
    m, n, k = 64, 128, 256
    a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    b = jnp.asarray(rng.randn(n, k), jnp.bfloat16)
    aq, asf = dg.per_token_cast_to_fp8(a, use_ue8m0=True)
    bq, bsf = dg.per_token_cast_to_fp4(b, use_ue8m0=True, gran_k=64,
                                       use_packed_ue8m0=True)
    assert bsf.dtype == jnp.int32
    with pytest.raises(ValueError, match='ambiguous'):
        dg.fp8_fp4_gemm_nt((aq, asf), (bq, bsf))      # no recipe
    # explicit recipe still works
    d = dg.fp8_fp4_gemm_nt((aq, asf), (bq, bsf), recipe_a=(1, 128),
                           recipe_b=(1, 64))
    ref = f32(a) @ f32(b).T
    assert calc_diff(d, ref) < 2e-2
