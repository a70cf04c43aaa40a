"""Tile-config heuristics for Pallas GEMM kernels.

TPU analog of the reference's GemmDesc/ArchSpec config search
(/root/reference/csrc/jit_kernels/heuristics/common.hpp:13-52,
sm90.hpp:13-244, sm100.hpp:14-267). Instead of smem stages / cluster dims, we
choose Pallas (block_m, block_n, block_k) tiles under a VMEM budget, shaped by
the MXU (128x128 systolic array) and the dtype-dependent min sublane tile.
"""

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

from ..utils.math import align, ceil_div

# Per-core VMEM budget in bytes (of ~16 MiB, the rest is reserved for
# Mosaic's own bookkeeping). 12.5 MiB validated on v5e with the
# (256, 1024, 4096) fp8 tile; (512, 1024, 4096) at ~16.5 MiB overflows.
VMEM_BUDGET = 12 * 1024 * 1024 + 512 * 1024
# NOTE (swept, then reverted): a single-k-step (128, 1024, 7168) fp8 tile at
# a 16.75 MiB estimate measured 163.6 vs 155 TFLOPS for the 2-step split, but
# compilation at that margin is FLAKY (the same config compiled in one
# harness and OOM'd in another once the stepped SF operands were live).
# Stay within VMEM_BUDGET; revisit if Mosaic exposes real occupancy.

MXU_DIM = 128

# Min sublane counts per dtype (lane dim is always 128)
_MIN_SUBLANES = {1: 32, 2: 16, 4: 8}


@dataclasses.dataclass(frozen=True)
class GemmConfig:
    block_m: int
    block_n: int
    block_k: int
    # 'promote': per-gran_k-block f32 promotion epilogue (exact FP8 semantics,
    #   matches /root/reference/deep_gemm/include/deep_gemm/impls/sm90_fp8_gemm_1d2d.cuh:332-347)
    # 'dequant': scale operands into bf16 before one big MXU pass (used for
    #   sub-128 scale granularities, e.g. FP4 (1,32) recipes)
    scale_strategy: str = 'promote'

    @property
    def grid_shape(self):
        return None


def _dtype_bytes(dtype) -> int:
    return jnp.dtype(dtype).itemsize


def _pick_block(dim: int, preferred: int, quantum: int) -> int:
    """Largest block <= preferred that is a multiple of `quantum`, covering
    `dim` without excessive padding."""
    if dim <= quantum:
        return quantum
    if dim <= preferred:
        return align(dim, quantum)
    return preferred


def _equal_split_bk(k_full: int, fit: int, k_quantum: int) -> int:
    """Fewest EQUAL k steps that fit — a non-dividing bk leaves a ragged
    (masked) final step that wrecks the pipeline (measured 110 vs 176 TFLOPS
    at 4096^3 with bk=3072)."""
    if fit >= k_full:
        return k_full
    steps = ceil_div(k_full, fit)
    block_k = align(ceil_div(k_full, steps), k_quantum)
    while block_k > fit:
        steps += 1
        block_k = align(ceil_div(k_full, steps), k_quantum)
    return block_k


def modeled_time_s(m: int, n: int, k_full: int, bm: int, bn: int, bk: int,
                   a_bytes: int, b_bytes: int, out_bytes: int, arch,
                   accum_read: bool = False) -> float:
    """Analytic per-candidate time model — the TPU analog of the reference's
    L1/L2-bandwidth cycle model (/root/reference/csrc/jit_kernels/heuristics/
    sm90.hpp:118-244, common.hpp:13-52). Models the three real costs:

      * HBM traffic: A is streamed once per n-tile column, B once per m-tile
        row, the output written once (plus an accumulator read when
        ``accum_read``) — this is the term that predicts the wgrad shape's
        HBM-boundness (94 TFLOPS measured vs ~120 kernel-only);
      * MXU time at the arch's (fp8-aware) peak over padded FLOPs;
      * per-grid-step pipeline overhead (``arch.step_overhead_s``,
        calibrated from the v5e bk sweep).
    """
    t_hbm, t_mxu, t_steps = modeled_components_s(
        m, n, k_full, bm, bn, bk, a_bytes, b_bytes, out_bytes, arch,
        accum_read=accum_read)
    return max(t_hbm, t_mxu) + t_steps


def modeled_components_s(m: int, n: int, k_full: int, bm: int, bn: int,
                         bk: int, a_bytes: int, b_bytes: int, out_bytes: int,
                         arch, accum_read: bool = False,
                         num_groups: int = 1):
    """(t_hbm, t_mxu, t_step_overhead) breakdown of :func:`modeled_time_s`.
    ``num_groups`` scales the output (and accumulator-read) traffic for
    k-grouped shapes, where each group writes its own (m, n) FP32 block."""
    gm, gn, gk = ceil_div(m, bm), ceil_div(n, bn), ceil_div(k_full, bk)
    m_pad, n_pad = gm * bm, gn * bn
    a_traffic = gn * m_pad * k_full * a_bytes
    b_traffic = gm * n_pad * k_full * b_bytes
    out_traffic = num_groups * m_pad * n_pad * out_bytes \
        * (2 if accum_read else 1)
    t_hbm = (a_traffic + b_traffic + out_traffic) / (arch.hbm_gbps * 1e9)
    peak = arch.bf16_tflops * 1e12
    if max(a_bytes, b_bytes) == 1 and not arch.fp8_direct:
        peak *= 0.5                     # fp8 upcast path halves the MXU rate
    t_mxu = 2.0 * m_pad * n_pad * k_full / peak
    return t_hbm, t_mxu, gm * gn * gk * arch.step_overhead_s


def get_dual_b_config(m: int, n: int, k: int, a_dtype, b_dtype, out_dtype,
                      gran_k: int = 128, straddle_tiles: int = 0,
                      arch=None) -> GemmConfig:
    """Tile pick for the DUAL-B straddle contiguous kernel (r5 align128
    path): bm is pinned to 256 and the B operand is resident TWICE (top-
    and bottom-half group), so the VMEM model doubles the B term and keeps
    an extra 2.5 MiB safety margin — the plain-budget (256, 256, 7168)
    single-step pick RESOURCE_EXHAUSTED on real Mosaic (chipless AOT r5).

    Ranking is by the dual-B traffic model (B restreams scaled by the
    straddle fraction), NOT the dense lexicographic rules alone: the
    single-k-step preference would pick bn=128, which re-inflates A
    restreams (gn = n/128 passes) past everything the taller tiles save.
    Ties fall back to the measured scaled-path order (gk, -bm, -bn)."""
    from .arch import detect_arch
    arch = arch or detect_arch()
    a_bytes, b_bytes = _dtype_bytes(a_dtype), _dtype_bytes(b_dtype)
    out_bytes = _dtype_bytes(out_dtype)
    bm = 256
    budget = arch.vmem_budget - (5 * 1024 * 1024) // 2   # 2.5 MiB margin
    k_quantum = max(gran_k, MXU_DIM) if gran_k >= MXU_DIM else MXU_DIM
    k_full = align(k, k_quantum)
    gm = ceil_div(m, bm)

    cands = []
    for bn in (1024, 512, 256, MXU_DIM):
        if bn > align(n, MXU_DIM):
            continue
        fixed = bm * bn * 4 + bm * bn * out_bytes * 2
        per_k = (bm * a_bytes + 2 * bn * b_bytes) * 2
        fit = (budget - fixed) // per_k if budget > fixed else 0
        fit = min(k_full, fit // k_quantum * k_quantum)
        if fit < k_quantum:
            continue
        cands.append((bm, bn, _equal_split_bk(k_full, fit, k_quantum)))
    if not cands:
        cands = [(bm, MXU_DIM, k_quantum)]

    def dual_time(c):
        _, bn, bk = c
        gn, gk = ceil_div(n, bn), ceil_div(k_full, bk)
        n_pad = gn * bn
        a_traffic = gn * gm * bm * k_full * a_bytes
        b_traffic = gm * n_pad * k_full * b_bytes \
            * (1.0 + straddle_tiles / max(gm, 1))
        out_traffic = gm * bm * n_pad * out_bytes
        t_hbm = (a_traffic + b_traffic + out_traffic) / (arch.hbm_gbps * 1e9)
        peak = arch.bf16_tflops * 1e12
        if max(a_bytes, b_bytes) == 1 and not arch.fp8_direct:
            peak *= 0.5
        t_mxu = 2.0 * gm * bm * n_pad * k_full / peak
        return max(t_hbm, t_mxu) + gm * gn * gk * arch.step_overhead_s

    times = {c: dual_time(c) for c in cands}
    t_min = min(times.values())

    def score(c):
        _, bn, bk = c
        gn, gk = ceil_div(n, bn), ceil_div(k_full, bk)
        waste = (gm * bm) * (gn * bn) / float(m * n) - 1.0
        return (int((times[c] / t_min - 1.0) * 8), int(waste * 8),
                gk, -bn)

    bm, bn, bk = min(cands, key=score)
    return GemmConfig(block_m=bm, block_n=bn, block_k=bk,
                      scale_strategy='promote')


def get_gemm_config(m: int, n: int, k: int,
                    a_dtype, b_dtype, out_dtype,
                    gran_k: int = 128,
                    num_groups: int = 1,
                    is_grouped_m: bool = False,
                    mk_alignment: int = 128,
                    scale_strategy: Optional[str] = None,
                    arch=None) -> GemmConfig:
    """Pick Pallas tile sizes for a (possibly grouped) NT GEMM by candidate
    enumeration + lexicographic scoring — the TPU analog of the reference's
    layout search (/root/reference/csrc/jit_kernels/heuristics/common.hpp:13-52
    enumerate, sm100.hpp:241-266 lexicographic comparator). Per-generation
    constants come from :mod:`deepgemm_tpu.heuristics.arch`.

    Scoring (v5e-measured; all at G8-scale 8192x4096x7168 fp8 promote unless
    noted):
      1. least padded FLOPs (tail utilization — ref `get_num_waves` analog);
      2. [scaled paths] fewest k steps: a SINGLE full-depth k block dominates
         everything else — (256, 512, 7168) = 175.7 TFLOPS vs the 2-step
         (256, 1024, 3584) = 161.3, because each extra k step re-reads and
         re-writes the f32 accumulator;
      3. widest block_n that satisfies 1-2 (A-operand re-reads scale with
         n / block_n): 4096^3 keeps (256, 1024, 4096) at 176.3;
      4. tallest block_m up to 256 ((256,512,7168) 175.7 > (128,.) 172.9 >
         (384,.) 171.7; 512 regressed).
    BF16 / dequant paths keep the round-1 bn-first order (the single-step
    preference was measured on the promote epilogue only).
    """
    from .arch import detect_arch
    arch = arch or detect_arch()
    a_bytes, b_bytes = _dtype_bytes(a_dtype), _dtype_bytes(b_dtype)
    out_bytes = _dtype_bytes(out_dtype)
    is_scaled = scale_strategy is not None
    min_sub = arch.min_sublanes[a_bytes]
    budget = arch.vmem_budget

    # k blocks are multiples of the scale granularity so each in-kernel
    # promotion step covers whole scale blocks.
    k_quantum = max(gran_k, MXU_DIM) if gran_k >= MXU_DIM else MXU_DIM
    k_full = align(k, k_quantum)

    def max_bk(bm, bn):
        fixed = bm * bn * 4 + bm * bn * out_bytes * 2
        per_k = (bm * a_bytes + bn * b_bytes) * 2
        fit = (budget - fixed) // per_k if budget > fixed else 0
        return min(k_full, max(fit // k_quantum * k_quantum, 0))

    # --- candidate enumeration -------------------------------------------
    if is_grouped_m:
        # Each m-tile must lie entirely inside one group: pin block_m to the
        # group start alignment (or a divisor of it).
        bm_cands = [min(mk_alignment, 512)]
    else:
        cap = align(m, min_sub)
        bm_cands = sorted({min(c, cap) for c in (256, 128, 64, min_sub)},
                          reverse=True)
    # Small-m full-n tile: the r5 isolated sweep (measure_small_m) read
    # (128,4096,1024) = 149.3 vs the gk=1 pick's 138.1 TFLOPS, but the
    # BENCH-form leg measured the OPPOSITE order (148.1 vs 151.9) — the
    # two harnesses disagree by more than either delta (the sweep's
    # kernel-layer call vs the bench's ops-layer call at the same tiles:
    # 138.1 vs 151.9 for the SAME config). Until that discrepancy is
    # resolved the shipping default keeps the single-k-step pick;
    # DGT_DENSE_SMALLM_FULLN=1 pins the sweep's winner.
    import os as _os
    small_m = (m <= MXU_DIM and is_scaled and not is_grouped_m
               and _os.environ.get('DGT_DENSE_SMALLM_FULLN') == '1')
    if n % MXU_DIM == 0:
        bn_cands = [c for c in (1024, 512, 256, MXU_DIM)
                    if c <= align(n, MXU_DIM)] or [MXU_DIM]
    else:
        # Ragged n: whole dim (Mosaic lane rule) or a 128-aligned padded
        # block; the aligned fallbacks keep VMEM-constrained cases legal.
        bn_cands = [n] + [c for c in (1024, 512, 256, MXU_DIM)
                          if c <= align(n, MXU_DIM)]
    if small_m and align(n, MXU_DIM) not in bn_cands:
        # decode-GEMM regime (m <= 128): the FULL-n tile measured best on
        # chip — (128, 4096, 1024) = 149.3 TFLOPS vs the gk=1 (128, 512,
        # 7168) pick's 138.1 (scripts/measure_small_m.py, r5); at one m
        # tile the k-split costs less than the n-split's per-step promote
        # exposure, and the unscaled ceiling at this shape is 149.8 — the
        # epilogue is fully hidden at this tile.
        bn_cands.insert(0, align(n, MXU_DIM))

    cands = []
    for bm in bm_cands:
        for bn in bn_cands:
            fit = max_bk(bm, bn)
            if fit < k_quantum:
                continue
            bk = _equal_split_bk(k_full, fit, k_quantum)
            cands.append((bm, bn, bk))
    if not cands:
        # Nothing fits even shallow: smallest tile, one k quantum.
        cands = [(min(bm_cands), MXU_DIM, k_quantum)]

    # Modeled time per candidate (the sm90.hpp traffic-model analog): on
    # compute-bound shapes every candidate lands in the same 12.5% bucket and
    # the measured lexicographic rules decide; on HBM-bound shapes (wgrad)
    # the traffic term dominates and picks the restream-minimizing tiles.
    times = {c: modeled_time_s(m, n, k_full, *c, a_bytes, b_bytes, out_bytes,
                               arch) for c in cands}
    t_min = min(times.values())

    def score(c):
        bm, bn, bk = c
        gm, gn, gk = ceil_div(m, bm), ceil_div(n, bn), ceil_div(k_full, bk)
        time_bucket = int((times[c] / t_min - 1.0) * 8)
        # Tail utilization in coarse 12.5% buckets (ref `get_num_waves` /
        # last-wave-util analog): a few percent of padding must not override
        # the step-count and block-width terms.
        waste = (gm * bm) * (gn * bn) / float(m * n) - 1.0
        waste_bucket = int(waste * 8)
        if small_m:
            # m <= 128 scaled dense: fewest n tiles first (the full-n
            # candidate above), THEN fewest k steps — the measured decode
            # order (149.3 > 145.3 > 142.1 > 138.1 is gn 1 < 16 < 4 < 8
            # only under gn-first ranking).
            return (time_bucket, waste_bucket, gn, gk, -bm)
        if is_scaled:
            # bm before bn: (256,256,8192) measured 180.8 vs (128,512,8192)
            # peers and (256,1024,4096) at 177.0 on the 4096x7168x8192 wgrad
            # shape; (256,512,7168) 175.7 > (128,512,7168) 172.9.
            return (time_bucket, waste_bucket, gk, -bm, -bn)
        return (time_bucket, waste_bucket, -bn, gk, -bm)

    block_m, block_n, block_k = min(cands, key=score)

    if scale_strategy is None:
        scale_strategy = 'promote'
    return GemmConfig(block_m=block_m, block_n=block_n, block_k=block_k,
                      scale_strategy=scale_strategy)
