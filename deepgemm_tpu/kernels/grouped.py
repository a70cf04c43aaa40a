"""Grouped GEMM Pallas kernels for MoE:

  * m-grouped contiguous (prefill): rows of ``a`` are the concatenation of
    per-expert token blocks, each padded to the mk alignment; ``b`` holds one
    weight matrix per expert. TPU re-design of the reference contiguous
    scheduler (/root/reference/deep_gemm/include/deep_gemm/scheduler/gemm.cuh:160-162),
    where the device reads ``grouped_layout[m_block * BLOCK_M]`` to pick the B
    group. Here the per-m-tile group ids are computed on device by the API
    layer (a few jnp ops) and fed as a scalar-prefetch array that BlockSpec
    index maps consume — the Pallas analog of the persistent scheduler.

  * m-grouped masked (decode): A/B/D are ``[G, max_m, .]``; ``masked_m[g]`` is
    read on-core only, so the host never syncs on it — the TPU analog of the
    reference's CUDA-graph-safe masked kernel
    (/root/reference/deep_gemm/include/deep_gemm/scheduler/gemm.cuh:200-216).

Scale handling matches kernels/dense.py (f32 promotion per scale block).
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..heuristics.configs import GemmConfig, get_gemm_config
from ..runtime.cache import kernel_cache
from ..runtime.config import is_cpu_backend, runtime
from ..utils.math import align, ceil_div
from .common import (dot_mn, k_slice, mask_k_tail, promote_block,
                     promote_block_swapped)
from .dense import pad_sf_k, sf_to_stepped


@dataclasses.dataclass(frozen=True)
class GroupedGemmSpec:
    kind: str            # 'contiguous' | 'masked'
    num_groups: int
    m: int               # total m (contiguous) or max_m (masked)
    n: int
    k: int
    b_kmajor: bool
    a_dtype: str
    b_dtype: str
    out_dtype: str
    is_scaled: bool
    gran_k_a: int
    gran_k_b: int
    zero_padded_rows: bool   # epilogue zeroing of group-padding rows
    cfg: GemmConfig
    # Static equal-group fast path (contiguous only): when the layout is
    # host-concrete and exactly ``repeat(arange(G), rows_per_group)`` (equal
    # full groups — the standard balanced-prefill case), the per-m-tile group
    # id is plain index arithmetic ``i // static_tpg`` and the kernel builds
    # WITHOUT scalar-prefetch operands (prefetch-dependent index maps carry
    # measurable per-step overhead — the align-128 gap, CLAUDE.md).
    static_tpg: Optional[int] = None   # m-tiles per group
    # Static UNEVEN-group fast path (contiguous only): host-concrete layout
    # whose group starts are all block_m-aligned but NOT equal-sized (the
    # align-128 serving layouts). The per-m-tile group id is then a pure
    # compare-chain over the host-constant group-boundary TILE indices:
    # gid(i) = sum_g [i >= tile_starts[g]] — index arithmetic, so the kernel
    # builds WITHOUT scalar-prefetch operands (the prefetch machinery itself
    # measured ~4 TFLOPS at the bench shape: 175.0 static vs 170.4 forced-
    # prefetch, same kernel/tiles — VERDICT r3 #4 / scheduler/gemm.cuh:160).
    static_tile_starts: Optional[tuple] = None  # boundary tile idx, g=1..G-1
    # Masked only: drop the per-m-tile early-exit predicate. Legal for ANY
    # masked_m (rows >= masked_m[g] are "not meaningful" per the contract —
    # the predicate only SKIPS work, never changes meaningful rows); chosen
    # when the caller's expected_m hint says tiles are ~always active, where
    # the predicate saves nothing but sits in Mosaic's pipeline.
    no_early_exit: bool = False
    # Masked only: LOW-occupancy variant — masked_m becomes a scalar-
    # prefetch operand and the a/b/SF index maps CLAMP inactive m-tiles'
    # block indices to a constant, so Mosaic's revisit-dedup skips their
    # DMAs. The plain early-exit only skips the MXU body; the operand
    # streaming still runs for every grid step, and B traffic dominates the
    # decode regime (measured: expected_m = max_m/4 at the bench shape read
    # 23 TFLOPS effective — the full-B-restream bound — vs the XLA full-
    # batch einsum's 43). The reference's masked scheduler skips whole
    # blocks the same way (scheduler/gemm.cuh:200-216). Correct for ANY
    # masked_m; chosen on the expected_m hint only.
    pf_skip: bool = False
    # DUAL-B straddle path (contiguous only; r5 align128 fix): bm=256 tiles
    # over a 128-aligned-but-not-256-aligned host-concrete uneven layout.
    # The bm=128 grid's B restreams are the measured align128 bound (each
    # m-tile row streams every B block once: 64 passes at the bench layout);
    # bm=256 halves them, but a 256-tall tile can STRADDLE a 128-aligned
    # group boundary. Fix: B rides as TWO operands — B_top indexed by the
    # tile's top-half group, B_bot by a chain that only CHANGES on straddle
    # tiles (elsewhere frozen at the last straddle's group, plus j/s clamped
    # to 0, so Mosaic's revisit-dedup skips its DMAs entirely — the pf-skip
    # trick). Straddle tiles compute two 128-tall half dots; others one
    # 256-tall dot. Bitwise vs the bm=128 static path at equal block_k
    # (rows are independent in dot_general; the promote chain is row-local).
    # Value: the group start rows (host constants), len G, starts[0] == 0.
    dual_b_row_starts: Optional[tuple] = None
    # Swap-AB kernel body (the reference's MANDATORY layout for m-grouped
    # GEMMs, /root/reference/csrc/jit_kernels/heuristics/sm100.hpp:31-43):
    # per-tile dots run ``b_blk @ a_blk^T`` so the weight side is the MXU
    # LHS (sublane-tall) while the group-alignment-pinned token side rides
    # the 128 lanes; one f32 transpose per output tile restores (bm, bn).
    # Same tiles/BlockSpecs/HBM traffic — isolates the dot-height effect
    # behind the align128 gap. Bitwise-equal to the plain body (see
    # kernels/common.py:promote_block_swapped).
    swap_ab: bool = False


def _build_contiguous(spec: GroupedGemmSpec):
    cfg = spec.cfg
    bm, bn, bk = cfg.block_m, cfg.block_n, cfg.block_k
    m, n, k = spec.m, spec.n, spec.k
    gm, gn, gk = ceil_div(m, bm), ceil_div(n, bn), ceil_div(k, bk)
    out_dtype = jnp.dtype(spec.out_dtype)
    has_k_tail = (k % bk) != 0
    n_sf_a, n_sf_b = ceil_div(k, spec.gran_k_a), ceil_div(k, spec.gran_k_b)
    tpg = spec.static_tpg
    tstarts = spec.static_tile_starts
    n_pf = 0 if (tpg or tstarts is not None) else 2

    # Scalar-prefetch operands (dynamic path): gids[gm] (group per m-tile,
    # clamped >= 0) and row_ends[gm] (first invalid row for the tile's
    # group; m if none). Static paths: gid = i // tpg (equal groups) or the
    # boundary compare-chain (uneven groups) — no prefetch operands.
    def _gid(i, pf):
        if tpg:
            return i // tpg
        if tstarts is not None:
            g = None
            for ts in tstarts:
                term = jnp.where(i >= ts, 1, 0)
                g = term if g is None else g + term
            return 0 if g is None else g
        return pf[0][i]

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, s, *pf: (i, s),
                     memory_space=pltpu.VMEM),
        (pl.BlockSpec((1, bn, bk), lambda i, j, s, *pf: (_gid(i, pf), j, s),
                      memory_space=pltpu.VMEM)
         if spec.b_kmajor else
         pl.BlockSpec((1, bk, bn), lambda i, j, s, *pf: (_gid(i, pf), s, j),
                      memory_space=pltpu.VMEM)),
    ]
    nsub_a, nsub_b = bk // spec.gran_k_a, bk // spec.gran_k_b
    if spec.is_scaled:
        # per-k-step SF slices from stepped SF arrays (exact f32; see
        # dense.sf_to_stepped): sfa [gk, m, nsub_a], sfb [gk, G, nsub_b, n]
        # — or the TRANSPOSED orientations for the swap-AB body, so its
        # scale selects stay natural row/column vectors (see
        # common.promote_block_swapped): sfa [gk, nsub_a, m],
        # sfb [gk, G, n, nsub_b].
        if spec.swap_ab:
            in_specs.append(pl.BlockSpec((1, nsub_a, bm),
                                         lambda i, j, s, *pf: (s, 0, i),
                                         memory_space=pltpu.VMEM))
            in_specs.append(pl.BlockSpec(
                (1, 1, bn, nsub_b),
                lambda i, j, s, *pf: (s, _gid(i, pf), j, 0),
                memory_space=pltpu.VMEM))
        else:
            in_specs.append(pl.BlockSpec((1, bm, nsub_a),
                                         lambda i, j, s, *pf: (s, i, 0),
                                         memory_space=pltpu.VMEM))
            in_specs.append(pl.BlockSpec(
                (1, 1, nsub_b, bn),
                lambda i, j, s, *pf: (s, _gid(i, pf), 0, j),
                memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((bm, bn), lambda i, j, s, *pf: (i, j),
                            memory_space=pltpu.VMEM)

    def kernel(*all_refs):
        pf_refs, refs = all_refs[:n_pf], all_refs[n_pf:]
        ends_ref = pf_refs[1] if n_pf else None
        a_ref, b_ref = refs[0], refs[1]
        if gk == 1:
            d_ref, acc_ref = refs[-1], None
        else:
            d_ref, acc_ref = refs[-2], refs[-1]
        i = pl.program_id(0)
        ki = pl.program_id(2)

        if gk > 1:
            @pl.when(ki == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

        a_blk = a_ref[:]
        b_blk = b_ref[0]
        if has_k_tail:
            a_blk = mask_k_tail(a_blk, True, ki * bk, k)
            b_blk = mask_k_tail(b_blk, spec.b_kmajor, ki * bk, k)

        if spec.is_scaled:
            part = (promote_block_swapped(spec, bk, k, a_blk, b_blk,
                                          refs[2][0], refs[3][0, 0])
                    if spec.swap_ab else
                    promote_block(spec, bk, k, a_blk, b_blk,
                                  refs[2][0], refs[3][0, 0]))
        elif spec.swap_ab:
            part = dot_mn(b_blk, a_blk, spec.b_kmajor, True)
        else:
            part = dot_mn(a_blk, b_blk, True, spec.b_kmajor)

        def _epilogue(res):
            if spec.swap_ab:
                # partial lives transposed (bn, bm); one f32 transpose per
                # output tile restores (bm, bn)
                res = res.T
            if spec.zero_padded_rows and n_pf:
                # psum-layout `ensure_zero_padding`: zero d rows past the
                # group's end (/root/reference/tests/test_fp8_fp4.py:22-30).
                # Static path: groups are exactly full, nothing to zero.
                row = i * bm + jax.lax.broadcasted_iota(jnp.int32, res.shape, 0)
                res = jnp.where(row < ends_ref[i], res, jnp.zeros_like(res))
            d_ref[:] = res.astype(out_dtype)

        if gk == 1:
            # Single full-depth k step: write d directly (bitwise-identical
            # to 0 + part), freeing the acc scratch roundtrip.
            _epilogue(part)
        else:
            acc_ref[:] += part

            @pl.when(ki == gk - 1)
            def _():
                _epilogue(acc_ref[:])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_pf,
        grid=(gm, gn, gk),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=([] if gk == 1 else
                        [pltpu.VMEM((bn, bm) if spec.swap_ab else (bm, bn),
                                    jnp.float32)]),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            # m/n tiles are independent (only k accumulates) — 'parallel'
            # lets Mosaic schedule them like the dense kernel does
            dimension_semantics=('parallel', 'parallel', 'arbitrary'),
        ),
        cost_estimate=pl.CostEstimate(flops=2 * m * n * k, bytes_accessed=0,
                                      transcendentals=0),
        interpret=is_cpu_backend(),
    )
    return jax.jit(call)


def _build_contiguous_dual_b(spec: GroupedGemmSpec):
    """Dual-B straddle kernel (see GroupedGemmSpec.dual_b_row_starts)."""
    cfg = spec.cfg
    bm, bn, bk = cfg.block_m, cfg.block_n, cfg.block_k
    assert bm == 256 and spec.b_kmajor and not spec.zero_padded_rows
    m, n, k = spec.m, spec.n, spec.k
    gm, gn, gk = ceil_div(m, bm), ceil_div(n, bn), ceil_div(k, bk)
    out_dtype = jnp.dtype(spec.out_dtype)
    has_k_tail = (k % bk) != 0
    half = bm // 2

    starts = spec.dual_b_row_starts
    # top-half group id: compare-chain over ceil(start/256) tile thresholds
    thr_top = [ceil_div(s, bm) for s in starts[1:]]
    # straddle tiles: one per 128-but-not-256-aligned group start
    st_list = sorted((s - half) // bm for s in starts[1:] if s % bm == half)

    def _bot_gid(tile):
        return sum(1 for s in starts[1:] if s <= tile * bm + half)
    # frozen B_bot chain: holds the LAST straddle tile's bottom group, so
    # between straddles the computed index never changes (no DMAs); ON a
    # straddle tile the chain equals that tile's real bottom gid.
    froz_chain = []
    prev = 0
    for st in st_list:
        g = _bot_gid(st)
        froz_chain.append((st, g - prev))
        prev = g

    def _top(i):
        g = 0
        for t in thr_top:
            g = g + jnp.where(i >= t, 1, 0)
        return g

    def _froz(i):
        g = 0
        for st, d in froz_chain:
            g = g + jnp.where(i >= st, d, 0)
        return g

    def _is_str(i):
        f = jnp.int32(0)
        for st in st_list:
            f = f | jnp.where(i == st, 1, 0)
        return f

    in_specs = [
        pl.BlockSpec((bm, bk), lambda i, j, s: (i, s),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, bn, bk), lambda i, j, s: (_top(i), j, s),
                     memory_space=pltpu.VMEM),
        # B_bot: frozen chain + j/s clamped to 0 off-straddle, so the whole
        # index tuple is constant between straddles (revisit-dedup)
        pl.BlockSpec((1, bn, bk),
                     lambda i, j, s: (_froz(i),
                                      jnp.where(_is_str(i) == 1, j, 0),
                                      jnp.where(_is_str(i) == 1, s, 0)),
                     memory_space=pltpu.VMEM),
    ]
    nsub_a = bk // spec.gran_k_a
    nsub_b = bk // spec.gran_k_b
    if spec.is_scaled:
        in_specs.append(pl.BlockSpec((1, bm, nsub_a),
                                     lambda i, j, s: (s, i, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, 1, nsub_b, bn),
                                     lambda i, j, s: (s, _top(i), 0, j),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(
            (1, 1, nsub_b, bn),
            lambda i, j, s: (s, _froz(i),
                             0, jnp.where(_is_str(i) == 1, j, 0)),
            memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((bm, bn), lambda i, j, s: (i, j),
                            memory_space=pltpu.VMEM)

    def kernel(*refs):
        a_ref, bt_ref, bb_ref = refs[0], refs[1], refs[2]
        if gk == 1:
            d_ref, acc_ref = refs[-1], None
        else:
            d_ref, acc_ref = refs[-2], refs[-1]
        i = pl.program_id(0)
        ki = pl.program_id(2)
        is_str = _is_str(i) == 1

        if gk > 1:
            @pl.when(ki == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

        a_blk = a_ref[:]
        bt_blk = bt_ref[0]
        if has_k_tail:
            a_blk = mask_k_tail(a_blk, True, ki * bk, k)
            bt_blk = mask_k_tail(bt_blk, True, ki * bk, k)

        def _part(a_part, b_blk, sfa_rows, sfb_blk):
            if spec.is_scaled:
                return promote_block(spec, bk, k, a_part, b_blk,
                                     sfa_rows, sfb_blk)
            return dot_mn(a_part, b_blk, True, True)

        def _emit(rows, part):
            if gk == 1:
                d_ref[rows] = part.astype(out_dtype)
            else:
                acc_ref[rows] += part

        sfa_full = refs[3][0] if spec.is_scaled else None
        sft = refs[4][0, 0] if spec.is_scaled else None

        @pl.when(jnp.logical_not(is_str))
        def _():
            _emit(slice(None), _part(a_blk, bt_blk, sfa_full, sft))

        @pl.when(is_str)
        def _():
            bb_blk = bb_ref[0]
            if has_k_tail:
                bb_blk = mask_k_tail(bb_blk, True, ki * bk, k)
            sfb = refs[5][0, 0] if spec.is_scaled else None
            _emit(slice(0, half),
                  _part(a_blk[:half],
                        bt_blk, None if sfa_full is None else
                        sfa_full[:half], sft))
            _emit(slice(half, bm),
                  _part(a_blk[half:],
                        bb_blk, None if sfa_full is None else
                        sfa_full[half:], sfb))

        if gk > 1:
            @pl.when(ki == gk - 1)
            def _():
                d_ref[:] = acc_ref[:].astype(out_dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(gm, gn, gk),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=([] if gk == 1 else
                        [pltpu.VMEM((bm, bn), jnp.float32)]),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary'),
        ),
        cost_estimate=pl.CostEstimate(flops=2 * m * n * k, bytes_accessed=0,
                                      transcendentals=0),
        interpret=is_cpu_backend(),
    )
    return jax.jit(call)


def _build_masked(spec: GroupedGemmSpec):
    cfg = spec.cfg
    bm, bn, bk = cfg.block_m, cfg.block_n, cfg.block_k
    g, mm, n, k = spec.num_groups, spec.m, spec.n, spec.k
    gm, gn, gk = ceil_div(mm, bm), ceil_div(n, bn), ceil_div(k, bk)
    out_dtype = jnp.dtype(spec.out_dtype)
    has_k_tail = (k % bk) != 0
    n_sf_a, n_sf_b = ceil_div(k, spec.gran_k_a), ceil_div(k, spec.gran_k_b)

    if spec.pf_skip:
        # LOW-occupancy variant (see the spec field): masked_m is a scalar-
        # prefetch operand; inactive m-tiles' operand index maps clamp to a
        # constant so consecutive inactive steps re-use the resident block
        # (Mosaic only issues a DMA when the computed block index CHANGES).
        # The out map stays honest — inactive out blocks receive stale
        # buffer contents, which the masked contract allows (rows >=
        # masked_m[g] are never meaningful).
        def _act(e, i, mref):
            return i * bm < mref[e]

        def _ab(fn):
            def index_map(e, i, j, s, mref):
                a = _act(e, i, mref)
                return fn(e, i, j, s, lambda v: jnp.where(a, v, 0))
            return index_map

        in_specs = [
            pl.BlockSpec((1, bm, bk),
                         _ab(lambda e, i, j, s, g_: (e, g_(i), g_(s))),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, bk),
                         _ab(lambda e, i, j, s, g_: (e, g_(j), g_(s))),
                         memory_space=pltpu.VMEM),
        ]
        nsub_a, nsub_b = bk // spec.gran_k_a, bk // spec.gran_k_b
        if spec.is_scaled:
            if spec.swap_ab:
                in_specs.append(pl.BlockSpec(
                    (1, 1, nsub_a, bm),
                    _ab(lambda e, i, j, s, g_: (g_(s), e, 0, g_(i))),
                    memory_space=pltpu.VMEM))
                in_specs.append(pl.BlockSpec(
                    (1, 1, bn, nsub_b),
                    _ab(lambda e, i, j, s, g_: (g_(s), e, g_(j), 0)),
                    memory_space=pltpu.VMEM))
            else:
                in_specs.append(pl.BlockSpec(
                    (1, 1, bm, nsub_a),
                    _ab(lambda e, i, j, s, g_: (g_(s), e, g_(i), 0)),
                    memory_space=pltpu.VMEM))
                in_specs.append(pl.BlockSpec(
                    (1, 1, nsub_b, bn),
                    _ab(lambda e, i, j, s, g_: (g_(s), e, 0, g_(j))),
                    memory_space=pltpu.VMEM))
        out_spec = pl.BlockSpec((1, bm, bn),
                                lambda e, i, j, s, mref: (e, i, j),
                                memory_space=pltpu.VMEM)
    else:
        # masked_m rides as a plain SMEM operand, NOT scalar prefetch: no
        # index map consumes it (only the in-body early-exit predicate
        # does), and prefetch-free grid specs keep Mosaic's pipeline
        # statically analyzable (the same machinery finding as the
        # contiguous/k-grouped static paths).
        in_specs = [
            pl.BlockSpec((g,), lambda e, i, j, s: (0,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bm, bk), lambda e, i, j, s: (e, i, s),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn, bk), lambda e, i, j, s: (e, j, s),
                         memory_space=pltpu.VMEM),
        ]
        nsub_a, nsub_b = bk // spec.gran_k_a, bk // spec.gran_k_b
        if spec.is_scaled:
            # stepped SFs: sfa [gk, G, max_m, nsub_a], sfb [gk, G, nsub_b, n]
            # (swap-AB: transposed minor dims, see the contiguous builder)
            if spec.swap_ab:
                in_specs.append(pl.BlockSpec((1, 1, nsub_a, bm),
                                             lambda e, i, j, s: (s, e, 0, i),
                                             memory_space=pltpu.VMEM))
                in_specs.append(pl.BlockSpec((1, 1, bn, nsub_b),
                                             lambda e, i, j, s: (s, e, j, 0),
                                             memory_space=pltpu.VMEM))
            else:
                in_specs.append(pl.BlockSpec((1, 1, bm, nsub_a),
                                             lambda e, i, j, s: (s, e, i, 0),
                                             memory_space=pltpu.VMEM))
                in_specs.append(pl.BlockSpec((1, 1, nsub_b, bn),
                                             lambda e, i, j, s: (s, e, 0, j),
                                             memory_space=pltpu.VMEM))
        out_spec = pl.BlockSpec((1, bm, bn), lambda e, i, j, s: (e, i, j),
                                memory_space=pltpu.VMEM)

    def kernel(mref, *refs):
        a_ref, b_ref = refs[0], refs[1]
        if gk == 1:
            d_ref, acc_ref = refs[-1], None
        else:
            d_ref, acc_ref = refs[-2], refs[-1]
        e = pl.program_id(0)
        i = pl.program_id(1)
        ki = pl.program_id(3)

        def body():
            a_blk = a_ref[0]
            b_blk = b_ref[0]
            if has_k_tail:
                a_blk = mask_k_tail(a_blk, True, ki * bk, k)
                b_blk = mask_k_tail(b_blk, True, ki * bk, k)

            if spec.is_scaled:
                part = (promote_block_swapped(spec, bk, k, a_blk, b_blk,
                                              refs[2][0, 0], refs[3][0, 0])
                        if spec.swap_ab else
                        promote_block(spec, bk, k, a_blk, b_blk,
                                      refs[2][0, 0], refs[3][0, 0]))
            elif spec.swap_ab:
                part = dot_mn(b_blk, a_blk, True, True)
            else:
                part = dot_mn(a_blk, b_blk, True, True)

            def _store(res):
                d_ref[0] = (res.T if spec.swap_ab else res).astype(out_dtype)

            if gk == 1:
                # Single full-depth k step (the measured-best config): write
                # d directly, skipping the acc VMEM zero/read/write roundtrip
                # (bitwise-identical: acc would be 0 + part).
                _store(part)
            else:
                @pl.when(ki == 0)
                def _():
                    acc_ref[:] = jnp.zeros_like(acc_ref)

                acc_ref[:] += part

                @pl.when(ki == gk - 1)
                def _():
                    _store(acc_ref[:])

        if spec.no_early_exit:
            # Unpredicated body (see the spec field's docstring): rows past
            # masked_m[e] are computed-and-ignored instead of skipped.
            body()
        else:
            # Early-exit for m-tiles entirely beyond this group's masked_m —
            # the CUDA-graph-safe contract: masked_m is only ever read on
            # device (/root/reference/csrc/apis/gemm.hpp "masked" +
            # scheduler/gemm.cuh:200-216).
            pl.when(i * bm < mref[e])(body)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1 if spec.pf_skip else 0,
        grid=(g, gm, gn, gk),
        in_specs=in_specs,
        out_specs=out_spec,
        # gk==1 writes d directly — dropping the scratch frees a (bm, bn)
        # f32 block of VMEM for wider tiles
        scratch_shapes=([] if gk == 1 else
                        [pltpu.VMEM((bn, bm) if spec.swap_ab else (bm, bn),
                                    jnp.float32)]),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g, mm, n), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'parallel', 'arbitrary'),
        ),
        cost_estimate=pl.CostEstimate(flops=2 * g * mm * n * k, bytes_accessed=0,
                                      transcendentals=0),
        interpret=is_cpu_backend(),
    )
    return jax.jit(call)


def compute_tile_gids(grouped_layout: jnp.ndarray, num_groups: int, m: int,
                      block_m: int, use_psum_layout: bool):
    """Device-side per-m-tile (group id, group end row) — the Pallas analog of
    the reference scheduler's grouped_layout reads
    (/root/reference/deep_gemm/include/deep_gemm/scheduler/gemm.cuh:160-162,253-262)."""
    num_tiles = ceil_div(m, block_m)
    starts = jnp.arange(num_tiles, dtype=jnp.int32) * block_m
    # jnp-coerce first: a host-side numpy layout indexed by `starts` (a
    # staged constant under jit) raises TracerArrayConversionError.
    grouped_layout = jnp.asarray(grouped_layout)
    if use_psum_layout:
        ends = grouped_layout.astype(jnp.int32)           # [G] psum end offsets
        gids = jnp.searchsorted(ends, starts, side='right').astype(jnp.int32)
        gids = jnp.minimum(gids, num_groups - 1)
        row_ends = ends[gids]
    else:
        ids = grouped_layout.astype(jnp.int32)            # [m] per-row group ids
        tile_ids = ids[starts]
        gids = jnp.maximum(tile_ids, 0)                   # -1 padding -> any valid B
        # Real end row of each group (scatter-max over valid rows), so the
        # zero-padding epilogue can blank id==-1 rows — the reference
        # zero-fills them (/root/reference/deep_gemm/legacy/m_grouped_gemm.py:36-41).
        # Tiles never straddle groups (block_m divides the alignment), so a
        # per-tile end row suffices; all-padding tiles clamp to a group whose
        # end precedes them and zero entirely.
        idxs = jnp.arange(m, dtype=jnp.int32)
        contrib = jnp.where(ids >= 0, idxs + 1, 0)
        ends_real = jnp.zeros((num_groups,), jnp.int32) \
            .at[jnp.maximum(ids, 0)].max(contrib)
        row_ends = ends_real[gids]
    return gids, row_ends


def _host_uneven_starts(grouped_layout, num_groups: int, m: int,
                        use_psum_layout: bool, mk_alignment: int):
    """Host-concrete per-group start rows + layout monotonicity (shared by
    the static-uneven compare-chain and dual-B paths). Absent groups
    back-fill from the next present one (zero tiles either way)."""
    import numpy as _np
    lay = _np.asarray(grouped_layout).astype(_np.int64)
    if use_psum_layout:
        prev = _np.concatenate([[0], lay[:-1]])
        starts = (prev + mk_alignment - 1) // mk_alignment * mk_alignment
        monotone = bool(_np.all(_np.diff(lay) >= 0))
    else:
        valid = lay >= 0
        monotone = bool(_np.all(_np.diff(lay[valid]) >= 0))
        starts = _np.full((num_groups,), m, _np.int64)
        for g in range(num_groups - 1, -1, -1):
            occ = _np.nonzero(lay == g)[0]
            if occ.size:
                starts[g] = occ[0]
            elif g + 1 < num_groups:
                starts[g] = starts[g + 1]
    starts[0] = 0
    return starts, monotone


def m_grouped_gemm_contiguous(a, b, grouped_layout, *, use_psum_layout: bool,
                              sfa=None, sfb_t=None, b_kmajor: bool = True,
                              gran_k_a: int = 128, gran_k_b: int = 128,
                              out_dtype=jnp.bfloat16,
                              ensure_zero_padding: bool = False,
                              swap_ab: Optional[bool] = None,
                              cfg: Optional[GemmConfig] = None) -> jnp.ndarray:
    m, k = a.shape
    num_groups = b.shape[0]
    n = b.shape[1] if b_kmajor else b.shape[2]
    is_scaled = sfa is not None
    user_cfg = cfg is not None

    mk_alignment = runtime().mk_alignment
    if cfg is None:
        # block_m is pinned to the group-start alignment so m-tiles never
        # straddle groups — but taller tiles are worth real TFLOPS (G8
        # 8192x4096x7168 fp8: bm 128 = 161.3, bm 256 = 171.0 measured). When
        # the layout is host-concrete, lift the effective alignment to the
        # gcd of the actual group start offsets (<= 256), the adaptive-
        # block_m analog of the reference's runtime heuristic
        # (/root/reference/csrc/jit_kernels/heuristics/runtime.hpp:47-57).
        bm_align = mk_alignment
        if not isinstance(grouped_layout, jax.core.Tracer):
            import math as _math
            import numpy as _np
            lay = _np.asarray(grouped_layout).astype(_np.int64)
            if use_psum_layout:
                prev = _np.concatenate([[0], lay[:-1]])
                starts = (prev + mk_alignment - 1) \
                    // mk_alignment * mk_alignment
            else:
                starts = _np.asarray(
                    [int(_np.nonzero(lay == g)[0][0])
                     for g in range(num_groups) if (lay == g).any()],
                    _np.int64)
            g = 0
            for s in starts:
                g = _math.gcd(g, int(s))
            if g == 0:                      # single group starting at 0
                g = align(m, mk_alignment)
            if g % mk_alignment == 0:
                # the lift must DIVIDE g or m-tiles straddle group starts
                # (e.g. equal groups of 384 rows: g=384, a naive min(256, g)
                # lift puts rows 384-511 of tile 1 in group 0's B). gcd with
                # 256 keeps it a power-of-two divisor of every group start.
                bm_align = max(mk_alignment, _math.gcd(g, 256))
        cfg = get_gemm_config(m, n, k, a.dtype, b.dtype, out_dtype,
                              gran_k=min(gran_k_a, gran_k_b) if is_scaled else 128,
                              num_groups=num_groups, is_grouped_m=True,
                              mk_alignment=bm_align,
                              scale_strategy='promote' if is_scaled else None)
    # Static equal-group fast path (see GroupedGemmSpec.static_tpg): layout
    # is host-concrete and exactly repeat(arange(G), mpg) (ids) or
    # arange(1, G+1)*mpg (psum) with mpg % block_m == 0 — gid becomes index
    # arithmetic, no scalar-prefetch operands.
    # DGT_GROUPED_FORCE_PREFETCH=1 pins the dynamic path for A/B profiling.
    import os as _os
    static_tpg = None
    if (not isinstance(grouped_layout, jax.core.Tracer)
            and m % num_groups == 0
            and not _os.environ.get('DGT_GROUPED_FORCE_PREFETCH')):
        import numpy as _np
        mpg = m // num_groups
        if mpg % cfg.block_m == 0:
            lay = _np.asarray(grouped_layout).astype(_np.int64)
            want = (_np.arange(1, num_groups + 1, dtype=_np.int64) * mpg
                    if use_psum_layout else
                    _np.repeat(_np.arange(num_groups, dtype=_np.int64), mpg))
            if lay.shape == want.shape and bool(_np.all(lay == want)):
                static_tpg = mpg // cfg.block_m

    # Static UNEVEN-group path (VERDICT r3 #4): host-concrete layout, all
    # group starts block_m-aligned — gid is a compare-chain over the
    # host-constant boundary tile indices (see GroupedGemmSpec). Not taken
    # with ensure_zero_padding (the zero epilogue needs per-tile row ends,
    # which stay on the prefetch path).
    static_starts = None
    if (static_tpg is None and not ensure_zero_padding
            and not isinstance(grouped_layout, jax.core.Tracer)
            and not _os.environ.get('DGT_GROUPED_FORCE_PREFETCH')):
        import numpy as _np
        starts, monotone = _host_uneven_starts(
            grouped_layout, num_groups, m, use_psum_layout, mk_alignment)
        if monotone and bool(_np.all(starts % cfg.block_m == 0)):
            static_starts = tuple(int(s) // cfg.block_m for s in starts[1:])

    # DUAL-B straddle path (see GroupedGemmSpec.dual_b_row_starts): a
    # 128-aligned-but-not-256-aligned uneven layout runs bm=256 tiles with
    # a second dedup-clamped B operand — B passes drop from m/128 to
    # m/256 + straddle_count (64 -> 36 at the bench align128 layout).
    # MEASURED NEGATIVE on v5e (r5 on-chip A/B): 161.9 vs the bm=128
    # static path's 176.7 TFLOPS. Mechanism: the second resident B operand
    # costs VMEM, and every single-k-step (bk=7168) dual config
    # RESOURCE_EXHAUSTs on real Mosaic (chipless-AOT-confirmed at bn 256/
    # 384/512) — so dual-B is structurally pinned to >= 2 k steps, and the
    # k-split (the measured ~15-TFLOPS single-step effect; 161.9 matches
    # the 2-step class exactly) outweighs the B-restream saving. The dual
    # machinery itself is ~free. Kept as a pin-only layout tier
    # (DGT_GROUPED_DUAL_B=1) with bitwise tests; legality: host-concrete
    # strictly-monotone starts, all 128-aligned, at least one 128-odd,
    # m % 256 == 0, k-major B, no zero-padding.
    dual_starts = None
    _env_dual = _os.environ.get('DGT_GROUPED_DUAL_B')
    if (static_tpg is None and not ensure_zero_padding and b_kmajor
            and not user_cfg and m % 256 == 0
            and _env_dual == '1'
            and _os.environ.get('DGT_GROUPED_SWAP_AB') != '1'
            and not isinstance(grouped_layout, jax.core.Tracer)
            and not _os.environ.get('DGT_GROUPED_FORCE_PREFETCH')):
        import numpy as _np
        starts, monotone = _host_uneven_starts(
            grouped_layout, num_groups, m, use_psum_layout, mk_alignment)
        strict = bool(_np.all(_np.diff(starts) > 0))
        if (monotone and strict and bool(_np.all(starts % 128 == 0))
                and bool(_np.any(starts % 256 == 128))):
            from ..heuristics.configs import get_dual_b_config
            dual_starts = tuple(int(s) for s in starts)
            straddles = sum(1 for s in dual_starts if s % 256 == 128)
            cfg = get_dual_b_config(
                m, n, k, a.dtype, b.dtype, out_dtype,
                gran_k=min(gran_k_a, gran_k_b) if is_scaled else 128,
                straddle_tiles=straddles)
            static_starts = None

    if dual_starts is not None:
        swap_ab = False
    if swap_ab is None:
        # DGT_GROUPED_SWAP_AB={0,1} pins for A/B profiling.
        _env_sw = _os.environ.get('DGT_GROUPED_SWAP_AB')
        if _env_sw is not None:
            swap_ab = _env_sw == '1'
        else:
            from ..heuristics.arch import detect_arch
            swap_ab = detect_arch().swap_ab_profitable(
                m, n, k, cfg, is_scaled=is_scaled, is_grouped=True)
    if swap_ab and not is_cpu_backend() \
            and cfg.block_m % 128 != 0 and cfg.block_m != m:
        # swap-AB puts block_m on the LANE dim (swapped sfa minor dim);
        # Mosaic needs %128 or the whole array dim (see dense.py gate)
        swap_ab = False
    spec = GroupedGemmSpec(
        kind='contiguous', num_groups=num_groups, m=m, n=n, k=k,
        b_kmajor=b_kmajor, a_dtype=str(a.dtype), b_dtype=str(b.dtype),
        out_dtype=str(jnp.dtype(out_dtype)), is_scaled=is_scaled,
        gran_k_a=gran_k_a, gran_k_b=gran_k_b,
        zero_padded_rows=ensure_zero_padding, cfg=cfg,
        static_tpg=static_tpg, static_tile_starts=static_starts,
        dual_b_row_starts=dual_starts, swap_ab=bool(swap_ab))
    fn = kernel_cache().get_or_build(
        spec, lambda: (_build_contiguous_dual_b(spec)
                       if spec.dual_b_row_starts is not None
                       else _build_contiguous(spec)))

    if dual_starts is not None:
        args = [a, b, b]
    elif static_tpg is not None or static_starts is not None:
        args = [a, b]
    else:
        gids, row_ends = compute_tile_gids(grouped_layout, num_groups, m,
                                           cfg.block_m, use_psum_layout)
        args = [gids, row_ends, a, b]
    if is_scaled:
        gk = ceil_div(k, cfg.block_k)
        nsub_a, nsub_b = cfg.block_k // gran_k_a, cfg.block_k // gran_k_b
        sfa = sf_to_stepped(pad_sf_k(sfa, gk * nsub_a, k_last=True),
                            gk, nsub_a, k_last=True)
        sfb_t = sf_to_stepped(pad_sf_k(sfb_t, gk * nsub_b, k_last=False),
                              gk, nsub_b, k_last=False)
        if spec.swap_ab:
            # transposed minor dims for the swapped kernel's natural-slice
            # scale selects: [gk, m, nsub] -> [gk, nsub, m],
            # [gk, G, nsub, n] -> [gk, G, n, nsub]
            sfa = jnp.swapaxes(sfa, 1, 2)
            sfb_t = jnp.swapaxes(sfb_t, 2, 3)
        args += ([sfa, sfb_t, sfb_t] if dual_starts is not None
                 else [sfa, sfb_t])
    return fn(*args)


def m_grouped_gemm_masked(a, b, masked_m, *, sfa=None, sfb_t=None,
                          gran_k_a: int = 128, gran_k_b: int = 128,
                          out_dtype=jnp.bfloat16, expected_m: Optional[int] = None,
                          swap_ab: Optional[bool] = None,
                          cfg: Optional[GemmConfig] = None) -> jnp.ndarray:
    num_groups, max_m, k = a.shape
    n = b.shape[1]
    is_scaled = sfa is not None
    user_cfg = cfg is not None

    if cfg is None:
        # expected_m only shapes the heuristic, never the semantics
        # (CUDA-graph-safety analog: /root/reference/csrc/apis/gemm.hpp masked).
        # The bm cap follows expected_m up to 256: at full occupancy
        # (expected_m == max_m == 256) the 256-tall tile is the measured
        # winner ((256,512,7168) 175.7 vs (128,512,7168) 172.9 contiguous);
        # at low expected_m short tiles keep the early-exit predicate
        # effective. Tiles never straddle groups here (each group has its
        # own array dim), so this is purely a heuristic knob.
        em = expected_m or max_m
        bm_hint = min(256, max(32, align(em, 32)), align(max_m, 32))
        cfg = get_gemm_config(em, n, k, a.dtype, b.dtype, out_dtype,
                              gran_k=min(gran_k_a, gran_k_b) if is_scaled else 128,
                              num_groups=num_groups, is_grouped_m=True,
                              mk_alignment=bm_hint,
                              scale_strategy='promote' if is_scaled else None)
    # Callers asserting full expected occupancy get the unpredicated body:
    # the early-exit can't save work there, and an always-true pl.when still
    # costs Mosaic pipelining. Semantics are unchanged for ANY runtime
    # masked_m (rows >= masked_m[g] are never meaningful).
    # DGT_MASKED_FORCE_EXIT=1 pins the predicated kernel for A/B profiling.
    import os as _os
    no_exit = (expected_m is not None and expected_m >= max_m
               and not _os.environ.get('DGT_MASKED_FORCE_EXIT'))

    if no_exit and not user_cfg and max_m % 128 == 0:
        # Full-occupancy reroute: the [G, max_m, ·] masked layout IS a
        # contiguous psum layout with equal groups of max_m rows, and the
        # contiguous STATIC kernel's dense-style 2D blocks measurably beat
        # the masked kernel's leading-1 3D blocks (175.0 vs 171.1 TFLOPS at
        # the G8 256x4096x7168 bench shape — the 4D grid + (1, bm, bk)
        # blocks carry the same machinery cost as scalar prefetch).
        # masked_m is ignored — identical contract to the unpredicated body:
        # rows >= masked_m[g] are computed-and-ignored, never meaningful.
        # Bitwise-equal to the masked kernel whenever both pick the same
        # block_k (single-k-step shapes): same dot sizes, same gran_k
        # sub-block promote order; rows/columns are independent of bm/bn.
        import numpy as _np
        layout = _np.arange(1, num_groups + 1, dtype=_np.int64) * max_m
        d = m_grouped_gemm_contiguous(
            a.reshape(num_groups * max_m, k), b, layout,
            use_psum_layout=True,
            sfa=None if sfa is None else sfa.reshape(num_groups * max_m, -1),
            sfb_t=sfb_t, gran_k_a=gran_k_a, gran_k_b=gran_k_b,
            out_dtype=out_dtype)
        return d.reshape(num_groups, max_m, n)
    # Low-occupancy pf-skip choice (see GroupedGemmSpec.pf_skip): when the
    # expected_m hint says the batch is partially occupied: the r5 on-chip
    # occupancy sweep (scripts/measure_pf_crossover.py, 2026-08-20) shows
    # pf-skip wins at EVERY partial occupancy — eff-TFLOPS pf vs predicated:
    # occ 1/8: 36.0/5.8, 1/4: 76.7/23.1, 1/2: 151.5/89.0, 3/4: 163.7/110.1
    # (full occupancy: equal at 189.6, rerouted anyway) — so the old
    # `expected_m*2 <= max_m` threshold was far too conservative; B-restream
    # dedup pays whenever ANY m-tile is expected inactive. The hint never
    # changes semantics. DGT_MASKED_PF_SKIP={0,1} pins it for A/B profiling.
    _env_pf = _os.environ.get('DGT_MASKED_PF_SKIP')
    if _env_pf is not None:
        pf_skip = _env_pf == '1'
    else:
        pf_skip = (not no_exit and expected_m is not None
                   and expected_m < max_m)
    if swap_ab is None:
        # DGT_MASKED_SWAP_AB={0,1} pins for A/B profiling.
        _env_sw = _os.environ.get('DGT_MASKED_SWAP_AB')
        if _env_sw is not None:
            swap_ab = _env_sw == '1'
        else:
            from ..heuristics.arch import detect_arch
            swap_ab = detect_arch().swap_ab_profitable(
                max_m, n, k, cfg, is_scaled=is_scaled, is_grouped=True)
    if swap_ab and not is_cpu_backend() \
            and cfg.block_m % 128 != 0 and cfg.block_m != max_m:
        # swap-AB puts block_m on the LANE dim (swapped sfa minor dim);
        # Mosaic needs %128 or the whole array dim (see dense.py gate)
        swap_ab = False
    spec = GroupedGemmSpec(
        kind='masked', num_groups=num_groups, m=max_m, n=n, k=k,
        b_kmajor=True, a_dtype=str(a.dtype), b_dtype=str(b.dtype),
        out_dtype=str(jnp.dtype(out_dtype)), is_scaled=is_scaled,
        gran_k_a=gran_k_a, gran_k_b=gran_k_b, zero_padded_rows=False, cfg=cfg,
        no_early_exit=no_exit, pf_skip=pf_skip, swap_ab=bool(swap_ab))
    fn = kernel_cache().get_or_build(spec, lambda: _build_masked(spec))

    args = [masked_m.astype(jnp.int32), a, b]
    if is_scaled:
        gk = ceil_div(k, cfg.block_k)
        nsub_a, nsub_b = cfg.block_k // gran_k_a, cfg.block_k // gran_k_b
        sfa = sf_to_stepped(pad_sf_k(sfa, gk * nsub_a, k_last=True),
                            gk, nsub_a, k_last=True)
        sfb_t = sf_to_stepped(pad_sf_k(sfb_t, gk * nsub_b, k_last=False),
                              gk, nsub_b, k_last=False)
        if spec.swap_ab:
            # transposed minor dims (see the contiguous call site):
            # sfa [gk, G, max_m, nsub] -> [gk, G, nsub, max_m],
            # sfb [gk, G, nsub, n] -> [gk, G, n, nsub]
            sfa = jnp.swapaxes(sfa, 2, 3)
            sfb_t = jnp.swapaxes(sfb_t, 2, 3)
        args += [sfa, sfb_t]
    return fn(*args)
