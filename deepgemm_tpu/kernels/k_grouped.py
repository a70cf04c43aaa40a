"""K-grouped GEMM Pallas kernel (the MoE weight-gradient path).

Computes ``d[g] = c[g] + a[ks_g]^T @ b[ks_g]`` over per-group k-ranges with
mandatory FP32 accumulation — the TPU re-design of the reference k-grouped
1D1D kernels (/root/reference/csrc/jit_kernels/impls/sm90_fp8_gemm_1d1d.hpp:15-229,
device walk: deep_gemm/include/deep_gemm/scheduler/gemm.cuh:197-287).

Where the reference rewrites TMA descriptors on device per group
(impls/sm90_fp8_gemm_1d1d.cuh:196-199), the TPU version uses a flat k-tile
grid with per-tile scalar-prefetch metadata (group id, first/last flags, SF
row bases) computed on device in a few jnp ops — group boundaries never touch
the host, so the kernel stays graph-safe for dynamic ``ks`` tensors.

Layout contract (TN): ``a`` is [total_k, m], ``b`` is [total_k, n] (both
MN-major); per-channel SFs are compacted per group and K-FIRST
(/root/reference/tests/generators.py:411-433): ``sfa_t`` [nsf_total, m],
``sfb_t`` [nsf_total, n] — so the kernel's runtime SF-row reads are dynamic
sublane slices (exact f32).
"""

import dataclasses
import math
import os
import types
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..runtime.cache import kernel_cache
from ..runtime.config import is_cpu_backend, runtime
from ..utils.math import align, ceil_div
from .common import dot_mn, k_slice, promote_block


@dataclasses.dataclass(frozen=True)
class KGroupedGemmSpec:
    num_groups: int
    m: int
    n: int
    total_k: int
    a_dtype: str
    b_dtype: str
    is_scaled: bool
    gran_k: int
    nsf_total: int
    block_m: int
    block_n: int
    block_k: int
    # c=None contract: the accumulator input is known-zero, so the kernel
    # zero-inits instead of streaming G*m*n FP32 of zeros from HBM — the
    # analog of the reference's d==c aliasing fast path
    # (/root/reference/csrc/apis/gemm.hpp:328 accumulation contract).
    has_c: bool = True
    # k-major operands ([m, total_k] / [n, total_k], one XLA relayout at
    # the ops layer). Measured on v5e at 4096x7168, total_k 8192: ~69 TFLOPS
    # in BOTH orientations (the sublane-contraction theory did not hold) —
    # k-major is kept as the default for its better lane legality on ragged
    # m/n, not for speed. The remaining gap vs dense NT is under
    # investigation (see CLAUDE.md open items).
    k_major: bool = False
    # Static equal-group fast path: when the layout is host-concrete with
    # equal-size non-empty groups (the standard wgrad case — G experts, one
    # k slab each), every per-k-tile quantity is plain index arithmetic:
    #   gid = s // static_spg, first = (s % spg == 0), last = (s % spg ==
    #   spg-1), sf row = gid * static_nsfg + (s % spg) * bk // gran + ...
    # so the kernel is built WITHOUT scalar-prefetch operands. Rationale:
    # prefetch-array-dependent index maps cost measurable per-step overhead
    # (the grouped align-128 gap, CLAUDE.md), and the wgrad per-step time
    # measured on v5e ~= compute + IO summed — the static maps give Mosaic
    # the same statically-analyzable pipeline as the dense kernel (which
    # overlaps at 176 TFLOPS).
    static_spg: Optional[int] = None    # k-tiles (grid steps) per group
    static_nsfg: Optional[int] = None   # SF rows per group
    # Stepped-SF refinement of the static path (requires kpg == padded_kpg,
    # kpg % gran == 0, bk % gran == 0): scales arrive as per-k-step BlockSpec
    # slices with the step as a LEADING dim — sfa [nt, m, nsub] m-major, sfb
    # [nt, nsub, n] — and the kernel uses the dense promote_block (STATIC
    # lane/sublane slices, no per-sub-step dynamic row selects or (1,bm) ->
    # (bm,1) transposes). Measured on v5e at the wgrad bench shape: the
    # dynamic-row epilogue serializes the VPU scaling under the MXU
    # (108 TFLOPS ~= MXU + VPU summed); static slices are what let the dense
    # kernel overlap at 176.
    static_sf_stepped: bool = False


def _build_k_grouped(spec: KGroupedGemmSpec):
    bm, bn, bk = spec.block_m, spec.block_n, spec.block_k
    m, n, tk = spec.m, spec.n, spec.total_k
    gm, gn = ceil_div(m, bm), ceil_div(n, bn)
    nt = tk // bk
    gran = spec.gran_k
    nsf = spec.nsf_total
    gsub = math.gcd(gran, bk)
    kmaj = spec.k_major
    spg = spec.static_spg        # None => dynamic-layout (scalar-prefetch)
    nsfg = spec.static_nsfg
    n_pf = 0 if spg else 5

    # Prefetch operands (dynamic path only): gid[nt], first[nt], last[nt],
    # sf_start[nt], local_base[nt]. The static path derives the group id in
    # the index maps themselves (s // spg): no prefetch operands at all, so
    # Mosaic sees the same statically-analyzable pipeline as the dense kernel.
    def _gid(s, pf):
        return s // spg if spg else pf[0][s]

    in_specs = [
        (pl.BlockSpec((bm, bk), lambda i, j, s, *pf: (i, s),
                      memory_space=pltpu.VMEM) if kmaj else
         pl.BlockSpec((bk, bm), lambda i, j, s, *pf: (s, i),
                      memory_space=pltpu.VMEM)),
        (pl.BlockSpec((bn, bk), lambda i, j, s, *pf: (j, s),
                      memory_space=pltpu.VMEM) if kmaj else
         pl.BlockSpec((bk, bn), lambda i, j, s, *pf: (s, j),
                      memory_space=pltpu.VMEM)),
    ]
    if spec.has_c:
        in_specs.append(
            pl.BlockSpec((1, bm, bn),
                         lambda i, j, s, *pf: (_gid(s, pf), i, j),
                         memory_space=pltpu.VMEM))
    stepped = spec.static_sf_stepped
    nsub = bk // gran if stepped else 0
    if spec.is_scaled and stepped:
        # Dense-style stepped SFs (see the spec field's docstring): the grid
        # k-step is the leading array dim, so every in-kernel SF access is a
        # STATIC slice and Mosaic pipelines the scaling under the MXU.
        in_specs.append(pl.BlockSpec((1, bm, nsub),
                                     lambda i, j, s, *pf: (s, i, 0),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((1, nsub, bn),
                                     lambda i, j, s, *pf: (s, 0, j),
                                     memory_space=pltpu.VMEM))
    elif spec.is_scaled:
        # SFs are k-first ([nsf, m] / [nsf, n]) so the kernel can pick the
        # runtime-computed SF row with a dynamic *sublane* slice (Mosaic
        # forbids dynamic lane-dim slicing; sublane is fine).
        in_specs.append(pl.BlockSpec((nsf, bm), lambda i, j, s, *pf: (0, i),
                                     memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec((nsf, bn), lambda i, j, s, *pf: (0, j),
                                     memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((1, bm, bn),
                            lambda i, j, s, *pf: (_gid(s, pf), i, j),
                            memory_space=pltpu.VMEM)

    # spg == 1 (one full-depth k tile per group — the tile picker's favorite
    # for equal slabs): every step is first AND last, so the acc scratch
    # roundtrip is skipped entirely (bitwise-identical: acc = c/0 + part).
    direct = spg == 1

    def kernel(*all_refs):
        pf_refs, refs = all_refs[:n_pf], all_refs[n_pf:]
        a_ref, b_ref = refs[0], refs[1]
        c_ref = refs[2] if spec.has_c else None
        if direct:
            d_ref, acc_ref = refs[-1], None
        else:
            d_ref, acc_ref = refs[-2], refs[-1]
        s = pl.program_id(2)
        if spg:
            sloc = jax.lax.rem(s, spg)
            is_first = sloc == 0
            is_last = sloc == spg - 1
        else:
            gid_ref, first_ref, last_ref, sfstart_ref, localbase_ref = pf_refs
            is_first = first_ref[s] == 1
            is_last = last_ref[s] == 1

        if not direct:
            @pl.when(is_first)
            def _():
                if spec.has_c:
                    acc_ref[:] = c_ref[0].astype(jnp.float32)
                else:
                    acc_ref[:] = jnp.zeros_like(acc_ref)

        a_blk = a_ref[:]
        b_blk = b_ref[:]
        if not spec.is_scaled:
            part = dot_mn(a_blk, b_blk, kmaj, kmaj)
        elif stepped:
            # Shared dense epilogue: identical multiply order to the dynamic
            # branch below ((p * sfb_row) * sfa_col), so the two are bitwise-
            # equal — regression-tested by test_k_grouped_static_equals_
            # prefetch.
            sf0 = 3 if spec.has_c else 2
            pspec = types.SimpleNamespace(gran_k_a=gran, gran_k_b=gran,
                                          a_kmajor=kmaj, b_kmajor=kmaj)
            part = promote_block(pspec, bk, bk, a_blk, b_blk,
                                 refs[sf0][0], refs[sf0 + 1][0])
        else:
            sf0 = 3 if spec.has_c else 2
            sfa_ref2, sfb_ref2 = refs[sf0], refs[sf0 + 1]  # (nsf, bm/bn)
            total = None
            for t in range(bk // gsub):
                # SF row for this sub-slice: group-compact rows
                # (generators.py:411-433 contract). Out-of-group tiles only
                # multiply zero-padded data; clamp keeps the read in-bounds.
                if spg:
                    row = (s // spg) * nsfg + jnp.minimum(
                        (sloc * bk + t * gsub) // gran, nsfg - 1)
                else:
                    row = sfstart_ref[s] + \
                        (localbase_ref[s] + t * gsub) // gran
                row = jnp.minimum(row, nsf - 1)
                p = dot_mn(k_slice(a_blk, kmaj, t * gsub, gsub),
                           k_slice(b_blk, kmaj, t * gsub, gsub), kmaj, kmaj)
                sfa_row = sfa_ref2[pl.ds(row, 1), :]          # (1, bm), exact
                sfb_row = sfb_ref2[pl.ds(row, 1), :]          # (1, bn), exact
                term = (p * sfb_row) * sfa_row.reshape(bm, 1)
                total = term if total is None else total + term
            part = total

        if direct:
            res = part
            if spec.has_c:
                res = c_ref[0].astype(jnp.float32) + res
            d_ref[0] = res
        else:
            acc_ref[:] += part

            @pl.when(is_last)
            def _():
                d_ref[0] = acc_ref[:]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_pf,
        grid=(gm, gn, nt),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=([] if direct else
                        [pltpu.VMEM((bm, bn), jnp.float32)]),
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((spec.num_groups, m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary'),
        ),
        cost_estimate=pl.CostEstimate(flops=2 * m * n * tk, bytes_accessed=0,
                                      transcendentals=0),
        interpret=is_cpu_backend(),
    )
    return jax.jit(call)


def compute_k_tile_metadata(grouped_layout: jnp.ndarray, num_groups: int,
                            total_k: int, block_k: int, gran_k: int,
                            k_alignment: int, use_psum_layout: bool):
    """Per-k-tile (gid, first, last, sf_start, local_base) from the dynamic
    group layout — all on device (the analog of the reference's in-kernel
    k-group walking, scheduler/gemm.cuh:253-287)."""
    nt = total_k // block_k
    tile_start = jnp.arange(nt, dtype=jnp.int32) * block_k
    layout = grouped_layout.astype(jnp.int32)
    if use_psum_layout:
        ends = layout
        prev_ends = jnp.concatenate([jnp.zeros((1,), jnp.int32), ends[:-1]])
        starts = (prev_ends + k_alignment - 1) // k_alignment * k_alignment
        starts = jnp.where(jnp.arange(num_groups) == 0, 0, starts)
    else:
        ks = layout
        ends = jnp.cumsum(ks).astype(jnp.int32)
        starts = ends - ks
    real_ks = ends - starts

    # Group of each tile: last group with start <= tile_start AND nonempty
    # coverage. Empty groups produce start == next start; taking the last
    # match skips them.
    gid = jnp.searchsorted(starts, tile_start, side='right').astype(jnp.int32) - 1
    gid = jnp.clip(gid, 0, num_groups - 1)
    first = (tile_start == starts[gid]).astype(jnp.int32)
    next_gid = jnp.concatenate([gid[1:], jnp.full((1,), -1, jnp.int32)])
    last = (gid != next_gid).astype(jnp.int32)

    sf_rows = (real_ks + gran_k - 1) // gran_k
    sf_start_per_group = jnp.cumsum(sf_rows) - sf_rows
    sf_start = sf_start_per_group[gid].astype(jnp.int32)
    local_base = tile_start - starts[gid]
    return gid, first, last, sf_start, local_base, real_ks


def k_grouped_gemm(a, b, c, grouped_layout, *, use_psum_layout: bool,
                   sfa_t=None, sfb_t=None, gran_k: int = 128,
                   num_groups: Optional[int] = None,
                   ks_cpu=None, k_major: bool = True) -> jnp.ndarray:
    """d[g] = c[g] + a_g^T @ b_g (FP32 out). ``grouped_layout`` is per-group
    k sizes or psum end offsets (/root/reference/csrc/apis/gemm.hpp:48-69).

    ``k_major`` (default): one XLA relayout turns the TN operands k-major
    (better Mosaic lane legality for ragged m/n; measured perf parity with
    the MN-major orientation on v5e)."""
    total_k, m = a.shape
    n = b.shape[1]
    num_groups = num_groups or grouped_layout.shape[0]
    is_scaled = sfa_t is not None
    has_c = c is not None
    k_alignment = runtime().mk_alignment

    # Tile choice by modeled HBM traffic: the wgrad shape is HBM-BOUND (A is
    # re-streamed once per n-tile column, B once per m-tile row, plus the
    # FP32 c read / d write per output element). Minimize
    #   ceil(n/bn) * m * total_k * a_bytes + ceil(m/bm) * n * total_k * b_bytes
    # over VMEM-fitting (bm, bn); the c/d term is tile-invariant. Dropping
    # the known-zero c (has_c=False) frees a whole (bm, bn) FP32 block of
    # VMEM, which is what lets 1024-wide tiles fit and halves the A/B
    # re-streams. Lane/sublane rule: 128-divisible or the whole dim.
    nsf_total = sfa_t.shape[0] if is_scaled else 0
    a_bytes = jnp.dtype(a.dtype).itemsize
    b_bytes = jnp.dtype(b.dtype).itemsize
    budget0 = 12 * 1024 * 1024 + 512 * 1024

    def _fixed_est(bm_c, bn_c):
        # acc (1x) + double-buffered d (2x) + double-buffered c when present
        # (2x) + double-buffered SF panels. The round-3 first cut ignored the
        # out-block double buffering and overflowed real scoped VMEM (16.84M
        # vs the 16M ceiling) at (1024, 512, 1024) with c.
        out_blocks = 1 + 2 + (2 if has_c else 0)
        return bm_c * bn_c * 4 * out_blocks \
            + nsf_total * (bm_c + bn_c) * 4 * 2

    best_pick = None
    for cm in (1024, 512, 256):
        for cn in (1024, 512, 256):
            bm_c = min(cm, m) if m % 128 == 0 else m
            bn_c = min(cn, n) if n % 128 == 0 else n
            per_k0 = (bm_c * a_bytes + bn_c * b_bytes) * 2
            if budget0 - _fixed_est(bm_c, bn_c) < per_k0 * k_alignment:
                continue
            traffic = (ceil_div(n, bn_c) * m * total_k * a_bytes
                       + ceil_div(m, bm_c) * n * total_k * b_bytes)
            # tie-break: deeper-k headroom (smaller per_k), then taller bm
            key = (traffic, per_k0, -bm_c)
            if best_pick is None or key < best_pick[0]:
                best_pick = (key, bm_c, bn_c)
    assert best_pick is not None, 'no VMEM-fitting k-grouped tile'
    _, bm, bn = best_pick

    # Profiling escape hatch: DGT_KG_TILES="bm,bn[,bk]" pins the tile choice
    # (the analog of the reference's DG_PRINT_CONFIGS-guided manual sweeps).
    _ovr = os.environ.get('DGT_KG_TILES')
    if _ovr:
        parts = [int(x) for x in _ovr.split(',')]
        bm, bn = parts[0], parts[1]
        bk_override = parts[2] if len(parts) > 2 else None
    else:
        bk_override = None

    # block_k must divide every group START (so no k-tile straddles a group
    # boundary; inter-group padding rows are zero by the layout contract).
    # Group starts are multiples of the k alignment, so bk = alignment is
    # always safe — but the measured deep-k rule (heuristics/configs.py:
    # bk 512 -> 4096 is worth 160 -> 176 TFLOPS) says shallow k steps are
    # the wgrad kernel's round-1 perf sin. When the layout is host-concrete
    # (ks_cpu or an untraced grouped_layout), deepen bk to the largest
    # VMEM-fitting divisor of gcd(group starts, total_k).
    bk = k_alignment
    layout_np = None
    if ks_cpu is not None:
        layout_np = np.asarray(ks_cpu)
    elif not isinstance(grouped_layout, jax.core.Tracer):
        lay = np.asarray(grouped_layout).astype(np.int64)
        layout_np = (lay if not use_psum_layout else
                     np.diff(np.concatenate([[0], lay])))
    if layout_np is not None:
        sizes = np.asarray(layout_np, np.int64)
        padded = (sizes + k_alignment - 1) // k_alignment * k_alignment
        starts = np.cumsum(np.concatenate([[0], padded[:-1]]))
        g = int(total_k)
        for s in starts[1:]:
            g = math.gcd(g, int(s))
        per_k = (bm * a_bytes + bn * b_bytes) * 2
        # Equal full groups: a candidate bk == group depth means spg == 1 —
        # every group is one k-tile, d is written directly and the acc
        # scratch DISAPPEARS, freeing bm*bn*4 bytes exactly when the deepest
        # candidate needs them. Measured on the bench shape (G4 kpg=2048):
        # (1024,512,2048) spg==1 = 174.0 TFLOPS vs (1024,512,1024) = 161.5.
        # The credit only applies when the static kernel will actually be
        # built: the prefetch kernel keeps the acc scratch at any bk (its
        # per-tile group walk is dynamic), so a forced-prefetch A/B at the
        # credited depth would VMEM-overflow (measured: 16.66M > 16M).
        eq_kpg = (int(padded[0]) if (sizes.size and np.all(sizes == sizes[0])
                                     and padded[0] * num_groups == total_k
                                     and not os.environ.get(
                                         'DGT_KG_FORCE_PREFETCH'))
                  else None)
        best = k_alignment
        cand = k_alignment
        while cand <= g:
            if g % cand == 0:
                fixed_c = _fixed_est(bm, bn)
                if eq_kpg is not None and cand == eq_kpg:
                    fixed_c -= bm * bn * 4          # no acc scratch at spg==1
                if cand * per_k <= budget0 - fixed_c:
                    best = cand
            cand += k_alignment
        bk = best
    if bk_override:
        bk = bk_override
    assert total_k % bk == 0, (total_k, bk)

    # Static equal-group fast path (see KGroupedGemmSpec.static_spg): all
    # per-tile metadata collapses to index arithmetic, so the kernel builds
    # without scalar-prefetch operands. DGT_KG_FORCE_PREFETCH=1 pins the
    # dynamic path for A/B measurement.
    static_spg = static_nsfg = None
    sf_stepped = False
    if (layout_np is not None
            and not os.environ.get('DGT_KG_FORCE_PREFETCH')):
        sizes = np.asarray(layout_np, np.int64)
        if (sizes.size == num_groups and np.all(sizes == sizes[0])
                and sizes[0] > 0):
            padded_kpg = int(align(int(sizes[0]), k_alignment))
            if padded_kpg * num_groups == total_k and padded_kpg % bk == 0:
                static_spg = padded_kpg // bk
                static_nsfg = ceil_div(int(sizes[0]), gran_k)
                # Stepped SFs need group-compact rows to line up exactly
                # with a [nt, nsub] reshape: no alignment padding inside a
                # group and gran-aligned tile/group depths.
                sf_stepped = (is_scaled
                              and int(sizes[0]) == padded_kpg
                              and padded_kpg % gran_k == 0
                              and bk % gran_k == 0
                              and nsf_total * gran_k == total_k)

    spec = KGroupedGemmSpec(
        num_groups=num_groups, m=m, n=n, total_k=total_k,
        a_dtype=str(a.dtype), b_dtype=str(b.dtype), is_scaled=is_scaled,
        gran_k=gran_k, nsf_total=nsf_total,
        block_m=bm, block_n=bn, block_k=bk, k_major=k_major, has_c=has_c,
        static_spg=static_spg, static_nsfg=static_nsfg,
        static_sf_stepped=sf_stepped)
    fn = kernel_cache().get_or_build(spec, lambda: _build_k_grouped(spec))
    if k_major:
        a = jnp.swapaxes(a, 0, 1)          # [m, total_k]
        b = jnp.swapaxes(b, 0, 1)          # [n, total_k]

    if static_spg is not None:
        args = [a, b]
    else:
        (gid, first, last, sf_start, local_base,
         real_ks) = compute_k_tile_metadata(
            grouped_layout, num_groups, total_k, bk, gran_k, k_alignment,
            use_psum_layout)
        args = [gid, first, last, sf_start, local_base, a, b]
    if has_c:
        args.append(c)
    if is_scaled:
        if sf_stepped:
            nt = total_k // bk
            nsub = bk // gran_k
            sfa_t = sfa_t.reshape(nt, nsub, m).swapaxes(1, 2)  # [nt, m, nsub]
            sfb_t = sfb_t.reshape(nt, nsub, n)                 # [nt, nsub, n]
        args += [sfa_t, sfb_t]
    d = fn(*args)
    # Empty groups own no k-tiles, so their d block is never written: splice
    # c (or zero) back in (matches ref_d[i] = c[i],
    # tests/generators.py:513-516). Static path excludes empty groups.
    if static_spg is not None:
        return d
    empty = (real_ks == 0)[:, None, None]
    return jnp.where(empty, c if has_c else jnp.zeros_like(d), d)
