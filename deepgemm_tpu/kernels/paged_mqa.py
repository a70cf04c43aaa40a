"""Paged MQA logits Pallas kernel (decode-side indexer scoring).

Computes, for each batch element ``b`` with context length ``ctx[b]``, the
weighted-ReLU MQA scores of ``next_n`` query tokens against a paged KV cache:
the TPU re-design of /root/reference/deep_gemm/include/deep_gemm/impls/
sm90_fp8_paged_mqa_logits.cuh and the SM100 variant.

TPU-first mapping: the reference needs a metadata kernel to balance per-batch
kv splits across persistent SMs
(scheduler/sm90_paged_mqa_logits.cuh:47-100); on TPU the grid is uniform
(batch x kv-block) and the *block table itself* is the scalar-prefetch array
that BlockSpec index maps consume — each grid step DMAs exactly the cache
block ``block_table[b, c]``, so paging indirection costs nothing extra.
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..runtime.cache import kernel_cache
from ..runtime.config import is_cpu_backend
from ..utils.math import ceil_div

NEG_INF = float('-inf')


@dataclasses.dataclass(frozen=True)
class PagedMQASpec:
    batch_size: int
    next_n: int
    num_heads: int
    head_dim: int
    num_kv_blocks: int
    block_kv: int
    max_blocks_per_seq: int     # block_table row length
    max_model_len: int
    ctx_2d: bool                # context_lens given per (batch, next_n)
    logits_dtype: str
    tile_kv: int = 4096         # kv positions per grid step
    # 'gather' strategy (DEFAULT, swept on v5e; bitwise-identical to
    # 'paged'): the pages are pre-gathered into a contiguous [B, mb*bkv, d]
    # cache by one XLA gather pass, and the kernel streams big linear
    # tiles. The 2x cache traffic of the copy is far cheaper than the paged
    # path's small-DMA overhead, and the GEMM single-k-step rule applies
    # here too: at B64/ctx4096, tile_kv 1024 -> 4096 (one step per row) is
    # 326 -> 642 GB/s effective. 'paged' remains the zero-copy option for
    # HBM-constrained serving: the fp8 cache stays in place, pages ride
    # manual double-buffered DMAs (next tile's pages issued under the
    # current tile's compute — the round-2 bpt-BlockSpec-window scheme paid
    # per-window Mosaic machinery and measured 99 GB/s). The tiny f32 SF
    # sideband (~1 MB) still rides a linear gather.
    linear_cache: bool = False
    kv_dtype: str = 'float8_e4m3fn'   # cache dtype (bf16 after FP4 decode)
    # Zero-copy only: DMA pipeline depth in kv tiles (slots in the VMEM ring;
    # lookahead = n_slots - 1 tiles in flight). Scattered 8KB page reads are
    # latency-bound, so deeper lookahead buys real bandwidth.
    n_slots: int = 2
    # Zero-copy only: coalesce physically-adjacent page runs into one DMA —
    # per-tile precomputed level 2 = QUADS (32KB DMAs), 1 = PAIRS (16KB),
    # 0 = singles (8KB). The per-8KB DMA issue cost is the measured zc
    # bound (scripts/zc_roofline.py: pure-DMA ceilings 592 / 728 / 732
    # GB/s); the serving PageAllocator's quad-aligned layout makes level 2
    # the common case.
    coalesce: bool = True


def _build_paged_mqa(spec: PagedMQASpec):
    b_sz, nn, h, d = spec.batch_size, spec.next_n, spec.num_heads, spec.head_dim
    bkv = spec.block_kv
    out_dtype = jnp.dtype(spec.logits_dtype)
    mb = spec.max_blocks_per_seq
    # Each grid step covers a `tile_kv`-wide output tile = `bpt` cache
    # blocks, fetched through `bpt` independent paged index maps. Wide tiles
    # amortize the per-step pipeline overhead — decode is HBM-bound (swept
    # on v5e: 55 GB/s at tile 128 -> 126 at 512 -> 141 at 1024;
    # results are bitwise-identical across tile widths).
    tile_kv = spec.tile_kv
    bpt = max(1, tile_kv // bkv)
    tile_kv = bpt * bkv
    gkv = ceil_div(spec.max_model_len, tile_kv)

    assert spec.linear_cache, \
        'the paged (zero-copy) strategy builds via _build_paged_mqa_zerocopy'
    # No index map consumes the scalar operands (the block table was already
    # applied by the XLA gather pass; ctx gates in-body only), so ctx rides
    # as a plain SMEM operand and the grid spec stays prefetch-free — same
    # machinery finding as the grouped/k-grouped static paths.
    n_ctx = b_sz * nn if spec.ctx_2d else b_sz
    in_specs = [
        # context lens (SMEM, in-body predicate only)
        pl.BlockSpec((n_ctx,), lambda b, c: (0,),
                     memory_space=pltpu.SMEM),
        # q [B, next_n*h, d]
        pl.BlockSpec((1, nn * h, d), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        # weights [B, next_n, h]
        pl.BlockSpec((1, nn, h), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        # contiguous per-batch cache [B, mb*bkv, d] + sf [B, 1, mb*bkv]
        pl.BlockSpec((1, tile_kv, d), lambda b, c: (b, c, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, tile_kv), lambda b, c: (b, 0, c),
                     memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, nn, tile_kv), lambda b, c: (b, 0, c),
                            memory_space=pltpu.VMEM)

    def kernel(ctx_ref, q_ref, w_ref, *refs):
        out_ref = refs[-1]
        b = pl.program_id(0)
        c = pl.program_id(1)
        if spec.ctx_2d:
            # per-(batch, token) context lengths
            ctx_rows = [ctx_ref[b * nn + t] for t in range(nn)]
            ctx = ctx_rows[0]
            for t in range(1, nn):
                ctx = jnp.maximum(ctx, ctx_rows[t])
        else:
            ctx = ctx_ref[b]
        active = c * tile_kv < ctx

        @pl.when(jnp.logical_not(active))
        def _():
            out_ref[:] = jnp.full_like(out_ref, jnp.asarray(NEG_INF, out_dtype))

        @pl.when(active)
        def _():
            q_blk = q_ref[0]                                 # (nn*h, d)
            w3 = w_ref[0].astype(jnp.float32)                # (nn, h)
            kv_blk = refs[0][0]                               # (tile_kv, d)
            sf_row = refs[1][0]                               # (1, tile_kv)
            scores = jax.lax.dot_general(
                q_blk, kv_blk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)           # (nn*h, tile_kv)
            scores = jnp.maximum(scores, 0.0) * sf_row
            s3 = scores.reshape(nn, h, tile_kv)
            logits = jnp.sum(s3 * w3[:, :, None], axis=1)

            # Causal/context mask: token t of the query block attends to kv
            # positions <= its own offset (reference semantics,
            # tests/test_attention.py:255-275)
            col = c * tile_kv + jax.lax.broadcasted_iota(
                jnp.int32, (nn, tile_kv), 1)
            if spec.ctx_2d:
                q_off = jnp.zeros((nn, 1), jnp.int32)
                rid = jax.lax.broadcasted_iota(jnp.int32, (nn, 1), 0)
                for t, r in enumerate(ctx_rows):
                    q_off = jnp.where(rid == t, r, q_off)
            else:
                q_off = ctx - nn + 1 + jax.lax.broadcasted_iota(
                    jnp.int32, (nn, 1), 0)
            valid = (col < ctx) & (col < q_off)
            out_ref[0] = jnp.where(valid, logits.astype(out_dtype),
                                   jnp.asarray(NEG_INF, out_dtype))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b_sz, gkv),
        in_specs=in_specs,
        out_specs=out_spec,
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_sz, nn, spec.max_model_len), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_sz * nn * h * d * spec.max_model_len,
            bytes_accessed=0, transcendentals=0),
        interpret=is_cpu_backend(),
    )
    return jax.jit(call)


def _build_paged_mqa_zerocopy(spec: PagedMQASpec):
    """Zero-copy paged decode: the fp8 cache pages stay in HBM and stream
    through manual double-buffered async copies — pages for grid step c+1
    are issued while step c computes, so every DMA rides under MXU/VPU work.
    Replaces the bpt-independent-BlockSpec-window scheme whose per-window
    Mosaic pipeline machinery measured 99 GB/s (VERDICT r2 #4). Math is the
    one-dot linear_cache sequence, so results are bitwise-equal to the
    gather strategy."""
    b_sz, nn, h, d = spec.batch_size, spec.next_n, spec.num_heads, spec.head_dim
    bkv = spec.block_kv
    out_dtype = jnp.dtype(spec.logits_dtype)
    mb = spec.max_blocks_per_seq
    tile_kv = spec.tile_kv
    bpt = max(1, tile_kv // bkv)
    tile_kv = bpt * bkv
    gkv = ceil_div(spec.max_model_len, tile_kv)

    # bt/ctx are consumed in-body only (page indices for the manual DMAs,
    # the active predicate) — plain SMEM operands, prefetch-free grid spec
    # (same machinery finding as the gather path).
    n_ctx = b_sz * nn if spec.ctx_2d else b_sz
    in_specs = [
        pl.BlockSpec((b_sz * mb,), lambda b, c: (0,),
                     memory_space=pltpu.SMEM),                 # block table
        pl.BlockSpec((n_ctx,), lambda b, c: (0,),
                     memory_space=pltpu.SMEM),                 # context lens
        pl.BlockSpec((1, nn * h, d), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),                 # q
        pl.BlockSpec((1, nn, h), lambda b, c: (b, 0, 0),
                     memory_space=pltpu.VMEM),                 # weights
        pl.BlockSpec(memory_space=pl.ANY),                     # kv cache (HBM)
        pl.BlockSpec((1, 1, tile_kv), lambda b, c: (b, 0, c),
                     memory_space=pltpu.VMEM),                 # linear sf
    ]
    if spec.coalesce:
        # per-tile "all page pairs adjacent" flags, precomputed by ONE
        # vectorized XLA pass in the wrapper (see for_tile_copies)
        in_specs.append(pl.BlockSpec((b_sz * gkv,), lambda b, c: (0,),
                                     memory_space=pltpu.SMEM))
    out_spec = pl.BlockSpec((1, nn, tile_kv), lambda b, c: (b, 0, c),
                            memory_space=pltpu.VMEM)

    n_slots = max(2, spec.n_slots)

    def kernel(bt_ref, ctx_ref, q_ref, w_ref, kv_hbm, sf_ref, *rest):
        if spec.coalesce:
            adj_ref, out_ref, kv_vmem, copy_sems = rest
        else:
            out_ref, kv_vmem, copy_sems = rest
            adj_ref = None
        b = pl.program_id(0)
        c = pl.program_id(1)

        def row_ctx(bb):
            if spec.ctx_2d:
                m = ctx_ref[bb * nn]
                for t in range(1, nn):
                    m = jnp.maximum(m, ctx_ref[bb * nn + t])
                return m
            return ctx_ref[bb]

        ctx = row_ctx(b)
        active = c * tile_kv < ctx

        def _page_at(bb, cc, i):
            return bt_ref[bb * mb + jnp.minimum(cc * bpt + i, mb - 1)]

        def page_copy(bb, cc, i, slot, npages=1):
            # kv_vmem is (n_slots, bpt, bkv, d): page i of the tile lands in
            # row i, so an npages=2 PAIR copy is one contiguous 2-page DMA
            # (src pl.ds(page, 2) x dst pl.ds(i, 2)) — the 16KB-DMA
            # coalescing the zc roofline showed lifts the pure-DMA ceiling
            # 592 -> 728 GB/s (scripts/zc_roofline.py; the per-8KB issue
            # cost is the bound, not HBM row locality).
            page = _page_at(bb, cc, i)
            return pltpu.make_async_copy(
                kv_hbm.at[pl.ds(page, npages)],
                kv_vmem.at[slot, pl.ds(i, npages)],
                copy_sems.at[slot])

        def for_tile_copies(bb, cc, slot, fn):
            # Walk tile (bb, cc)'s page DMAs in the coalesced shape: the
            # tile's PRECOMPUTED adjacency LEVEL (adj_ref — one vectorized
            # XLA pass over the block table per call; the serving
            # PageAllocator's quad-aligned layout makes level 2 the common
            # case) selects 4-page 32KB DMAs (2), 2-page 16KB (1), or the
            # plain per-page loop (0). ONE SMEM load + branches per tile: a
            # per-PAIR branchy issue loop measured 243 GB/s vs 433
            # unconditional — the scalar-core branch path starved the DMA
            # engines; detection must not live in the kernel's issue loop.
            # The issue and wait sides branch on the same flag so every
            # started copy is waited exactly once.
            if not spec.coalesce or bpt < 2:
                for i in range(bpt):
                    fn(page_copy(bb, cc, i, slot))
                return
            lvl = adj_ref[bb * gkv + jnp.minimum(cc, gkv - 1)]

            if bpt >= 4:
                @pl.when(lvl == 2)
                def _():
                    for i in range(0, bpt - 3, 4):
                        fn(page_copy(bb, cc, i, slot, npages=4))
                    for i in range((bpt // 4) * 4, bpt - 1, 2):
                        fn(page_copy(bb, cc, i, slot, npages=2))
                    if bpt % 2:
                        fn(page_copy(bb, cc, bpt - 1, slot))

            @pl.when(lvl == 1 if bpt >= 4 else lvl >= 1)
            def _():
                for i in range(0, bpt - 1, 2):
                    fn(page_copy(bb, cc, i, slot, npages=2))
                if bpt % 2:
                    fn(page_copy(bb, cc, bpt - 1, slot))

            @pl.when(lvl == 0)
            def _():
                for i in range(bpt):
                    fn(page_copy(bb, cc, i, slot))

        def issue_tile(bb, cc, slot):
            # issue all pages of tile (bb, cc); inactive tiles issue nothing
            @pl.when((cc * tile_kv < row_ctx(bb)) & (bb < b_sz))
            def _():
                for_tile_copies(bb, cc, slot, lambda cp: cp.start())

        # linear tile sequence t = b*gkv + c; slot(t) = t mod n_slots;
        # step t issues tile t + (n_slots-1), so n_slots-1 tiles of scattered
        # page DMAs stay in flight under the compute (8KB page reads are
        # latency-bound — depth 2 measured 393 GB/s, depth 4+: see README)
        t_seq = b * gkv + c
        look = n_slots - 1

        @pl.when((b == 0) & (c == 0))
        def _():
            # bootstrap tiles 0 .. n_slots-2 into slots 0 .. n_slots-2
            for t0 in range(look):
                issue_tile(t0 // gkv, t0 % gkv, t0 % n_slots)

        # the tile this step must issue: t + look (slot = (t+look) mod S)
        nb = (t_seq + look) // gkv
        nc = jax.lax.rem(t_seq + look, gkv)
        nslot = jax.lax.rem(t_seq + look, n_slots)

        @pl.when(active)
        def _():
            # wait for our tile's pages (issued `look` steps earlier, or by
            # the bootstrap above), then prefetch tile t+look BEFORE
            # computing, so its DMAs ride under the MXU.
            slot = jax.lax.rem(t_seq, n_slots)
            for_tile_copies(b, c, slot, lambda cp: cp.wait())
            issue_tile(nb, nc, nslot)

            q_blk = q_ref[0]
            w3 = w_ref[0].astype(jnp.float32)
            # collapse the (bpt, bkv) page rows back to the tile's kv axis —
            # leading-dim collapse of a loaded value, relayout-free
            kv_blk = kv_vmem[slot].reshape(tile_kv, d)
            sf_row = sf_ref[0]
            scores = jax.lax.dot_general(
                q_blk, kv_blk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            scores = jnp.maximum(scores, 0.0) * sf_row
            s3 = scores.reshape(nn, h, tile_kv)
            logits = jnp.sum(s3 * w3[:, :, None], axis=1)

            col = c * tile_kv + jax.lax.broadcasted_iota(
                jnp.int32, (nn, tile_kv), 1)
            if spec.ctx_2d:
                q_off = jnp.zeros((nn, 1), jnp.int32)
                rid = jax.lax.broadcasted_iota(jnp.int32, (nn, 1), 0)
                for t in range(nn):
                    q_off = jnp.where(rid == t, ctx_ref[b * nn + t], q_off)
            else:
                q_off = ctx - nn + 1 + jax.lax.broadcasted_iota(
                    jnp.int32, (nn, 1), 0)
            valid = (col < ctx) & (col < q_off)
            out_ref[0] = jnp.where(valid, logits.astype(out_dtype),
                                   jnp.asarray(NEG_INF, out_dtype))

        @pl.when(jnp.logical_not(active))
        def _():
            out_ref[:] = jnp.full_like(out_ref,
                                       jnp.asarray(NEG_INF, out_dtype))
            # still prefetch tile t+look (this step has no compute to hide
            # it under, but the step that consumes it must find its pages
            # issued exactly once): only step t may issue tile t+look.
            issue_tile(nb, nc, nslot)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b_sz, gkv),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            # page-major ring (see page_copy): row i = page i of the slot's
            # tile, so adjacent-page PAIR DMAs write pl.ds(i, 2) contiguously
            pltpu.VMEM((n_slots, bpt, bkv, d), jnp.dtype(spec.kv_dtype)),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_sz, nn, spec.max_model_len),
                                       out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * b_sz * nn * h * d * spec.max_model_len,
            bytes_accessed=0, transcendentals=0),
        interpret=is_cpu_backend(),
    )
    return jax.jit(call)


def paged_mqa_logits(q: jnp.ndarray, kv_cache: jnp.ndarray, kv_sf: jnp.ndarray,
                     weights: jnp.ndarray, context_lens: jnp.ndarray,
                     block_table: jnp.ndarray, max_model_len: int,
                     logits_dtype=jnp.float32, tile_kv: int = 4096,
                     strategy: str = 'gather') -> jnp.ndarray:
    """q [B, next_n, h, d] fp8; kv_cache [num_blocks, block_kv, d] fp8 with
    per-token kv_sf [num_blocks, block_kv] f32; weights [B*next_n, h];
    context_lens [B] (1D, causal per-token offsets) or [B, next_n] (2D, all
    rows see ctx). Returns [B*next_n, max_model_len] with -inf outside range."""
    b_sz, nn, h, d = q.shape
    num_blocks, bkv = kv_cache.shape[0], kv_cache.shape[1]
    mb = block_table.shape[1]
    ctx_2d = context_lens.ndim == 2

    tile_kv = min(tile_kv, max(128, max_model_len))
    # The zero-copy kernel DMAs pages straight out of the HBM cache ref, so
    # each page slice must honor Mosaic's lane tiling: head_dim % 128. At
    # d=64 the interpreter accepts the slice but hardware rejects it
    # ("Slice shape along dimension 2 must be aligned to tiling (128)") —
    # fall back to the bitwise-identical gather strategy for narrow heads.
    linear = strategy == 'gather' or d % 128 != 0
    # Zero-copy DMA pipeline depth: scattered page reads are latency-bound,
    # so keep n_slots-1 tiles of page DMAs in flight (DGT_ZC_SLOTS pins it
    # for A/B profiling; default measured on chip, see README).
    import os as _os
    n_slots = int(_os.environ.get('DGT_ZC_SLOTS', '4'))
    # DGT_ZC_COALESCE={0,1} pins the adjacent-page-pair 16KB-DMA coalescing
    # for A/B profiling (default on; bitwise either way).
    coalesce = _os.environ.get('DGT_ZC_COALESCE', '1') == '1'
    spec = PagedMQASpec(
        batch_size=b_sz, next_n=nn, num_heads=h, head_dim=d,
        num_kv_blocks=num_blocks, block_kv=bkv, max_blocks_per_seq=mb,
        max_model_len=max_model_len, ctx_2d=ctx_2d,
        logits_dtype=str(jnp.dtype(logits_dtype)), tile_kv=tile_kv,
        linear_cache=linear, kv_dtype=str(kv_cache.dtype), n_slots=n_slots,
        coalesce=coalesce)
    builder = _build_paged_mqa if linear else _build_paged_mqa_zerocopy
    fn = kernel_cache().get_or_build(spec, lambda: builder(spec))

    q3 = q.reshape(b_sz, nn * h, d)
    w3 = weights.reshape(b_sz, nn, h)
    # Clamp table entries so out-of-context garbage never indexes OOB
    bt2 = jnp.clip(block_table.astype(jnp.int32), 0, num_blocks - 1)
    bt = bt2.reshape(-1)
    ctx = context_lens.astype(jnp.int32).reshape(-1)
    # The tiny f32 SF sideband rides a linear gather in BOTH strategies
    # (~B*mb*bkv*4 bytes, negligible next to the fp8 values); "zero-copy"
    # refers to the big cache pages, which only the gather strategy copies.
    sf_lin = kv_sf.astype(jnp.float32)[bt2].reshape(b_sz, 1, mb * bkv)
    if linear:
        # one XLA gather pass makes the per-batch cache contiguous; the
        # kernel then streams full tiles (large DMAs). bt is consumed by the
        # gather — the kernel itself is prefetch-free (ctx rides in SMEM).
        kv_lin = kv_cache[bt2].reshape(b_sz, mb * bkv, d)
        args = [ctx, q3, w3, kv_lin, sf_lin]
    else:
        args = [bt, ctx, q3, w3, kv_cache, sf_lin]
        if spec.coalesce:
            # per-tile adjacency LEVEL (2 = all quads adjacent, 1 = all
            # pairs, 0 = neither): one vectorized pass over the table —
            # replicates the kernel's clamped page lookup exactly,
            # including the repeated-last-page tail of short rows
            import numpy as np
            bpt = spec.tile_kv // bkv
            gkv = ceil_div(max_model_len, spec.tile_kv)
            idx = np.minimum(np.arange(gkv * bpt), mb - 1)
            bt_tiles = bt2[:, idx].reshape(b_sz, gkv, bpt)
            if bpt >= 2:
                npairs = (bpt // 2) * 2
                pair_adj = jnp.all(
                    bt_tiles[:, :, 1:npairs:2]
                    == bt_tiles[:, :, 0:npairs - 1:2] + 1, axis=2)
                lvl = pair_adj.astype(jnp.int32)
                if bpt >= 4:
                    nq = (bpt // 4) * 4
                    t4 = bt_tiles[:, :, :nq].reshape(b_sz, gkv, nq // 4, 4)
                    quad_adj = jnp.all(
                        t4[..., 1:] == t4[..., :1]
                        + jnp.arange(1, 4, dtype=bt_tiles.dtype), axis=(2, 3))
                    # quad level also needs the pair tail (nq..bpt) adjacent,
                    # which pair_adj already covers
                    lvl = jnp.where(quad_adj & pair_adj, 2, lvl)
            else:
                lvl = jnp.zeros((b_sz, gkv), jnp.int32)
            args.append(lvl.reshape(-1).astype(jnp.int32))
    out = fn(*args)
    return out.reshape(b_sz * nn, max_model_len)
