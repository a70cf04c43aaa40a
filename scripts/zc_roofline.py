#!/usr/bin/env python
"""Scattered-page-read roofline microbench (VERDICT r3 #3): what GB/s can a
Pallas kernel sustain from manual per-page HBM->VMEM DMAs alone, with NO MQA
compute? Separates the zero-copy decode kernel's 433 GB/s (0.53 of HBM) into
its possible causes:

  * pure-DMA scattered 8KB pages at pipeline depths 2/4/8  — if this matches
    ~433, the kernel is already AT the machine's scattered-read/DMA-issue
    ceiling and the gap vs 819 GB/s is hardware, not a pipeline defect;
  * the same page-sized DMAs from CONTIGUOUS addresses — separates HBM row
    locality from DMA-issue rate (equal => issue-rate-bound, faster =>
    locality-bound);
  * ONE contiguous tile-sized DMA per step (the large-DMA upper bound of the
    same ring-buffer pipeline);
  * 2x page size (16KB: two consecutive table pages coalesced into one DMA,
    the `pair-coalesced` variant a serving layout could guarantee).

Run on the real chip (one TPU process!): python scripts/zc_roofline.py
Prints one line per leg: <name>  <GB/s>  (<us/iter>).
Mirrors the zero-copy kernel's ring protocol (kernels/paged_mqa.py:174-328).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import bench  # relay guard at import; reuse the trace-timing harness

B, BKV, MB, D = 64, 64, 64, 128          # bench dims: ctx 4096, 8KB pages
NB = B * MB                              # 4096 pages in the cache


def build_dma_kernel(*, n_slots: int, pages_per_dma: int, contiguous: bool,
                     tile_pages: int = 64):
    """Pure-DMA pipeline: grid step t waits slot t%S, issues tile t+S-1,
    consumes one element per tile (so nothing is dead). Copies are
    ``pages_per_dma`` consecutive cache pages per DMA (1 = the zero-copy
    kernel's 8KB reads; tile_pages = one big tile read)."""
    bkv, d = BKV, D
    n_dma = tile_pages // pages_per_dma
    gkv = MB // tile_pages                      # tiles per batch row
    n_tiles = B * gkv

    def kernel(bt_ref, kv_hbm, out_ref, kv_vmem, copy_sems):
        t_seq = pl.program_id(0)
        look = n_slots - 1

        def dma(tile, i, slot):
            # ALWAYS table-driven (contiguous legs pass an arange table):
            # keeps every leg's loop body dependent on the rolled table so
            # XLA cannot hoist the kernel out of the timing loop.
            page0 = bt_ref[jnp.minimum(tile * n_dma + i,
                                       n_tiles * n_dma - 1)]
            return pltpu.make_async_copy(
                kv_hbm.at[pl.ds(page0, pages_per_dma)],
                kv_vmem.at[slot, pl.ds(i * pages_per_dma, pages_per_dma)],
                copy_sems.at[slot])

        def issue_tile(tile, slot):
            @pl.when(tile < n_tiles)
            def _():
                for i in range(n_dma):
                    dma(tile, i, slot).start()

        @pl.when(t_seq == 0)
        def _():
            for t0 in range(look):
                issue_tile(t0, t0 % n_slots)

        slot = jax.lax.rem(t_seq, n_slots)
        for i in range(n_dma):
            dma(t_seq, i, slot).wait()
        issue_tile(t_seq + look, jax.lax.rem(t_seq + look, n_slots))
        # consume: one lane of the landed tile (prevents any dead-code doubt;
        # cost is negligible next to the 512KB transfer)
        out_ref[0] = kv_vmem[slot, 0, :1, :].astype(jnp.float32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((n_tiles * n_dma,), lambda t: (0,),
                         memory_space=pltpu.SMEM),   # scattered page table
            pl.BlockSpec(memory_space=pl.ANY),       # cache (HBM)
        ],
        out_specs=pl.BlockSpec((1, 1, d), lambda t: (t, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_slots, tile_pages, bkv, d), jnp.float8_e4m3fn),
            pltpu.SemaphoreType.DMA((n_slots,)),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 1, d), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',)),
    )


def main():
    rng = np.random.RandomState(0)
    kv = jnp.asarray(
        rng.randint(-8, 8, (NB, BKV, D)).astype(np.float32) / 8.0
    ).astype(jnp.float8_e4m3fn)
    total_bytes = NB * BKV * D               # every page read exactly once

    def run(name, *, n_slots, pages_per_dma, contiguous):
        n_dma = 64 // pages_per_dma
        n_tiles = B * (MB // 64)
        # scattered table: a random permutation of all pages, chunked so DMA
        # i of tile t reads pages_per_dma CONSECUTIVE physical pages starting
        # at a scattered base (pair-coalescing needs physically-adjacent
        # pairs, which a serving allocator can guarantee)
        if contiguous:
            table = (np.arange(NB // pages_per_dma, dtype=np.int32)
                     * pages_per_dma)
        elif pages_per_dma == 1:
            table = rng.permutation(NB).astype(np.int32)
        else:
            base = rng.permutation(NB // pages_per_dma).astype(np.int32)
            table = (base * pages_per_dma).astype(np.int32)
        bt = jnp.asarray(table)
        fn = jax.jit(build_dma_kernel(n_slots=n_slots,
                                      pages_per_dma=pages_per_dma,
                                      contiguous=contiguous))

        @jax.jit
        def loop(bt_, kv_):
            def body(i, acc):
                # REAL i-dependence: roll the (tiny) page table — a rolled
                # permutation is still a permutation, so every iteration
                # reads all pages once. (A folded `bt + (i-i)` let XLA
                # hoist the kernel: first run read 8 TB/s.)
                o = fn(jnp.roll(bt_, i), kv_)
                return acc + o[0, 0, 0]
            return jax.lax.fori_loop(0, bench.N_ITERS, body, 0.0)

        t = bench._device_time_of(loop, (bt, kv), f'zcroof_{name}')
        gbps = total_bytes / t / 1e9
        print(f'{name:44s} {gbps:7.1f} GB/s  ({t * 1e6:8.1f} us/iter)',
              flush=True)
        return gbps

    for s in (2, 4, 8):
        run(f'scattered 8KB pages, depth {s}', n_slots=s, pages_per_dma=1,
            contiguous=False)
    run('contiguous 8KB-page DMAs, depth 4', n_slots=4, pages_per_dma=1,
        contiguous=True)
    run('scattered 16KB (pair-coalesced), depth 4', n_slots=4,
        pages_per_dma=2, contiguous=False)
    run('scattered 32KB (quad-coalesced), depth 4', n_slots=4,
        pages_per_dma=4, contiguous=False)
    run('one 512KB tile DMA per step, depth 4', n_slots=4, pages_per_dma=64,
        contiguous=True)


if __name__ == '__main__':
    main()
