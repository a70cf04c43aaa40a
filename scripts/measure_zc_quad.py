#!/usr/bin/env python
"""On-chip zero-copy paged decode with QUAD-aligned pages (VERDICT r4 #5).

The r5 PageAllocator hands out (4i..4i+3) physically-adjacent runs; the
kernel's level-2 coalescing folds each into ONE 32KB DMA (pure-DMA
ceilings: scattered-8KB 592, pair-16KB 728, quad-32KB 732 GB/s —
scripts/zc_roofline.py). Target >= 680 GB/s (0.83 of HBM). Also re-reads
the pair and scattered layouts for the ladder, and asserts quad == gather
bitwise on device.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench


def main():
    import deepgemm_tpu as dg
    dg.init_persistent_cache()
    rng = np.random.RandomState(0)

    Bp, nn2, h2, d2 = 64, 1, 32, 128
    bkv, bps = 64, 64
    mml = bkv * bps
    nb = Bp * bps
    kvv = jnp.asarray(rng.randn(nb, bkv, d2), jnp.bfloat16)
    kvq = jnp.clip(kvv.astype(jnp.float32), -448,
                   448).astype(jnp.float8_e4m3fn)
    kvs = jnp.asarray(rng.rand(nb, bkv).astype(np.float32))
    ctx = jnp.full((Bp,), mml, jnp.int32)
    qp = jnp.clip(jnp.asarray(rng.randn(Bp, nn2, h2, d2), jnp.float32),
                  -448, 448).astype(jnp.float8_e4m3fn)
    wp = jnp.asarray(rng.randn(Bp * nn2, h2).astype(np.float32))
    cache_bytes = Bp * mml * d2

    tabs = {}
    tabs['scattered'] = rng.permutation(nb).reshape(Bp, bps)
    pairs = rng.permutation(nb // 2)
    tabs['paired'] = np.stack([pairs * 2, pairs * 2 + 1], 1).reshape(Bp, bps)
    quads = rng.permutation(nb // 4)
    tabs['quad'] = (quads[:, None] * 4 + np.arange(4)[None]).reshape(Bp, bps)

    # bitwise: quad zero-copy vs gather on device
    bt_q = jnp.asarray(tabs['quad'], jnp.int32)
    o_zc = dg.fp8_fp4_paged_mqa_logits((qp, None), (kvq, kvs), wp, ctx,
                                       bt_q, max_context_len=mml,
                                       strategy='paged')
    o_ga = dg.fp8_fp4_paged_mqa_logits((qp, None), (kvq, kvs), wp, ctx,
                                       bt_q, max_context_len=mml,
                                       strategy='gather')
    same = bool(jnp.all((o_zc == o_ga) | (jnp.isneginf(o_zc)
                                          & jnp.isneginf(o_ga))))
    print(f'quad zero-copy bitwise vs gather: {same}', flush=True)
    assert same

    for name, tab in tabs.items():
        bt = jnp.asarray(tab, jnp.int32)
        loop = bench._loop(lambda i, q_, w_, kv_, ks_, bt_=bt:
                           dg.fp8_fp4_paged_mqa_logits(
                               (jnp.roll(q_, i, 0), None), (kv_, ks_), w_,
                               ctx, bt_, max_context_len=mml,
                               strategy='paged')[0, i % mml]
                           .astype(jnp.float32))
        t = bench._device_time_of(loop, (qp, wp, kvq, kvs), f'zcq_{name}')
        gbps = cache_bytes / t / 1e9
        print(f'zero-copy {name:10s} {gbps:7.1f} GB/s  '
              f'({gbps / bench.HBM_GBPS:.3f} of HBM)', flush=True)


if __name__ == '__main__':
    main()
