#!/usr/bin/env python
"""On-chip A/B of the zero-copy paged-decode DMA pipeline depth
(DGT_ZC_SLOTS) and tile size, at the bench shape (B64, ctx 4096, permuted
block table). Correctness: on-device bitwise check vs the gather strategy
per config. AOT-precompile new specs chipless first if VMEM is a concern
(4 slots x 4096 x 128 fp8 = 2 MB — comfortably inside budget)."""

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
    print(f'backend: {jax.default_backend()}', flush=True)

    B, nn2, h2, d2 = 64, 1, 32, 128
    bkv, bps = 64, 64
    mml = bkv * bps
    nb = B * bps
    kvv = jnp.asarray(rng.randn(nb, bkv, d2), jnp.bfloat16)
    kvq = jnp.clip(kvv.astype(jnp.float32), -448, 448).astype(jnp.float8_e4m3fn)
    kvs = jnp.asarray(rng.rand(nb, bkv).astype(np.float32))
    btab = jnp.asarray(rng.permutation(nb).reshape(B, bps), jnp.int32)
    ctx = jnp.full((B,), mml, jnp.int32)
    qp = jnp.clip(jnp.asarray(rng.randn(B, nn2, h2, d2), jnp.float32),
                  -448, 448).astype(jnp.float8_e4m3fn)
    wp = jnp.asarray(rng.randn(B * nn2, h2).astype(np.float32))
    bytes_eff = B * mml * d2  # fp8 cache bytes one pass

    @jax.jit
    def _dev_equal(x, y):
        return jnp.all(x == y)

    from deepgemm_tpu.kernels.paged_mqa import paged_mqa_logits
    ref = paged_mqa_logits(qp, kvq, kvs, wp, ctx, btab, mml,
                           strategy='gather')

    def run(slots, tile):
        os.environ['DGT_ZC_SLOTS'] = str(slots)
        out = paged_mqa_logits(qp, kvq, kvs, wp, ctx, btab, mml,
                               tile_kv=tile, strategy='paged')
        eq = bool(_dev_equal(out, ref))
        del out
        loop = bench._loop(lambda i, q_, w_:
                           paged_mqa_logits(
                               jnp.roll(q_, i, 0), kvq, kvs, w_, ctx, btab,
                               mml, tile_kv=tile,
                               strategy='paged')[0, 0].astype(jnp.float32))
        t = bench._device_time_of(loop, (qp, wp), f'zc_s{slots}_t{tile}')
        print(f'slots={slots} tile={tile}: {bytes_eff / t / 1e9:6.1f} GB/s '
              f'({t * 1e6:.1f} us/iter)  bitwise-vs-gather: {eq}', flush=True)
        assert eq

    for slots, tile in [(2, 4096), (4, 4096), (8, 4096),
                        (8, 2048), (8, 1024), (16, 1024)]:
        run(slots, tile)
    os.environ.pop('DGT_ZC_SLOTS', None)


if __name__ == '__main__':
    main()
