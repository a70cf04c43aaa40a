#!/usr/bin/env python
"""On-chip A/B: DUAL-B straddle bm=256 contiguous kernel vs the bm=128
static path at the bench align128 layout (r5; the traffic fix for the
0.929 gap after swap-AB measured negative).

Model: bm=128 streams B once per 128-row tile (64 passes = 1.88 GB); the
dual-B bm=256 grid streams B_top per 256-row tile (32 passes) + B_bot only
on the 4 straddle tiles = 36 passes ≈ 1.06 GB. At (256,256,7168) the A
restream doubles (940 MB) — total 2.06 vs 2.42 GB, with the MXU time
(~2.53 ms at the 190-class rate) becoming the bound.

Also asserts dual-B == plain BITWISE on device.
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
    from deepgemm_tpu.kernels.grouped import m_grouped_gemm_contiguous
    from deepgemm_tpu.ops.m_grouped import _grouped_sfb_t
    dg.init_persistent_cache()
    rng = np.random.RandomState(0)

    G, n, k = 8, 4096, 7168
    bg = jnp.asarray(rng.randn(G, n, k) * 0.1, jnp.bfloat16)
    bs = [dg.per_block_cast_to_fp8(bg[g], use_ue8m0=False) for g in range(G)]
    bq = jnp.stack([x[0] for x in bs])
    bsf = jnp.stack([x[1] for x in bs])
    sfb_t = _grouped_sfb_t(bsf, G, n, k, (128, 128), b_kmajor=True)
    mpg_list = [896 if g % 2 == 0 else 1152 for g in range(G)]
    m128 = sum(mpg_list)
    ids128 = np.repeat(np.arange(G, dtype=np.int32), mpg_list)
    a128 = jnp.asarray(rng.randn(m128, k), jnp.bfloat16)
    aq, asf = dg.per_token_cast_to_fp8(a128, use_ue8m0=False)

    def call(aq_, asf_, bq_, sfb_):
        return m_grouped_gemm_contiguous(
            aq_, bq_, ids128, use_psum_layout=False,
            sfa=asf_, sfb_t=sfb_, out_dtype=jnp.bfloat16)

    # bitwise on device first
    outs = {}
    for mode in ('0', '1'):
        os.environ['DGT_GROUPED_DUAL_B'] = mode
        outs[mode] = jax.jit(call)(aq, asf, bq, sfb_t)
    same = bool(jnp.all(outs['0'] == outs['1']))
    print(f'dual-B bitwise vs plain on TPU: {same}', flush=True)
    assert same
    del outs

    flops = 2 * m128 * n * k
    for mode, tag in (('0', 'PLAIN bm128 static'), ('1', 'DUAL-B bm256')):
        os.environ['DGT_GROUPED_DUAL_B'] = mode
        loop = bench._loop(lambda i, aq_, asf_, bq_, sfb_:
                           call(aq_, jnp.roll(asf_, i, 0), bq_,
                                sfb_)[0, i % n].astype(jnp.float32))
        t = bench._device_time_of(loop, (aq, asf, bq, sfb_t),
                                  f'dualb_{tag.split()[0]}')
        print(f'align128 {tag:22s} {flops / t / 1e12:7.1f} TFLOPS '
              f'({t * 1e6:8.1f} us/iter)', flush=True)
    os.environ.pop('DGT_GROUPED_DUAL_B', None)


if __name__ == '__main__':
    main()
