#!/usr/bin/env python
"""Masked-decode occupancy crossover sweep (VERDICT r4 #8).

Sweeps expected_m/max_m in {1/8, 1/4, 1/2, 3/4, 1} at the bench masked
shape (G8, max_m 256, n 4096, k 7168 fp8) across the three masked
strategies:

  pf-skip     masked_m as scalar prefetch; inactive tiles' operand index
              maps clamp so their DMAs dedupe (B restream skipped)
  predicated  plain early-exit body (skips MXU only; B still streams)
  reroute     full-occupancy contiguous-static reroute (occ=1 only)

and prints each point against its B-STREAM ROOFLINE: with only the active
m-tiles streaming B, time >= (bytes_B + bytes_d + bytes_a) / HBM, so

  eff_TFLOPS_bound = 2 * valid_rows * n * k / that time.

The r4 heuristic threshold (pf-skip when expected_m*2 <= max_m,
kernels/grouped.py) is pinned to this data.
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
    from deepgemm_tpu.kernels.grouped import m_grouped_gemm_masked
    from deepgemm_tpu.ops.m_grouped import _grouped_sfb_t
    dg.init_persistent_cache()
    rng = np.random.RandomState(0)

    G, max_m, n, k = 8, 256, 4096, 7168
    am = jnp.asarray(rng.randn(G, max_m, k), jnp.bfloat16)
    amq, amsf = dg.per_token_cast_to_fp8(am.reshape(-1, k), use_ue8m0=False)
    amq = amq.reshape(G, max_m, k)
    amsf = amsf.reshape(G, max_m, -1)
    bg = jnp.asarray(rng.randn(G, n, k) * 0.1, jnp.bfloat16)
    bs = [dg.per_block_cast_to_fp8(bg[g], use_ue8m0=False) for g in range(G)]
    bq = jnp.stack([x[0] for x in bs])
    bsf = jnp.stack([x[1] for x in bs])
    sfb_t = _grouped_sfb_t(bsf, G, n, k, (128, 128), b_kmajor=True)

    def run(occ_m, mode):
        masked = jnp.full((G,), occ_m, jnp.int32)
        env = {'pf': '1', 'pred': '0'}.get(mode)
        if env is not None:
            os.environ['DGT_MASKED_PF_SKIP'] = env
        try:
            loop = bench._loop(lambda i, aq_, sf_, bq_, sfb_:
                               m_grouped_gemm_masked(
                                   aq_, bq_, masked,
                                   sfa=jnp.roll(sf_, i, 1), sfb_t=sfb_,
                                   out_dtype=jnp.bfloat16,
                                   expected_m=occ_m if mode != 'reroute'
                                   else max_m)[0, 0, i % n]
                               .astype(jnp.float32))
            t = bench._device_time_of(loop, (amq, amsf, bq, sfb_t),
                                      f'pfx_{mode}_{occ_m}')
        finally:
            os.environ.pop('DGT_MASKED_PF_SKIP', None)
        return t

    hbm = bench.HBM_GBPS * 1e9
    print(f'{"occ":>6} {"mode":>10} {"eff-TF":>8} {"us":>8} '
          f'{"roofline":>9} {"frac":>6}', flush=True)
    for occ_m in (32, 64, 128, 192, 256):
        flops = 2 * G * occ_m * n * k
        for mode in (('pf', 'pred') if occ_m < max_m
                     else ('pf', 'pred', 'reroute')):
            # roofline: active tiles stream B; d written for ALL tiles;
            # active a rows + SF sidebands negligible next to B
            bm_eff = min(256, max(32, occ_m))   # the heuristic bm hint
            act_tiles = -(-occ_m // bm_eff)
            b_bytes = (G * act_tiles * n * k if mode == 'pf'
                       else G * (max_m // bm_eff) * n * k)
            d_bytes = G * max_m * n * 2
            a_bytes = G * occ_m * k
            bound = flops / ((b_bytes + d_bytes + a_bytes) / hbm) / 1e12
            t = run(occ_m, mode)
            eff = flops / t / 1e12
            print(f'{occ_m / max_m:6.3f} {mode:>10} {eff:8.1f} '
                  f'{t * 1e6:8.1f} {bound:9.1f} {eff / bound:6.2f}',
                  flush=True)


if __name__ == '__main__':
    main()
