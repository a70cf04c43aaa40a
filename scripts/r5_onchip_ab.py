#!/usr/bin/env python
"""Round-5 on-chip A/B sweeps: the swap-AB layout family (VERDICT r4 #1/#4).

One TPU process; run when the chip is free. Every spec here has a chipless
AOT PASS in scripts/r5_aot.py first (the relay-wedge rule).

Legs:
  1. dense fp8 128x4096x7168 (the decode-GEMM shape, r4 = 151.8 = 72% of
     its ~210 weight-stream roofline): plain vs swap-AB at the heuristic
     tile and at (128,1024,3584) / (128,256,7168).
  2. dense fp8 4096^3 (r4 = 188.8): plain vs swap — regression guard.
  3. grouped contiguous align128 uneven static (r4 = 176.7 = 0.929 of the
     aligned 190.1; diagnosed bm=128 dot height): plain vs swap.
  4. grouped contiguous ALIGNED bench shape (r4 = 190.1, bm=256): swap —
     does the tall-LHS effect still help when bm is already 256?
  5. masked skewed pf-skip (r4 = 76.7 eff): plain vs swap.

Prints one line per measurement: <name>  <TFLOPS>  (<us/iter>).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench  # relay guard at import; reuse the trace-timing harness


def show(name, t, flops):
    print(f'{name:52s} {flops / t / 1e12:7.1f} TFLOPS  '
          f'({t * 1e6:8.1f} us/iter)', flush=True)
    return flops / t / 1e12


def main():
    import deepgemm_tpu as dg
    from deepgemm_tpu.heuristics.configs import GemmConfig
    from deepgemm_tpu.kernels.dense import dense_gemm
    from deepgemm_tpu.kernels.grouped import (m_grouped_gemm_contiguous,
                                              m_grouped_gemm_masked)
    from deepgemm_tpu.ops.m_grouped import _grouped_sfb_t
    dg.init_persistent_cache()
    rng = np.random.RandomState(0)

    # ---- leg 1: dense small-m decode-GEMM shape --------------------------
    m, n, k = 128, 4096, 7168
    a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    b = jnp.asarray(rng.randn(n, k) * 0.1, jnp.bfloat16)
    aq, asf = dg.per_token_cast_to_fp8(a, use_ue8m0=False)
    bq, bsf = dg.per_block_cast_to_fp8(b, use_ue8m0=False)
    # per_block SF is [n/128, k/128]; the promote path wants sfb_t [ksf, n]
    sfb_t = jnp.repeat(bsf, 128, axis=0)[:n].T
    flops = 2 * m * n * k

    def run_dense(tag, swap, cfg=None):
        loop = bench._loop(lambda i, aq_, asf_, bq_, sfb_:
                           dense_gemm(aq_, bq_, sfa=jnp.roll(asf_, i, 0),
                                      sfb_t=sfb_, out_dtype=jnp.bfloat16,
                                      swap_ab=swap, cfg=cfg)[0, i % n]
                           .astype(jnp.float32))
        t = bench._device_time_of(loop, (aq, asf, bq, sfb_t),
                                  f'r5d_{tag}')
        return show(f'dense 128x4096x7168 {tag}', t, flops)

    tf_plain = run_dense('PLAIN heuristic', False)
    tf_swap = run_dense('SWAP heuristic', True)
    for bm, bn, bk in [(128, 1024, 3584), (128, 256, 7168)]:
        cfg = GemmConfig(block_m=bm, block_n=bn, block_k=bk,
                         scale_strategy='promote')
        run_dense(f'SWAP ({bm},{bn},{bk})', True, cfg)
    print(f'  -> swap/plain small-m = {tf_swap / tf_plain:.3f} '
          f'(r4 plain 151.8; roofline ~210)', flush=True)

    # ---- leg 2: dense 4096^3 regression guard ----------------------------
    m3 = n3 = k3 = 4096
    a3 = jnp.asarray(rng.randn(m3, k3), jnp.bfloat16)
    b3 = jnp.asarray(rng.randn(n3, k3) * 0.1, jnp.bfloat16)
    aq3, asf3 = dg.per_token_cast_to_fp8(a3, use_ue8m0=False)
    bq3, bsf3 = dg.per_block_cast_to_fp8(b3, use_ue8m0=False)
    sfb3_t = jnp.repeat(bsf3, 128, axis=0)[:n3].T
    flops3 = 2 * m3 * n3 * k3

    def run_d3(tag, swap):
        loop = bench._loop(lambda i, aq_, asf_, bq_, sfb_:
                           dense_gemm(aq_, bq_, sfa=jnp.roll(asf_, i, 0),
                                      sfb_t=sfb_, out_dtype=jnp.bfloat16,
                                      swap_ab=swap)[0, i % n3]
                           .astype(jnp.float32))
        t = bench._device_time_of(loop, (aq3, asf3, bq3, sfb3_t),
                                  f'r5d3_{tag}')
        return show(f'dense 4096^3 {tag}', t, flops3)

    tf3_plain = run_d3('PLAIN', False)
    tf3_swap = run_d3('SWAP', True)
    print(f'  -> swap/plain 4096^3 = {tf3_swap / tf3_plain:.3f} '
          f'(r4 188.8)', flush=True)

    # ---- legs 3+4: grouped contiguous align128 + aligned ----------------
    G, n, k = 8, 4096, 7168
    bg = jnp.asarray(rng.randn(G, n, k) * 0.1, jnp.bfloat16)
    bs = [dg.per_block_cast_to_fp8(bg[g], use_ue8m0=False) for g in range(G)]
    bqg = jnp.stack([x[0] for x in bs])
    bsfg = jnp.stack([x[1] for x in bs])
    sfbg_t = _grouped_sfb_t(bsfg, G, n, k, (128, 128), b_kmajor=True)
    mpg_list = [896 if g % 2 == 0 else 1152 for g in range(G)]
    m128 = sum(mpg_list)
    ids128 = np.repeat(np.arange(G, dtype=np.int32), mpg_list)
    a128 = jnp.asarray(rng.randn(m128, k), jnp.bfloat16)
    aq128, asf128 = dg.per_token_cast_to_fp8(a128, use_ue8m0=False)

    def run128(tag, swap):
        loop = bench._loop(lambda i, aq_, asf_, bq_, sfb_:
                           m_grouped_gemm_contiguous(
                               aq_, bq_, ids128, use_psum_layout=False,
                               sfa=jnp.roll(asf_, i, 0), sfb_t=sfb_,
                               swap_ab=swap,
                               out_dtype=jnp.bfloat16)[0, i % n]
                           .astype(jnp.float32))
        t = bench._device_time_of(loop, (aq128, asf128, bqg, sfbg_t),
                                  f'r5g128_{tag}')
        return show(f'align128 uneven static {tag}', t, 2 * m128 * n * k)

    tfg_plain = run128('PLAIN', False)
    tfg_swap = run128('SWAP', True)
    print(f'  -> swap/plain align128 = {tfg_swap / tfg_plain:.3f} '
          f'(r4 176.7 vs aligned 190.1)', flush=True)

    mpg = 1024
    ids = np.repeat(np.arange(G, dtype=np.int32), mpg)
    aA = jnp.asarray(rng.randn(G * mpg, k), jnp.bfloat16)
    aqA, asfA = dg.per_token_cast_to_fp8(aA, use_ue8m0=False)

    def runA(tag, swap):
        loop = bench._loop(lambda i, aq_, asf_, bq_, sfb_:
                           m_grouped_gemm_contiguous(
                               aq_, bq_, ids, use_psum_layout=False,
                               sfa=jnp.roll(asf_, i, 0), sfb_t=sfb_,
                               swap_ab=swap,
                               out_dtype=jnp.bfloat16)[0, i % n]
                           .astype(jnp.float32))
        t = bench._device_time_of(loop, (aqA, asfA, bqg, sfbg_t),
                                  f'r5gA_{tag}')
        return show(f'grouped aligned bm256 {tag}', t, 2 * G * mpg * n * k)

    tfA_swap = runA('SWAP', True)
    print(f'  -> swap aligned = {tfA_swap:.1f} (r4 plain 190.1)', flush=True)

    # ---- leg 5: masked skewed pf-skip ------------------------------------
    max_m, mlow = 256, 64
    am = jnp.asarray(rng.randn(G, max_m, k), jnp.bfloat16)
    amq, amsf = dg.per_token_cast_to_fp8(am.reshape(-1, k), use_ue8m0=False)
    amq = amq.reshape(G, max_m, k)
    amsf = amsf.reshape(G, max_m, -1)
    masked_lo = jnp.full((G,), mlow, jnp.int32)
    flops_lo = 2 * G * mlow * n * k

    def run_masked(tag, swap, cfg=None):
        loop = bench._loop(lambda i, aq_, sf_, bq_, sfb_:
                           m_grouped_gemm_masked(
                               aq_, bq_, masked_lo, sfa=jnp.roll(sf_, i, 1),
                               sfb_t=sfb_, out_dtype=jnp.bfloat16,
                               expected_m=mlow, swap_ab=swap,
                               cfg=cfg)[0, 0, i % n]
                           .astype(jnp.float32))
        t = bench._device_time_of(loop, (amq, amsf, bqg, sfbg_t),
                                  f'r5m_{tag}')
        return show(f'masked skewed pf-skip {tag}', t, flops_lo)

    # swap-AB needs bm % 128 == 0 (bm rides the lane dim); the heuristic
    # bm at expected_m=64 is 64, so compare at matched bm=128 tiles too
    cfg128 = GemmConfig(block_m=128, block_n=512, block_k=7168,
                        scale_strategy='promote')
    tfm_plain = run_masked('PLAIN bm64 (heuristic)', False)
    tfm_p128 = run_masked('PLAIN bm128', False, cfg128)
    tfm_swap = run_masked('SWAP bm128', True, cfg128)
    print(f'  -> swap/plain(128) masked skewed = '
          f'{tfm_swap / tfm_p128:.3f}; plain128/plain64 = '
          f'{tfm_p128 / tfm_plain:.3f} (r4 76.7 eff)', flush=True)


if __name__ == '__main__':
    main()
