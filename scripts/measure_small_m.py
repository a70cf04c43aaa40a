#!/usr/bin/env python
"""Small-m dense fp8 decomposition (VERDICT r4 #4): 128x4096x7168 sits at
~152 TFLOPS = 72% of its ~200 weight-stream roofline (B fp8 29.4 MB + out
= ~37 us floor; measured ~50 us). With gm == 1 the B matrix streams
exactly ONCE for every tile config, so the gap is pipeline ramp + promote
VPU exposure, not restreaming. Legs:

  1. (128,512,7168)   heuristic pick (8 steps of 3.7 MB)   [r4 = 151.8]
  2. (128,256,7168)   16 shallower steps (smoother ramp?)
  3. (128,1024,3584)  2 k-steps (acc roundtrip, wider lanes)
  4. (128,4096,1024)  ONE n-tile, 7 k-steps (B never re-blocked)
  5. (128,512,7168)   UNSCALED fp8 (no promote epilogue) — isolates the
                      per-sub-block VPU scale cost
  6. XLA bf16 dot     the roofline-of-record baseline
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
    from deepgemm_tpu.heuristics.configs import GemmConfig
    from deepgemm_tpu.kernels.dense import dense_gemm
    dg.init_persistent_cache()
    rng = np.random.RandomState(0)

    m, n, k = 128, 4096, 7168
    a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    b = jnp.asarray(rng.randn(n, k) * 0.1, jnp.bfloat16)
    aq, asf = dg.per_token_cast_to_fp8(a, use_ue8m0=False)
    bq, bsf = dg.per_block_cast_to_fp8(b, use_ue8m0=False)
    sfb_t = jnp.repeat(bsf, 128, axis=0)[:n].T
    flops = 2 * m * n * k

    def run(tag, cfg=None, scaled=True):
        if scaled:
            loop = bench._loop(lambda i, aq_, asf_, bq_, sfb_:
                               dense_gemm(aq_, bq_, sfa=jnp.roll(asf_, i, 0),
                                          sfb_t=sfb_, out_dtype=jnp.bfloat16,
                                          cfg=cfg)[0, i % n]
                               .astype(jnp.float32))
            args = (aq, asf, bq, sfb_t)
        else:
            # unscaled: roll the small A operand instead of SF
            loop = bench._loop(lambda i, aq_, bq_:
                               dense_gemm(jnp.roll(aq_, i, 0), bq_,
                                          out_dtype=jnp.bfloat16,
                                          cfg=cfg)[0, i % n]
                               .astype(jnp.float32))
            args = (aq, bq)
        t = bench._device_time_of(loop, args, f'smallm_{tag}')
        print(f'{tag:36s} {flops / t / 1e12:7.1f} TFLOPS '
              f'({t * 1e6:7.1f} us/iter)', flush=True)
        return t

    run('scaled (128,512,7168) heuristic')
    run('scaled (128,256,7168)',
        GemmConfig(128, 256, 7168, 'promote'))
    run('scaled (128,1024,3584)',
        GemmConfig(128, 1024, 3584, 'promote'))
    run('scaled (128,4096,1024)',
        GemmConfig(128, 4096, 1024, 'promote'))
    run('UNSCALED fp8 (128,512,7168)',
        GemmConfig(128, 512, 7168, 'promote'), scaled=False)

    loop_x = bench._loop(lambda i, a_, b_:
                         jnp.dot(jnp.roll(a_, i, 0), b_.T,
                                 preferred_element_type=jnp.float32)
                         .astype(jnp.bfloat16)[0, i % n]
                         .astype(jnp.float32))
    t_x = bench._device_time_of(loop_x, (a, b), 'smallm_xla')
    print(f'{"XLA bf16 dot":36s} {flops / t_x / 1e12:7.1f} TFLOPS '
          f'({t_x * 1e6:7.1f} us/iter)', flush=True)


if __name__ == '__main__':
    main()
