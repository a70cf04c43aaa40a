#!/usr/bin/env python
"""Quantify the bench-loop input-refresh (jnp.roll) overhead at the dense
4096^3 shape, and whether XLA fuses the roll into its own dot (it matters
for the roofline fraction: the Pallas custom call cannot absorb the roll).

Legs:
  1. roll-only loop (roll A + trivially consume)  -> the raw copy cost
  2. kernel leg as-in-bench (roll A)              -> 176.2 in BENCH_r03
  3. kernel leg rolling only the 128KB SF operand -> kernel sans big-roll
  4. XLA bf16 dot as-in-bench (roll A)            -> 188 reference
  5. XLA bf16 dot with no roll (hoisting DEFEATED by consuming acc into
     the next iteration's operand via a scalar add) -> dot sans roll
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
    print(f'backend: {jax.default_backend()}', flush=True)

    m, n, k = 4096, 4096, 4096
    a = jnp.asarray(rng.randn(m, k), dtype=jnp.bfloat16)
    b = jnp.asarray(rng.randn(n, k), dtype=jnp.bfloat16)
    aq, asf = dg.per_token_cast_to_fp8(a, use_ue8m0=False)
    bq, bsf = dg.per_block_cast_to_fp8(b, use_ue8m0=False)
    flops = 2 * m * n * k

    def report(tag, t):
        print(f'{tag:34s} {t * 1e6:8.1f} us/iter  '
              f'({flops / t / 1e12:6.1f} "TFLOPS")', flush=True)
        return t

    # 1. roll-only: copy cost of refreshing the fp8 A operand
    loop_roll = bench._loop(lambda i, av:
                            jnp.roll(av, i, 0)[0, i].astype(jnp.float32))
    t_roll = report('roll-only (fp8 A, 16.8MB)',
                    bench._device_time_of(loop_roll, (aq,), 'roll_only'))

    # 2. kernel, bench methodology (roll A)
    loop_kb = bench._loop(lambda i, av, sf, bv, bs2:
                          dg.fp8_gemm_nt((jnp.roll(av, i, 0), sf),
                                         (bv, bs2))[0, 0].astype(jnp.float32))
    t_kb = report('kernel, roll A (bench leg)',
                  bench._device_time_of(loop_kb, (aq, asf, bq, bsf), 'k_rollA'))

    # 3. kernel, roll only the SF operand (128KB f32) — defeats hoisting,
    #    leaves the 16.8MB A in place
    loop_ks = bench._loop(lambda i, av, sf, bv, bs2:
                          dg.fp8_gemm_nt((av, jnp.roll(sf, i, 0)),
                                         (bv, bs2))[0, 0].astype(jnp.float32))
    t_ks = report('kernel, roll SF only',
                  bench._device_time_of(loop_ks, (aq, asf, bq, bsf), 'k_rollSF'))

    # 4. XLA dot, bench methodology
    loop_xb = bench._loop(lambda i, a_, b_:
                          jnp.dot(jnp.roll(a_, i, 0), b_.T,
                                  preferred_element_type=jnp.float32
                                  ).astype(jnp.bfloat16)[0, 0]
                          .astype(jnp.float32))
    t_xb = report('XLA bf16 dot, roll A (bench leg)',
                  bench._device_time_of(loop_xb, (a, b), 'x_rollA'))

    # 5. XLA dot, roll only one 128-row slice of A (cheap refresh)
    loop_xs = bench._loop(lambda i, a_, b_:
                          jnp.dot(a_.at[:128].set(
                              jnp.roll(a_[:128], i, 0)), b_.T,
                                  preferred_element_type=jnp.float32
                                  ).astype(jnp.bfloat16)[0, 0]
                          .astype(jnp.float32))
    t_xs = report('XLA bf16 dot, refresh 128 rows',
                  bench._device_time_of(loop_xs, (a, b), 'x_slice'))

    print(f'\nroll-corrected kernel: {flops / (t_kb - t_roll) / 1e12:6.1f} '
          f'TFLOPS ({(flops / (t_kb - t_roll) / 1e12) / 197.0 * 100:.1f}% of '
          f'197 fp8 roofline)', flush=True)


if __name__ == '__main__':
    main()
