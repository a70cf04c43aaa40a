#!/usr/bin/env python
"""Focused on-chip masked-grouped measurement (bench shape): no-early-exit
default (expected_m == max_m) vs DGT_MASKED_FORCE_EXIT=1 predicated kernel.
AOT-check first (scripts/aot_check.py covers both legs). Diffs are computed
on device — never pull big arrays through the axon relay."""

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
    print(f'backend: {jax.default_backend()}', flush=True)

    Gm, max_m, nm, km = 8, 256, 4096, 7168
    am = jnp.asarray(rng.randn(Gm, max_m, km), jnp.bfloat16)
    amq, amsf = dg.per_token_cast_to_fp8(am.reshape(-1, km), use_ue8m0=False)
    amq = amq.reshape(Gm, max_m, km)
    amsf = amsf.reshape(Gm, max_m, -1)
    bmg = jnp.asarray(rng.randn(Gm, nm, km) * 0.1, jnp.bfloat16)
    bsm = [dg.per_block_cast_to_fp8(bmg[g], use_ue8m0=False)
           for g in range(Gm)]
    bmq = jnp.stack([x[0] for x in bsm])
    bmsf = jnp.stack([x[1] for x in bsm])
    sfbm_t = _grouped_sfb_t(bmsf, Gm, nm, km, (128, 128), b_kmajor=True)
    masked = jnp.full((Gm,), max_m, jnp.int32)
    flops_m = 2 * Gm * max_m * nm * km

    @jax.jit
    def _dev_diff(x, y):
        x, y = x.astype(jnp.float32), y.astype(jnp.float32)
        return 1.0 - 2.0 * jnp.vdot(x, y) / (jnp.vdot(x, x) + jnp.vdot(y, y))

    def call():
        return m_grouped_gemm_masked(amq, bmq, masked, sfa=amsf,
                                     sfb_t=sfbm_t, out_dtype=jnp.bfloat16,
                                     expected_m=max_m)

    d_noexit = call()
    os.environ['DGT_MASKED_FORCE_EXIT'] = '1'
    d_exit = call()
    os.environ.pop('DGT_MASKED_FORCE_EXIT')
    diff = float(_dev_diff(d_noexit, d_exit))
    print(f'no-exit vs predicated (on-device, full occupancy): {diff:.2e}',
          flush=True)
    assert diff == 0.0, diff
    del d_noexit, d_exit

    def loop():
        return bench._loop(lambda i, aq_, sf_, bq_, sfb_:
                           m_grouped_gemm_masked(
                               jnp.roll(aq_, i, 1), bq_, masked,
                               sfa=jnp.roll(sf_, i, 1), sfb_t=sfb_,
                               out_dtype=jnp.bfloat16,
                               expected_m=max_m)[0, 0, i].astype(jnp.float32))

    t = bench._device_time_of(loop(), (amq, amsf, bmq, sfbm_t), 'mk_noexit')
    print(f'masked G8 no-early-exit:  {flops_m / t / 1e12:7.1f} TFLOPS '
          f'({t * 1e6:.1f} us/iter)', flush=True)
    os.environ['DGT_MASKED_FORCE_EXIT'] = '1'
    t = bench._device_time_of(loop(), (amq, amsf, bmq, sfbm_t), 'mk_exit')
    print(f'masked G8 predicated:     {flops_m / t / 1e12:7.1f} TFLOPS '
          f'({t * 1e6:.1f} us/iter)', flush=True)
    os.environ.pop('DGT_MASKED_FORCE_EXIT')
    # honest XLA einsum baseline ([0, 0, i] dynamic consumption — DCE-proof,
    # relayout-free; see the bench.py wgrad note)
    loop_me = bench._loop(lambda i, a_, b_:
                          jnp.einsum('gmk,gnk->gmn', jnp.roll(a_, i, 1), b_,
                                     preferred_element_type=jnp.float32
                                     ).astype(jnp.bfloat16)[0, 0, i]
                          .astype(jnp.float32))
    t = bench._device_time_of(loop_me, (am, bmg), 'mk_xla')
    print(f'masked G8 XLA einsum:     {flops_m / t / 1e12:7.1f} TFLOPS '
          f'({t * 1e6:.1f} us/iter)', flush=True)


if __name__ == '__main__':
    main()
