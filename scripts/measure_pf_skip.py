#!/usr/bin/env python
"""On-chip A/B for the masked pf-skip decode variant (round 4).

Shape mirrors bench.py's fp8_grouped_masked_skewed_G8 leg exactly:
G=8, max_m=256, n=4096, k=7168, masked counts = expected_m = max_m/4 = 64.
The r4 diagnosis: the plain predicated kernel early-exits the MXU only —
every inactive m-tile still streams its B block (B restreamed 4x at bm=64),
reading 23.1 effective TFLOPS (0.532 vs the full-padded XLA einsum).
pf-skip clamps inactive tiles' operand index maps to a constant so Mosaic's
revisit-dedup skips their DMAs.

Legs: pf-skip forced ON vs forced OFF (same kernel otherwise), plus the
on-device bitwise check and the padded-einsum baseline. Effective TFLOPS
counts only valid rows (the masked kernel's whole point).
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
    print(f'backend: {jax.default_backend()}', flush=True)

    Gm, max_m, nm, km = 8, 256, 4096, 7168
    mlow = max_m // 4
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
    masked_lo = jnp.full((Gm,), mlow, jnp.int32)
    flops_lo = 2 * Gm * mlow * nm * km

    @jax.jit
    def _dev_diff(x, y):
        x, y = x.astype(jnp.float32), y.astype(jnp.float32)
        return 1.0 - 2.0 * jnp.vdot(x, y) / (jnp.vdot(x, x) + jnp.vdot(y, y))

    def call():
        return m_grouped_gemm_masked(amq, bmq, masked_lo, sfa=amsf,
                                     sfb_t=sfbm_t, out_dtype=jnp.bfloat16,
                                     expected_m=mlow)

    os.environ['DGT_MASKED_PF_SKIP'] = '1'
    y_pf = call()
    os.environ['DGT_MASKED_PF_SKIP'] = '0'
    y_plain = call()
    # bitwise on the VALID rows only (garbage rows are unspecified)
    d = float(_dev_diff(y_pf[:, :mlow], y_plain[:, :mlow]))
    print(f'pf-skip vs plain (valid rows, on-device): calc_diff={d:.2e}',
          flush=True)
    assert d == 0.0, d
    del y_pf, y_plain

    def loop():
        return bench._loop(lambda i, aq_, sf_, bq_, sfb_:
                           m_grouped_gemm_masked(
                               aq_, bq_, masked_lo,
                               sfa=jnp.roll(sf_, i, 1), sfb_t=sfb_,
                               out_dtype=jnp.bfloat16,
                               expected_m=mlow)[0, 0, 0]
                           .astype(jnp.float32))

    for tag, v in (('pf-skip ON ', '1'), ('pf-skip OFF', '0')):
        os.environ['DGT_MASKED_PF_SKIP'] = v
        t = bench._device_time_of(loop(), (amq, amsf, bmq, sfbm_t),
                                  f'pfskip_{v}')
        print(f'masked skewed G8 {tag}: {flops_lo / t / 1e12:7.1f} eff-TFLOPS'
              f' ({t * 1e6:.1f} us/iter)', flush=True)
    os.environ.pop('DGT_MASKED_PF_SKIP')

    # padded XLA einsum baseline (counts the same valid-rows flops)
    loop_me = bench._loop(lambda i, a_, b_:
                          jnp.einsum('gmk,gnk->gmn', jnp.roll(a_, i, 1), b_,
                                     preferred_element_type=jnp.float32
                                     ).astype(jnp.bfloat16)[0, 0, i]
                          .astype(jnp.float32))
    t = bench._device_time_of(loop_me, (am, bmg), 'pfskip_xla')
    print(f'padded XLA einsum baseline: {flops_lo / t / 1e12:7.1f} eff-TFLOPS'
          f' ({t * 1e6:.1f} us/iter)', flush=True)


if __name__ == '__main__':
    main()
