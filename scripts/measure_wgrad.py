#!/usr/bin/env python
"""Focused on-chip wgrad measurement (bench shape, c=None): stepped-SF
static path (default) vs DGT_KG_FORCE_PREFETCH=1 dynamic kernel. AOT-check
first (scripts/aot_check.py covers both legs)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench


def main():
    import deepgemm_tpu as dg
    from deepgemm_tpu.kernels.k_grouped import k_grouped_gemm
    dg.init_persistent_cache()
    rng = np.random.RandomState(0)
    print(f'backend: {jax.default_backend()}', flush=True)

    Gk, mk_, nk_, kpg = 4, 4096, 7168, 2048
    tk = Gk * kpg
    ak = jnp.asarray(rng.randn(tk, mk_) * 0.1, jnp.bfloat16)
    bk_ = jnp.asarray(rng.randn(tk, nk_) * 0.1, jnp.bfloat16)
    akq, aksf = dg.per_channel_cast_to_fp8(ak, use_ue8m0=False)
    bkq, bksf = dg.per_channel_cast_to_fp8(bk_, use_ue8m0=False)
    ks_list = [kpg] * Gk
    flops_k = 2 * mk_ * nk_ * tk

    # Correctness spot check vs the prefetch kernel. The two paths may pick
    # DIFFERENT block_k (the spg==1 acc-scratch credit applies only to the
    # static kernel), so f32 accumulation grouping differs — tolerance, not
    # bitwise (bitwise equality at identical bk is covered by
    # test_k_grouped_static_equals_prefetch). The diff is computed ON DEVICE
    # (pull scalars only — a 470MB np.asarray through the axon relay takes
    # minutes and a timeout kill mid-transfer wedges the relay).
    @jax.jit
    def _dev_diff(x, y):
        x, y = x.astype(jnp.float32), y.astype(jnp.float32)
        return 1.0 - 2.0 * jnp.vdot(x, y) / (jnp.vdot(x, x) + jnp.vdot(y, y))

    d_static = k_grouped_gemm(akq, bkq, None, jnp.asarray(ks_list, jnp.int32),
                              use_psum_layout=False, sfa_t=aksf, sfb_t=bksf,
                              ks_cpu=ks_list)
    os.environ['DGT_KG_FORCE_PREFETCH'] = '1'
    d_pf = k_grouped_gemm(akq, bkq, None, jnp.asarray(ks_list, jnp.int32),
                          use_psum_layout=False, sfa_t=aksf, sfb_t=bksf,
                          ks_cpu=ks_list)
    os.environ.pop('DGT_KG_FORCE_PREFETCH')
    diff = float(_dev_diff(d_static, d_pf))
    print(f'stepped vs prefetch calc_diff (on-device): {diff:.2e}', flush=True)
    assert diff < 1e-6, diff
    del d_static, d_pf

    def loop(salt):
        return bench._loop(lambda i, a_, b_, sa, sb:
                           k_grouped_gemm(jnp.roll(a_, i, 1), b_, None,
                                          jnp.asarray(ks_list, jnp.int32),
                                          use_psum_layout=False,
                                          sfa_t=jnp.roll(sa, i, 1), sfb_t=sb,
                                          ks_cpu=ks_list).reshape(-1)[salt])

    t = bench._device_time_of(loop(0), (akq, bkq, aksf, bksf), 'kg_stepped')
    print(f'wgrad G4 stepped-SF static: {flops_k / t / 1e12:7.1f} TFLOPS '
          f'({t * 1e6:.1f} us/iter)', flush=True)
    os.environ['DGT_KG_FORCE_PREFETCH'] = '1'
    t = bench._device_time_of(loop(1), (akq, bkq, aksf, bksf), 'kg_prefetch2')
    print(f'wgrad G4 prefetch (forced):  {flops_k / t / 1e12:7.1f} TFLOPS '
          f'({t * 1e6:.1f} us/iter)', flush=True)
    os.environ.pop('DGT_KG_FORCE_PREFETCH')


if __name__ == '__main__':
    main()
