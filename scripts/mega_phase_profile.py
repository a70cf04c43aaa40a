#!/usr/bin/env python
"""Phase-level timing of the fused mega kernel vs the unfused chain at the
bench serving dims (D=1) — finds where the remaining fused-vs-unfused gap
lives (bench r4: fused 157.0 vs unfused 160.4 TFLOPS, ratio 0.979).

Measures, each with the bench fori_loop/trace methodology:
  L1 only   : masked grouped (full-occupancy reroute) x into gate|up
  requant   : XLA SwiGLU + topk weight + per-token FP8 requant
  L2 only   : masked grouped act -> y
  unfused   : the 3-stage chain (sanity: ~= L1 + rq + L2)
  fused     : the mega kernel

One TPU process; run when the chip is free.
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
    from deepgemm_tpu.ops.m_grouped import _grouped_sfb_t
    from deepgemm_tpu.kernels.grouped import m_grouped_gemm_masked
    from deepgemm_tpu.kernels.fused_moe import fused_mega_moe
    from deepgemm_tpu.parallel.moe import swiglu_apply_weight_to_fp8
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    dg.init_persistent_cache()
    rng = np.random.RandomState(0)
    EL, cap, H, I = 8, 128, 7168, 2048
    xm = jnp.asarray(rng.randn(EL * cap, H) * 0.5, jnp.bfloat16)
    xq, xsf = dg.per_token_cast_to_fp8(xm, use_ue8m0=False)
    xq3 = xq.reshape(EL, cap, H)
    xsf3 = xsf.reshape(EL, cap, -1)
    rw = jnp.asarray(rng.rand(EL, cap).astype(np.float32))
    w1 = jnp.asarray(rng.randn(EL, 2 * I, H) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(EL, H, I) * 0.02, jnp.bfloat16)
    w1q, w1sf, w2q, w2sf = [], [], [], []
    for e in range(EL):
        vq, vs = dg.per_block_cast_to_fp8(w1[e], use_ue8m0=False)
        w1q.append(vq); w1sf.append(vs)
        vq, vs = dg.per_block_cast_to_fp8(w2[e], use_ue8m0=False)
        w2q.append(vq); w2sf.append(vs)
    w1q, w1sf = jnp.stack(w1q), jnp.stack(w1sf)
    w2q, w2sf = jnp.stack(w2q), jnp.stack(w2sf)
    sfb1 = _grouped_sfb_t(w1sf, EL, 2 * I, H, (128, 128), b_kmajor=True)
    sfb2 = _grouped_sfb_t(w2sf, EL, H, I, (128, 128), b_kmajor=True)
    full = jnp.full((EL,), cap, jnp.int32)
    fl1 = 2 * EL * cap * 2 * I * H
    fl2 = 2 * EL * cap * H * I

    def show(name, t, flops=None):
        tf = f'{flops / t / 1e12:7.1f} TFLOPS ' if flops else ' ' * 15
        print(f'{name:28s} {t * 1e6:8.1f} us/iter  {tf}', flush=True)
        return t

    # L1 only
    loop_l1 = bench._loop(
        lambda i, xq_, sf_, w_, sb_: m_grouped_gemm_masked(
            xq_, w_, full, sfa=jnp.roll(sf_, i, 1), sfb_t=sb_,
            out_dtype=jnp.bfloat16, expected_m=cap)[0, 0, i]
        .astype(jnp.float32))
    t_l1 = show('L1 masked (reroute)',
                bench._device_time_of(loop_l1, (xq3, xsf3, w1q, sfb1),
                                      'ph_l1'), fl1)

    # requant only (gu bf16 -> fp8 act + sf)
    gu = jax.jit(lambda xq_, sf_, w_, sb_: m_grouped_gemm_masked(
        xq_, w_, full, sfa=sf_, sfb_t=sb_, out_dtype=jnp.bfloat16,
        expected_m=cap))(xq3, xsf3, w1q, sfb1)
    loop_rq = bench._loop(
        lambda i, gu_, rw_: swiglu_apply_weight_to_fp8(
            jnp.roll(gu_, i, 1), rw_)[0][0, 0, i].astype(jnp.float32))
    t_rq = show('SwiGLU+requant (XLA)',
                bench._device_time_of(loop_rq, (gu, rw), 'ph_rq'))

    # L2 only
    aq2, asf2 = jax.jit(swiglu_apply_weight_to_fp8)(gu, rw)
    loop_l2 = bench._loop(
        lambda i, a_, sf_, w_, sb_: m_grouped_gemm_masked(
            a_, w_, full, sfa=jnp.roll(sf_, i, 1), sfb_t=sb_,
            out_dtype=jnp.bfloat16, expected_m=cap)[0, 0, i]
        .astype(jnp.float32))
    t_l2 = show('L2 masked (reroute)',
                bench._device_time_of(loop_l2, (aq2, asf2, w2q, sfb2),
                                      'ph_l2'), fl2)

    print(f'{"sum L1+rq+L2":28s} {(t_l1 + t_rq + t_l2) * 1e6:8.1f} us/iter',
          flush=True)

    # fused mega (packed weights, D=1 local kernel)
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ('ep',))
    packm = jax.block_until_ready(dg.pack_mega_weights(
        w1q, w2q, w1sf, w2sf, cap=cap, x_dtype=xq.dtype, num_devices=1))
    mega_fn = jax.jit(shard_map(
        lambda xs, ss, rws, pw: fused_mega_moe(
            xs, rws, None, None, 'ep', send_sf=ss, packed=pw),
        mesh=mesh1, check_vma=False, in_specs=(P(),) * 4, out_specs=P()))

    @jax.jit
    def loop_mega(xs, ss, rws, pw):
        def body(i, acc):
            o = mega_fn(xs, jnp.roll(ss, i, 2), rws, pw)
            return acc + o[0, 0, 0, 0].astype(jnp.float32)
        return jax.lax.fori_loop(0, bench.N_ITERS, body, 0.0)
    t_mega = show('fused mega kernel',
                  bench._device_time_of(
                      loop_mega,
                      (xq3[None], xsf3[None], rw[None], packm), 'ph_mega'),
                  fl1 + fl2)
    print(f'  -> fused vs (L1+L2) GEMM-only: {(t_l1 + t_l2) / t_mega:.3f}; '
          f'vs full chain: {(t_l1 + t_rq + t_l2) / t_mega:.3f}', flush=True)


if __name__ == '__main__':
    main()
