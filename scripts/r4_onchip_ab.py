#!/usr/bin/env python
"""Round-4 on-chip A/B sweeps. One TPU process; run when the chip is free.

Legs:
  1. fused mega D=1 (serving dims) vs the unfused masked chain — the r4
     bench methodology (roll the SF sideband, trace-timed), reported as
     both TFLOPS and the fused/unfused ratio (VERDICT r3 #2 target >= 1.0).
  2. grouped contiguous align-128 uneven layout: compare-chain STATIC path
     (new, r4) vs DGT_GROUPED_FORCE_PREFETCH=1 (the r3 number was 171.9
     prefetch-only; target >= 0.97 of the 190.1 aligned rate).

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
    print(f'{name:48s} {flops / t / 1e12:7.1f} TFLOPS  '
          f'({t * 1e6:8.1f} us/iter)', flush=True)
    return flops / t / 1e12


def main():
    import deepgemm_tpu as dg
    from deepgemm_tpu.ops.m_grouped import _grouped_sfb_t
    from deepgemm_tpu.kernels.grouped import m_grouped_gemm_contiguous
    dg.init_persistent_cache()
    rng = np.random.RandomState(0)

    # ---- leg 2 first (cheaper compiles): align-128 uneven static vs pf ---
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
    aq128, asf128 = dg.per_token_cast_to_fp8(a128, use_ue8m0=False)

    def run128(tag):
        loop = bench._loop(lambda i, aq_, asf_, bq_, sfb_:
                           m_grouped_gemm_contiguous(
                               aq_, bq_, ids128, use_psum_layout=False,
                               sfa=jnp.roll(asf_, i, 0), sfb_t=sfb_,
                               out_dtype=jnp.bfloat16)[0, 0]
                           .astype(jnp.float32))
        t = bench._device_time_of(loop, (aq128, asf128, bq, sfb_t),
                                  f'ab128_{tag}')
        return show(f'align128 uneven {tag}', t, 2 * m128 * n * k)

    tf_static = run128('STATIC compare-chain')
    os.environ['DGT_GROUPED_FORCE_PREFETCH'] = '1'
    tf_pf = run128('forced prefetch')
    del os.environ['DGT_GROUPED_FORCE_PREFETCH']
    print(f'  -> static/prefetch = {tf_static / tf_pf:.3f} '
          f'(r3 prefetch-only read 171.9; aligned-path 190.1)', flush=True)

    # ---- leg 2b: per-group DENSE split for the uneven layout -------------
    # Host-concrete starts are static slices: run one dense GEMM per group
    # (bm can be 256 inside each group, unlike the uniform grouped grid
    # pinned to bm=128 by the 128-odd starts). If this clears ~184 TFLOPS
    # (0.97 of the aligned 190.1), route large uneven groups this way.
    starts = np.concatenate([[0], np.cumsum(mpg_list)]).astype(int)

    def dense_split(aq_, asf_, bq_, sfb_, i):
        # consume ONE dynamically-indexed element from EVERY group's output
        # — a static [0, 0] on the concatenation let XLA DCE 7 of the 8
        # per-group GEMMs (first read: 1228 "TFLOPS" = the G~8x artifact)
        acc = jnp.float32(0)
        for g in range(G):
            s0, s1 = int(starts[g]), int(starts[g + 1])
            from deepgemm_tpu.kernels.dense import dense_gemm
            o = dense_gemm(aq_[s0:s1], bq_[g], sfa=asf_[s0:s1],
                           sfb_t=sfb_[g], out_dtype=jnp.bfloat16)
            acc = acc + o[0, i].astype(jnp.float32)
        return acc

    loop_ds = bench._loop(lambda i, aq_, asf_, bq_, sfb_:
                          dense_split(aq_, jnp.roll(asf_, i, 0), bq_,
                                      sfb_, i))
    try:
        t_ds = bench._device_time_of(loop_ds, (aq128, asf128, bq, sfb_t),
                                     'ab128_densesplit')
        tf_ds = show('align128 uneven PER-GROUP DENSE split', t_ds,
                     2 * m128 * n * k)
        print(f'  -> dense-split/static = {tf_ds / tf_static:.3f}',
              flush=True)
    except Exception as e:                            # noqa: BLE001
        print(f'  dense-split leg failed: {type(e).__name__}: '
              f'{str(e)[:160]}', flush=True)

    # ---- leg 1: fused mega vs unfused chain at serving dims (D=1) -------
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    from deepgemm_tpu.kernels.fused_moe import fused_mega_moe
    from deepgemm_tpu.kernels.grouped import m_grouped_gemm_masked
    from deepgemm_tpu.parallel.moe import swiglu_apply_weight_to_fp8
    ELm, capm, Hm, Im = 8, 128, 7168, 2048
    xm = jnp.asarray(rng.randn(ELm * capm, Hm) * 0.5, jnp.bfloat16)
    xqm, xsfm = dg.per_token_cast_to_fp8(xm, use_ue8m0=False)
    xqm = xqm.reshape(1, ELm, capm, Hm)
    xsfm = xsfm.reshape(1, ELm, capm, -1)
    rwm = jnp.asarray(rng.rand(1, ELm, capm).astype(np.float32))
    w1m = jnp.asarray(rng.randn(ELm, 2 * Im, Hm) * 0.02, jnp.bfloat16)
    w2m = jnp.asarray(rng.randn(ELm, Hm, Im) * 0.02, jnp.bfloat16)
    w1mq, w1msf, w2mq, w2msf = [], [], [], []
    for e in range(ELm):
        vq, vs = dg.per_block_cast_to_fp8(w1m[e], use_ue8m0=False)
        w1mq.append(vq); w1msf.append(vs)
        vq, vs = dg.per_block_cast_to_fp8(w2m[e], use_ue8m0=False)
        w2mq.append(vq); w2msf.append(vs)
    w1mq, w1msf = jnp.stack(w1mq), jnp.stack(w1msf)
    w2mq, w2msf = jnp.stack(w2mq), jnp.stack(w2msf)
    flops_mega = ELm * (2 * capm * 2 * Im * Hm + 2 * capm * Hm * Im)
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ('ep',))

    packm = jax.block_until_ready(dg.pack_mega_weights(
        w1mq, w2mq, w1msf, w2msf, cap=capm, x_dtype=xqm.dtype,
        num_devices=1))
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
    t_mega = bench._device_time_of(loop_mega, (xqm, xsfm, rwm, packm),
                                   'ab_mega')
    show('fused mega D=1 (serving dims)', t_mega, flops_mega)

    sfb1m_t = _grouped_sfb_t(w1msf, ELm, 2 * Im, Hm, (128, 128),
                             b_kmajor=True)
    sfb2m_t = _grouped_sfb_t(w2msf, ELm, Hm, Im, (128, 128), b_kmajor=True)
    fullm = jnp.full((ELm,), capm, jnp.int32)

    # weights as jit ARGS, never closures (closure arrays embed into the
    # compile body -> relay HTTP 413; the r4 bench root cause)
    def _unfused_mega(xq, sf, rws, w1q, sfb1_t, w2q, sfb2_t):
        gu = m_grouped_gemm_masked(xq, w1q, fullm, sfa=sf, sfb_t=sfb1_t,
                                   out_dtype=jnp.bfloat16, expected_m=capm)
        aq2, asf2 = swiglu_apply_weight_to_fp8(gu, rws)
        return m_grouped_gemm_masked(aq2, w2q, fullm, sfa=asf2,
                                     sfb_t=sfb2_t, out_dtype=jnp.bfloat16,
                                     expected_m=capm)

    @jax.jit
    def loop_unf(xs, ss, rws, w1q, sfb1_t, w2q, sfb2_t):
        def body(i, acc):
            y = _unfused_mega(xs[0], jnp.roll(ss, i, 2)[0], rws[0],
                              w1q, sfb1_t, w2q, sfb2_t)
            return acc + y[0, 0, i].astype(jnp.float32)
        return jax.lax.fori_loop(0, bench.N_ITERS, body, 0.0)
    t_unf = bench._device_time_of(
        loop_unf, (xqm, xsfm, rwm, w1mq, sfb1m_t, w2mq, sfb2m_t), 'ab_unf')
    show('unfused chain D=1 (serving dims)', t_unf, flops_mega)
    print(f'  -> fused/unfused speedup = {t_unf / t_mega:.3f} '
          f'(VERDICT target >= 1.0)', flush=True)


if __name__ == '__main__':
    main()
