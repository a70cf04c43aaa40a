#!/usr/bin/env python
"""Round-3 on-chip A/B sweeps (the persistent form of the recovery script the
relay outage stranded in /tmp): measures the prefetch-free static kernel
paths against the scalar-prefetch kernels on real hardware, plus the
chipless-AOT-verified dense tile candidate. One TPU process; run AFTER
scripts/tpu_smoke.py and BEFORE bench.py.

Prints one line per measurement:  <name>  <TFLOPS>  (<s/iter>)

A/B legs:
  1. k-grouped wgrad G4 (bench shape, c=None): static_spg vs
     DGT_KG_FORCE_PREFETCH=1 dynamic kernel.
  2. grouped contiguous G8 mpg=1024: static_tpg vs
     DGT_GROUPED_FORCE_PREFETCH=1.
  3. grouped contiguous alignment-128 layout (the unexplained ~4-TFLOP
     scalar-prefetch gap, CLAUDE.md): uneven 896/1152 groups — prefetch only
     (no static path exists for uneven groups; measured for the record).
  4. dense fp8 4096^3: heuristic pick vs pinned (512,512,4096) — the new
     chipless-verified single-k-step candidate.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench  # relay guard runs at import; reuse the trace-timing harness


def show(name, t, flops):
    print(f'{name:44s} {flops / t / 1e12:7.1f} TFLOPS  ({t * 1e6:8.1f} us/iter)',
          flush=True)
    return flops / t / 1e12


def main():
    import deepgemm_tpu as dg
    from deepgemm_tpu.kernels.k_grouped import k_grouped_gemm
    from deepgemm_tpu.kernels.grouped import m_grouped_gemm_contiguous
    from deepgemm_tpu.kernels.dense import dense_gemm
    from deepgemm_tpu.heuristics.configs import GemmConfig
    dg.init_persistent_cache()
    rng = np.random.RandomState(0)
    print(f'backend: {jax.default_backend()}', flush=True)

    # ---- 1. k-grouped wgrad static vs prefetch --------------------------
    Gk, mk_, nk_, kpg = 4, 4096, 7168, 2048
    tk = Gk * kpg
    ak = jnp.asarray(rng.randn(tk, mk_) * 0.1, jnp.bfloat16)
    bk_ = jnp.asarray(rng.randn(tk, nk_) * 0.1, jnp.bfloat16)
    akq, aksf = dg.per_channel_cast_to_fp8(ak, use_ue8m0=False)
    bkq, bksf = dg.per_channel_cast_to_fp8(bk_, use_ue8m0=False)
    ks_list = [kpg] * Gk
    loop_k = bench._loop(lambda i, a_, b_, sa, sb:
                         k_grouped_gemm(jnp.roll(a_, i, 1), b_, None,
                                        jnp.asarray(ks_list, jnp.int32),
                                        use_psum_layout=False,
                                        sfa_t=jnp.roll(sa, i, 1), sfb_t=sb,
                                        ks_cpu=ks_list).reshape(-1)[i])
    flops_k = 2 * mk_ * nk_ * tk
    os.environ.pop('DGT_KG_FORCE_PREFETCH', None)
    t = bench._device_time_of(loop_k, (akq, bkq, aksf, bksf), 'kg_static')
    show('wgrad G4 static (prefetch-free)', t, flops_k)
    os.environ['DGT_KG_FORCE_PREFETCH'] = '1'
    # new env -> new spec at trace time, but the jitted loop is already
    # compiled; rebuild the loop so tracing re-runs
    loop_kp = bench._loop(lambda i, a_, b_, sa, sb:
                          k_grouped_gemm(jnp.roll(a_, i, 1), b_, None,
                                         jnp.asarray(ks_list, jnp.int32),
                                         use_psum_layout=False,
                                         sfa_t=jnp.roll(sa, i, 1), sfb_t=sb,
                                         ks_cpu=ks_list).reshape(-1)[i + 1])
    t = bench._device_time_of(loop_kp, (akq, bkq, aksf, bksf), 'kg_prefetch')
    show('wgrad G4 prefetch (forced)', t, flops_k)
    os.environ.pop('DGT_KG_FORCE_PREFETCH', None)
    del ak, bk_, akq, aksf, bkq, bksf

    # ---- 2. grouped contiguous static vs prefetch -----------------------
    G, mpg, n, k = 8, 1024, 4096, 7168
    m = G * mpg
    a = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    aq, asf = dg.per_token_cast_to_fp8(a, use_ue8m0=False)
    bg = jnp.asarray(rng.randn(G, n, k) * 0.1, jnp.bfloat16)
    bs = [dg.per_block_cast_to_fp8(bg[g], use_ue8m0=False) for g in range(G)]
    bq = jnp.stack([x[0] for x in bs])
    bsf = jnp.stack([x[1] for x in bs])
    from deepgemm_tpu.ops.m_grouped import _grouped_sfb_t
    sfb_t = _grouped_sfb_t(bsf, G, n, k, (128, 128), b_kmajor=True)
    ids = jnp.repeat(jnp.arange(G, dtype=jnp.int32), mpg)
    flops_g = 2 * m * n * k

    def g_loop(salt):
        return bench._loop(lambda i, aq_, asf_, bq_, sfb_:
                           m_grouped_gemm_contiguous(
                               jnp.roll(aq_, i, 0), bq_, ids,
                               use_psum_layout=False,
                               sfa=jnp.roll(asf_, i, 0), sfb_t=sfb_,
                               out_dtype=jnp.bfloat16)[0, salt].astype(jnp.float32))

    os.environ.pop('DGT_GROUPED_FORCE_PREFETCH', None)
    t = bench._device_time_of(g_loop(0), (aq, asf, bq, sfb_t), 'g_static')
    show('grouped contiguous G8 static', t, flops_g)
    os.environ['DGT_GROUPED_FORCE_PREFETCH'] = '1'
    t = bench._device_time_of(g_loop(1), (aq, asf, bq, sfb_t), 'g_prefetch')
    show('grouped contiguous G8 prefetch (forced)', t, flops_g)
    os.environ.pop('DGT_GROUPED_FORCE_PREFETCH', None)

    # ---- 3. alignment-128 uneven groups (prefetch-only path) ------------
    mpg_list = [896 if g_ % 2 == 0 else 1152 for g_ in range(G)]
    m128 = sum(mpg_list)
    ids128 = jnp.asarray(np.repeat(np.arange(G, dtype=np.int32), mpg_list))
    a128 = jnp.asarray(rng.randn(m128, k), jnp.bfloat16)
    aq128, asf128 = dg.per_token_cast_to_fp8(a128, use_ue8m0=False)
    loop128 = bench._loop(lambda i, aq_, asf_, bq_, sfb_:
                          m_grouped_gemm_contiguous(
                              jnp.roll(aq_, i, 0), bq_, ids128,
                              use_psum_layout=False,
                              sfa=jnp.roll(asf_, i, 0), sfb_t=sfb_,
                              out_dtype=jnp.bfloat16)[0, 0].astype(jnp.float32))
    t = bench._device_time_of(loop128, (aq128, asf128, bq, sfb_t), 'g_128')
    show('grouped contiguous align-128 (prefetch)', t, 2 * m128 * n * k)
    del a, aq, asf, bg, bq, bsf, sfb_t, a128, aq128, asf128

    # ---- 3b. bf16 grouped contiguous: Pallas kernel vs ragged_dot -------
    # The ops layer delegates bf16 contiguous to XLA ragged_dot (143 TFLOPS
    # measured) while the same Pallas kernel unscaled might track the dense
    # bf16 roofline (188). Winner takes the routing.
    abf = jnp.asarray(rng.randn(m, k), jnp.bfloat16)
    bbf = jnp.asarray(rng.randn(G, n, k) * 0.1, jnp.bfloat16)
    d_pal = m_grouped_gemm_contiguous(abf, bbf, ids, use_psum_layout=False,
                                      out_dtype=jnp.bfloat16)
    b_kn2 = jnp.swapaxes(bbf, 1, 2)
    sizes = jnp.full((G,), mpg, jnp.int32)
    d_rd = jax.lax.ragged_dot(abf, b_kn2, sizes,
                              preferred_element_type=jnp.float32
                              ).astype(jnp.bfloat16)
    from deepgemm_tpu.testing import calc_diff
    dchk = calc_diff(d_pal, np.asarray(d_rd, np.float32))
    print(f'bf16 grouped pallas-vs-ragged diff: {dchk:.2e}', flush=True)
    loop_bp = bench._loop(lambda i, a_, b_:
                          m_grouped_gemm_contiguous(
                              jnp.roll(a_, i, 0), b_, ids,
                              use_psum_layout=False,
                              out_dtype=jnp.bfloat16)[0, 0].astype(jnp.float32))
    t = bench._device_time_of(loop_bp, (abf, bbf), 'bf16_g_pallas')
    show('bf16 grouped contiguous Pallas', t, flops_g)
    loop_br = bench._loop(lambda i, a_, b_:
                          jax.lax.ragged_dot(jnp.roll(a_, i, 0), b_, sizes,
                                             preferred_element_type=jnp.float32
                                             )[0, 0].astype(jnp.float32))
    t = bench._device_time_of(loop_br, (abf, b_kn2), 'bf16_g_ragged')
    show('bf16 grouped contiguous ragged_dot', t, flops_g)
    del abf, bbf, b_kn2, d_pal, d_rd

    # ---- 4. dense 4096^3: heuristic pick vs (512,512,4096) --------------
    md = nd = kd = 4096
    ad = jnp.asarray(rng.randn(md, kd), jnp.bfloat16)
    bd = jnp.asarray(rng.randn(nd, kd), jnp.bfloat16)
    adq, adsf = dg.per_token_cast_to_fp8(ad, use_ue8m0=False)
    bdq, bdsf = dg.per_block_cast_to_fp8(bd, use_ue8m0=False)
    from deepgemm_tpu.ops.sf_layout import transform_sfa, transform_sfb
    from deepgemm_tpu.kernels.dense import required_sf_orientation
    sfa_mmaj, sfb_kmaj_like = required_sf_orientation('promote', True, True)
    sfa_d = transform_sfa(adsf, md, kd, 128, True, want_m_major=sfa_mmaj)
    sfb_d = transform_sfb(bdsf, nd, kd, (128, 128), True,
                          want_n_major=sfb_kmaj_like)
    flops_d = 2 * md * nd * kd

    def d_loop(cfg, salt):
        return bench._loop(lambda i, a_, b_, sa, sb:
                           dense_gemm(jnp.roll(a_, i, 0), b_, sfa=jnp.roll(sa, i, 0),
                                      sfb_t=sb, scale_strategy='promote',
                                      cfg=cfg)[0, salt].astype(jnp.float32))

    t = bench._device_time_of(d_loop(None, 0), (adq, bdq, sfa_d, sfb_d),
                              'dense_default')
    show('dense 4096^3 heuristic pick', t, flops_d)
    cfg512 = GemmConfig(block_m=512, block_n=512, block_k=4096,
                        scale_strategy='promote')
    t = bench._device_time_of(d_loop(cfg512, 1), (adq, bdq, sfa_d, sfb_d),
                              'dense_512')
    show('dense 4096^3 pinned (512,512,4096)', t, flops_d)
    del ad, bd, adq, bdq, sfa_d, sfb_d

    # ---- 5. fused mega D=1 serving dims: (256,512) vs (256,1024) --------
    # (256,1024) compiles chipless (aot_check) but the conservative VMEM
    # estimate shrinks it to 512 — the DGT_MEGA_TILES hatch exists for
    # exactly this measurement. bn1 is unchanged so only bh2 (the L2/w2
    # tile width) differs; wider tiles halve the L2 grid steps.
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    from deepgemm_tpu.kernels.fused_moe import fused_mega_moe
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
    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ('ep',))
    flops_mega = ELm * (2 * capm * 2 * Im * Hm + 2 * capm * Hm * Im)

    def run_mega(tag):
        pack = jax.block_until_ready(dg.pack_mega_weights(
            w1mq, w2mq, w1msf, w2msf, cap=capm, x_dtype=xqm.dtype,
            num_devices=1))
        print(f'  [{tag}] tiles bn1={pack.bn1} bh2={pack.bh2}', flush=True)
        mega_fn = jax.jit(shard_map(
            lambda xs, ss, rws, pw: fused_mega_moe(
                xs, rws, None, None, 'ep', send_sf=ss, packed=pw),
            mesh=mesh1, check_vma=False, in_specs=(P(),) * 4, out_specs=P()))

        @jax.jit
        def loop_mega(xs, ss, rws, pw):
            def body(i, acc):
                o = mega_fn(jnp.roll(xs, i, 2), ss, rws, pw)
                return acc + o[0, 0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, bench.N_ITERS, body, 0.0)
        t = bench._device_time_of(loop_mega, (xqm, xsfm, rwm, pack),
                                  f'mega_{tag}')
        show(f'fused mega D=1 serving dims [{tag}]', t, flops_mega)

    os.environ.pop('DGT_MEGA_TILES', None)
    run_mega('default')
    os.environ['DGT_MEGA_TILES'] = '256,1024'
    run_mega('256x1024')
    os.environ.pop('DGT_MEGA_TILES', None)


if __name__ == '__main__':
    main()
