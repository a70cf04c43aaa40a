"""Chipless TPU AOT-compile check: compiles the headline kernel specs against
a v5e topology using the LOCAL libtpu (no chip, no relay), reproducing the
device compiler exactly — including the VMEM-overflow class that remote
compiles surface as HTTP 500 (verified: the (512,1024,2048)+c k-grouped
config that overflowed on the relay fails here with the same
RESOURCE_EXHAUSTED vmem message, and the shipping configs compile).

Strictly stronger than scripts/lowering_check.py (which stops at the
Pallas->Mosaic lowering). Use THIS before any on-chip sweep: a candidate that
fails here would have wedged the relay.

Usage: python scripts/aot_check.py            # all headline specs
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ['DGT_FORCE_MOSAIC'] = '1'

import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
import jax.numpy as jnp
from jax.experimental import topologies
from jax import ShapeDtypeStruct

TOPO = topologies.get_topology_desc(platform='tpu',
                                    topology_name='v5e:2x2x1')
SHARD = jax.sharding.SingleDeviceSharding(TOPO.devices[0])
f8 = jnp.float8_e4m3fn
ok = fail = 0


def S(shape, dt):
    return ShapeDtypeStruct(shape, dt, sharding=SHARD)


def check(name, f, *args):
    global ok, fail
    try:
        compiled = jax.jit(f).lower(*args).compile()
        try:
            ma = compiled.memory_analysis()
            extra = f'  (argbytes {ma.argument_size_in_bytes >> 20}M, ' \
                    f'tmp {ma.temp_size_in_bytes >> 20}M)'
        except Exception:
            extra = ''
        print(f'PASS  {name}{extra}', flush=True)
        ok += 1
    except Exception as e:
        msg = str(e).replace('\n', ' ')[:180]
        print(f'FAIL  {name}: {type(e).__name__}: {msg}', flush=True)
        fail += 1


def main():
    import deepgemm_tpu as dg
    from deepgemm_tpu.kernels.k_grouped import k_grouped_gemm
    from deepgemm_tpu.kernels.fused_moe import _mega_local_call

    # dense fp8 — deep-k (gk==1) + headline square
    m, n, k = 8192, 4096, 7168
    check('dense fp8 deep-k (gk==1 direct write)',
          lambda a, sa, b, sb: dg.fp8_gemm_nt((a, sa), (b, sb)),
          S((m, k), f8), S((m, k // 128), jnp.float32),
          S((n, k), f8), S((n // 128, k // 128), jnp.float32))
    check('dense fp8 4096^3',
          lambda a, sa, b, sb: dg.fp8_gemm_nt((a, sa), (b, sb)),
          S((4096, 4096), f8), S((4096, 32), jnp.float32),
          S((4096, 4096), f8), S((32, 32), jnp.float32))

    # grouped contiguous — static (bench) + dynamic (align-128 uneven)
    G, mpg, n, k = 8, 1024, 4096, 7168
    m = G * mpg
    ids = jnp.asarray(np.repeat(np.arange(G, dtype=np.int32), mpg))
    check('grouped contiguous STATIC (bench shape)',
          lambda a, sa, bv, sb: dg.m_grouped_fp8_gemm_nt_contiguous(
              (a, sa), (bv, sb), grouped_layout=ids, use_psum_layout=False),
          S((m, k), f8), S((m, k // 128), jnp.float32),
          S((G, n, k), f8), S((G, n // 128, k // 128), jnp.float32))
    mpg_list = [896, 1152] * 4
    m128 = sum(mpg_list)
    ids128 = jnp.asarray(np.repeat(np.arange(8, dtype=np.int32), mpg_list))
    check('grouped contiguous DYNAMIC (align-128 uneven)',
          lambda a, sa, bv, sb: dg.m_grouped_fp8_gemm_nt_contiguous(
              (a, sa), (bv, sb), grouped_layout=ids128,
              use_psum_layout=False),
          S((m128, k), f8), S((m128, k // 128), jnp.float32),
          S((G, n, k), f8), S((G, n // 128, k // 128), jnp.float32))

    # bf16 grouped contiguous through the Pallas kernel (the ragged_dot-vs-
    # Pallas routing A/B, scripts/r3_onchip_ab.py leg 3b)
    from deepgemm_tpu.kernels.grouped import m_grouped_gemm_contiguous
    check('grouped contiguous BF16 Pallas (bench shape)',
          lambda a, bv: m_grouped_gemm_contiguous(
              a, bv, ids, use_psum_layout=False, out_dtype=jnp.bfloat16),
          S((m, k), jnp.bfloat16), S((G, n, k), jnp.bfloat16))

    # dense fp8 4096^3 pinned (512,512,4096) — the single-k-step frontier
    # candidate (less A-restream traffic than the (256,1024) heuristic pick)
    from deepgemm_tpu.kernels.dense import dense_gemm
    from deepgemm_tpu.heuristics.configs import GemmConfig
    cfg512 = GemmConfig(block_m=512, block_n=512, block_k=4096,
                        scale_strategy='promote')
    check('dense fp8 4096^3 pinned (512,512,4096)',
          lambda a, b, sa, sb: dense_gemm(a, b, sfa=sa, sfb_t=sb,
                                          scale_strategy='promote',
                                          cfg=cfg512),
          S((4096, 4096), f8), S((4096, 4096), f8),
          S((4096, 32), jnp.float32), S((32, 4096), jnp.float32))

    # masked (bench shape) — expected_m == max_m builds the no-early-exit
    # body by default; the FORCE_EXIT env leg audits the predicated A/B
    masked_args = (S((G, 256, k), f8), S((G, 256, k // 128), jnp.float32),
                   S((G, n, k), f8), S((G, n // 128, k // 128), jnp.float32),
                   S((G,), jnp.int32))

    def masked(a, sa, bv, sb, mm):
        return dg.m_grouped_fp8_gemm_nt_masked(
            (a, sa), (bv, sb), masked_m=mm, expected_m=256)

    check('masked grouped (no-early-exit, gk==1)', masked, *masked_args)
    os.environ['DGT_MASKED_FORCE_EXIT'] = '1'
    check('masked grouped PREDICATED (A/B leg)', masked, *masked_args)
    os.environ.pop('DGT_MASKED_FORCE_EXIT')

    # k-grouped wgrad — static + prefetch A/B legs (bench shape)
    Gk, mk_, nk_, kpg = 4, 4096, 7168, 2048
    tk = Gk * kpg
    ks_list = [kpg] * Gk

    def kg(a, b, sa, sb):
        return k_grouped_gemm(a, b, None, jnp.asarray(ks_list, jnp.int32),
                              use_psum_layout=False, sfa_t=sa, sfb_t=sb,
                              ks_cpu=ks_list, k_major=True)

    kg_args = (S((tk, mk_), f8), S((tk, nk_), f8),
               S((tk // 128, mk_), jnp.float32),
               S((tk // 128, nk_), jnp.float32))
    check('k-grouped wgrad STATIC (c=None)', kg, *kg_args)
    os.environ['DGT_KG_FORCE_PREFETCH'] = '1'
    check('k-grouped wgrad PREFETCH (A/B leg)', kg, *kg_args)
    os.environ.pop('DGT_KG_FORCE_PREFETCH')

    # paged decode, both strategies (bench: B64, ctx 4096)
    B, bkv, bps, h, d = 64, 256, 16, 64, 128
    mml = bkv * bps
    nb = B * bps
    for strat in ('gather', 'zerocopy'):
        check(f'paged decode {strat.upper()}',
              lambda q, kv, sf, w, ctx, bt, _s=strat:
                  dg.fp8_fp4_paged_mqa_logits(
                      (q, None), (kv, sf), w, ctx, bt, max_context_len=mml,
                      strategy=_s),
              S((B, 1, h, d), f8), S((nb, bkv, d), f8),
              S((nb, bkv), jnp.float32), S((B, h), jnp.float32),
              S((B,), jnp.int32), S((B, bps), jnp.int32))

    # MQA prefill (unchanged kernel — compile canary)
    sq, skv, hh, dh = 2048, 8192, 64, 128
    check('mqa logits prefill',
          lambda q, kv, sf, w, ks, ke: dg.fp8_mqa_logits(
              (q, None), (kv, sf), w, ks, ke),
          S((sq, hh, dh), f8), S((skv, dh), f8), S((skv,), jnp.float32),
          S((sq, hh), jnp.float32), S((sq,), jnp.int32), S((sq,), jnp.int32))

    # masked LOW-occupancy pf-skip variant at the bench skewed shape
    # (masked_m as scalar prefetch + clamped index maps for inactive tiles)
    Gs, mms, ns, ks_ = 8, 256, 4096, 7168
    check('masked pf-skip (skewed decode, fp8)',
          lambda a, sa, bv, sb, mm: dg.m_grouped_fp8_gemm_nt_masked(
              (a, sa), (bv, sb), masked_m=mm, expected_m=mms // 4),
          S((Gs, mms, ks_), f8), S((Gs, mms, ks_ // 128), jnp.float32),
          S((Gs, ns, ks_), f8), S((Gs, ns // 128, ks_ // 128), jnp.float32),
          S((Gs,), jnp.int32))

    # fused mega D=1 local kernel at serving dims — at the DEFAULT tile pick
    # (so a pick_mega_tiles change re-audits compileability automatically)
    from deepgemm_tpu.kernels.fused_moe import pick_mega_tiles
    H, I, cap, E = 7168, 2048, 128, 8
    gran = 128
    bn1, bh2 = pick_mega_tiles(H, I, cap, xb=1, wb=1, scaled=True, local=True)
    print(f'      (mega default pick: bn1={bn1} bh2={bh2})', flush=True)
    nt1, nt2 = I // bn1, H // bh2
    ksf1, ksf2 = H // gran, I // gran
    ksf_pad = ((ksf1 + 127) // 128) * 128
    # both act policies: bf16 act (the TPU default — no in-kernel requant)
    # and fp8 act (the reference's requantized dataflow, VMEM-tight option)
    for actp in (False, True):
        check(f'fused mega D=1 local (serving dims, fp8, act_fp8={actp})',
              lambda x, xsf, rw3, w1p, w1sf_t, w2, w2sf_t, _a=actp:
              _mega_local_call(
                  x, xsf, rw3, w1p, w1sf_t, w2, w2sf_t, cap=cap, hidden=H,
                  inter=I, e_local=E, nt1=nt1, nt2=nt2, bn1=bn1, bh2=bh2,
                  gran_k=gran, clamp=256.0, scaled=True, interpret=False,
                  act_fp8=_a),
              S((E, cap, H), f8), S((E, cap, ksf_pad), jnp.float32),
              S((E, cap, 1), jnp.float32), S((E, nt1, 2 * bn1, H), f8),
              S((E, nt1, ksf1, 2 * bn1), jnp.float32),
              S((E, H, I), f8), S((E, ksf2, H), jnp.float32))

    # fused mega D=1 local with PLANAR-PACKED FP4 weights (VERDICT r4 #5):
    # same serving dims, w tiles halved, per-chunk in-VPU nibble decode —
    # the real-Mosaic legality check for the decode ops (shift/and/exp2 on
    # (2*bn1, 128) int blocks; interpret mode can't catch lane-rule issues).
    check('fused mega D=1 local FP4 weights (serving dims)',
          lambda x, xsf, rw3, w1p, w1sf_t, w2, w2sf_t: _mega_local_call(
              x, xsf, rw3, w1p, w1sf_t, w2, w2sf_t, cap=cap, hidden=H,
              inter=I, e_local=E, nt1=nt1, nt2=nt2, bn1=bn1, bh2=bh2,
              gran_k=gran, clamp=256.0, scaled=True, interpret=False,
              w_fp4=True),
          S((E, cap, H), f8), S((E, cap, ksf_pad), jnp.float32),
          S((E, cap, 1), jnp.float32), S((E, nt1, 2 * bn1, H // 2), jnp.int8),
          S((E, nt1, ksf1, 2 * bn1), jnp.float32),
          S((E, H, I // 2), jnp.int8), S((E, ksf2, H), jnp.float32))

    # unfused mega A/B leg (bench.py fp8_unfused_mega_moe_1chip): masked
    # grouped L1 -> SwiGLU/requant -> masked grouped L2 at the serving dims.
    # Both masked calls are full-occupancy (max_m == cap == 128) so they
    # reroute through the contiguous static kernel — new shape classes
    # (1024x4096x7168 and 1024x7168x2048 in equal 128-row groups).
    from deepgemm_tpu.kernels.grouped import m_grouped_gemm_masked
    from deepgemm_tpu.parallel.moe import swiglu_apply_weight_to_fp8
    Hm, Im, capm, Em = 7168, 2048, 128, 8

    def unfused_mega(xq, xsf, rws, w1q, sfb1_t, w2q, sfb2_t):
        fullm = jnp.full((Em,), capm, jnp.int32)
        gu = m_grouped_gemm_masked(xq, w1q, fullm, sfa=xsf, sfb_t=sfb1_t,
                                   out_dtype=jnp.bfloat16, expected_m=capm)
        aq2, asf2 = swiglu_apply_weight_to_fp8(gu, rws)
        return m_grouped_gemm_masked(aq2, w2q, fullm, sfa=asf2,
                                     sfb_t=sfb2_t, out_dtype=jnp.bfloat16,
                                     expected_m=capm)

    check('unfused mega A/B pipeline (serving dims, fp8)', unfused_mega,
          S((Em, capm, Hm), f8), S((Em, capm, Hm // 128), jnp.float32),
          S((Em, capm), jnp.float32),
          S((Em, 2 * Im, Hm), f8),
          S((Em, Hm // 128, 2 * Im), jnp.float32),   # sfb_t: [G, ksf, n]
          S((Em, Hm, Im), f8),
          S((Em, Im // 128, Hm), jnp.float32))

    # HC prenorm, both branches
    check('hc_prenorm gk==1 direct write',
          lambda a, b: dg.tf32_hc_prenorm_gemm(a, b),
          S((128, 384), jnp.bfloat16), S((192, 384), jnp.float32))
    check('hc_prenorm gk>1 scratch branch',
          lambda a, b: dg.tf32_hc_prenorm_gemm(a, b),
          S((128, 2048), jnp.bfloat16), S((192, 2048), jnp.float32))

    # fused mega GENERAL kernel, D=4 over the chipless topology mesh — the
    # only real-Mosaic validation of the multi-chip RDMA path (the CPU
    # interpreter accepts lane-rule-violating DMA slices Mosaic rejects).
    # Exercises the wave-pooled grid (pick_wave_pool auto-pick) at serving
    # dims. NOTE: compiles SPMD for 4 devices without any chip.
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as MP
    from deepgemm_tpu.kernels.fused_moe import fused_mega_moe, pick_wave_pool
    mesh = Mesh(np.array(TOPO.devices).reshape(4), ('ep',))
    D = 4
    pool = pick_wave_pool(D, cap, H, I, xb=1, wb=1, scaled=True)
    print(f'      (mega wave pool at D=4: P={pool})', flush=True)

    def MS(shape, dt, spec):
        return ShapeDtypeStruct(shape, dt, sharding=NamedSharding(mesh, spec))

    def mega_d4(send, sf, rw, w1, w1sf, w2, w2sf):
        return jax.shard_map(
            lambda s_, sf_, rw_, a, b, c, d_:
                fused_mega_moe(s_, rw_, a, c, 'ep', send_sf=sf_,
                               w1_sf=b, w2_sf=d_),
            mesh=mesh, check_vma=False,
            in_specs=(MP('ep'), MP('ep'), MP('ep'),
                      MP(), MP(), MP(), MP()),
            out_specs=MP('ep'))(send, sf, rw, w1, w1sf, w2, w2sf)

    check('fused mega GENERAL D=4 (wave-pooled, serving dims, fp8)',
          mega_d4,
          MS((D * D, E, cap, H), f8, MP('ep')),
          MS((D * D, E, cap, ksf1), jnp.float32, MP('ep')),
          MS((D * D, E, cap), jnp.float32, MP('ep')),
          MS((E, 2 * I, H), f8, MP()),
          MS((E, (2 * I) // 128, ksf1), jnp.float32, MP()),
          MS((E, H, I), f8, MP()),
          MS((E, H // 128, ksf2), jnp.float32, MP()))

    if '--wide' in sys.argv:
        wide(dg)

    print(f'\n{ok} pass / {fail} fail')
    sys.exit(1 if fail else 0)


def wide(dg):
    """--wide: AOT-compile the config-search pick for every production-shape
    family the reference sweeps (DeepSeek-V3-like n,k pairs,
    /root/reference/tests/generators.py:115-259) — an exhaustive audit that
    no user shape hits a VMEM overflow at the heuristics' chosen tiles."""
    for m in (128, 4096, 8192):
        for (n, k) in ((7168, 2048), (2048, 7168), (4096, 7168),
                       (16384, 7168), (7168, 16384), (24576, 1536),
                       (1536, 24576)):
            check(f'wide dense fp8 {m}x{n}x{k}',
                  lambda a, sa, b, sb: dg.fp8_gemm_nt((a, sa), (b, sb)),
                  S((m, k), f8), S((m, (k + 127) // 128), jnp.float32),
                  S((n, k), f8), S(((n + 127) // 128, (k + 127) // 128),
                                   jnp.float32))

    # grouped contiguous + masked at EP-split group counts
    for G, mpg, (n, k) in ((4, 1024, (7168, 2048)), (8, 512, (2048, 7168)),
                           (16, 256, (4096, 7168))):
        m = G * mpg
        ids = jnp.asarray(np.repeat(np.arange(G, dtype=np.int32), mpg))
        nsf, ksf = (n + 127) // 128, (k + 127) // 128
        check(f'wide grouped G{G} {m}x{n}x{k}',
              lambda a, sa, bv, sb, _ids=ids: dg.m_grouped_fp8_gemm_nt_contiguous(
                  (a, sa), (bv, sb), grouped_layout=_ids,
                  use_psum_layout=False),
              S((m, k), f8), S((m, ksf), jnp.float32),
              S((G, n, k), f8), S((G, nsf, ksf), jnp.float32))
        check(f'wide masked G{G} 256x{n}x{k}',
              lambda a, sa, bv, sb, mm: dg.m_grouped_fp8_gemm_nt_masked(
                  (a, sa), (bv, sb), masked_m=mm, expected_m=128),
              S((G, 256, k), f8), S((G, 256, ksf), jnp.float32),
              S((G, n, k), f8), S((G, nsf, ksf), jnp.float32),
              S((G,), jnp.int32))

    # k-grouped wgrad at EP-split k slabs
    from deepgemm_tpu.kernels.k_grouped import k_grouped_gemm
    for G, kpg, (m, n) in ((4, 2048, (4096, 7168)), (8, 1024, (7168, 2048)),
                           (16, 512, (2048, 4096))):
        tk = G * kpg
        ks_list = [kpg] * G
        check(f'wide wgrad G{G} {m}x{n} tk{tk}',
              lambda a, b, sa, sb, _ks=ks_list: k_grouped_gemm(
                  a, b, None, jnp.asarray(_ks, jnp.int32),
                  use_psum_layout=False, sfa_t=sa, sfb_t=sb,
                  ks_cpu=_ks, k_major=True),
              S((tk, m), f8), S((tk, n), f8),
              S((tk // 128, m), jnp.float32), S((tk // 128, n), jnp.float32))


if __name__ == '__main__':
    main()
