#!/usr/bin/env python
"""Real-TPU smoke drive of the library surface — the scripted form of the
repo's verify recipe (.claude/skills/verify/SKILL.md). Runs the headline op
families once each against host oracles and prints one PASS/FAIL line per
probe. Minutes on a cold compile cache, seconds warm.

Usage: python scripts/tpu_smoke.py
"""

import os
import socket
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Under the axon tunnel jax.devices() HANGS (not errors) when the local relay
# is down — fail fast with a clear message instead (same guard as bench.py).
if os.environ.get('PALLAS_AXON_POOL_IPS') \
        and os.environ.get('JAX_PLATFORMS') == 'axon':
    try:
        socket.create_connection(('127.0.0.1', 8083), timeout=10).close()
    except OSError:
        print('FAIL  axon relay down (no listener on 127.0.0.1:8083); '
              'TPU unreachable — smoke aborted instead of hanging')
        sys.exit(1)

import numpy as np
import jax
import jax.numpy as jnp


def main():
    import deepgemm_tpu as dg
    from deepgemm_tpu.testing import calc_diff
    dg.init_persistent_cache()
    rng = np.random.RandomState(0)
    failures = []

    def check(name, diff, tol):
        ok = diff < tol
        print(f'{"PASS" if ok else "FAIL"}  {name}: diff={diff:.2e} '
              f'(tol {tol:g})', flush=True)
        if not ok:
            failures.append(name)

    print(f'backend: {jax.default_backend()}', flush=True)
    t0 = time.perf_counter()

    # dense fp8, both scale flows
    a = jnp.asarray(rng.randn(512, 1024), jnp.bfloat16)
    b = jnp.asarray(rng.randn(768, 1024), jnp.bfloat16)
    ref = np.asarray(a, np.float32) @ np.asarray(b, np.float32).T
    d = dg.fp8_gemm_nt(dg.per_token_cast_to_fp8(a, use_ue8m0=False),
                       dg.per_block_cast_to_fp8(b, use_ue8m0=False))
    check('fp8_gemm_nt promote', calc_diff(d, ref), 1e-3)
    aq = dg.per_token_cast_to_fp8(a, use_ue8m0=True, use_packed_ue8m0=True)
    bq = dg.per_block_cast_to_fp8(b, use_ue8m0=True)
    d = dg.fp8_gemm_nt(aq, bq, recipe=(1, 128, 128))
    check('fp8_gemm_nt packed-ue8m0', calc_diff(d, ref), 1e-3)

    # grouped contiguous fp8
    ids = jnp.repeat(jnp.arange(4, dtype=jnp.int32), 128)
    ag = jnp.asarray(rng.randn(512, 512), jnp.bfloat16)
    agq, agsf = dg.per_token_cast_to_fp8(ag, use_ue8m0=False)
    bgs = [dg.per_block_cast_to_fp8(
        jnp.asarray(rng.randn(256, 512) * 0.1, jnp.bfloat16),
        use_ue8m0=False) for _ in range(4)]
    bgq = jnp.stack([x[0] for x in bgs])
    bgsf = jnp.stack([x[1] for x in bgs])
    dgr = dg.m_grouped_fp8_gemm_nt_contiguous((agq, agsf), (bgq, bgsf),
                                              grouped_layout=ids)
    g0 = np.asarray(agq, np.float32)[:128] * np.repeat(
        np.asarray(agsf), 128, 1)[:128, :512]
    b0 = np.asarray(bgq[0], np.float32) * np.repeat(np.repeat(
        np.asarray(bgsf[0]), 128, 0), 128, 1)[:256, :512]
    check('m_grouped_fp8 contiguous', calc_diff(dgr[:128], g0 @ b0.T), 1e-3)

    # bf16 grouped contiguous — routes through the unscaled Pallas kernel
    # since r3 (160.8 vs ragged_dot 144.9 at the bench shape)
    bgb = jnp.asarray(rng.randn(4, 256, 512) * 0.1, jnp.bfloat16)
    dgb = dg.m_grouped_bf16_gemm_nt_contiguous(ag, bgb, grouped_layout=ids)
    refb = np.asarray(ag, np.float32)[:128] @ np.asarray(bgb[0], np.float32).T
    check('m_grouped_bf16 contiguous (pallas)', calc_diff(dgb[:128], refb),
          1e-4)

    # k-grouped wgrad
    tk, mm, nn = 512, 256, 384
    ak = jnp.asarray(rng.randn(tk, mm) * 0.1, jnp.bfloat16)
    bk_ = jnp.asarray(rng.randn(tk, nn) * 0.1, jnp.bfloat16)
    akq, aksf = dg.per_channel_cast_to_fp8(ak, use_ue8m0=False)
    bkq, bksf = dg.per_channel_cast_to_fp8(bk_, use_ue8m0=False)
    ck = jnp.zeros((2, mm, nn), jnp.float32)
    dk = dg.k_grouped_fp8_gemm_tn_contiguous((akq, aksf), (bkq, bksf),
                                             ks=[256, 256], c=ck)
    ad = np.asarray(akq, np.float32) * np.repeat(np.asarray(aksf), 128, 0)[:tk]
    bd = np.asarray(bkq, np.float32) * np.repeat(np.asarray(bksf), 128, 0)[:tk]
    check('k_grouped_fp8 wgrad', calc_diff(dk[0], ad[:256].T @ bd[:256]), 2e-4)

    # masked grouped (decode MoE) — SMEM masked_m operand + gk==1 direct write
    Gm, mxm, nm, km = 4, 128, 256, 384
    am = jnp.asarray(rng.randn(Gm, mxm, km) * 0.1, jnp.bfloat16)
    bm_ = jnp.asarray(rng.randn(Gm, nm, km) * 0.1, jnp.bfloat16)
    mmask = jnp.asarray([128, 64, 32, 128], jnp.int32)
    aqs = [dg.per_token_cast_to_fp8(am[g], use_ue8m0=False)
           for g in range(Gm)]
    bqs = [dg.per_block_cast_to_fp8(bm_[g], use_ue8m0=False)
           for g in range(Gm)]
    amq = (jnp.stack([v for v, _ in aqs]), jnp.stack([s for _, s in aqs]))
    bmq = (jnp.stack([v for v, _ in bqs]), jnp.stack([s for _, s in bqs]))
    dmk = dg.m_grouped_fp8_gemm_nt_masked(amq, bmq, masked_m=mmask,
                                          expected_m=96)
    worst = 0.0
    for g in range(Gm):
        rg = np.asarray(am[g], np.float32) @ np.asarray(bm_[g], np.float32).T
        v = int(mmask[g])
        worst = max(worst, calc_diff(dmk[g, :v], rg[:v]))
    check('m_grouped_fp8 masked', worst, 1e-3)

    # MQA prefill + paged decode
    sq, skv, h, dh = 64, 256, 4, 64
    q = jnp.asarray(rng.randn(sq, h, dh), jnp.bfloat16)
    kv = jnp.asarray(rng.randn(skv, dh), jnp.bfloat16)
    w = jnp.asarray(rng.randn(sq, h).astype(np.float32))
    ks = jnp.zeros((sq,), jnp.int32)
    ke = jnp.asarray((np.arange(sq) + (skv - sq)).astype(np.int32))
    q8 = jnp.clip(q.astype(jnp.float32), -448, 448).astype(jnp.float8_e4m3fn)
    kv8, kvsf = dg.per_custom_dims_cast_to_fp8(kv, (0,), use_ue8m0=False)
    lg = dg.fp8_mqa_logits((q8, None), (kv8, kvsf), w, ks, ke)
    score = np.einsum('mhd,nd->hmn',
                      np.asarray(q8, np.float32),
                      np.asarray(kv8, np.float32) * np.asarray(kvsf)[:, None])
    refl = np.einsum('hmn,mh->mn', np.maximum(score, 0), np.asarray(w))
    cols = np.arange(skv)
    mask = (cols[None] >= 0) & (cols[None] < np.asarray(ke)[:, None])
    check('fp8_mqa_logits', calc_diff(
        np.where(mask, np.asarray(lg), 0), np.where(mask, refl, 0)), 1e-4)

    # dh=128 here: the zero-copy strategy requires 128-lane-aligned pages
    # (narrower heads auto-fall back to gather — then the bitwise check below
    # would not drive the zero-copy kernel at all)
    B, bkv, bps, dh = 3, 64, 3, 128
    mml = bkv * bps
    nb = B * bps
    kvv = jnp.clip(jnp.asarray(rng.randn(nb, bkv, dh), jnp.float32),
                   -448, 448).astype(jnp.float8_e4m3fn)
    kvs = jnp.asarray(rng.rand(nb, bkv).astype(np.float32))
    bt = jnp.asarray(rng.permutation(nb).reshape(B, bps), jnp.int32)
    ctx = jnp.asarray(rng.randint(8, mml, B), jnp.int32)
    qp = jnp.clip(jnp.asarray(rng.randn(B, 1, h, dh), jnp.float32),
                  -448, 448).astype(jnp.float8_e4m3fn)
    wp = jnp.asarray(rng.randn(B, h).astype(np.float32))
    lgp = dg.fp8_fp4_paged_mqa_logits((qp, None), (kvv, kvs), wp, ctx, bt,
                                      max_context_len=mml)
    i = 0
    kvseq = (np.asarray(kvv, np.float32) *
             np.asarray(kvs)[:, :, None])[np.asarray(bt)[i]].reshape(-1, dh)
    sc = np.maximum(np.asarray(qp, np.float32)[i, 0] @ kvseq.T, 0)
    vr = (np.asarray(wp)[i][:, None] * sc).sum(0)
    msk = np.arange(mml) < int(ctx[i])
    check('fp8_paged_mqa_logits', calc_diff(
        np.where(msk, np.asarray(lgp)[i], 0), np.where(msk, vr, 0)), 1e-4)

    # zero-copy paged strategy must be bitwise-identical to gather
    lgz = dg.fp8_fp4_paged_mqa_logits((qp, None), (kvv, kvs), wp, ctx, bt,
                                      max_context_len=mml,
                                      strategy='zerocopy')
    zc_diff = 0.0 if np.array_equal(np.asarray(lgz), np.asarray(lgp)) else 1.0
    check('paged zerocopy==gather (bitwise)', zc_diff, 1e-9)

    # fused post-gather sparse attention (r5) vs host oracle
    Bs5, t5, h5, d5 = 8, 64, 8, 128
    q5 = jnp.asarray(rng.randn(Bs5, h5, d5), jnp.bfloat16)
    k5 = jnp.asarray(rng.randn(Bs5, t5, h5, d5), jnp.bfloat16)
    v5 = jnp.asarray(rng.randn(Bs5, t5, h5, d5), jnp.bfloat16)
    valid5 = jnp.asarray(rng.rand(Bs5, t5) > 0.2).at[:, 0].set(True)
    from deepgemm_tpu.kernels.sparse_attn import gathered_attention
    o5 = gathered_attention(q5, k5, v5, valid5, 1.0 / np.sqrt(d5))
    qf, kf, vf = (np.asarray(x, np.float32) for x in (q5, k5, v5))
    scr5 = np.einsum('bhd,bthd->bth', qf, kf) / np.sqrt(d5)
    scr5[~np.asarray(valid5)] = -np.inf
    e5 = np.exp(scr5 - scr5.max(1, keepdims=True))
    e5[~np.asarray(valid5)] = 0.0
    ref5 = np.einsum('bth,bthd->bhd', e5 / e5.sum(1, keepdims=True), vf)
    check('sparse_gathered_attention', calc_diff(
        np.asarray(o5, np.float32), ref5), 2e-3)

    # dual-B straddle contiguous (r5) must be bitwise vs the plain path
    import os as _os
    sizes5 = [128, 384, 256]
    ids5 = jnp.asarray(np.repeat(np.arange(3, dtype=np.int32), sizes5))
    a5 = jnp.asarray(rng.randn(sum(sizes5), 1024), jnp.bfloat16)
    b5 = jnp.asarray(rng.randn(3, 512, 1024) * 0.1, jnp.bfloat16)
    outs5 = {}
    for mode in ('0', '1'):
        _os.environ['DGT_GROUPED_DUAL_B'] = mode
        outs5[mode] = dg.m_grouped_bf16_gemm_nt_contiguous(
            a5, b5, grouped_layout=ids5, use_psum_layout=False)
    _os.environ.pop('DGT_GROUPED_DUAL_B', None)
    dual_diff = 0.0 if np.array_equal(np.asarray(outs5['0']),
                                      np.asarray(outs5['1'])) else 1.0
    check('grouped dual-B==plain (bitwise)', dual_diff, 1e-9)

    print(f'total {time.perf_counter() - t0:.0f}s; '
          f'{"ALL PASS" if not failures else "FAILURES: " + str(failures)}',
          flush=True)
    return 1 if failures else 0


if __name__ == '__main__':
    raise SystemExit(main())
