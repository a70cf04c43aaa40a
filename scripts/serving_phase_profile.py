#!/usr/bin/env python
"""Serving decode-step phase profile (VERDICT r4 weak #4 / next #6).

Splits bench.py's serving `_serve_step` (the engine's _device_step
dataflow) into its four phases and trace-times each in isolation at the
bench config (B=64 slots, ctx 4096, topk 512):

  P1 scatter-append   4 cache .at[].set scatters (k/v/ik/isf)
  P2 indexer score    fp8_fp4_paged_mqa_logits (the Pallas kernel)
  P3 top-k            jax.lax.top_k over [B, 4096] logits
  P4 gather+attn      sparse gather + exact attention over topk slots

plus the FULL step for cross-checking (phases overlap under XLA fusion, so
the sum is an upper bound on the full step). The Amdahl question this
answers: is the paged kernel 7% of a kernel-bound step, or 50% of an
attention-bound one? (mega_phase_profile.py is the sibling that found the
mega's VPU exposure.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench


def show(name, t):
    print(f'{name:32s} {t * 1e6:9.1f} us/step', flush=True)
    return t


def main():
    import deepgemm_tpu as dg  # noqa: F401 (init + relay guard via bench)
    from deepgemm_tpu.models.indexer import indexer_sparse_decode, \
        _topk_indices
    from deepgemm_tpu.ops.attention import fp8_fp4_paged_mqa_logits
    dg.init_persistent_cache()
    rng = np.random.RandomState(0)

    Bs, bkv, mps = 64, 64, 64
    nbs = Bs * mps
    hs, ds, his, dis, tks = 8, 128, 32, 128, 512
    mcl = bkv * mps
    kp = jnp.asarray(rng.randn(nbs, bkv, hs, ds) * 0.1, jnp.bfloat16)
    vp = jnp.asarray(rng.randn(nbs, bkv, hs, ds) * 0.1, jnp.bfloat16)
    ikp = jnp.clip(jnp.asarray(rng.randn(nbs, bkv, dis), jnp.float32),
                   -448, 448).astype(jnp.float8_e4m3fn)
    isfp = jnp.asarray(rng.rand(nbs, bkv).astype(np.float32))
    btab = jnp.asarray(rng.permutation(nbs).reshape(Bs, mps), jnp.int32)
    last = mcl - 1
    pages = btab[jnp.arange(Bs), last // bkv]
    offs = jnp.full((Bs,), last % bkv, jnp.int32)
    ctx = jnp.full((Bs,), mcl, jnp.int32)
    q = jnp.asarray(rng.randn(Bs, hs, ds) * 0.1, jnp.bfloat16)
    iq = jnp.asarray(rng.randn(Bs, his, dis) * 0.1, jnp.bfloat16)
    iw = jnp.asarray(rng.randn(Bs, his).astype(np.float32))
    kn = jnp.asarray(rng.randn(Bs, hs, ds) * 0.1, jnp.bfloat16)
    vn = jnp.asarray(rng.randn(Bs, hs, ds) * 0.1, jnp.bfloat16)
    ikn = jnp.clip(jnp.asarray(rng.randn(Bs, dis), jnp.float32),
                   -448, 448).astype(jnp.float8_e4m3fn)
    isn = jnp.asarray(rng.rand(Bs).astype(np.float32))
    iqf = jnp.clip(iq.astype(jnp.float32), -448, 448) \
        .astype(jnp.float8_e4m3fn)

    # fixed logits / selection operands for the isolated later phases
    logits0 = jax.block_until_ready(fp8_fp4_paged_mqa_logits(
        (iqf[:, None], None), (ikp, isfp), iw, ctx, btab, None, mcl))

    # ---- P1: scatter-append ---------------------------------------------
    def p1(i, iw_, kp_, vp_, ikp_, isf_):
        kp2 = kp_.at[pages, offs].set(kn * iw_[0, 0])
        vp2 = vp_.at[pages, offs].set(vn)
        ik2 = ikp_.at[pages, offs].set(ikn)
        is2 = isf_.at[pages, offs].set(isn)
        return (kp2[0, 0, 0, 0].astype(jnp.float32)
                + vp2[0, 0, 0, 0].astype(jnp.float32)
                + ik2[0, 0, 0].astype(jnp.float32) + is2[0, 0])

    # ---- P2: indexer scoring (Pallas paged kernel) ------------------------
    def p2(i, iw_, kp_, vp_, ikp_, isf_):
        lg = fp8_fp4_paged_mqa_logits((iqf[:, None], None), (ikp_, isf_),
                                      jnp.roll(iw_, i, 0), ctx, btab,
                                      None, mcl)
        return lg[0, i % mcl].astype(jnp.float32)

    # ---- P3: top-k --------------------------------------------------------
    def p3(i, iw_, kp_, vp_, ikp_, isf_):
        sel, valid = _topk_indices(logits0 + iw_[0, 0], tks)
        return sel[0, i % tks].astype(jnp.float32)

    # ---- P4: sparse gather + exact attention ------------------------------
    sel0, valid0 = _topk_indices(logits0, tks)
    sel0 = jax.block_until_ready(sel0)

    def p4(i, iw_, kp_, vp_, ikp_, isf_):
        pg = jnp.clip(sel0, 0, mcl - 1) // bkv
        of = jnp.clip(sel0, 0, mcl - 1) % bkv
        rows = jnp.arange(Bs)[:, None]
        blocks = jnp.clip(btab, 0, nbs - 1)[rows, jnp.clip(pg, 0, mps - 1)]
        k_sel = kp_[blocks, of]
        v_sel = vp_[blocks, of]
        scr = jnp.einsum('bhd,bthd->bht',
                         (q * iw_[0, 0]).astype(jnp.float32),
                         k_sel.astype(jnp.float32)) / np.sqrt(ds)
        scr = jnp.where(valid0[:, None, :], scr, -jnp.inf)
        pr = jax.nn.softmax(scr, axis=-1)
        out = jnp.einsum('bht,bthd->bhd', pr, v_sel.astype(jnp.float32))
        return out[0, 0, i % ds]

    # ---- FULL step ---------------------------------------------------------
    def full(i, iw_, kp_, vp_, ikp_, isf_):
        kp2 = kp_.at[pages, offs].set(kn)
        vp2 = vp_.at[pages, offs].set(vn)
        ik2 = ikp_.at[pages, offs].set(ikn)
        is2 = isf_.at[pages, offs].set(isn)
        out = indexer_sparse_decode(
            q[:, None], (kp2, vp2), (ik2, is2), iq[:, None],
            jnp.roll(iw_, i, 0), ctx, btab, mcl, tks)
        return (out.astype(jnp.float32).reshape(-1)[0]
                + kp2[0, 0, 0, 0].astype(jnp.float32)
                + vp2[0, 0, 0, 0].astype(jnp.float32)
                + ik2[0, 0, 0].astype(jnp.float32) + is2[0, 0])

    args = (iw, kp, vp, ikp, isfp)
    ts = {}
    for name, fn in [('P2 indexer score (kernel)', p2),
                     ('P1 scatter-append', p1),
                     ('P3 top-k', p3),
                     ('P4 gather+attn', p4),
                     ('FULL step', full)]:
        t = bench._device_time_of(bench._loop(fn), args,
                                  f'svp_{name.split()[0]}')
        ts[name.split()[0]] = show(name, t)

    t_sum = sum(v for k, v in ts.items() if k != 'FULL')
    print(f'{"sum(P1..P4)":32s} {t_sum * 1e6:9.1f} us/step  '
          f'(FULL = {ts["FULL"] * 1e6:.1f}; overlap = '
          f'{(t_sum - ts["FULL"]) * 1e6:+.1f})', flush=True)
    print(f'kernel share of FULL: {ts["P2"] / ts["FULL"]:.1%}', flush=True)
    print(f'tokens/s at FULL: {Bs / ts["FULL"]:.0f}', flush=True)

    # ---- FULL step with the caches as fori_loop CARRY (the r5 fix): the
    # scatter updates in place instead of copying ~1.1 GB of caches per
    # step (the engine's donate_argnums analog). One entry copy amortizes
    # over a longer loop.
    SV = 64

    @jax.jit
    def full_carry(iw_, kp_, vp_, ikp_, isf_):
        def body(i, c):
            kpc, vpc, ikc, isc, acc = c
            kp2 = kpc.at[pages, offs].set(kn)
            vp2 = vpc.at[pages, offs].set(vn)
            ik2 = ikc.at[pages, offs].set(ikn)
            is2 = isc.at[pages, offs].set(isn)
            out = indexer_sparse_decode(
                q[:, None], (kp2, vp2), (ik2, is2), iq[:, None],
                jnp.roll(iw_, i, 0), ctx, btab, mcl, tks)
            return (kp2, vp2, ik2, is2,
                    acc + out.astype(jnp.float32).reshape(-1)[0])
        return jax.lax.fori_loop(0, SV, body,
                                 (kp_, vp_, ikp_, isf_, 0.0))[-1]

    t_c = bench._device_time_of(full_carry, args, 'svp_carry') \
        * bench.N_ITERS / SV
    show('FULL step (carried caches)', t_c)
    print(f'tokens/s carried: {Bs / t_c:.0f}  '
          f'(speedup {ts["FULL"] / t_c:.2f}x)', flush=True)


if __name__ == '__main__':
    main()
