#!/usr/bin/env python
"""Does donation make the serving cache append in-place on TPU?

serving_phase_profile.py (r5) showed the decode step is >90% cache-copy:
XLA materializes a fresh ~1.1 GB of k/v cache per step around the 64-row
scatter, both with loop-invariant args (2755 us) and — WORSE — as
fori_loop carry (5006 us: copy out + copy back). The remaining candidate
mechanisms, measured here as donated top-level jits called repeatedly
with ping-ponged state (exactly the engine's cadence; per-call device
trace events, wall-clock lies through the relay):

  V0  scatter append, NO donation        (the r4 engine)
  V1  scatter append, donate_argnums     (engine r5 fix, aliasing pairs)
  V2  64x dynamic-update-slice loop append, donated (the maxtext-style
      in-place pattern XLA reliably aliases)
  V3  V2 + full indexer_sparse_decode    (the whole donated step)
"""

import glob
import gzip
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench  # relay guard


def timed_calls(step, state, extra, tag, n=12):
    # fresh buffers per variant — donated runs consume theirs
    state = tuple(jax.block_until_ready(jnp.copy(x)) for x in state)
    for _ in range(2):                       # compile + warm (consumes state)
        out = step(*state, *extra)
        state = tuple(out[:len(state)])
    trace_dir = f'/tmp/dgt_donate_{tag}'
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(n):
            out = step(*state, *extra)
            state = tuple(out[:len(state)])
        jax.block_until_ready(out)
    durs = []
    paths = sorted(glob.glob(os.path.join(trace_dir, '**', '*.trace.json.gz'),
                             recursive=True), key=os.path.getmtime)
    with gzip.open(paths[-1], 'rt') as f:
        trace = json.load(f)
    for ev in trace.get('traceEvents', []):
        if ev.get('ph') == 'X' and ev.get('name', '').startswith('jit_'):
            durs.append(ev['dur'])
    durs.sort()
    med = durs[len(durs) // 2] if durs else float('nan')
    print(f'{tag:34s} {med:9.1f} us/step  ({len(durs)} events)', flush=True)
    return med


def main():
    from deepgemm_tpu.models.indexer import indexer_sparse_decode
    import deepgemm_tpu as dg
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
    pages = btab[jnp.arange(Bs), (mcl - 1) // bkv]
    offs = jnp.full((Bs,), (mcl - 1) % bkv, jnp.int32)
    ctx = jnp.full((Bs,), mcl, jnp.int32)
    q = jnp.asarray(rng.randn(Bs, hs, ds) * 0.1, jnp.bfloat16)
    iq = jnp.asarray(rng.randn(Bs, his, dis) * 0.1, jnp.bfloat16)
    iw = jnp.asarray(rng.randn(Bs, his).astype(np.float32))
    kn = jnp.asarray(rng.randn(Bs, hs, ds) * 0.1, jnp.bfloat16)
    vn = jnp.asarray(rng.randn(Bs, hs, ds) * 0.1, jnp.bfloat16)
    ikn = jnp.clip(jnp.asarray(rng.randn(Bs, dis), jnp.float32),
                   -448, 448).astype(jnp.float8_e4m3fn)
    isn = jnp.asarray(rng.rand(Bs).astype(np.float32))

    def scatter_append(kp_, vp_, ik_, is_):
        kp2 = kp_.at[pages, offs].set(kn)
        vp2 = vp_.at[pages, offs].set(vn)
        ik2 = ik_.at[pages, offs].set(ikn)
        is2 = is_.at[pages, offs].set(isn)
        return kp2, vp2, ik2, is2

    def dus_append(kp_, vp_, ik_, is_):
        # 64 per-slot dynamic-update-slices (flat token dim) — the pattern
        # XLA reliably updates in place under donation
        kpf = kp_.reshape(nbs * bkv, hs, ds)
        vpf = vp_.reshape(nbs * bkv, hs, ds)
        ikf = ik_.reshape(nbs * bkv, dis)
        isf2 = is_.reshape(nbs * bkv)
        tok = pages * bkv + offs

        def body(i, c):
            kpc, vpc, ikc, isc = c
            kpc = jax.lax.dynamic_update_slice(kpc, kn[i][None], (tok[i], 0, 0))
            vpc = jax.lax.dynamic_update_slice(vpc, vn[i][None], (tok[i], 0, 0))
            ikc = jax.lax.dynamic_update_slice(ikc, ikn[i][None], (tok[i], 0))
            isc = jax.lax.dynamic_update_slice(isc, isn[i][None], (tok[i],))
            return kpc, vpc, ikc, isc
        kpf, vpf, ikf, isf2 = jax.lax.fori_loop(0, Bs, body,
                                                (kpf, vpf, ikf, isf2))
        return (kpf.reshape(nbs, bkv, hs, ds), vpf.reshape(nbs, bkv, hs, ds),
                ikf.reshape(nbs, bkv, dis), isf2.reshape(nbs, bkv))

    def mk(append, full, donate):
        def step(kp_, vp_, ik_, is_, iw_):
            kp2, vp2, ik2, is2 = append(kp_, vp_, ik_, is_)
            if full:
                out = indexer_sparse_decode(
                    q[:, None], (kp2, vp2), (ik2, is2), iq[:, None], iw_,
                    ctx, btab, mcl, tks)
                r = out.astype(jnp.float32).reshape(-1)[0]
            else:
                r = (kp2[0, 0, 0, 0].astype(jnp.float32)
                     + vp2[0, 0, 0, 0].astype(jnp.float32)
                     + ik2[0, 0, 0].astype(jnp.float32) + is2[0, 0])
            return kp2, vp2, ik2, is2, r
        return jax.jit(step, donate_argnums=(0, 1, 2, 3) if donate else ())

    state = (kp, vp, ikp, isfp)
    run_all = 'split' not in sys.argv
    if run_all:
        timed_calls(mk(scatter_append, False, False), state, (iw,),
                    'V0 scatter, no donation')
        timed_calls(mk(scatter_append, False, True), state, (iw,),
                    'V1 scatter, donated')
        timed_calls(mk(dus_append, False, True), state, (iw,),
                    'V2 DUS-loop, donated')
        timed_calls(mk(dus_append, True, True), state, (iw,),
                    'V3 DUS-loop + full step, donated')
        timed_calls(mk(scatter_append, True, True), state, (iw,),
                    'V4 scatter + full step, donated')

        # ---- top-k method A/B inside the full donated step ---------------
        # (indexer_sparse_decode routes selection via DGT_TOPK_METHOD)
        for meth in ('sort', 'select'):
            os.environ['DGT_TOPK_METHOD'] = meth
            timed_calls(mk(scatter_append, True, True), state, (iw,),
                        f'V5 full donated step, topk={meth}')
        os.environ.pop('DGT_TOPK_METHOD', None)

    # ---- W: SPLIT-STEP form — the r5 conclusion candidate ----------------
    # Composing the scatter-append with the downstream gather in ONE jit
    # defeats the in-place aliasing (V4/V5: ~1.8 ms ≈ one full k/v cache
    # copy reappears vs V1's 27 us pure append). Two jits per step: a
    # DONATED append (in-place) + a read-only compute (score/topk/attn) —
    # the engine cadence this measures is two dispatches, no copies.
    append_fn = jax.jit(
        lambda kp_, vp_, ik_, is_: scatter_append(kp_, vp_, ik_, is_),
        donate_argnums=(0, 1, 2, 3))

    @jax.jit
    def compute_fn(kp_, vp_, ik_, is_, iw_):
        out = indexer_sparse_decode(
            q[:, None], (kp_, vp_), (ik_, is_), iq[:, None], iw_,
            ctx, btab, mcl, tks)
        return out.astype(jnp.float32).reshape(-1)[0]

    st = tuple(jax.block_until_ready(jnp.copy(x))
               for x in (kp, vp, ikp, isfp))
    for _ in range(2):
        st = tuple(append_fn(*st))
        r = compute_fn(*st, iw)
    trace_dir = '/tmp/dgt_donate_split'
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        for _ in range(12):
            st = tuple(append_fn(*st))
            r = compute_fn(*st, iw)
        jax.block_until_ready(r)
    durs = {}
    paths = sorted(glob.glob(os.path.join(trace_dir, '**',
                                          '*.trace.json.gz'),
                             recursive=True), key=os.path.getmtime)
    with gzip.open(paths[-1], 'rt') as f:
        trace = json.load(f)
    for ev in trace.get('traceEvents', []):
        if ev.get('ph') == 'X' and ev.get('name', '').startswith('jit_'):
            durs.setdefault(ev['name'], []).append(ev['dur'])
    total = 0.0
    for name, ds_ in sorted(durs.items()):
        ds_.sort()
        med = ds_[len(ds_) // 2]
        print(f'  split-step module {name}: {med:9.1f} us x{len(ds_)}',
              flush=True)
        total += med
    print(f'{"W  SPLIT append+compute":34s} {total:9.1f} us/step',
          flush=True)

    # ---- C: decompose the READ-ONLY compute step (split measured the
    # compute jit alone at ~2.2 ms; isolated P-phases were hoisting
    # artifacts). Candidate mechanism: the per-token 2-level sparse k/v
    # gather kp[blocks, offs] ([64,512] indices of (8,128) rows) lowering
    # at ~33 GB/s.
    if 'compute' in sys.argv:
        from deepgemm_tpu.models.indexer import _topk_indices
        from deepgemm_tpu.ops.attention import fp8_fp4_paged_mqa_logits
        iqf = jnp.clip(iq.astype(jnp.float32), -448, 448) \
            .astype(jnp.float8_e4m3fn)

        def score_topk(kp_, vp_, ik_, is_, iw_):
            lg = fp8_fp4_paged_mqa_logits((iqf[:, None], None), (ik_, is_),
                                          iw_, ctx, btab, None, mcl)
            sel, valid = _topk_indices(lg, tks)
            return kp_, vp_, ik_, is_, sel[0, 0].astype(jnp.float32)

        def full_2lvl(kp_, vp_, ik_, is_, iw_):
            r = indexer_sparse_decode(
                q[:, None], (kp_, vp_), (ik_, is_), iq[:, None], iw_,
                ctx, btab, mcl, tks)
            return kp_, vp_, ik_, is_, r.astype(jnp.float32).reshape(-1)[0]

        def full_flat(kp_, vp_, ik_, is_, iw_):
            lg = fp8_fp4_paged_mqa_logits((iqf[:, None], None), (ik_, is_),
                                          iw_, ctx, btab, None, mcl)
            sel, valid = _topk_indices(lg, tks)
            pg = jnp.clip(sel, 0, mcl - 1) // bkv
            of = jnp.clip(sel, 0, mcl - 1) % bkv
            rows = jnp.arange(Bs)[:, None]
            blocks = btab[rows, jnp.clip(pg, 0, mps - 1)]
            tok = blocks * bkv + of                       # FLAT index
            k_sel = kp_.reshape(nbs * bkv, hs, ds)[tok]
            v_sel = vp_.reshape(nbs * bkv, hs, ds)[tok]
            scr = jnp.einsum('bhd,bthd->bht', q.astype(jnp.float32),
                             k_sel.astype(jnp.float32)) / np.sqrt(ds)
            scr = jnp.where(valid[:, None, :], scr, -jnp.inf)
            pr = jax.nn.softmax(scr, axis=-1)
            out = jnp.einsum('bht,bthd->bhd', pr,
                             v_sel.astype(jnp.float32))
            return kp_, vp_, ik_, is_, out[0, 0, 0].astype(jnp.float32)

        def gather_only(kp_, vp_, ik_, is_, iw_):
            # fixed random sel (data-independent): pure gather cost,
            # 2-level form
            sel = jnp.asarray(rng.randint(0, mcl, (Bs, tks)), jnp.int32)
            sel = sel + (iw_[0, 0] * 0).astype(jnp.int32)  # keep iw_ used
            pg, of = sel // bkv, sel % bkv
            rows = jnp.arange(Bs)[:, None]
            blocks = btab[rows, pg]
            k_sel = kp_[blocks, of]
            v_sel = vp_[blocks, of]
            return (kp_, vp_, ik_, is_,
                    k_sel[0, 0, 0, 0].astype(jnp.float32)
                    + v_sel[0, 0, 0, 0].astype(jnp.float32))

        def gather_only_flat(kp_, vp_, ik_, is_, iw_):
            sel = jnp.asarray(rng.randint(0, mcl, (Bs, tks)), jnp.int32)
            sel = sel + (iw_[0, 0] * 0).astype(jnp.int32)
            pg, of = sel // bkv, sel % bkv
            rows = jnp.arange(Bs)[:, None]
            tok = btab[rows, pg] * bkv + of
            k_sel = kp_.reshape(nbs * bkv, hs, ds)[tok]
            v_sel = vp_.reshape(nbs * bkv, hs, ds)[tok]
            return (kp_, vp_, ik_, is_,
                    k_sel[0, 0, 0, 0].astype(jnp.float32)
                    + v_sel[0, 0, 0, 0].astype(jnp.float32))

        for name, f in [('C1 score+topk only', score_topk),
                        ('C2 gather-only 2-level', gather_only),
                        ('C3 gather-only FLAT', gather_only_flat),
                        ('C4 full compute 2-level', full_2lvl),
                        ('C5 full compute FLAT gather', full_flat)]:
            # donate so the identity-returned caches ALIAS instead of
            # copying (~3.4 ms of output copies otherwise — first C run)
            timed_calls(jax.jit(f, donate_argnums=(0, 1, 2, 3)),
                        state, (iw,), name)
        return

    if run_all:
        # ---- isolated top-k timing (rolled logits so nothing hoists) -----
        from deepgemm_tpu.models.indexer import _topk_indices
        logits = jnp.asarray(rng.randn(Bs, mcl).astype(np.float32))
        for meth in ('sort', 'select'):
            os.environ['DGT_TOPK_METHOD'] = meth
            loop = bench._loop(lambda i, lg: _topk_indices(
                jnp.roll(lg, i, 0), tks)[0][0, i % tks].astype(jnp.float32))
            t = bench._device_time_of(loop, (logits,), f'topk_{meth}')
            print(f'{"isolated topk " + meth:34s} {t * 1e6:9.1f} us/step',
                  flush=True)
        os.environ.pop('DGT_TOPK_METHOD', None)


if __name__ == '__main__' and 'attn' not in sys.argv:
    main()


# appended r5b: fused-vs-XLA attention tail inside the full donated step
# (run as `python scripts/measure_serving_donate.py attn`); also A/Bs the
# flat vs 2-level sparse gather form.
def attn_ab():
    from deepgemm_tpu.models.indexer import indexer_sparse_decode
    import deepgemm_tpu as dg
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
    ctx = jnp.full((Bs,), mcl, jnp.int32)
    q = jnp.asarray(rng.randn(Bs, hs, ds) * 0.1, jnp.bfloat16)
    iq = jnp.asarray(rng.randn(Bs, his, dis) * 0.1, jnp.bfloat16)
    iw = jnp.asarray(rng.randn(Bs, his).astype(np.float32))

    def full(kp_, vp_, ik_, is_, iw_):
        r = indexer_sparse_decode(
            q[:, None], (kp_, vp_), (ik_, is_), iq[:, None], iw_,
            ctx, btab, mcl, tks)
        return kp_, vp_, ik_, is_, r.astype(jnp.float32)[0, 0, 0, 0]

    state = (kp, vp, ikp, isfp)
    for attn in ('xla', 'fused'):
        for gather in ('2level', 'flat'):
            os.environ['DGT_SPARSE_ATTN'] = attn
            os.environ['DGT_SPARSE_GATHER'] = gather
            timed_calls(jax.jit(full, donate_argnums=(0, 1, 2, 3)),
                        state, (iw,), f'A6 compute attn={attn} g={gather}')
    for k in ('DGT_SPARSE_ATTN', 'DGT_SPARSE_GATHER'):
        os.environ.pop(k, None)


if __name__ == '__main__' and 'attn' in sys.argv:
    attn_ab()
