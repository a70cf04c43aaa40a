#!/usr/bin/env python
"""Phase isolation for the serving compute step (r5b follow-up): the
paged gather-fused attention measured a WASH vs the XLA-gather path
inside the full step (1603 us both) — time each phase alone to find the
real bound: (a) indexer score + top-k, (b) XLA gather alone, (c) fused
attention on pre-gathered rows, (d) the paged gather-fused kernel alone."""

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


def timed(step, state, tag, n=12):
    state = tuple(jax.block_until_ready(jnp.copy(x)) for x in state)
    for _ in range(2):
        out = step(*state)
        state = tuple(out[:len(state)])
    td = f'/tmp/dgt_phase_{tag.replace(" ", "_")}'
    shutil.rmtree(td, ignore_errors=True)
    with jax.profiler.trace(td):
        for _ in range(n):
            out = step(*state)
            state = tuple(out[:len(state)])
        jax.block_until_ready(out[-1])
    durs = []
    paths = sorted(glob.glob(os.path.join(td, '**', '*.trace.json.gz'),
                             recursive=True), key=os.path.getmtime)
    with gzip.open(paths[-1], 'rt') as f:
        tr = json.load(f)
    for ev in tr.get('traceEvents', []):
        if ev.get('ph') == 'X' and ev.get('name', '').startswith('jit_'):
            durs.append(ev['dur'])
    durs.sort()
    med = durs[len(durs) // 2] if durs else float('nan')
    print(f'{tag:44s} {med:9.1f} us/step ({len(durs)} ev)', flush=True)
    return med


def main():
    from deepgemm_tpu.models.indexer import _topk_indices
    from deepgemm_tpu.ops.attention import fp8_fp4_paged_mqa_logits
    from deepgemm_tpu.kernels.sparse_attn import (sparse_attention_paged,
                                                  gathered_attention)
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
    iqf = jnp.clip(jnp.asarray(rng.randn(Bs, 1, his, dis), jnp.float32),
                   -448, 448).astype(jnp.float8_e4m3fn)
    iw = jnp.asarray(rng.randn(Bs, his).astype(np.float32))
    tok = jnp.asarray(rng.randint(0, nbs * bkv, (Bs, tks)), jnp.int32)
    valid = jnp.ones((Bs, tks), bool)
    kflat = kp.reshape(-1, hs, ds)
    vflat = vp.reshape(-1, hs, ds)

    # (a) score + topk (donate caches so identity returns alias)
    def score_topk(ik_, is_, iw_):
        lg = fp8_fp4_paged_mqa_logits((iqf, None), (ik_, is_), iw_,
                                      ctx, btab, None, mcl)
        sel, v_ = _topk_indices(lg, tks)
        return ik_, is_, iw_, sel[0, 0].astype(jnp.float32)
    timed(jax.jit(score_topk, donate_argnums=(0, 1)), (ikp, isfp, iw),
          'a score+topk')

    # (b) XLA gather alone (k+v), rolled tok so nothing hoists
    def gather_only(kf, vf, tk):
        tk = jnp.roll(tk, 1, 0)
        ks = kf[tk]
        vs = vf[tk]
        return kf, vf, tk, ks[0, 0, 0, 0].astype(jnp.float32) \
            + vs[0, 0, 0, 0].astype(jnp.float32)
    timed(jax.jit(gather_only, donate_argnums=(0, 1)), (kflat, vflat, tok),
          'b XLA gather k+v')

    # (c) fused attention on pre-gathered rows
    ksel = jax.block_until_ready(kflat[tok])
    vsel = jax.block_until_ready(vflat[tok])

    def attn_only(ks, vs, q_):
        q_ = jnp.roll(q_, 1, 0)
        o = gathered_attention(q_, ks, vs, valid, 0.0883883)
        return ks, vs, q_, o[0, 0, 0].astype(jnp.float32)
    timed(jax.jit(attn_only, donate_argnums=()), (ksel, vsel, q),
          'c fused attn on gathered')

    # (d) paged gather-fused kernel alone
    def paged_only(kf, vf, q_, tk):
        q_ = jnp.roll(q_, 1, 0)
        o = sparse_attention_paged(q_, kf, vf, tk, valid, 0.0883883)
        return kf, vf, q_, tk, o[0, 0, 0].astype(jnp.float32)
    timed(jax.jit(paged_only, donate_argnums=(0, 1)), (kflat, vflat, q, tok),
          'd paged gather-fused kernel')

    # (e) XLA attention tail on gathered rows (the no-kernel baseline tail)
    def attn_xla(ks, vs, q_):
        q_ = jnp.roll(q_, 1, 0)
        scr = jnp.einsum('bhd,bthd->bht', q_.astype(jnp.float32),
                         ks.astype(jnp.float32)) * 0.0883883
        pr = jax.nn.softmax(scr, axis=-1)
        o = jnp.einsum('bht,bthd->bhd', pr, vs.astype(jnp.float32))
        return ks, vs, q_, o[0, 0, 0].astype(jnp.float32)
    timed(jax.jit(attn_xla, donate_argnums=()), (ksel, vsel, q),
          'e XLA attn on gathered')


if __name__ == '__main__':
    main()
