#!/usr/bin/env python
"""On-chip A/B: gather-fused sparse attention (DGT_SPARSE_GATHER=pallas)
vs the XLA-gather + fused-attention compute step, inside the donated
serving cadence (r5b). Also validates the paged kernel bitwise-class vs
the gathered kernel on device (first real-relay compile of the family —
the chipless AOT tier is necessary-but-not-sufficient for new op
classes)."""

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


def main():
    from deepgemm_tpu.models.indexer import indexer_sparse_decode
    from deepgemm_tpu.kernels.sparse_attn import (sparse_attention_paged,
                                                  gathered_attention)
    import deepgemm_tpu as dg
    from deepgemm_tpu.testing import calc_diff
    dg.init_persistent_cache()
    rng = np.random.RandomState(0)

    # --- 1. relay compile probe + numerics at a small shape --------------
    B0, T0, H0, D0, N0 = 8, 64, 8, 128, 1024
    q0 = jnp.asarray(rng.randn(B0, H0, D0), jnp.bfloat16)
    cache0 = jnp.asarray(rng.randn(N0, H0, D0), jnp.bfloat16)
    tok0 = jnp.asarray(rng.randint(0, N0, (B0, T0)), jnp.int32)
    valid0 = jnp.asarray(rng.rand(B0, T0) > 0.3).at[:, 0].set(True)
    o_p = sparse_attention_paged(q0, cache0, cache0, tok0, valid0, 0.088)
    o_g = gathered_attention(q0, cache0[tok0], cache0[tok0], valid0, 0.088)
    d = calc_diff(o_p.astype(jnp.float32), o_g.astype(jnp.float32))
    print(f'paged vs gathered on chip (small): diff={d:.2e}', flush=True)
    assert d < 1e-6

    # --- 2. donated compute-step A/B at serving dims ---------------------
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

    def timed(step, state, tag, n=12):
        state = tuple(jax.block_until_ready(jnp.copy(x)) for x in state)
        for _ in range(2):
            out = step(*state, iw)
            state = tuple(out[:4])
        td = f'/tmp/dgt_paged_{tag}'
        shutil.rmtree(td, ignore_errors=True)
        with jax.profiler.trace(td):
            for _ in range(n):
                out = step(*state, iw)
                state = tuple(out[:4])
            jax.block_until_ready(out[4])
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
        print(f'{tag:40s} {med:9.1f} us/step ({len(durs)} ev)', flush=True)
        return med

    state = (kp, vp, ikp, isfp)
    outs = {}
    for mode in ('flat', 'pallas'):
        os.environ['DGT_SPARSE_GATHER'] = mode
        f = jax.jit(full, donate_argnums=(0, 1, 2, 3))
        # value check on the same inputs first (fresh copies)
        st = tuple(jnp.copy(x) for x in state)
        outs[mode] = np.asarray(jax.block_until_ready(f(*st, iw)[4]))
        timed(f, state, f'compute gather={mode}')
    os.environ.pop('DGT_SPARSE_GATHER', None)
    print('flat vs pallas probe value:', outs['flat'], outs['pallas'],
          flush=True)


if __name__ == '__main__':
    main()
