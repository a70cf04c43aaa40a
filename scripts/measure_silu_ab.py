#!/usr/bin/env python
"""On-chip A/B of the mega L1 epilogue's SiLU lowering (DGT_MEGA_SILU).

Serving dims, D=1 local kernel, bf16-act default policy. Variants:
  exp    — jax.nn.silu (default)
  tanh   — x*(0.5*tanh(0.5x)+0.5), mathematically equal
  nosilu — identity (WRONG results; isolates the transcendental's cost in
           the single issue stream)
Plus the unfused chain for the ratio. The env is read at TRACE time, so each
variant builds a fresh jit."""

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
    print(f'backend: {jax.default_backend()}', flush=True)

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

    @jax.jit
    def _dev_diff(x, y):
        x, y = x.astype(jnp.float32), y.astype(jnp.float32)
        return 1.0 - 2.0 * jnp.vdot(x, y) / (jnp.vdot(x, x) + jnp.vdot(y, y))

    results = {}
    y_ref = None
    for impl in ('exp', 'tanh', 'nosilu'):
        os.environ['DGT_MEGA_SILU'] = impl
        mega_fn = jax.jit(shard_map(
            lambda xs, ss, rws, pw: fused_mega_moe(
                xs, rws, None, None, 'ep', send_sf=ss, packed=pw),
            mesh=mesh1, check_vma=False, in_specs=(P(),) * 4, out_specs=P()))
        if impl != 'nosilu':
            y = mega_fn(xqm, xsfm, rwm, packm)
            if y_ref is None:
                y_ref = y
            else:
                d = float(_dev_diff(y, y_ref))
                print(f'{impl} vs exp (on-device): calc_diff={d:.2e}',
                      flush=True)
                del y

        @jax.jit
        def loop_mega(xs, ss, rws, pw, _fn=mega_fn):
            def body(i, acc):
                o = _fn(xs, jnp.roll(ss, i, 2), rws, pw)
                return acc + o[0, 0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, bench.N_ITERS, body, 0.0)

        t = bench._device_time_of(loop_mega, (xqm, xsfm, rwm, packm),
                                  f'silu_{impl}')
        results[impl] = t
        print(f'fused mega silu={impl:7s}: {flops_mega / t / 1e12:7.1f} '
              f'TFLOPS ({t * 1e6:.1f} us/iter)', flush=True)
    os.environ.pop('DGT_MEGA_SILU')

    # unfused chain (weights as jit ARGS — the 413-closure rule)
    sfb1m_t = _grouped_sfb_t(w1msf, ELm, 2 * Im, Hm, (128, 128),
                             b_kmajor=True)
    sfb2m_t = _grouped_sfb_t(w2msf, ELm, Hm, Im, (128, 128), b_kmajor=True)
    fullm = jnp.full((ELm,), capm, jnp.int32)

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
        loop_unf, (xqm, xsfm, rwm, w1mq, sfb1m_t, w2mq, sfb2m_t),
        'silu_unf')
    print(f'unfused chain          : {flops_mega / t_unf / 1e12:7.1f} '
          f'TFLOPS ({t_unf * 1e6:.1f} us/iter)', flush=True)
    for impl, t in results.items():
        print(f'  fused[{impl}]/unfused speedup = {t_unf / t:.3f}',
              flush=True)


if __name__ == '__main__':
    main()
