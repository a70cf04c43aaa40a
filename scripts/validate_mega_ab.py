"""Tiny-dims CPU (interpret-mode) numerics validation of the bench.py
fused-vs-unfused mega A/B leg: the unfused pipeline (masked grouped L1 ->
SwiGLU/requant -> masked grouped L2) must match fused_mega_moe at D=1 to
fp8-requant tolerance, using EXACTLY the bench leg's call pattern (same
arg order, same sfb_t layout). Catches arg-order / layout bugs before the
leg ever touches the relay."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
jax.config.update('jax_platforms', 'cpu')

import numpy as np
import jax.numpy as jnp


def main():
    import deepgemm_tpu as dg
    from deepgemm_tpu.ops.m_grouped import _grouped_sfb_t
    from deepgemm_tpu.kernels.grouped import m_grouped_gemm_masked
    from deepgemm_tpu.kernels.fused_moe import fused_mega_moe
    from deepgemm_tpu.parallel.moe import swiglu_apply_weight_to_fp8
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    rng = np.random.RandomState(0)
    ELm, capm, Hm, Im = 2, 128, 256, 256

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
    packm = dg.pack_mega_weights(w1mq, w2mq, w1msf, w2msf, cap=capm,
                                 x_dtype=xqm.dtype, num_devices=1)
    mega_fn = jax.jit(shard_map(
        lambda xs, ss, rws, pw: fused_mega_moe(
            xs, rws, None, None, 'ep', send_sf=ss, packed=pw,
           ),
        mesh=mesh1, check_vma=False, in_specs=(P(),) * 4, out_specs=P()))
    y_f = mega_fn(xqm, xsfm, rwm, packm)

    # ---- the bench leg, verbatim ----
    sfb1m_t = _grouped_sfb_t(w1msf, ELm, 2 * Im, Hm, (128, 128),
                             b_kmajor=True)
    sfb2m_t = _grouped_sfb_t(w2msf, ELm, Hm, Im, (128, 128), b_kmajor=True)
    fullm = jnp.full((ELm,), capm, jnp.int32)

    def _unfused_mega(xq, sf, rws):
        gu = m_grouped_gemm_masked(xq, w1mq, fullm, sfa=sf, sfb_t=sfb1m_t,
                                   out_dtype=jnp.bfloat16, expected_m=capm,
                                  )
        aq2, asf2 = swiglu_apply_weight_to_fp8(gu, rws)
        return m_grouped_gemm_masked(aq2, w2mq, fullm, sfa=asf2,
                                     sfb_t=sfb2m_t, out_dtype=jnp.bfloat16,
                                     expected_m=capm,)

    y_u = jax.jit(_unfused_mega)(xqm[0], xsfm[0], rwm[0])
    assert y_f.shape == (1,) + y_u.shape, (y_f.shape, y_u.shape)

    from deepgemm_tpu.testing import calc_diff
    d = calc_diff(y_f[0], y_u)
    print(f'fused vs unfused (tiny dims, interpret): calc_diff={d:.2e}')
    assert d < 1e-3, d
    print('OK')


if __name__ == '__main__':
    main()
