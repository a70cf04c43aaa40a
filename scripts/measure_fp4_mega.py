#!/usr/bin/env python
"""On-chip A/B: fused mega D=1 at serving dims with PLANAR-PACKED FP4
weights vs pre-decoded FP8 weights (VERDICT r4 #2).

The kernel is weight-stream bound at serving dims (mega phase profile);
packed FP4 halves exactly that stream (w1+w2: 44 MB -> 22 MB per call) at
the cost of the in-VPU nibble decode. This measures which side of the
roofline v5e actually lands on — the r4 default (pre-decode) rests on a
MODELED verdict only. Reference: the flagship mega is FP8xFP4
(sm100_fp8_fp4_mega_moe.cuh:51-64, MmaKind::MXFP8FP4).

Also asserts the two runs are bitwise-equal ON DEVICE (e2m1 ⊂ e4m3).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

import bench  # relay guard + trace-timing harness


def main():
    import deepgemm_tpu as dg
    from deepgemm_tpu.kernels.fused_moe import (fused_mega_moe,
                                                pack_mega_weights)
    from deepgemm_tpu.utils.math import (_quantize_to_fp4_e2m1,
                                         _dequantize_from_fp4_e2m1,
                                         pack_fp4_planar)
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map
    dg.init_persistent_cache()
    rng = np.random.RandomState(0)

    E, cap, H, I = 8, 128, 7168, 2048
    xm = jnp.asarray(rng.randn(E * cap, H) * 0.5, jnp.bfloat16)
    xq, xsf = dg.per_token_cast_to_fp8(xm, use_ue8m0=False)
    xq = xq.reshape(1, E, cap, H)
    xsf = xsf.reshape(1, E, cap, -1)
    rw = jnp.asarray(rng.rand(1, E, cap).astype(np.float32))

    @jax.jit
    def quant_fp4(w):
        # per-(128,128)-block e2m1 quantization + planar packing, on device;
        # also the EXACT fp8 pre-decode (baseline weights, same SFs)
        e, n, k = w.shape
        wf = w.astype(jnp.float32).reshape(e, n // 128, 128, k // 128, 128)
        amax = jnp.clip(jnp.abs(wf).max(axis=(2, 4)), 1e-4, None)
        sf = amax / 6.0
        scaled = (wf / sf[:, :, None, :, None]).reshape(e, n, k)
        codes = _quantize_to_fp4_e2m1(scaled)
        packed = pack_fp4_planar(codes.astype(jnp.int32))
        w_fp8 = _dequantize_from_fp4_e2m1(codes).astype(jnp.float8_e4m3fn)
        return packed, sf, w_fp8

    w1 = jnp.asarray(rng.randn(E, 2 * I, H) * 0.05, jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(E, H, I) * 0.05, jnp.bfloat16)
    w1p4, w1sf, w1f8 = jax.block_until_ready(quant_fp4(w1))
    w2p4, w2sf, w2f8 = jax.block_until_ready(quant_fp4(w2))
    del w1, w2

    pk4 = jax.block_until_ready(pack_mega_weights(
        w1p4, w2p4, w1sf, w2sf, cap=cap, x_dtype=xq.dtype, num_devices=1,
        w_packed_fp4=True))
    pk8 = jax.block_until_ready(pack_mega_weights(
        w1f8, w2f8, w1sf, w2sf, cap=cap, x_dtype=xq.dtype, num_devices=1))
    print(f'tiles: fp4 bn1={pk4.bn1} bh2={pk4.bh2} | '
          f'fp8 bn1={pk8.bn1} bh2={pk8.bh2}', flush=True)

    mesh1 = Mesh(np.asarray(jax.devices()[:1]), ('ep',))
    mega_fn = jax.jit(shard_map(
        lambda xs, ss, rws, pw: fused_mega_moe(
            xs, rws, None, None, 'ep', send_sf=ss, packed=pw),
        mesh=mesh1, check_vma=False, in_specs=(P(),) * 4, out_specs=P()))

    # bitwise check on device (pull one scalar only)
    y4 = mega_fn(xq, xsf, rw, pk4)
    y8 = mega_fn(xq, xsf, rw, pk8)
    same = bool(jnp.all(y4 == y8))
    print(f'bitwise fp4-vs-fp8: {same}', flush=True)
    assert same

    flops = E * (2 * cap * 2 * I * H + 2 * cap * H * I)

    def run(tag, pk):
        @jax.jit
        def loop(xs, ss, rws, pw):
            def body(i, acc):
                o = mega_fn(xs, jnp.roll(ss, i, 2), rws, pw)
                return acc + o[0, 0, 0, 0].astype(jnp.float32)
            return jax.lax.fori_loop(0, bench.N_ITERS, body, 0.0)
        t = bench._device_time_of(loop, (xq, xsf, rw, pk), f'fp4mega_{tag}')
        print(f'fused mega D=1 {tag:14s} {flops / t / 1e12:7.1f} TFLOPS '
              f'({t * 1e6:8.1f} us/iter)', flush=True)
        return t

    t8 = run('FP8 weights', pk8)
    t4 = run('FP4 weights', pk4)
    print(f'  -> fp4/fp8 speedup = {t8 / t4:.3f} '
          f'(weight stream halved: 44 -> 22 MB/call)', flush=True)


if __name__ == '__main__':
    main()
