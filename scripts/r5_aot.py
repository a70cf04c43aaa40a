"""Round-5 chipless AOT pre-checks (swap-AB family + r5 candidates).

Same harness as scripts/aot_check.py: compiles against a chipless v5e
topology with the LOCAL libtpu, reproducing the device compiler exactly.
NEVER submit a tile candidate to the relay without a PASS here first.

Usage: python scripts/r5_aot.py
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
        jax.jit(f).lower(*args).compile()
        print(f'PASS  {name}', flush=True)
        ok += 1
    except Exception as e:
        msg = str(e).replace('\n', ' ')[:180]
        print(f'FAIL  {name}: {type(e).__name__}: {msg}', flush=True)
        fail += 1


def main():
    from deepgemm_tpu.heuristics.configs import GemmConfig
    from deepgemm_tpu.kernels.dense import dense_gemm

    # --- swap-AB dense: small-m decode-GEMM shape (VERDICT #1/#4) --------
    m, n, k = 128, 4096, 7168

    def dense(swap, cfg=None):
        return lambda a, b, sa, sb: dense_gemm(
            a, b, sfa=sa, sfb_t=sb, scale_strategy='promote',
            swap_ab=swap, cfg=cfg)

    args_small = (S((m, k), f8), S((n, k), f8),
                  S((m, k // 128), jnp.float32), S((k // 128, n), jnp.float32))
    check('dense fp8 128x4096x7168 PLAIN heuristic', dense(False), *args_small)
    check('dense fp8 128x4096x7168 SWAP heuristic', dense(True), *args_small)
    for bm, bn, bk in [(128, 1024, 3584), (128, 2048, 2432), (128, 256, 7168)]:
        cfg = GemmConfig(block_m=bm, block_n=bn, block_k=bk,
                         scale_strategy='promote')
        check(f'dense fp8 128x4096x7168 SWAP ({bm},{bn},{bk})',
              dense(True, cfg), *args_small)
        check(f'dense fp8 128x4096x7168 PLAIN ({bm},{bn},{bk})',
              dense(False, cfg), *args_small)

    # --- swap-AB dense: headline square + deep-k ------------------------
    cfg1n = GemmConfig(block_m=128, block_n=4096, block_k=1024,
                       scale_strategy='promote')
    check('dense fp8 128x4096x7168 PLAIN (128,4096,1024)',
          dense(False, cfg1n), *args_small)
    check('dense fp8 4096^3 SWAP heuristic', dense(True),
          S((4096, 4096), f8), S((4096, 4096), f8),
          S((4096, 32), jnp.float32), S((32, 4096), jnp.float32))
    check('dense fp8 8192x4096x7168 SWAP heuristic', dense(True),
          S((8192, 7168), f8), S((4096, 7168), f8),
          S((8192, 56), jnp.float32), S((56, 4096), jnp.float32))

    # --- swap-AB grouped: align128 uneven (the 0.929 gap) + masked -------
    os.environ['DGT_GROUPED_SWAP_AB'] = '1'
    os.environ['DGT_MASKED_SWAP_AB'] = '1'
    import deepgemm_tpu as dg
    G, n, k = 8, 4096, 7168
    mpg_list = [896, 1152] * 4
    m128 = sum(mpg_list)
    ids128 = jnp.asarray(np.repeat(np.arange(G, dtype=np.int32), mpg_list))
    check('grouped align128 uneven SWAP static',
          lambda a, sa, bv, sb: dg.m_grouped_fp8_gemm_nt_contiguous(
              (a, sa), (bv, sb), grouped_layout=ids128,
              use_psum_layout=False),
          S((m128, k), f8), S((m128, k // 128), jnp.float32),
          S((G, n, k), f8), S((G, n // 128, k // 128), jnp.float32))
    ids = jnp.asarray(np.repeat(np.arange(G, dtype=np.int32), 1024))
    check('grouped contiguous SWAP static (bench aligned shape)',
          lambda a, sa, bv, sb: dg.m_grouped_fp8_gemm_nt_contiguous(
              (a, sa), (bv, sb), grouped_layout=ids, use_psum_layout=False),
          S((G * 1024, k), f8), S((G * 1024, k // 128), jnp.float32),
          S((G, n, k), f8), S((G, n // 128, k // 128), jnp.float32))
    # masked swap needs bm % 128 == 0 (bm rides the lane dim in the swapped
    # SF layout) — drive the kernel layer with the pinned bm=128 config the
    # on-chip A/B uses
    from deepgemm_tpu.kernels.grouped import m_grouped_gemm_masked
    cfg128 = GemmConfig(block_m=128, block_n=512, block_k=7168,
                        scale_strategy='promote')
    # sfb_t [G, ksf, n] rides in directly as an arg
    masked_args = (S((G, 256, k), f8), S((G, 256, k // 128), jnp.float32),
                   S((G, n, k), f8), S((G, k // 128, n), jnp.float32),
                   S((G,), jnp.int32))
    for pf in ('0', '1'):
        os.environ['DGT_MASKED_PF_SKIP'] = pf
        check(f'grouped masked SWAP bm128 pf_skip={pf} (bench shape)',
              lambda a, sa, bv, sb, mm: m_grouped_gemm_masked(
                  a, bv, mm, sfa=sa, sfb_t=sb, expected_m=64,
                  swap_ab=True, cfg=cfg128),
              *masked_args)
    del os.environ['DGT_GROUPED_SWAP_AB'], os.environ['DGT_MASKED_SWAP_AB']
    del os.environ['DGT_MASKED_PF_SKIP']

    # --- DUAL-B straddle contiguous at the bench align128 shape ----------
    mpg_list128 = [896, 1152] * 4
    m128b = sum(mpg_list128)
    ids128b = jnp.asarray(np.repeat(np.arange(8, dtype=np.int32),
                                    mpg_list128))
    os.environ['DGT_GROUPED_DUAL_B'] = '1'
    check('grouped align128 DUAL-B bm256 (bench shape)',
          lambda a, sa, bv, sb: dg.m_grouped_fp8_gemm_nt_contiguous(
              (a, sa), (bv, sb), grouped_layout=ids128b,
              use_psum_layout=False),
          S((m128b, k), f8), S((m128b, k // 128), jnp.float32),
          S((G, n, k), f8), S((G, n // 128, k // 128), jnp.float32))
    os.environ.pop('DGT_GROUPED_DUAL_B')

    # --- zero-copy paged decode with the r5 3-level adjacency code -------
    Bp, bkv, bps, h, d = 64, 64, 64, 32, 128
    mml = bkv * bps
    nb = Bp * bps
    check('paged decode ZEROCOPY (quad-level coalescing)',
          lambda q, kv, sf, w, ctx, bt: dg.fp8_fp4_paged_mqa_logits(
              (q, None), (kv, sf), w, ctx, bt, max_context_len=mml,
              strategy='paged'),
          S((Bp, 1, h, d), f8), S((nb, bkv, d), f8),
          S((nb, bkv), jnp.float32), S((Bp, h), jnp.float32),
          S((Bp,), jnp.int32), S((Bp, bps), jnp.int32))

    # --- fused post-gather sparse attention (serving decode, r5) ---------
    from deepgemm_tpu.kernels.sparse_attn import gathered_attention
    Bs, tks, hs, ds = 64, 512, 8, 128
    check('sparse gathered attention (serving dims)',
          lambda q, ks, vs, valid: gathered_attention(
              q, ks, vs, valid, 0.088388),
          S((Bs, hs, ds), jnp.bfloat16),
          S((Bs, tks, hs, ds), jnp.bfloat16),
          S((Bs, tks, hs, ds), jnp.bfloat16),
          S((Bs, tks), jnp.bool_))

    print(f'\n{ok} ok, {fail} fail')
    sys.exit(1 if fail else 0)


if __name__ == '__main__':
    main()
