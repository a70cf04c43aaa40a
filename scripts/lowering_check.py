"""TPU Mosaic-lowering pre-check (chip-free): cross-lowers the headline
kernel specs for platform tpu via jax.export on the CPU host
(DGT_FORCE_MOSAIC=1). Catches lane-rule / block-shape / SMEM-operand
lowering errors at the driver-bench shapes without touching the device;
the VMEM-limit class still needs the device compiler (heuristics budget
12.5 MiB vs the ~16 MiB real ceiling covers that gap).

Usage: PYTHONPATH=/root/repo python scripts/lowering_check.py"""
import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ['DGT_FORCE_MOSAIC'] = '1'
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
import deepgemm_tpu as dg
from jax import export, ShapeDtypeStruct as S

f8 = jnp.float8_e4m3fn
ok = fail = 0

def check_tpu(name, f, *args):
    global ok, fail
    try:
        export.export(jax.jit(f), platforms=['tpu'])(*args)
        print(f'PASS  {name}', flush=True)
        ok += 1
    except Exception as e:
        print(f'FAIL  {name}: {type(e).__name__}: {str(e)[:200]}', flush=True)
        fail += 1

# ---- dense gk==1 (bench deep-k shape 8192x4096x7168) -------------------
m, n, k = 8192, 4096, 7168
check_tpu('dense fp8 deep-k (gk==1 direct write)',
          lambda a, sa, b, sb: dg.fp8_gemm_nt((a, sa), (b, sb)),
          S((m, k), f8), S((m, k // 128), jnp.float32),
          S((n, k), f8), S((n // 128, k // 128), jnp.float32))

# dense 4096^3 (the headline shape)
check_tpu('dense fp8 4096^3',
          lambda a, sa, b, sb: dg.fp8_gemm_nt((a, sa), (b, sb)),
          S((4096, 4096), f8), S((4096, 32), jnp.float32),
          S((4096, 4096), f8), S((32, 32), jnp.float32))

# ---- grouped contiguous static path (bench: G8, mpg 1024, 4096x7168) ---
G, mpg = 8, 1024
m = G * mpg
ids = jnp.asarray(np.repeat(np.arange(G, dtype=np.int32), mpg))
n, k = 4096, 7168
check_tpu('grouped contiguous STATIC (bench shape)',
          lambda a, sa, bv, sb: dg.m_grouped_fp8_gemm_nt_contiguous(
              (a, sa), (bv, sb), grouped_layout=ids, use_psum_layout=False),
          S((m, k), f8), S((m, k // 128), jnp.float32),
          S((G, n, k), f8), S((G, n // 128, k // 128), jnp.float32))

# align-128 uneven groups (dynamic prefetch path must still lower)
mpg_list = [896, 1152] * 4
m128 = sum(mpg_list)
ids128 = jnp.asarray(np.repeat(np.arange(8, dtype=np.int32), mpg_list))
check_tpu('grouped contiguous DYNAMIC (align-128 uneven)',
          lambda a, sa, bv, sb: dg.m_grouped_fp8_gemm_nt_contiguous(
              (a, sa), (bv, sb), grouped_layout=ids128,
              use_psum_layout=False),
          S((m128, k), f8), S((m128, k // 128), jnp.float32),
          S((G, n, k), f8), S((G, n // 128, k // 128), jnp.float32))

# ---- masked (bench: G8, max_m 256, 4096x7168) --------------------------
check_tpu('masked grouped (SMEM mref, gk==1, bench shape)',
          lambda a, sa, bv, sb, mm: dg.m_grouped_fp8_gemm_nt_masked(
              (a, sa), (bv, sb), masked_m=mm, expected_m=256),
          S((G, 256, k), f8), S((G, 256, k // 128), jnp.float32),
          S((G, n, k), f8), S((G, n // 128, k // 128), jnp.float32),
          S((G,), jnp.int32))

# ---- k-grouped wgrad static (bench: G4, 4096x7168, kpg 2048) -----------
from deepgemm_tpu.kernels.k_grouped import k_grouped_gemm
Gk, mk_, nk_, kpg = 4, 4096, 7168, 2048
tk = Gk * kpg
ks_list = [kpg] * Gk
check_tpu('k-grouped wgrad STATIC (bench shape, c=None)',
          lambda a, b, sa, sb: k_grouped_gemm(
              a, b, None, jnp.asarray(ks_list, jnp.int32),
              use_psum_layout=False, sfa_t=sa, sfb_t=sb,
              ks_cpu=ks_list, k_major=True),
          S((tk, mk_), f8), S((tk, nk_), f8),
          S((tk // 128, mk_), jnp.float32), S((tk // 128, nk_), jnp.float32))

os.environ['DGT_KG_FORCE_PREFETCH'] = '1'
check_tpu('k-grouped wgrad PREFETCH (A/B leg)',
          lambda a, b, sa, sb: k_grouped_gemm(
              a, b, None, jnp.asarray(ks_list, jnp.int32),
              use_psum_layout=False, sfa_t=sa, sfb_t=sb,
              ks_cpu=ks_list, k_major=True),
          S((tk, mk_), f8), S((tk, nk_), f8),
          S((tk // 128, mk_), jnp.float32), S((tk // 128, nk_), jnp.float32))
os.environ.pop('DGT_KG_FORCE_PREFETCH')

# ---- paged decode, both strategies (bench: B64, ctx 4096) --------------
B, bkv, bps, h, d = 64, 256, 16, 64, 128
mml = bkv * bps
nb = B * bps
check_tpu('paged decode GATHER (ctx SMEM operand)',
          lambda q, kv, sf, w, ctx, bt: dg.fp8_fp4_paged_mqa_logits(
              (q, None), (kv, sf), w, ctx, bt, max_context_len=mml),
          S((B, 1, h, d), f8), S((nb, bkv, d), f8),
          S((nb, bkv), jnp.float32), S((B, h), jnp.float32),
          S((B,), jnp.int32), S((B, bps), jnp.int32))
check_tpu('paged decode ZEROCOPY (SMEM bt/ctx)',
          lambda q, kv, sf, w, ctx, bt: dg.fp8_fp4_paged_mqa_logits(
              (q, None), (kv, sf), w, ctx, bt, max_context_len=mml,
              strategy='zerocopy'),
          S((B, 1, h, d), f8), S((nb, bkv, d), f8),
          S((nb, bkv), jnp.float32), S((B, h), jnp.float32),
          S((B,), jnp.int32), S((B, bps), jnp.int32))

# ---- fused mega D=1 local kernel at serving dims -----------------------
from deepgemm_tpu.kernels.fused_moe import _mega_local_call
H, I, cap, E = 7168, 2048, 128, 8
bn1, bh2, gran = 256, 512, 128
nt1, nt2 = I // bn1, H // bh2
ksf1, ksf2 = H // gran, I // gran
ksf_pad = ((ksf1 + 127) // 128) * 128
check_tpu('fused mega D=1 local (serving dims, fp8)',
          lambda x, xsf, rw3, w1p, w1sf_t, w2, w2sf_t: _mega_local_call(
              x, xsf, rw3, w1p, w1sf_t, w2, w2sf_t, cap=cap, hidden=H,
              inter=I, e_local=E, nt1=nt1, nt2=nt2, bn1=bn1, bh2=bh2,
              gran_k=gran, clamp=256.0, scaled=True, interpret=False),
          S((E, cap, H), f8), S((E, cap, ksf_pad), jnp.float32),
          S((E, cap, 1), jnp.float32), S((E, nt1, 2 * bn1, H), f8),
          S((E, nt1, ksf1, 2 * bn1), jnp.float32),
          S((E, H, I), f8), S((E, ksf2, H), jnp.float32))

# ---- HC prenorm gk==1 --------------------------------------------------
check_tpu('hc_prenorm gk==1 direct write',
          lambda a, b: dg.tf32_hc_prenorm_gemm(a, b),
          S((128, 384), jnp.bfloat16), S((192, 384), jnp.float32))
check_tpu('hc_prenorm gk>1 scratch branch',
          lambda a, b: dg.tf32_hc_prenorm_gemm(a, b),
          S((128, 2048), jnp.bfloat16), S((192, 2048), jnp.float32))

print(f'\n{ok} pass / {fail} fail')
import sys
sys.exit(1 if fail else 0)
