import os, sys
sys.path.insert(0, "/root/repo")
import time
import numpy as np, jax, jax.numpy as jnp
import deepgemm_tpu as dg
from deepgemm_tpu.testing import calc_diff

print('backend:', jax.default_backend(), flush=True)

# 1. happy path (promote f32-scale flow)
a = jnp.asarray(np.random.randn(512, 1024), dtype=jnp.bfloat16)
b = jnp.asarray(np.random.randn(768, 1024), dtype=jnp.bfloat16)
ref = np.asarray(a, np.float32) @ np.asarray(b, np.float32).T
aq = dg.per_token_cast_to_fp8(a, use_ue8m0=False)
bq = dg.per_block_cast_to_fp8(b, use_ue8m0=False)
d = dg.fp8_gemm_nt(aq, bq)
print('happy-path diff:', calc_diff(d, ref), flush=True)
assert calc_diff(d, ref) < 1e-3

# 2. swap-AB pinned ON HARDWARE, bitwise vs plain (the r5 kernel family)
from deepgemm_tpu.kernels.dense import dense_gemm
d_plain = dense_gemm(aq[0], bq[0], sfa=aq[1], sfb_t=jnp.repeat(
    bq[1], 128, axis=0)[:768].T, swap_ab=False)
d_swap = dense_gemm(aq[0], bq[0], sfa=aq[1], sfb_t=jnp.repeat(
    bq[1], 128, axis=0)[:768].T, swap_ab=True)
same = bool(jnp.all(d_plain == d_swap))
print('swap-AB bitwise vs plain on TPU:', same, flush=True)
assert same

# 3. transpose alias + packed-UE8M0 dequant flow
d_tt = dg.fp8_gemm_tt((aq[0].T, aq[1].T), bq, disable_ue8m0_cast=True)
print('tt alias diff:', calc_diff(d_tt, ref), flush=True)
assert calc_diff(d_tt, ref) < 1e-3
aqp = dg.per_token_cast_to_fp8(a, use_ue8m0=True, use_packed_ue8m0=True)
bqp = dg.per_block_cast_to_fp8(b, use_ue8m0=True)
d_pk = dg.fp8_gemm_nt(aqp, bqp, recipe=(1, 128, 128))
print('packed-ue8m0 dequant diff:', calc_diff(d_pk, ref), flush=True)
assert calc_diff(d_pk, ref) < 1e-3

# 4. m=1 decode shape + k=0 early return + warm-call latency
a1 = jnp.asarray(np.random.randn(1, 1024), dtype=jnp.bfloat16)
d1 = dg.fp8_gemm_nt(dg.per_token_cast_to_fp8(a1, use_ue8m0=False), bq)
r1 = np.asarray(a1, np.float32) @ np.asarray(b, np.float32).T
print('m=1 diff:', calc_diff(d1, r1), flush=True)
assert calc_diff(d1, r1) < 1e-3
z = dg.bf16_gemm_nt(jnp.zeros((16, 0), jnp.bfloat16),
                    jnp.zeros((32, 0), jnp.bfloat16))
assert not np.asarray(z).any()
t0 = time.perf_counter()
jax.block_until_ready(dg.fp8_gemm_nt(aq, bq))
print(f'warm-call latency: {(time.perf_counter() - t0) * 1e3:.1f} ms',
      flush=True)

# 5. grouped swap-AB bitwise on hardware (align128-shaped small variant)
from deepgemm_tpu.kernels.grouped import m_grouped_gemm_contiguous
from deepgemm_tpu.ops.m_grouped import _grouped_sfb_t
rng = np.random.RandomState(3)
G, n, k = 4, 512, 1024
mpg = [128, 256, 128, 256]
ids = np.repeat(np.arange(G, dtype=np.int32), mpg)
ag = jnp.asarray(rng.randn(sum(mpg), k), jnp.bfloat16)
aqg, asfg = dg.per_token_cast_to_fp8(ag, use_ue8m0=False)
bg = jnp.asarray(rng.randn(G, n, k) * 0.1, jnp.bfloat16)
bqs = [dg.per_block_cast_to_fp8(bg[g], use_ue8m0=False) for g in range(G)]
bqg = jnp.stack([x[0] for x in bqs])
bsfg = jnp.stack([x[1] for x in bqs])
sfbg = _grouped_sfb_t(bsfg, G, n, k, (128, 128), b_kmajor=True)
outs = [m_grouped_gemm_contiguous(aqg, bqg, ids, use_psum_layout=False,
                                  sfa=asfg, sfb_t=sfbg, swap_ab=s)
        for s in (False, True)]
same_g = bool(jnp.all(outs[0] == outs[1]))
print('grouped swap-AB bitwise on TPU:', same_g, flush=True)
assert same_g
refg = np.vstack([np.asarray(ag[s:e], np.float32)
                  @ np.asarray(bg[g], np.float32).T
                  for g, (s, e) in enumerate(
                      zip(np.cumsum([0] + mpg[:-1]), np.cumsum(mpg)))])
print('grouped swap diff vs host oracle:', calc_diff(outs[1], refg),
      flush=True)
assert calc_diff(outs[1], refg) < 1e-3

print('VERIFY PASS', flush=True)
