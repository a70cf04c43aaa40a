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

# --- r5 additions: dual-B, sparse-attn, serving engine donation ---------
from deepgemm_tpu.kernels.sparse_attn import gathered_attention
rng5 = np.random.RandomState(7)
B5, t5, h5, d5 = 4, 128, 8, 128
q5 = jnp.asarray(rng5.randn(B5, h5, d5), jnp.bfloat16)
k5 = jnp.asarray(rng5.randn(B5, t5, h5, d5), jnp.bfloat16)
v5 = jnp.asarray(rng5.randn(B5, t5, h5, d5), jnp.bfloat16)
valid5 = jnp.asarray(rng5.rand(B5, t5) > 0.2)
valid5 = valid5.at[:, 0].set(True)
sc5 = 1.0 / np.sqrt(d5)
o5 = gathered_attention(q5, k5, v5, valid5, sc5)
# host oracle
qf, kf, vf = (np.asarray(x, np.float32) for x in (q5, k5, v5))
scr = np.einsum('bhd,bthd->bth', qf, kf) * sc5
scr[~np.asarray(valid5)] = -np.inf
p5 = np.exp(scr - scr.max(1, keepdims=True))
p5 /= p5.sum(1, keepdims=True)
ref5 = np.einsum('bth,bthd->bhd', p5, vf)
print('sparse-attn kernel vs host oracle:', calc_diff(o5, ref5), flush=True)
assert calc_diff(o5, ref5) < 2e-3

# dual-B straddle grouped: bitwise vs plain on TPU (small shape)
import os as _os5
sizes5 = [128, 384, 256]
ids5 = jnp.asarray(np.repeat(np.arange(3, dtype=np.int32), sizes5))
a5 = jnp.asarray(rng5.randn(sum(sizes5), 1024), jnp.bfloat16)
aq5, asf5 = dg.per_token_cast_to_fp8(a5, use_ue8m0=False)
b5 = jnp.asarray(rng5.randn(3, 512, 1024) * 0.1, jnp.bfloat16)
b5s = [dg.per_block_cast_to_fp8(b5[g], use_ue8m0=False) for g in range(3)]
bq5 = jnp.stack([x[0] for x in b5s])
sfb5 = _grouped_sfb_t(jnp.stack([x[1] for x in b5s]), 3, 512, 1024,
                      (128, 128), b_kmajor=True)
outs5 = {}
for mode in ('0', '1'):
    _os5.environ['DGT_GROUPED_DUAL_B'] = mode
    outs5[mode] = m_grouped_gemm_contiguous(
        aq5, bq5, ids5, use_psum_layout=False, sfa=asf5, sfb_t=sfb5,
        out_dtype=jnp.bfloat16)
_os5.environ.pop('DGT_GROUPED_DUAL_B', None)
same5 = bool(jnp.all(outs5['0'] == outs5['1']))
print('dual-B bitwise vs plain on TPU:', same5, flush=True)
assert same5

# serving engine end-to-end with donated caches (tiny config, real TPU)
from deepgemm_tpu.serving.engine import ContinuousBatcher
hs6, ds6, his6, dis6 = 2, 128, 2, 128


def embed6(tokens):
    r = np.random.RandomState(50)
    n = int(tokens.shape[0])
    mk = lambda *s: jnp.asarray(r.randn(*s) * 0.1, jnp.bfloat16)
    ik = jnp.clip(jnp.asarray(r.randn(n, dis6), jnp.float32),
                  -448, 448).astype(jnp.float8_e4m3fn)
    return (mk(n, hs6, ds6), mk(n, his6, dis6),
            jnp.asarray(r.rand(n, his6), jnp.float32),
            mk(n, hs6, ds6), mk(n, hs6, ds6), ik,
            jnp.asarray(r.rand(n), jnp.float32))


eng6 = ContinuousBatcher(max_slots=2, max_pages_per_seq=4, num_blocks=8,
                         block_kv=128, num_heads=hs6, head_dim=ds6,
                         index_heads=his6, index_dim=dis6, topk=16,
                         embed_fn=embed6)
s6 = eng6.admit(128)
pr6 = embed6(jnp.zeros(128, jnp.int32))
eng6.prefill(s6, *(x for x in (pr6[3], pr6[4], pr6[5], pr6[6])))
for i in range(3):
    out6 = eng6.step({s6: i})
assert np.isfinite(np.asarray(out6[s6], np.float32)).all()
print('serving engine 3 donated steps: OK', flush=True)

print('VERIFY R5 PASS', flush=True)
