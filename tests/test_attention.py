"""MQA lightning-indexer logits tests (TPU analog of
/root/reference/tests/test_attention.py:64-246): exact-fp32 reference,
quantized "simulated" reference, -inf mask equality, bitwise self-consistency,
CP-window ranges, compressed layout."""

import numpy as np
import jax.numpy as jnp
import pytest

import deepgemm_tpu as dg
from deepgemm_tpu.testing import calc_diff, assert_bitwise_equal

from generators import f32


def ref_mqa_logits(q, kv, weights, ks, ke):
    """FP32 numpy oracle (mirrors /root/reference/tests/test_attention.py:86-115)."""
    sq, h, d = q.shape
    skv = kv.shape[0]
    score = np.einsum('mhd,nd->hmn', f32(q), f32(kv))
    logits = np.einsum('hmn,mh->mn', np.maximum(score, 0), f32(weights))
    cols = np.arange(skv)
    mask = (cols[None, :] >= ks[:, None]) & (cols[None, :] < ke[:, None])
    return np.where(mask, logits, -np.inf)


def make_ranges(sq, skv, disable_cp):
    """CP-window [ks, ke) generator (tests/test_attention.py:119-134)."""
    if disable_cp:
        ks = np.zeros(sq, np.int32)
        ke = np.arange(sq, dtype=np.int32) + (skv - sq)
        return ks, ke
    chunk = sq // 2
    cp = skv // sq
    cp_id = cp // 3
    ks = np.zeros(sq, np.int32)
    ke = np.zeros(sq, np.int32)
    for i in range(chunk):
        ke[i] = cp_id * chunk + i
        ke[i + chunk] = (cp * 2 - 1 - cp_id) * chunk + i
    return ks, ke


def quantize_inputs(q, kv):
    q_fp8 = jnp.clip(q.astype(jnp.float32), -448, 448).astype(jnp.float8_e4m3fn)
    kv_fp8, kv_sf = dg.per_custom_dims_cast_to_fp8(kv, (0,), use_ue8m0=False)
    return q_fp8, kv_fp8, kv_sf


@pytest.mark.parametrize('sq,skv,h,d', [(128, 512, 8, 64), (64, 256, 4, 128)])
@pytest.mark.parametrize('disable_cp', [True, False])
def test_fp8_mqa_logits(sq, skv, h, d, disable_cp):
    rng = np.random.RandomState(0)
    q = jnp.asarray(rng.randn(sq, h, d), dtype=jnp.bfloat16)
    kv = jnp.asarray(rng.randn(skv, d), dtype=jnp.bfloat16)
    w = jnp.asarray(rng.randn(sq, h).astype(np.float32))
    ks, ke = make_ranges(sq, skv, disable_cp)

    q_fp8, kv_fp8, kv_sf = quantize_inputs(q, kv)
    logits = dg.fp8_mqa_logits((q_fp8, None), (kv_fp8, kv_sf), w,
                               jnp.asarray(ks), jnp.asarray(ke))
    assert logits.shape == (sq, skv)
    ref = ref_mqa_logits(q, kv, w, ks, ke)

    # -inf masks match exactly
    l_np = np.asarray(logits)
    np.testing.assert_array_equal(np.isneginf(l_np), np.isneginf(ref))

    # quantized-input oracle: same math as the kernel on dequantized values
    kv_deq = (f32(kv_fp8) * np.asarray(kv_sf)[:, None]).astype(np.float32)
    sim = ref_mqa_logits(np.asarray(q_fp8).astype(np.float32), kv_deq, w, ks, ke)
    mask = ~np.isneginf(ref)
    assert calc_diff(np.where(mask, l_np, 0), np.where(mask, sim, 0)) < 1e-5
    assert calc_diff(np.where(mask, l_np, 0), np.where(mask, ref, 0)) < 1e-3


def test_mqa_logits_self_consistency():
    """Bitwise determinism across runs
    (/root/reference/tests/test_attention.py:205-209)."""
    rng = np.random.RandomState(1)
    sq, skv, h, d = 64, 256, 8, 64
    q = jnp.asarray(rng.randn(sq, h, d), dtype=jnp.bfloat16)
    kv = jnp.asarray(rng.randn(skv, d), dtype=jnp.bfloat16)
    w = jnp.asarray(rng.randn(sq, h).astype(np.float32))
    ks, ke = make_ranges(sq, skv, True)
    q_fp8, kv_fp8, kv_sf = quantize_inputs(q, kv)
    args = ((q_fp8, None), (kv_fp8, kv_sf), w, jnp.asarray(ks), jnp.asarray(ke))
    first = dg.fp8_mqa_logits(*args)
    for _ in range(5):
        assert_bitwise_equal(dg.fp8_mqa_logits(*args), first,
                             'mqa logits self-consistency')


def test_mqa_logits_compressed():
    """Compressed max_seqlen_k layout (row i holds [ks_i, ke_i) at cols 0..)."""
    rng = np.random.RandomState(2)
    sq, skv, h, d = 64, 512, 4, 64
    q = jnp.asarray(rng.randn(sq, h, d), dtype=jnp.bfloat16)
    kv = jnp.asarray(rng.randn(skv, d), dtype=jnp.bfloat16)
    w = jnp.asarray(rng.randn(sq, h).astype(np.float32))
    ks, ke = make_ranges(sq, skv, True)   # ks == 0
    maxk = int((ke - ks).max())

    q_fp8, kv_fp8, kv_sf = quantize_inputs(q, kv)
    logits = dg.fp8_fp4_mqa_logits((q_fp8, None), (kv_fp8, kv_sf), w,
                                   jnp.asarray(ks), jnp.asarray(ke),
                                   max_seqlen_k=maxk)
    assert logits.shape == (sq, maxk)
    full = dg.fp8_fp4_mqa_logits((q_fp8, None), (kv_fp8, kv_sf), w,
                                 jnp.asarray(ks), jnp.asarray(ke))
    l_np, f_np = np.asarray(logits), np.asarray(full)
    for i in range(sq):
        lo, hi = int(ks[i]), int(ke[i])
        np.testing.assert_array_equal(l_np[i, :hi - lo], f_np[i, lo:hi])


def test_mqa_logits_bf16_weights_and_logits():
    rng = np.random.RandomState(3)
    sq, skv, h, d = 64, 256, 8, 64
    q = jnp.asarray(rng.randn(sq, h, d), dtype=jnp.bfloat16)
    kv = jnp.asarray(rng.randn(skv, d), dtype=jnp.bfloat16)
    w = jnp.asarray(rng.randn(sq, h), dtype=jnp.bfloat16)
    ks, ke = make_ranges(sq, skv, True)
    q_fp8, kv_fp8, kv_sf = quantize_inputs(q, kv)
    logits = dg.fp8_fp4_mqa_logits((q_fp8, None), (kv_fp8, kv_sf), w,
                                   jnp.asarray(ks), jnp.asarray(ke),
                                   logits_dtype=jnp.bfloat16)
    assert logits.dtype == jnp.bfloat16
    ref = ref_mqa_logits(q, kv, w, ks, ke)
    mask = ~np.isneginf(ref)
    assert calc_diff(np.where(mask, np.asarray(logits, np.float32), 0),
                     np.where(mask, ref, 0)) < 5e-3


def test_clean_logits():
    rng = np.random.RandomState(4)
    logits = jnp.asarray(rng.randn(32, 128).astype(np.float32))
    ks = jnp.asarray(rng.randint(0, 32, size=32), dtype=jnp.int32)
    ke = ks + jnp.asarray(rng.randint(1, 96, size=32), dtype=jnp.int32)
    out = np.asarray(dg.clean_logits_(logits, ks, ke))
    cols = np.arange(128)
    mask = (cols[None, :] >= np.asarray(ks)[:, None]) & (cols[None, :] < np.asarray(ke)[:, None])
    np.testing.assert_array_equal(np.isneginf(out), ~mask)
    np.testing.assert_array_equal(out[mask], np.asarray(logits)[mask])


def make_fused_kv_cache(rng, num_blocks, block_kv, d):
    """Build the reference fused byte cache layout
    (tests/test_attention.py:293-305) in numpy."""
    kv = rng.randn(num_blocks, block_kv, d).astype(np.float32)
    amax = np.clip(np.abs(kv).max(axis=2, keepdims=True), 1e-4, None)
    sf = (amax / 448.0).astype(np.float32)
    vals = np.asarray(jnp.asarray(kv / sf).astype(jnp.float8_e4m3fn))
    fused = np.empty((num_blocks, block_kv * (d + 4)), np.uint8)
    fused[:, :block_kv * d] = vals.reshape(num_blocks, -1).view(np.uint8)
    fused[:, block_kv * d:] = sf.reshape(num_blocks, -1).view(np.uint8)
    kv_deq = vals.astype(np.float32) * sf
    return fused.reshape(num_blocks, block_kv, 1, d + 4), vals, sf[:, :, 0], kv_deq


@pytest.mark.parametrize('next_n', [1, 2])
def test_paged_mqa_logits(next_n):
    rng = np.random.RandomState(5)
    B, h, d = 4, 8, 64
    block_kv, blocks_per_seq = 64, 6
    max_model_len = block_kv * blocks_per_seq
    num_blocks = B * blocks_per_seq + 3

    fused, vals, sf, kv_deq = make_fused_kv_cache(rng, num_blocks, block_kv, d)
    perm = rng.permutation(num_blocks)[:B * blocks_per_seq]
    block_table = perm.reshape(B, blocks_per_seq).astype(np.int32)
    context_lens = rng.randint(next_n + 1, max_model_len, size=B).astype(np.int32)

    q = jnp.asarray(rng.randn(B, next_n, h, d), dtype=jnp.bfloat16)
    q_fp8 = jnp.clip(q.astype(jnp.float32), -448, 448).astype(jnp.float8_e4m3fn)
    w = jnp.asarray(rng.randn(B * next_n, h).astype(np.float32))

    meta = dg.get_paged_mqa_logits_metadata(jnp.asarray(context_lens), block_kv, 0)
    logits = dg.fp8_paged_mqa_logits(
        (q_fp8, None), jnp.asarray(fused), w, jnp.asarray(context_lens),
        jnp.asarray(block_table), meta, max_model_len)
    assert logits.shape == (B * next_n, max_model_len)

    # numpy oracle (mirrors ref_paged_mqa_logits, tests/test_attention.py:248-276)
    l_np = np.asarray(logits)
    q_np = np.asarray(q_fp8).astype(np.float32)
    w_np = np.asarray(w)
    for i in range(B):
        ctx = int(context_lens[i])
        kv_seq = kv_deq[block_table[i]].reshape(-1, d)     # [max_model_len, d]
        for t in range(next_n):
            row = i * next_n + t
            scores = np.maximum(q_np[i, t] @ kv_seq.T, 0)   # [h, L]
            vals_row = (w_np[row][:, None] * scores).sum(0)
            q_off = ctx - next_n + 1 + t
            cols = np.arange(max_model_len)
            mask = (cols < ctx) & (cols < q_off)
            expected = np.where(mask, vals_row, -np.inf)
            got = l_np[row]
            np.testing.assert_array_equal(np.isneginf(got), ~mask)
            diff = calc_diff(np.where(mask, got, 0), np.where(mask, expected, 0))
            assert diff < 1e-5, f'{i=}, {t=}, {diff=}'


def test_paged_mqa_logits_2d_context():
    rng = np.random.RandomState(6)
    B, next_n, h, d = 2, 2, 4, 32
    block_kv, blocks_per_seq = 64, 2
    max_model_len = block_kv * blocks_per_seq
    num_blocks = B * blocks_per_seq
    fused, vals, sf, kv_deq = make_fused_kv_cache(rng, num_blocks, block_kv, d)
    block_table = np.arange(num_blocks, dtype=np.int32).reshape(B, blocks_per_seq)
    ctx2d = rng.randint(2, max_model_len, size=(B, next_n)).astype(np.int32)

    q = jnp.asarray(rng.randn(B, next_n, h, d), dtype=jnp.bfloat16)
    q_fp8 = jnp.clip(q.astype(jnp.float32), -448, 448).astype(jnp.float8_e4m3fn)
    w = jnp.asarray(rng.randn(B * next_n, h).astype(np.float32))
    logits = dg.fp8_fp4_paged_mqa_logits(
        (q_fp8, None), jnp.asarray(fused), w, jnp.asarray(ctx2d),
        jnp.asarray(block_table), None, max_model_len)
    l_np = np.asarray(logits)
    q_np = np.asarray(q_fp8).astype(np.float32)
    for i in range(B):
        kv_seq = kv_deq[block_table[i]].reshape(-1, d)
        for t in range(next_n):
            row = i * next_n + t
            ctx = int(ctx2d[i, t])
            scores = np.maximum(q_np[i, t] @ kv_seq.T, 0)
            vals_row = (np.asarray(w)[row][:, None] * scores).sum(0)
            mask = np.arange(max_model_len) < ctx
            diff = calc_diff(np.where(mask, l_np[row], 0), np.where(mask, vals_row, 0))
            assert diff < 1e-5, f'{i=}, {t=}, {diff=}'
            assert np.all(np.isneginf(l_np[row][~mask]))


@pytest.mark.parametrize('d', (128, 64))
def test_paged_strategies_bitwise(d):
    """gather-then-stream and zero-copy paged strategies are bit-identical.

    d=128 drives the real zero-copy kernel; d=64 documents the narrow-head
    contract — the zero-copy page DMA needs 128-lane-aligned pages (Mosaic
    rejects a 64-lane HBM slice on hardware even though the interpreter
    accepts it), so the op transparently falls back to gather."""
    rng = np.random.RandomState(9)
    B, nn, h = 3, 1, 4
    block_kv, max_ctx = 64, 256
    nblocks = B * (max_ctx // block_kv)
    q = jnp.clip(jnp.asarray(rng.randn(B, nn, h, d), jnp.float32),
                 -448, 448).astype(jnp.float8_e4m3fn)
    w = jnp.asarray(rng.randn(B * nn, h).astype(np.float32))
    ctx = jnp.asarray(rng.randint(32, max_ctx, B), jnp.int32)
    bt = jnp.asarray(rng.permutation(nblocks).reshape(B, -1), jnp.int32)
    kvv = jnp.asarray(rng.randn(nblocks, block_kv, d), jnp.float8_e4m3fn)
    kvs = jnp.asarray(rng.rand(nblocks, block_kv).astype(np.float32))
    a = dg.fp8_fp4_paged_mqa_logits((q, None), (kvv, kvs), w, ctx, bt,
                                    max_context_len=max_ctx, strategy="paged")
    b = dg.fp8_fp4_paged_mqa_logits((q, None), (kvv, kvs), w, ctx, bt,
                                    max_context_len=max_ctx, strategy="gather")
    assert_bitwise_equal(b, a)


@pytest.mark.parametrize('layout', ('paired', 'offset', 'scattered'))
def test_paged_zerocopy_coalesce_bitwise(monkeypatch, layout):
    """The zero-copy kernel's adjacent-page-pair DMA coalescing is bitwise
    vs both the non-coalesced kernel and the gather strategy, for:
      paired    — fully pair-aligned table (every even j: bt[j+1]=bt[j]+1,
                  the serving PageAllocator layout; all pairs coalesce)
      offset    — ascending run shifted by one: coalesced pairs start on
                  ODD page values ((1,2), (3,4), ...) and the row wraps to
                  page 0 at the end (a non-adjacent tail pair)
      scattered — random permutation (mixed, whatever adjacency falls out)
    """
    rng = np.random.RandomState(17)
    B, nn, h, d = 3, 1, 4, 128
    block_kv, max_ctx = 64, 512
    bps = max_ctx // block_kv
    nblocks = B * bps
    if layout == 'paired':
        pairs = rng.permutation(nblocks // 2)
        bt_np = np.stack([pairs * 2, pairs * 2 + 1], 1).reshape(B, bps)
    elif layout == 'offset':
        bt_np = (np.arange(nblocks).reshape(B, bps) + 1) % nblocks
    else:
        bt_np = rng.permutation(nblocks).reshape(B, bps)
    bt = jnp.asarray(bt_np, jnp.int32)
    q = jnp.clip(jnp.asarray(rng.randn(B, nn, h, d), jnp.float32),
                 -448, 448).astype(jnp.float8_e4m3fn)
    w = jnp.asarray(rng.randn(B * nn, h).astype(np.float32))
    ctx = jnp.asarray(rng.randint(32, max_ctx, B), jnp.int32)
    kvv = jnp.asarray(rng.randn(nblocks, block_kv, d), jnp.float8_e4m3fn)
    kvs = jnp.asarray(rng.rand(nblocks, block_kv).astype(np.float32))

    def run(strategy):
        return dg.fp8_fp4_paged_mqa_logits(
            (q, None), (kvv, kvs), w, ctx, bt,
            max_context_len=max_ctx, strategy=strategy)

    monkeypatch.setenv('DGT_ZC_COALESCE', '1')
    zc_co = run('paged')
    monkeypatch.setenv('DGT_ZC_COALESCE', '0')
    zc_plain = run('paged')
    assert_bitwise_equal(zc_plain, zc_co)
    assert_bitwise_equal(run('gather'), zc_co)


def test_fp4_mqa_logits():
    """FP4 q/kv prefill (per-32 packed-UE8M0 SF) — the SM100 FP4 family
    (/root/reference/tests/test_attention.py:170-180): exact decode into
    bf16, checked against the simulated (cast-back) oracle."""
    rng = np.random.RandomState(11)
    sq, skv, h, d = 64, 256, 4, 128
    q = jnp.asarray(rng.randn(sq, h, d), dtype=jnp.bfloat16)
    kv = jnp.asarray(rng.randn(skv, d), dtype=jnp.bfloat16)
    w = jnp.asarray(rng.randn(sq, h).astype(np.float32))
    ks, ke = make_ranges(sq, skv, True)

    q_fp4, q_sf = dg.per_token_cast_to_fp4(q.reshape(-1, d), use_ue8m0=True,
                                           gran_k=32, use_packed_ue8m0=True)
    kv_fp4, kv_sf4 = dg.per_token_cast_to_fp4(kv, use_ue8m0=True,
                                              gran_k=32, use_packed_ue8m0=True)
    q_sim = dg.cast_back_from_fp4(q_fp4, q_sf, gran_k=32,
                                  use_packed_ue8m0=True).reshape(sq, h, d)
    kv_sim = dg.cast_back_from_fp4(kv_fp4, kv_sf4, gran_k=32,
                                   use_packed_ue8m0=True)

    logits = dg.fp8_fp4_mqa_logits(
        (q_fp4.reshape(sq, h, d // 2), q_sf.reshape(sq, h)),
        (kv_fp4, kv_sf4), w, jnp.asarray(ks), jnp.asarray(ke))
    ref = ref_mqa_logits(jnp.asarray(q_sim, jnp.bfloat16),
                         jnp.asarray(kv_sim, jnp.bfloat16), w, ks, ke)
    mask = ~np.isneginf(ref)
    np.testing.assert_array_equal(np.isneginf(np.asarray(logits)), ~mask)
    assert calc_diff(np.where(mask, np.asarray(logits), 0),
                     np.where(mask, ref, 0)) < 1e-5


def test_mqa_logits_compressed_ragged_ks():
    """Compressed layout with ARBITRARY per-row ks (the reference allows any,
    csrc/apis/attention.hpp:160-178): the ragged layout routes through the
    full-pass + per-row-gather fallback and must equal the full layout's
    [ks_i, ke_i) slice exactly, with zeros past ke-ks."""
    rng = np.random.RandomState(12)
    sq, skv, h, d = 64, 512, 4, 64
    q = jnp.asarray(rng.randn(sq, h, d), dtype=jnp.bfloat16)
    kv = jnp.asarray(rng.randn(skv, d), dtype=jnp.bfloat16)
    w = jnp.asarray(rng.randn(sq, h).astype(np.float32))
    ks = rng.randint(0, skv // 2, size=sq).astype(np.int32)   # ragged!
    ke = ks + rng.randint(1, skv // 2, size=sq).astype(np.int32)
    maxk = int((ke - ks).max())

    q_fp8, kv_fp8, kv_sf = quantize_inputs(q, kv)
    logits = dg.fp8_fp4_mqa_logits((q_fp8, None), (kv_fp8, kv_sf), w,
                                   jnp.asarray(ks), jnp.asarray(ke),
                                   max_seqlen_k=maxk)
    full = dg.fp8_fp4_mqa_logits((q_fp8, None), (kv_fp8, kv_sf), w,
                                 jnp.asarray(ks), jnp.asarray(ke))
    l_np, f_np = np.asarray(logits), np.asarray(full)
    assert l_np.shape == (sq, maxk)
    for i in range(sq):
        lo, hi = int(ks[i]), int(ke[i])
        np.testing.assert_array_equal(l_np[i, :hi - lo], f_np[i, lo:hi])
        np.testing.assert_array_equal(l_np[i, hi - lo:], 0.0)


def make_fused_kv_cache_fp4(rng, num_blocks, block_kv, d):
    """Reference FP4 fused byte cache (tests/test_attention.py:307-316):
    packed e2m1 nibbles + a packed-UE8M0 int32 of per-32 scales per token."""
    kv = jnp.asarray(rng.randn(num_blocks * block_kv, d), jnp.bfloat16)
    packed, sf = dg.per_token_cast_to_fp4(kv, use_ue8m0=True, gran_k=32,
                                          use_packed_ue8m0=True)
    kv_deq = np.asarray(dg.cast_back_from_fp4(
        packed, sf, gran_k=32, use_packed_ue8m0=True)).reshape(
        num_blocks, block_kv, d)
    fused = np.empty((num_blocks, block_kv * (d // 2 + 4)), np.uint8)
    fused[:, :block_kv * (d // 2)] = \
        np.asarray(packed).reshape(num_blocks, -1).view(np.uint8)
    fused[:, block_kv * (d // 2):] = \
        np.asarray(sf).reshape(num_blocks, -1).view(np.uint8)
    return fused.reshape(num_blocks, block_kv, 1, d // 2 + 4), kv_deq


def test_paged_mqa_logits_fp4():
    """FP4 q + FP4 fused byte cache paged decode (SM100 family,
    /root/reference/tests/test_attention.py:307-316,400-420)."""
    rng = np.random.RandomState(13)
    B, next_n, h, d = 3, 1, 4, 128
    block_kv, blocks_per_seq = 64, 3
    max_model_len = block_kv * blocks_per_seq
    num_blocks = B * blocks_per_seq

    fused, kv_deq = make_fused_kv_cache_fp4(rng, num_blocks, block_kv, d)
    block_table = np.arange(num_blocks, dtype=np.int32).reshape(B, -1)
    context_lens = rng.randint(2, max_model_len, size=B).astype(np.int32)

    q = jnp.asarray(rng.randn(B * next_n * h, d), jnp.bfloat16)
    q_fp4, q_sf = dg.per_token_cast_to_fp4(q, use_ue8m0=True, gran_k=32,
                                           use_packed_ue8m0=True)
    q_sim = np.asarray(dg.cast_back_from_fp4(
        q_fp4, q_sf, gran_k=32, use_packed_ue8m0=True)).reshape(B, next_n, h, d)
    w = jnp.asarray(rng.randn(B * next_n, h).astype(np.float32))

    logits = dg.fp8_fp4_paged_mqa_logits(
        (q_fp4.reshape(B, next_n, h, d // 2), q_sf.reshape(B, next_n, h)),
        jnp.asarray(fused), w, jnp.asarray(context_lens),
        jnp.asarray(block_table), None, max_model_len)
    l_np = np.asarray(logits)
    for i in range(B):
        ctx = int(context_lens[i])
        kv_seq = kv_deq[block_table[i]].reshape(-1, d)
        scores = np.maximum(q_sim[i, 0] @ kv_seq.T, 0)
        vals_row = (np.asarray(w)[i][:, None] * scores).sum(0)
        cols = np.arange(max_model_len)
        mask = (cols < ctx) & (cols < ctx - next_n + 1)
        np.testing.assert_array_equal(np.isneginf(l_np[i]), ~mask)
        assert calc_diff(np.where(mask, l_np[i], 0),
                         np.where(mask, vals_row, 0)) < 1e-5


def test_paged_mqa_logits_varlen():
    """Varlen `indices` decode (/root/reference/csrc/apis/attention.hpp:347-391,
    tests/test_attention.py:321-382): flat rows of the same sequence share
    one KV stream via the host-side pairing regroup; results must match the
    per-row oracle with per-token context lengths."""
    rng = np.random.RandomState(14)
    raw_B, h, d = 3, 4, 64
    block_kv, blocks_per_seq = 64, 3
    max_model_len = block_kv * blocks_per_seq
    num_blocks = raw_B * blocks_per_seq

    fused, vals, sf, kv_deq = make_fused_kv_cache(rng, num_blocks, block_kv, d)
    bt_raw = rng.permutation(num_blocks).reshape(raw_B, -1).astype(np.int32)
    tokens_per_seq = rng.randint(1, 4, size=raw_B)
    ctx_base = rng.randint(8, max_model_len - 4, size=raw_B).astype(np.int32)

    indices = np.repeat(np.arange(raw_B, dtype=np.int32), tokens_per_seq)
    offsets = np.concatenate([np.arange(t, dtype=np.int32)
                              for t in tokens_per_seq])
    context_lens = ctx_base[indices] + offsets        # per flat row
    block_table = bt_raw[indices]                     # interleaved copies
    B_flat = int(tokens_per_seq.sum())

    q = jnp.asarray(rng.randn(B_flat, 1, h, d), jnp.bfloat16)
    q_fp8 = jnp.clip(q.astype(jnp.float32), -448, 448).astype(jnp.float8_e4m3fn)
    w = jnp.asarray(rng.randn(B_flat, h).astype(np.float32))

    logits = dg.fp8_fp4_paged_mqa_logits(
        (q_fp8, None), jnp.asarray(fused), w,
        jnp.asarray(context_lens.reshape(B_flat, 1)),
        jnp.asarray(block_table), None, max_model_len,
        indices=indices)
    assert logits.shape == (B_flat, max_model_len)
    l_np = np.asarray(logits)
    q_np = np.asarray(q_fp8).astype(np.float32)
    for r in range(B_flat):
        ctx = int(context_lens[r])
        kv_seq = kv_deq[block_table[r]].reshape(-1, d)
        scores = np.maximum(q_np[r, 0] @ kv_seq.T, 0)
        vals_row = (np.asarray(w)[r][:, None] * scores).sum(0)
        mask = np.arange(max_model_len) < ctx
        np.testing.assert_array_equal(np.isneginf(l_np[r]), ~mask)
        assert calc_diff(np.where(mask, l_np[r], 0),
                         np.where(mask, vals_row, 0)) < 1e-5, r


def test_paged_mqa_logits_varlen_traced():
    """Traced varlen (VERDICT r2 missing #4): with static (max_batch,
    max_tokens_per_seq) bounds the pairing runs in jnp under jit — a serving
    graph can jit over varying batches with no host sync. Must be
    bitwise-equal to the host-concrete pairing path."""
    rng = np.random.RandomState(15)
    raw_B, h, d = 3, 4, 64
    block_kv, blocks_per_seq = 64, 3
    max_model_len = block_kv * blocks_per_seq
    num_blocks = raw_B * blocks_per_seq

    fused, vals, sf, kv_deq = make_fused_kv_cache(rng, num_blocks, block_kv, d)
    bt_raw = rng.permutation(num_blocks).reshape(raw_B, -1).astype(np.int32)
    tokens_per_seq = rng.randint(1, 4, size=raw_B)
    ctx_base = rng.randint(8, max_model_len - 4, size=raw_B).astype(np.int32)

    indices = np.repeat(np.arange(raw_B, dtype=np.int32), tokens_per_seq)
    offsets = np.concatenate([np.arange(t, dtype=np.int32)
                              for t in tokens_per_seq])
    context_lens = ctx_base[indices] + offsets
    block_table = bt_raw[indices]
    B_flat = int(tokens_per_seq.sum())

    q = jnp.asarray(rng.randn(B_flat, 1, h, d), jnp.bfloat16)
    q_fp8 = jnp.clip(q.astype(jnp.float32), -448, 448).astype(jnp.float8_e4m3fn)
    w = jnp.asarray(rng.randn(B_flat, h).astype(np.float32))
    t_bound = int(tokens_per_seq.max())
    import jax

    @jax.jit
    def jitted(q_, w_, ctx_, bt_, idx_):
        return dg.fp8_fp4_paged_mqa_logits(
            (q_, None), jnp.asarray(fused), w_, ctx_, bt_, None,
            max_model_len, indices=idx_,
            max_batch=raw_B, max_tokens_per_seq=t_bound)

    traced = jitted(q_fp8, w,
                    jnp.asarray(context_lens.reshape(B_flat, 1)),
                    jnp.asarray(block_table), jnp.asarray(indices))
    host = dg.fp8_fp4_paged_mqa_logits(
        (q_fp8, None), jnp.asarray(fused), w,
        jnp.asarray(context_lens.reshape(B_flat, 1)),
        jnp.asarray(block_table), None, max_model_len,
        indices=indices, max_batch=raw_B, max_tokens_per_seq=t_bound)
    np.testing.assert_array_equal(np.asarray(traced), np.asarray(host))
