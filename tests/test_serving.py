"""Continuous batching engine tests (serving/engine.py): static decode
slots, paged cache allocation/reuse, and BATCH-INVARIANCE — a sequence's
outputs must not depend on which other sequences share the batch (the
correctness property continuous batching rests on; per-row independence of
the paged kernel makes it exact)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deepgemm_tpu.serving import ContinuousBatcher, PageAllocator
from deepgemm_tpu.testing import assert_bitwise_equal

H, D, HI, DI = 2, 64, 2, 32
BLOCK_KV = 64


def make_embed_fn(slots):
    """Deterministic per-token streams (a real server plugs the model's
    projections here)."""
    def embed(tokens):
        t = np.asarray(tokens)
        rngs = [np.random.RandomState(7919 + int(x)) for x in t]
        q = jnp.asarray(np.stack([r.randn(H, D) for r in rngs]), jnp.bfloat16)
        iq = jnp.asarray(np.stack([r.randn(HI, DI) for r in rngs]), jnp.bfloat16)
        iw = jnp.asarray(np.stack([r.rand(HI) for r in rngs]).astype(np.float32))
        k = jnp.asarray(np.stack([r.randn(H, D) for r in rngs]), jnp.bfloat16)
        v = jnp.asarray(np.stack([r.randn(H, D) for r in rngs]), jnp.bfloat16)
        ik = jnp.asarray(np.clip(np.stack([r.randn(DI) for r in rngs]),
                                 -448, 448)).astype(jnp.float8_e4m3fn)
        isf = jnp.asarray(np.stack([r.rand() + 0.5 for r in rngs]).astype(np.float32))
        return q, iq, iw, k, v, ik, isf
    return embed


def prompt_streams(seed, t):
    r = np.random.RandomState(seed)
    k = jnp.asarray(r.randn(t, H, D), jnp.bfloat16)
    v = jnp.asarray(r.randn(t, H, D), jnp.bfloat16)
    ik = jnp.asarray(np.clip(r.randn(t, DI), -448, 448)).astype(jnp.float8_e4m3fn)
    isf = jnp.asarray((r.rand(t) + 0.5).astype(np.float32))
    return k, v, ik, isf


def make_engine(slots=4, num_blocks=24):
    return ContinuousBatcher(
        max_slots=slots, max_pages_per_seq=4, num_blocks=num_blocks,
        block_kv=BLOCK_KV, num_heads=H, head_dim=D,
        index_heads=HI, index_dim=DI, topk=8,
        embed_fn=make_embed_fn(slots))


def test_page_allocator():
    a = PageAllocator(4)
    p1 = a.alloc(2)
    p2 = a.alloc(2)
    assert sorted(p1 + p2) == [0, 1, 2, 3] and a.num_free == 0
    with pytest.raises(MemoryError):
        a.alloc(1)
    a.free(p1)
    assert a.alloc(2) == p1       # freed pages are reused


def test_continuous_batching_batch_invariance():
    eng = make_engine()
    # two sequences admitted together, a third mid-flight
    s1 = eng.admit(70)
    s2 = eng.admit(10)
    assert s1 is not None and s2 is not None
    eng.prefill(s1, *prompt_streams(1, 70))      # spans 2 pages
    eng.prefill(s2, *prompt_streams(2, 10))

    outs = {s1: [], s2: [], 'late': []}
    s3 = None
    alive = {s1, s2}
    for step in range(6):
        if step == 2:
            s3 = eng.admit(5)
            assert s3 is not None
            eng.prefill(s3, *prompt_streams(3, 5))
            alive.add(s3)
        if step == 4:
            eng.finish(s2)
            alive.discard(s2)
        toks = {}
        if s1 in alive:
            toks[s1] = 100 + step
        if s2 in alive:
            toks[s2] = 200 + step
        if s3 in alive:
            toks[s3] = 300 + (step - 2)
        res = eng.step(toks)
        for sid, val in res.items():
            key = 'late' if sid == s3 else sid
            outs[key].append(np.asarray(val, np.float32))

    # reference: each sequence alone in a fresh engine must produce the
    # SAME outputs (batch invariance, bitwise)
    for key, seed, t0, tok0, nsteps in [(s1, 1, 70, 100, 6), ('late', 3, 5, 300, 4)]:
        ref = make_engine()
        sid = ref.admit(t0)
        ref.prefill(sid, *prompt_streams(seed, t0))
        for i in range(nsteps):
            r = ref.step({sid: tok0 + i})
            assert_bitwise_equal(jnp.asarray(outs[key][i]),
                                 jnp.asarray(r[sid], jnp.float32))


def test_page_reuse_and_slot_recycling():
    eng = make_engine(slots=2, num_blocks=5)
    s1 = eng.admit(BLOCK_KV)          # 1 page
    s2 = eng.admit(BLOCK_KV * 2)      # 2 pages
    assert eng.alloc.num_free == 2
    assert eng.admit(BLOCK_KV * 3) is None       # no slot free
    eng.prefill(s1, *prompt_streams(4, BLOCK_KV))
    eng.finish(s1)
    assert eng.alloc.num_free == 3
    s4 = eng.admit(BLOCK_KV * 2)                 # recycles slot + pages
    assert s4 is not None
    eng.prefill(s4, *prompt_streams(5, BLOCK_KV * 2))
    out = eng.step({s4: 42})          # appends past the page boundary
    assert np.isfinite(np.asarray(out[s4], np.float32)).all()
    eng.finish(s4)
    eng.finish(s2)
    assert eng.alloc.num_free == 5


def test_cache_exhaustion_raises():
    eng = make_engine(slots=2, num_blocks=2)
    s1 = eng.admit(BLOCK_KV * 2)
    eng.prefill(s1, *prompt_streams(6, BLOCK_KV * 2))
    with pytest.raises(MemoryError):
        eng.step({s1: 1})             # tail page needed, none free


def test_page_allocator_quad_alignment():
    """The allocator's layout contract for the zero-copy kernel's coalesced
    DMAs: logical pages (4i..4i+3) physically adjacent whenever a whole
    aligned quad is free (32KB DMAs), degrading to aligned pairs (16KB)
    then singles, and runs recombine on free."""
    al = PageAllocator(8)
    a = al.alloc(4)                  # one whole quad
    assert a == [a[0], a[0] + 1, a[0] + 2, a[0] + 3] and a[0] % 4 == 0
    b = al.alloc(3)                  # 1 pair (split quad) + 1 single
    assert b[1] == b[0] + 1 and b[0] % 2 == 0
    assert al.num_free == 1
    al.free(a)
    al.free(b)
    assert al.num_free == 8
    c = al.alloc(8)                  # recombined: both quads again
    assert all(c[i:i + 4] == [c[i], c[i] + 1, c[i] + 2, c[i] + 3]
               and c[i] % 4 == 0 for i in range(0, 8, 4))
    # odd total: last block is a permanent single
    al9 = PageAllocator(9)
    got = al9.alloc(9)
    assert sorted(got) == list(range(9)) and al9.num_free == 0
    # 11 blocks: 2 quads + 1 pair + 1 single
    al11 = PageAllocator(11)
    assert al11.num_free == 11
    q = al11.alloc(4)
    assert q[0] % 4 == 0 and q == list(range(q[0], q[0] + 4))


def test_engine_decode_growth_keeps_quads():
    """Decode-time one-page-at-a-time growth preserves the (4i..4i+3)
    adjacency via the reserved-tail scheme, and finish() releases the
    reservation."""
    eng = make_engine(slots=1, num_blocks=8)
    s = eng.admit(BLOCK_KV)                       # 1 page (logical index 0)
    eng.prefill(s, *prompt_streams(BLOCK_KV, BLOCK_KV))
    seq = eng._seq(s)
    assert all(r == seq.pages[0] + 1 + j
               for j, r in enumerate(seq.reserved_pages)) \
        or not seq.reserved_pages
    for i in range(3 * BLOCK_KV):                 # grow to 4 pages
        eng.step({s: i})
    seq = eng._seq(s)
    assert len(seq.pages) == 4
    # logical (0,1) pair-adjacent and (2,3) pair-adjacent at least; the
    # reserved-tail scheme keeps whole quads when growth STARTS 4-aligned
    assert seq.pages[1] == seq.pages[0] + 1 and seq.pages[0] % 2 == 0
    assert seq.pages[3] == seq.pages[2] + 1 and seq.pages[2] % 2 == 0
    # a fresh sequence admitted with a 4-page prompt gets a whole quad
    eng2 = make_engine(slots=1, num_blocks=8)
    s2 = eng2.admit(4 * BLOCK_KV)
    p2 = eng2._seq(s2).pages
    assert p2 == list(range(p2[0], p2[0] + 4)) and p2[0] % 4 == 0
    free_before = eng.alloc.num_free
    eng.finish(s)
    assert eng.alloc.num_free == 8                # incl. any reservation
    assert free_before <= 8
