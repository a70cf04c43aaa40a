"""Continuous batching engine over the paged decode kernels.

TPU-idiomatic design (vs a GPU server's dynamic batches):

  * FIXED decode slots: the engine owns ``max_slots`` batch rows forever;
    admission fills a free slot, completion frees it. Every device shape
    (q, block tables, context lens) is static, so the decode step compiles
    ONCE — the TPU analog of the reference's CUDA-graph-safe masked decode
    contract ("masked_m read on device only").
  * Inactive slots carry ``context_len = 0``: the paged MQA kernel's
    active-tile predicate skips their work on device, no host branching.
  * Paged KV: a host-side free-list allocator hands cache blocks to slots;
    the block table is a static ``[max_slots, max_pages]`` int32 array.
  * Cache append is a functional ``.at[pages, offsets].set`` scatter in
    its OWN donated jit — donation makes it in-place (measured 27 us vs
    3368 us undonated at the serving shape), and it must stay a separate
    dispatch from the compute step: composed with the downstream token
    gather in one jit, XLA re-materializes a full cache copy even under
    donation (scripts/measure_serving_donate.py).

The per-step compute is the lightning-indexer sparse decode
(models/indexer.py): quantized indexer scoring on the Pallas paged kernel,
top-k selection, exact attention over the selected slots.
"""

import dataclasses
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from ..models.indexer import indexer_sparse_decode
from ..utils.math import ceil_div


class PageAllocator:
    """Host-side free-list of KV cache blocks (the paged-attention page
    table manager the reference's serving stacks keep around its kernels).

    QUAD-ALIGNED: pages are handed out so that a sequence's logical pages
    (4i .. 4i+3) are physically adjacent (4k .. 4k+3) whenever a whole
    aligned quad is free, degrading to aligned pairs, then singles — the
    layout contract the zero-copy decode kernel's coalesced DMAs ride
    (kernels/paged_mqa.py: the per-8KB DMA issue cost is the measured zc
    bound; adjacent pairs fold into one 16KB DMA and quads into one 32KB
    DMA — pure-DMA ceilings 592 / 728 / 732 GB/s, scripts/zc_roofline.py).
    Correctness never depends on adjacency."""

    def __init__(self, num_blocks: int):
        self.num_blocks = num_blocks
        # quad k = pages (4k .. 4k+3); ascending hand-out order. The tail
        # (num_blocks % 4) starts as pairs/singles.
        self._free_quads: List[int] = list(range(num_blocks // 4 - 1, -1, -1))
        tail = (num_blocks // 4) * 4
        self._free_pairs: List[int] = (
            [tail // 2] if num_blocks - tail >= 2 else [])
        self._free_singles: List[int] = (
            [num_blocks - 1] if num_blocks % 2 else [])

    @property
    def num_free(self) -> int:
        return (4 * len(self._free_quads) + 2 * len(self._free_pairs)
                + len(self._free_singles))

    def _pop_pair(self) -> Optional[int]:
        """An aligned pair index k (pages 2k, 2k+1), splitting a quad if
        needed; None when neither exists."""
        if self._free_pairs:
            return self._free_pairs.pop()
        if self._free_quads:
            q = self._free_quads.pop()      # split: hand low pair, keep high
            self._free_pairs.append(2 * q + 1)
            return 2 * q
        return None

    def _pop_single(self) -> int:
        if self._free_singles:
            return self._free_singles.pop()
        k = self._pop_pair()                # break a pair (rare path)
        if k is None:
            raise MemoryError('paged cache exhausted')
        self._free_singles.append(2 * k + 1)
        return 2 * k

    def alloc(self, n: int) -> List[int]:
        """n pages; positions (4i..4i+3) of the result are physically
        adjacent whenever a whole quad was available (pairs when not)."""
        if n > self.num_free:
            raise MemoryError(f'paged cache exhausted: need {n}, '
                              f'free {self.num_free}')
        out: List[int] = []
        while n - len(out) >= 4 and self._free_quads:
            q = self._free_quads.pop()
            out.extend(range(4 * q, 4 * q + 4))
        while n - len(out) >= 2:
            k = self._pop_pair()
            if k is None:
                break
            out.extend((2 * k, 2 * k + 1))
        while len(out) < n:
            out.append(self._pop_single())
        return out

    def alloc_pair(self) -> Optional[List[int]]:
        """One whole aligned pair, or None if only singles remain — decode
        growth reserves the tail for the sequence's NEXT pages so adjacency
        survives one-page-at-a-time growth."""
        k = self._pop_pair()
        return None if k is None else [2 * k, 2 * k + 1]

    def alloc_quad(self) -> Optional[List[int]]:
        """One whole aligned quad (4k..4k+3), or None — decode growth at a
        4-aligned logical index reserves the other three pages so the
        zero-copy kernel's 32KB quad DMAs stay coalesced while the
        sequence grows one page at a time."""
        if not self._free_quads:
            return None
        q = self._free_quads.pop()
        return list(range(4 * q, 4 * q + 4))

    def free(self, pages: List[int]):
        singles = set(self._free_singles)
        singles.update(pages)
        for k in list(self._free_pairs):
            singles.update((2 * k, 2 * k + 1))
        self._free_pairs = []
        quads, pairs = [], []
        for p in sorted(singles):
            q4 = p - (p % 4)
            if all(q4 + j in singles for j in range(4)):
                if p == q4:
                    quads.append(q4 // 4)
                    for j in range(4):
                        singles.discard(q4 + j)
        for p in sorted(singles):
            even = p - (p % 2)
            if even in singles and even + 1 in singles:
                pairs.append(even // 2)
                singles.discard(even)
                singles.discard(even + 1)
        # descending storage so pop() hands out ascending page numbers
        # (matches __init__'s order; locality preference only)
        self._free_quads = sorted(set(self._free_quads) | set(quads),
                                  reverse=True)
        self._free_pairs = sorted(pairs, reverse=True)
        self._free_singles = sorted(singles)


@dataclasses.dataclass
class SequenceState:
    seq_id: int
    slot: int
    ctx_len: int                  # tokens currently in the cache
    pages: List[int]
    steps: int = 0
    # tail of a quad/pair reserved by decode growth at a 4-/2-aligned
    # logical page index (PageAllocator.alloc_quad/alloc_pair) — consumed
    # by the NEXT growths so the (4i..4i+3) physical-adjacency contract
    # holds while growing one page at a time
    reserved_pages: List[int] = dataclasses.field(default_factory=list)


class PagedCache:
    """Device-side paged caches: attention K/V pages plus the quantized
    indexer cache in the kernel's pre-split (fp8 values, f32 SF) layout."""

    def __init__(self, num_blocks: int, block_kv: int, num_heads: int,
                 head_dim: int, index_dim: int):
        self.block_kv = block_kv
        self.k_pages = jnp.zeros((num_blocks, block_kv, num_heads, head_dim),
                                 jnp.bfloat16)
        self.v_pages = jnp.zeros_like(self.k_pages)
        self.ik_pages = jnp.zeros((num_blocks, block_kv, index_dim),
                                  jnp.float8_e4m3fn)
        self.isf_pages = jnp.full((num_blocks, block_kv), 1e-9, jnp.float32)

    def append(self, pages: jnp.ndarray, offsets: jnp.ndarray,
               k_new: jnp.ndarray, v_new: jnp.ndarray,
               ik_new: jnp.ndarray, isf_new: jnp.ndarray,
               active: jnp.ndarray):
        """Scatter one new token per slot into the caches. ``pages`` and
        ``offsets`` [slots] address each slot's tail; inactive slots write
        into a scratch page slot 0/offset 0 guarded by ``active`` masking
        (mode='drop' via an out-of-range page id)."""
        safe_pages = jnp.where(active, pages, self.k_pages.shape[0])
        self.k_pages = self.k_pages.at[safe_pages, offsets].set(
            k_new, mode='drop')
        self.v_pages = self.v_pages.at[safe_pages, offsets].set(
            v_new, mode='drop')
        self.ik_pages = self.ik_pages.at[safe_pages, offsets].set(
            ik_new, mode='drop')
        self.isf_pages = self.isf_pages.at[safe_pages, offsets].set(
            isf_new, mode='drop')


class ContinuousBatcher:
    """Static-slot continuous batching over the indexer sparse-decode path.

    ``embed_fn(token_batch) -> (q, iq, iw, k_new, v_new, ik_new, isf_new)``
    produces one decode step's streams for all slots (a real server plugs
    the model's projections in here; tests use a deterministic stub).
    """

    def __init__(self, *, max_slots: int, max_pages_per_seq: int,
                 num_blocks: int, block_kv: int, num_heads: int,
                 head_dim: int, index_heads: int, index_dim: int,
                 topk: int, embed_fn: Callable):
        self.max_slots = max_slots
        self.max_pages = max_pages_per_seq
        self.block_kv = block_kv
        self.topk = topk
        self.embed_fn = embed_fn
        self.alloc = PageAllocator(num_blocks)
        self.cache = PagedCache(num_blocks, block_kv, num_heads, head_dim,
                                index_dim)
        # static device state
        self.block_table = np.zeros((max_slots, max_pages_per_seq), np.int32)
        self.context_lens = np.zeros(max_slots, np.int32)
        self._slots: List[Optional[SequenceState]] = [None] * max_slots
        self._next_id = 0
        self.max_context_len = max_pages_per_seq * block_kv

        # The device step is TWO jits, both compiled once (static shapes):
        #
        #   1. a DONATED cache append — donation makes the 64-row scatter
        #      update the ~GB k/v caches IN PLACE (measured 27 us vs
        #      3368 us undonated at the serving shape,
        #      scripts/measure_serving_donate.py);
        #   2. a read-only compute step (indexer scoring + top-k + sparse
        #      attention).
        #
        # They must NOT be one jit: composing the donated scatter with the
        # downstream token gather re-materializes a full cache copy even
        # under donation (the gather pins the pre-scatter buffer alive —
        # measured 2147 us for the fused form). Two dispatches, no copies.
        def _append_step(kp, vp, ikp, isfp, pages, offs, active,
                         k_new, v_new, ik_new, isf_new):
            safe_pages = jnp.where(active, pages, kp.shape[0])
            kp = kp.at[safe_pages, offs].set(k_new, mode='drop')
            vp = vp.at[safe_pages, offs].set(v_new, mode='drop')
            ikp = ikp.at[safe_pages, offs].set(ik_new, mode='drop')
            isfp = isfp.at[safe_pages, offs].set(isf_new, mode='drop')
            return kp, vp, ikp, isfp
        self._append_step = jax.jit(_append_step, donate_argnums=(0, 1, 2, 3))

        def _compute_step(kp, vp, ikp, isfp, q, iq, iw,
                          block_table, context_lens):
            return indexer_sparse_decode(
                q[:, None], (kp, vp), (ikp, isfp), iq[:, None], iw,
                context_lens, block_table, self.max_context_len, self.topk)
        self._compute_step = jax.jit(_compute_step)

        # Donated per-page prefill write: one call per prompt page instead
        # of four whole-cache copies per page (page/off/n ride as traced
        # scalars so every prompt length hits the same compiled module).
        def _prefill_page(kp, vp, ikp, isfp, page, off, n, kc, vc, ikc, isc):
            j = jnp.arange(block_kv, dtype=jnp.int32)
            rows = jnp.clip(off + j, 0, block_kv - 1)
            safe_page = jnp.where(j < n, page, kp.shape[0])
            kp = kp.at[safe_page, rows].set(kc, mode='drop')
            vp = vp.at[safe_page, rows].set(vc, mode='drop')
            ikp = ikp.at[safe_page, rows].set(ikc, mode='drop')
            isfp = isfp.at[safe_page, rows].set(isc, mode='drop')
            return kp, vp, ikp, isfp
        self._prefill_page = jax.jit(_prefill_page,
                                     donate_argnums=(0, 1, 2, 3))

    # ----- admission / completion ---------------------------------------
    def admit(self, prompt_len: int) -> Optional[int]:
        """Claim a slot + pages for a sequence whose prompt KV the caller
        will prefill via :meth:`prefill`. Returns seq_id or None if no slot
        is free (the request queues at the caller)."""
        try:
            slot = self._slots.index(None)
        except ValueError:
            return None
        pages_needed = max(1, ceil_div(prompt_len, self.block_kv))
        if pages_needed > self.alloc.num_free:
            return None
        pages = self.alloc.alloc(pages_needed)
        seq = SequenceState(self._next_id, slot, 0, pages)
        self._next_id += 1
        self._slots[slot] = seq
        self.block_table[slot, :] = 0
        self.block_table[slot, :len(pages)] = pages
        self.context_lens[slot] = 0
        return seq.seq_id

    def finish(self, seq_id: int):
        for slot, seq in enumerate(self._slots):
            if seq is not None and seq.seq_id == seq_id:
                self.alloc.free(seq.pages + seq.reserved_pages)
                self._slots[slot] = None
                self.context_lens[slot] = 0
                self.block_table[slot, :] = 0
                return
        raise KeyError(seq_id)

    def _seq(self, seq_id: int) -> SequenceState:
        for seq in self._slots:
            if seq is not None and seq.seq_id == seq_id:
                return seq
        raise KeyError(seq_id)

    # ----- cache writes --------------------------------------------------
    def _grow(self, seq: SequenceState, new_len: int):
        pages_needed = max(1, ceil_div(new_len, self.block_kv))
        while len(seq.pages) < pages_needed:
            if len(seq.pages) >= self.max_pages:
                raise MemoryError(f'sequence {seq.seq_id} exceeded '
                                  f'max_pages_per_seq={self.max_pages}')
            # keep the (4i..4i+3) physical-adjacency contract while growing
            # one page at a time: at a 4-aligned logical index grab a whole
            # aligned quad (pair at 2-aligned) and reserve the tail for the
            # next growths — the zero-copy kernel's 32KB quad DMAs ride this
            if seq.reserved_pages:
                page = seq.reserved_pages.pop(0)
            else:
                run = None
                if len(seq.pages) % 4 == 0:
                    run = self.alloc.alloc_quad()
                if run is None and len(seq.pages) % 2 == 0:
                    run = self.alloc.alloc_pair()
                if run is None:
                    run = self.alloc.alloc(1)
                page, seq.reserved_pages = run[0], run[1:]
            seq.pages.append(page)
            self.block_table[seq.slot, len(seq.pages) - 1] = page

    def prefill(self, seq_id: int, k: jnp.ndarray, v: jnp.ndarray,
                ik: jnp.ndarray, isf: jnp.ndarray):
        """Write a prompt's KV ([T, h, d] / [T, di] fp8 / [T] f32) into the
        sequence's pages in one scatter per page."""
        seq = self._seq(seq_id)
        t = k.shape[0]
        self._grow(seq, seq.ctx_len + t)
        base = seq.ctx_len
        bkv = self.block_kv
        c = self.cache
        start = 0
        while start < t:
            pos0 = base + start
            page = seq.pages[pos0 // bkv]
            off = pos0 % bkv
            # chunks split at PAGE boundaries (a non-aligned base — chunked
            # prefill — must not spill past the page; the old slice form
            # silently clipped those rows)
            n = min(bkv - off, t - start)
            pad = bkv - n

            def chunk(x):
                sl = x[start:start + n]
                if pad:
                    sl = jnp.concatenate(
                        [sl, jnp.zeros((pad,) + sl.shape[1:], sl.dtype)])
                return sl
            (c.k_pages, c.v_pages, c.ik_pages, c.isf_pages) = \
                self._prefill_page(
                    c.k_pages, c.v_pages, c.ik_pages, c.isf_pages,
                    jnp.int32(page), jnp.int32(off), jnp.int32(n),
                    chunk(k), chunk(v), chunk(ik), chunk(isf))
            start += n
        seq.ctx_len += t
        self.context_lens[seq.slot] = seq.ctx_len

    # ----- one decode step over ALL slots -------------------------------
    def step(self, tokens: Dict[int, int]) -> Dict[int, jnp.ndarray]:
        """One continuous-batching decode step: ``tokens`` maps seq_id ->
        next input token id. Every active slot advances one position; free
        slots ride along masked (ctx 0). Returns seq_id -> output [h, d]."""
        token_batch = np.zeros(self.max_slots, np.int32)
        active = np.zeros(self.max_slots, bool)
        for seq_id, tok in tokens.items():
            seq = self._seq(seq_id)
            token_batch[seq.slot] = tok
            active[seq.slot] = True

        q, iq, iw, k_new, v_new, ik_new, isf_new = self.embed_fn(
            jnp.asarray(token_batch))

        # append the new token's KV at each active slot's tail
        pages_np = np.zeros(self.max_slots, np.int32)
        offs_np = np.zeros(self.max_slots, np.int32)
        for seq in self._slots:
            if seq is None or not active[seq.slot]:
                continue
            self._grow(seq, seq.ctx_len + 1)
            pages_np[seq.slot] = seq.pages[seq.ctx_len // self.block_kv]
            offs_np[seq.slot] = seq.ctx_len % self.block_kv
        for seq in self._slots:
            if seq is not None and active[seq.slot]:
                seq.ctx_len += 1
                seq.steps += 1
                self.context_lens[seq.slot] = seq.ctx_len

        c = self.cache
        (c.k_pages, c.v_pages, c.ik_pages, c.isf_pages) = \
            self._append_step(
                c.k_pages, c.v_pages, c.ik_pages, c.isf_pages,
                jnp.asarray(pages_np), jnp.asarray(offs_np),
                jnp.asarray(active), k_new, v_new, ik_new, isf_new)
        out = self._compute_step(
            c.k_pages, c.v_pages, c.ik_pages, c.isf_pages,
            q, iq, iw, jnp.asarray(self.block_table),
            jnp.asarray(self.context_lens))

        return {seq.seq_id: out[seq.slot, 0]
                for seq in self._slots
                if seq is not None and active[seq.slot]}
