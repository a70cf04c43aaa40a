"""Mega MoE — the overlapped dispatch -> expert GEMM -> combine pipeline.

TPU-native re-design of the reference's flagship fused EP kernel
(/root/reference/deep_gemm/include/deep_gemm/impls/sm100_fp8_fp4_mega_moe.cuh:51-1392
and its host API /root/reference/csrc/apis/mega.hpp:30-346). The reference
fuses EP dispatch + L1 GEMM + SwiGLU + FP8 requant + L2 GEMM + EP combine into
one persistent kernel that pulls/pushes tokens over NVLink symmetric memory
through ring buffers while UMMA consumes them.

On TPU the same overlap is expressed the idiomatic way (SURVEY.md §2.8):

  * token ring buffers + spin-wait counters  ->  **chunked software pipeline**:
    the per-(rank, expert) capacity slots are split into ``num_chunks`` chunks;
    chunk ``c``'s all-to-all (dispatch) is issued while chunk ``c-1`` is in the
    expert GEMMs and chunk ``c-2`` is in the combine all-to-all. XLA's
    latency-hiding scheduler runs the ICI collectives of one chunk under the
    MXU work of its neighbors — the analog of the mega kernel's
    dispatch-warps / MMA-warps / epilogue-warps concurrency.
  * NVLink one-sided pulls of ≤4096B token chunks
    (sm100_fp8_fp4_mega_moe.cuh:538-559)  ->  ``jax.lax.all_to_all`` chunks
    riding ICI.
  * expert-count exchange via remote atomics -> not needed: capacity slots
    carry zero-filled invalid rows.
  * SwiGLU + topk-weight + FP8 requant epilogue (:938-1132) ->
    ``swiglu_apply_weight(_to_fp8)`` fused by XLA between the two grouped
    Pallas GEMMs of each chunk.

**Bitwise contract**: with the same GEMM tile configs, the mega pipeline is
bitwise-equal to the unfused baseline (``ep_moe_forward``) — the analog of the
reference's fused-vs-unfused bitwise assertion
(/root/reference/tests/test_mega_moe.py:204-215). This holds because every
token row's GEMM result depends only on its own k-reduction (identical tile
order), and the final combine performs the exact same f32 scatter-add in the
same pair order.

All forward functions here run INSIDE ``shard_map`` over the ``ep`` axis.
"""

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..heuristics.configs import GemmConfig, get_gemm_config
from ..utils.math import align, ceil_div
from .collectives import pallas_all_to_all
from .moe import (MoEConfig, dispatch_indices, moe_capacity,
                  swiglu_apply_weight, _expert_gemm)

# Slot alignment of the per-(rank, expert) capacity — the analog of
# `get_token_alignment_for_mega_moe` (/root/reference/csrc/apis/mega.hpp:256-262,
# where it reflects the contiguous-layout mk alignment).
TOKEN_ALIGNMENT = 8


def get_token_alignment_for_mega_moe() -> int:
    """Parity API (/root/reference/csrc/apis/mega.hpp): tokens-per-expert
    counts are padded to this multiple inside the pipeline."""
    return TOKEN_ALIGNMENT


def get_ring_limit_for_mega_moe(num_local_experts: int, chunk_rows: int,
                                num_inflight_chunks: int = 2) -> int:
    """Max token rows in flight per local expert — the analog of the
    reference's ring-buffer capacity (`get_ring_limit_for_mega_moe`,
    /root/reference/csrc/apis/mega.hpp). On TPU the "ring" is the set of
    chunk staging buffers XLA keeps live while collectives overlap compute."""
    return chunk_rows * num_inflight_chunks * num_local_experts


def get_symm_buffer_size_for_mega_moe(
        num_ranks: int, num_experts: int, hidden: int, intermediate: int,
        num_max_tokens_per_rank: int, topk: int,
        capacity_factor: float = 1.5, num_chunks: int = 4,
        use_fp8: bool = True) -> Tuple[int, dict]:
    """Byte-layout calculator for the pipeline's staging buffers — parity with
    `get_symm_buffer_size_for_mega_moe` (/root/reference/csrc/apis/mega.hpp:30-159),
    which computes the NVLink symmetric-buffer layout. On TPU XLA allocates
    these internally for the chunked all-to-alls; this reports the same
    accounting so callers can budget HBM, and returns named slices like the
    reference's Python slice closure."""
    e_local = num_experts // num_ranks
    cap = moe_capacity(num_max_tokens_per_rank, topk, num_experts,
                       capacity_factor)
    cc = ceil_div(cap, num_chunks)
    x_bytes = 1 if use_fp8 else 2                        # fp8 vs bf16 payload
    sf_bytes = 4 * ceil_div(hidden, 128) if use_fp8 else 0

    slices, offset = {}, 0

    def _add(name, nbytes):
        nonlocal offset
        slices[name] = (offset, offset + nbytes)
        offset += nbytes

    # double-buffered dispatch staging: send + recv views of one chunk
    _add('dispatch_send', 2 * num_ranks * e_local * cc * (hidden * x_bytes + sf_bytes))
    _add('dispatch_recv', 2 * num_ranks * e_local * cc * (hidden * x_bytes + sf_bytes))
    # per-row topk weights travelling with the tokens
    _add('row_weights', 2 * 2 * num_ranks * e_local * cc * 4)
    # L1 activations ring (gate_up for one chunk, f32 before requant)
    _add('l1_ring', 2 * e_local * num_ranks * cc * (2 * intermediate) * 4)
    # combine staging: send + recv of one chunk of BF16 partials
    _add('combine_send', 2 * num_ranks * e_local * cc * hidden * 2)
    _add('combine_recv', 2 * num_ranks * e_local * cc * hidden * 2)
    return offset, slices


@dataclasses.dataclass
class SymmBuffer:
    """Parity object for the reference's `deep_gemm.mega.SymmBuffer`
    (/root/reference/deep_gemm/mega/__init__.py:18-65). On TPU there is no
    user-managed symmetric memory — XLA owns the ICI staging — so this holds
    the sizing/accounting and the transformed weights. `rendezvous` is the
    no-op analog of the peer-pointer exchange."""
    num_ranks: int
    num_experts: int
    hidden: int
    intermediate: int
    num_max_tokens_per_rank: int
    topk: int
    capacity_factor: float = 1.5
    num_chunks: int = 4
    use_fp8: bool = True

    def __post_init__(self):
        self.size, self.slices = get_symm_buffer_size_for_mega_moe(
            self.num_ranks, self.num_experts, self.hidden, self.intermediate,
            self.num_max_tokens_per_rank, self.topk, self.capacity_factor,
            self.num_chunks, self.use_fp8)

    def rendezvous(self):
        return self


def transform_weights_for_mega_moe(w1: jnp.ndarray,
                                   w1_sf: Optional[jnp.ndarray] = None,
                                   gate_up_interleave: int = 1):
    """Weight layout transform — parity with `transform_weights_for_mega_moe`
    (/root/reference/deep_gemm/mega/__init__.py:115-151), which interleaves
    gate/up at granularity 8 (+ a UTCCP SF transpose) into the mega kernel's
    preferred layout.

    The TPU kernels' canonical layout is the plain concat ``[E, 2I, H]`` with
    gate rows first (``swiglu_apply_weight`` splits at I). Given weights in
    gate/up-*interleaved* layout at ``gate_up_interleave`` granularity, this
    de-interleaves them (and their per-block SF) into the canonical layout;
    ``gate_up_interleave=1`` is already row-paired interleave [g0,u0,g1,u1,…].
    Pass concat-layout weights through ``gate_up_interleave=None`` (identity).
    """
    if gate_up_interleave is None:
        return w1, w1_sf
    g = gate_up_interleave
    e, i2, h = w1.shape
    inter = i2 // 2
    assert inter % g == 0, (inter, g)
    # interleaved rows: [I/g blocks] x [gate g rows, up g rows]
    w1c = w1.reshape(e, inter // g, 2, g, h).transpose(0, 2, 1, 3, 4) \
             .reshape(e, i2, h)
    sf = None
    if w1_sf is not None:
        # per-128-row block SF cannot be de-interleaved unless g % 128 == 0;
        # for finer interleave the caller must requantize.
        assert g % 128 == 0, 'SF de-interleave requires granularity >= 128'
        gb = g // 128
        eb, nb, kb = w1_sf.shape
        sf = w1_sf.reshape(eb, nb // (2 * gb), 2, gb, kb) \
                  .transpose(0, 2, 1, 3, 4).reshape(eb, nb, kb)
    return w1c, sf


def _chunk_bounds(cap: int, num_chunks: int):
    """Static chunk row ranges [(start, size), ...] covering [0, cap)."""
    cc = ceil_div(cap, num_chunks)
    bounds = []
    start = 0
    while start < cap:
        size = min(cc, cap - start)
        bounds.append((start, size))
        start += size
    return bounds


def mega_moe_forward(x: jnp.ndarray, topk_idx: jnp.ndarray,
                     topk_weights: jnp.ndarray,
                     w1, w1_sf, w2, w2_sf,
                     cfg: MoEConfig, *, num_chunks: Optional[int] = None,
                     axis_name: str = 'ep',
                     gemm_cfg1: Optional[GemmConfig] = None,
                     gemm_cfg2: Optional[GemmConfig] = None,
                     comm: str = 'xla', packed_weights=None):
    """Overlapped EP MoE forward (inside shard_map over ``axis_name``).

    Same contract as ``ep_moe_forward`` (x [T,H] bf16, topk_idx [T,K],
    topk_weights [T,K] f32, per-expert w1/w2 (+SF)); returns (y [T,H] bf16,
    num_dropped). Bitwise-equal to the unfused path when driven with the same
    ``gemm_cfg1/gemm_cfg2``.

    ``comm`` selects the transport: 'xla' = ``jax.lax.all_to_all`` (XLA
    async collectives over ICI), 'pallas' = the one-sided remote-DMA
    all-to-all (parallel/collectives.py), 'fused' = the in-kernel
    RDMA+GEMM kernel (kernels/fused_moe.py) where the dispatch DMAs overlap
    the L1 expert GEMM inside one Pallas program — the closest analog of the
    reference's fused mega kernel. 'xla'/'pallas' move bits verbatim, so the
    bitwise contract holds for either; 'fused' computes the L1 GEMM at full
    k depth (last-ulp differences vs a k-split config are possible).
    FP8 'fused' quantizes tokens per-token BEFORE dispatch (halved dispatch
    traffic — the reference's fused-SF token payload); numerics match the
    unfused path to fp8 tolerance rather than bitwise (the unfused path
    quantizes per expert chunk after dispatch).
    """
    t_count, hidden = x.shape
    k = topk_idx.shape[1]
    ep = jax.lax.psum(1, axis_name)
    e_local = cfg.num_experts // ep

    cap = moe_capacity(t_count, k, cfg.num_experts, cfg.capacity_factor)
    if num_chunks is None:
        # Pipeline-granularity policy (heuristics/mega.py — the analog of
        # the reference's mega-MoE config search, mega_moe.hpp:100-285).
        from ..heuristics.mega import get_mega_moe_config
        num_chunks = get_mega_moe_config(
            t_count, hidden, cfg.intermediate, cfg.num_experts, int(ep), k,
            cap, use_fp8=w1_sf is not None).num_chunks
    rank, local, slot, kept, num_dropped = dispatch_indices(
        topk_idx, cfg.num_experts, e_local, cap)
    pair_t = jnp.repeat(jnp.arange(t_count, dtype=jnp.int32), k)
    pair_w = topk_weights.reshape(-1).astype(jnp.float32)
    safe_slot = jnp.where(kept, slot, cap)

    # Stage all pairs into the slot layout once (the analog of the dispatch
    # warps' src-index table, sm100_fp8_fp4_mega_moe.cuh:358-401).
    send_x = jnp.zeros((ep, e_local, cap, hidden), x.dtype)
    send_x = send_x.at[rank, local, safe_slot].set(x[pair_t], mode='drop')
    send_w = jnp.zeros((ep, e_local, cap), jnp.float32)
    send_w = send_w.at[rank, local, safe_slot].set(pair_w, mode='drop')

    if comm == 'fused':
        # The fully-fused mega kernel (kernels/fused_moe.py:fused_mega_moe):
        # in-kernel RDMA dispatch + L1 GEMM + SwiGLU/topk-weight (+FP8
        # requant) + L2 GEMM + RDMA combine push, one Pallas program — the
        # TPU analog of the reference's flagship (sm100_fp8_fp4_mega_moe.cuh
        # phases 1-3). FP8 mode quantizes tokens per-token BEFORE dispatch
        # and pushes the SF alongside (halved dispatch traffic — the mega
        # kernel's fused-SF token payload). Only the per-row topk weights
        # ride a separate (tiny) all-to-all, permuted to the kernel's
        # processing-step order.
        from ..kernels.fused_moe import fused_mega_moe
        my = jax.lax.axis_index(axis_name)
        rw = jax.lax.all_to_all(send_w, axis_name, 0, 0, tiled=False)
        rw_steps = jnp.take(rw, jnp.mod(my - jnp.arange(ep), ep), axis=0)
        # Scaled decision must see load-time-packed weights too (FP8 or
        # packed-FP4 via pack_mega_weights): their SF lives in the pack.
        scaled_fused = w1_sf is not None or (
            packed_weights is not None and packed_weights.w1sf_t is not None)
        if scaled_fused:
            from ..utils.math import per_token_cast_to_fp8
            xq, xsf = per_token_cast_to_fp8(x, use_ue8m0=False)
            ksf = xsf.shape[-1]
            send_q = jnp.zeros((ep, e_local, cap, hidden), xq.dtype)
            send_q = send_q.at[rank, local, safe_slot].set(xq[pair_t],
                                                           mode='drop')
            # invalid slots keep unit scales (x zero values -> contribute 0)
            send_qsf = jnp.ones((ep, e_local, cap, ksf), jnp.float32)
            send_qsf = send_qsf.at[rank, local, safe_slot].set(
                xsf[pair_t], mode='drop')
            combine = fused_mega_moe(send_q, rw_steps, w1, w2, axis_name,
                                     send_sf=send_qsf, w1_sf=w1_sf,
                                     w2_sf=w2_sf, packed=packed_weights)
        else:
            combine = fused_mega_moe(send_x, rw_steps, w1, w2, axis_name,
                                     packed=packed_weights)
        # combine[d, e] = results from rank d — the exact layout of the
        # unfused path's reverse all-to-all, so the same pair gather +
        # f32 scatter-add applies (bitwise-equal combine reduction).
        y_pairs = combine[rank, local, safe_slot.clip(0, cap - 1)]
        y_pairs = jnp.where(kept[:, None], y_pairs, 0)
        out = jnp.zeros((t_count, hidden), jnp.float32)
        out = out.at[pair_t].add(y_pairs.astype(jnp.float32))
        return out.astype(jnp.bfloat16), num_dropped.reshape(1)

    bounds = _chunk_bounds(cap, num_chunks)
    cid = [0]

    def _a2a(v):
        if comm == 'pallas':
            cid[0] += 1
            return pallas_all_to_all(v, axis_name, collective_id=cid[0])
        return jax.lax.all_to_all(v, axis_name, 0, 0, tiled=False)

    def _dispatch(start, size):
        # dispatch all-to-all of one slot chunk (ICI analog of the NVLink
        # token pulls, sm100_fp8_fp4_mega_moe.cuh:538-559)
        rx = _a2a(jax.lax.dynamic_slice_in_dim(send_x, start, size, axis=2))
        rw = _a2a(jax.lax.dynamic_slice_in_dim(send_w, start, size, axis=2))
        return rx, rw

    def _expert_and_combine(rx, rw, size):
        # L1 GEMM -> SwiGLU epilogue -> L2 GEMM -> combine all-to-all for one
        # chunk (phases 1-2 of the mega kernel, :666-1233)
        rows = ep * size
        a1 = rx.transpose(1, 0, 2, 3).reshape(e_local, rows, hidden)
        row_w = rw.transpose(1, 0, 2).reshape(e_local, rows)
        gate_up = _expert_gemm(a1, w1, w1_sf, cfg, gemm_cfg=gemm_cfg1)
        act = swiglu_apply_weight(gate_up, row_w).astype(jnp.bfloat16)
        y_exp = _expert_gemm(act, w2, w2_sf, cfg, gemm_cfg=gemm_cfg2)
        back = y_exp.reshape(e_local, ep, size, hidden).transpose(1, 0, 2, 3)
        return _a2a(back)

    # Software pipeline: chunk c's dispatch is issued before chunk c-1's
    # compute so XLA can run the collective under the MXU work.
    y_chunks = []
    pending = _dispatch(*bounds[0])
    for c in range(1, len(bounds)):
        nxt = _dispatch(*bounds[c])
        y_chunks.append(_expert_and_combine(*pending, bounds[c - 1][1]))
        pending = nxt
    y_chunks.append(_expert_and_combine(*pending, bounds[-1][1]))

    # Final combine: identical f32 scatter-add to the unfused path (phase 3,
    # :1246-1384) — same pair order => bitwise-equal reduction.
    y_slots = jnp.concatenate(y_chunks, axis=2)          # [ep, E_local, cap, H]
    y_pairs = y_slots[rank, local, safe_slot.clip(0, cap - 1)]
    y_pairs = jnp.where(kept[:, None], y_pairs, 0)
    out = jnp.zeros((t_count, hidden), jnp.float32)
    out = out.at[pair_t].add(y_pairs.astype(jnp.float32))
    return out.astype(jnp.bfloat16), num_dropped.reshape(1)


def fp8_fp4_mega_moe(x, topk_idx, topk_weights, w1, w1_sf, w2, w2_sf,
                     cfg: MoEConfig, *, num_chunks: Optional[int] = None,
                     axis_name: str = 'ep'):
    """FP8 mega MoE (parity name: /root/reference/csrc/apis/mega.hpp
    `fp8_fp4_mega_moe`). Weights are FP8 + per-128x128-block SF."""
    assert w1_sf is not None and w2_sf is not None
    return mega_moe_forward(x, topk_idx, topk_weights, w1, w1_sf, w2, w2_sf,
                            cfg, num_chunks=num_chunks, axis_name=axis_name)


def bf16_mega_moe(x, topk_idx, topk_weights, w1, w2,
                  cfg: MoEConfig, *, num_chunks: Optional[int] = None,
                  axis_name: str = 'ep'):
    """BF16 mega MoE (parity name: /root/reference/csrc/apis/mega.hpp
    `bf16_mega_moe`)."""
    return mega_moe_forward(x, topk_idx, topk_weights, w1, None, w2, None,
                            cfg, num_chunks=num_chunks, axis_name=axis_name)
