"""Expert-parallel MoE layer (dispatch -> expert GEMMs -> combine).

TPU-native re-design of the reference MoE story:
  * the *unfused baseline* path mirrors DeepEP-dispatch -> grouped GEMM ->
    SwiGLU+requant -> grouped GEMM -> combine
    (/root/reference/tests/test_mega_moe.py:149-202), and
  * is the correctness anchor the overlapped "mega" path must match bitwise
    (reference asserts bitwise equality fused vs unfused,
    tests/test_mega_moe.py:204-215).

Mapping of the reference's NVLink machinery (SURVEY.md 2.8):
  * symmetric-memory one-sided pulls/pushes  -> ``jax.lax.all_to_all`` over
    the ``ep`` mesh axis (ICI collectives emitted by XLA),
  * token ring buffers with spin-wait counters -> fixed per-(rank, expert)
    capacity slots (static shapes; XLA-friendly), invalid slots are zero and
    contribute nothing,
  * expert-count exchange via remote atomics   -> not needed: capacity slots
    carry a validity mask.

All functions here run INSIDE ``shard_map`` over the ``ep`` axis.
"""

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..kernels.grouped import m_grouped_gemm_masked
from ..ops.m_grouped import _grouped_sfb_t
from ..utils.math import align, ceil_div, per_token_cast_to_fp8


@dataclasses.dataclass(frozen=True)
class MoEConfig:
    num_experts: int
    hidden: int
    intermediate: int
    topk: int
    capacity_factor: float = 1.5
    use_fp8: bool = True
    # Use the Pallas grouped kernels (inference). The pure-XLA path is
    # differentiable and used for training steps.
    use_kernels: bool = True
    # FP8 training: route the expert GEMMs through the differentiable
    # grouped autograd op (ops/autograd.py fp8_grouped_matmul — forward FP8
    # grouped GEMM, wgrad = the k-grouped FP32-accumulate kernel), instead
    # of the inference-only masked kernels or the plain-XLA einsum.
    fp8_training: bool = False


def swiglu_apply_weight(gate_up: jnp.ndarray, row_weights: jnp.ndarray,
                        clamp: float = 256.0) -> jnp.ndarray:
    """SwiGLU + clamp + per-row (topk) weight — the epilogue the reference
    fuses into the mega kernel's L1->L2 hop
    (/root/reference/deep_gemm/include/deep_gemm/impls/sm100_fp8_fp4_mega_moe.cuh:938-1132
    and third-party/tilelang_ops/swiglu_apply_weight_to_fp8.py)."""
    inter = gate_up.shape[-1] // 2
    gate = gate_up[..., :inter].astype(jnp.float32)
    up = gate_up[..., inter:].astype(jnp.float32)
    act = jax.nn.silu(gate) * up
    act = jnp.clip(act, -clamp, clamp)
    return act * row_weights[..., None]


def swiglu_apply_weight_to_fp8(gate_up: jnp.ndarray, row_weights: jnp.ndarray,
                               gran_k: int = 128):
    """SwiGLU + weight + per-token FP8 requant (parity with the standalone
    tilelang op used by the reference's unfused baseline,
    third-party/tilelang_ops/swiglu_apply_weight_to_fp8.py)."""
    act = swiglu_apply_weight(gate_up, row_weights)
    shape = act.shape
    q, sf = per_token_cast_to_fp8(act.reshape(-1, shape[-1]).astype(jnp.bfloat16),
                                  use_ue8m0=False, gran_k=gran_k)
    return q.reshape(shape), sf.reshape(*shape[:-1], -1)


def moe_capacity(num_tokens: int, topk: int, num_experts: int,
                 capacity_factor: float) -> int:
    """Per-(rank, expert) slot capacity — shared by the unfused and mega
    (fused/overlapped) paths so their dispatch plans are identical (the
    bitwise fused-vs-unfused contract, /root/reference/tests/test_mega_moe.py:204-215)."""
    return align(int(ceil_div(num_tokens * topk, num_experts)
                     * capacity_factor) + 1, 8)


def dispatch_indices(topk_idx: jnp.ndarray, num_experts: int, e_local: int,
                     capacity: int):
    """Static-shape dispatch plan: for each (token, k) pair, its destination
    (rank, local expert, slot). Slots >= capacity are dropped (capacity
    routing); the reference is dropless via dynamic ring buffers — the fixed
    capacity here is the static-shape TPU analog, with drop stats returned."""
    t_count, k = topk_idx.shape
    e = topk_idx.reshape(-1)                                   # [T*K]
    rank = e // e_local
    local = e % e_local

    # slot = position of this pair among pairs with the same expert
    order = jnp.argsort(e, stable=True)
    inv = jnp.argsort(order, stable=True)
    sorted_e = e[order]
    group_start = jnp.searchsorted(sorted_e, jnp.arange(num_experts))
    slot_sorted = jnp.arange(t_count * k) - group_start[sorted_e]
    slot = slot_sorted[inv]

    kept = slot < capacity
    num_dropped = jnp.sum(~kept)
    return rank, local, slot, kept, num_dropped


def local_expert_recv_stats(topk_idx: jnp.ndarray, cfg: MoEConfig,
                            axis_name: str = 'ep') -> jnp.ndarray:
    """Per-LOCAL-expert received-token counts for this step — the analog of
    the mega kernel's on-device `cumulative_local_expert_recv_stats`
    (/root/reference/deep_gemm/include/deep_gemm/impls/sm100_fp8_fp4_mega_moe.cuh:630-634).
    Functional: returns this step's counts [E_local]; accumulate across steps
    on the caller side. Runs inside shard_map over ``axis_name``. Counts
    include capacity-dropped pairs (they were routed, like the reference's
    recv accounting) — subtract num_dropped for landed-only counts."""
    ep = jax.lax.psum(1, axis_name)
    e_local = cfg.num_experts // ep
    e = topk_idx.reshape(-1)
    cnt = jnp.zeros((ep, e_local), jnp.int32)
    cnt = cnt.at[e // e_local, e % e_local].add(1)
    total = jax.lax.psum(cnt, axis_name)            # sum over source ranks
    return total[jax.lax.axis_index(axis_name)]


def ep_moe_forward(x: jnp.ndarray, topk_idx: jnp.ndarray,
                   topk_weights: jnp.ndarray,
                   w1, w1_sf, w2, w2_sf,
                   cfg: MoEConfig, axis_name: str = 'ep',
                   gemm_cfg1=None, gemm_cfg2=None):
    """Unfused EP MoE forward (inside shard_map over `axis_name`).

    x [T, H] bf16; topk_idx [T, K] global expert ids; topk_weights [T, K] f32;
    w1 [E_local, 2I, H], w2 [E_local, H, I] (fp8 + per-block SF, or bf16 with
    sf None). Returns (y [T, H] bf16, num_dropped)."""
    t_count, hidden = x.shape
    k = topk_idx.shape[1]
    ep = jax.lax.psum(1, axis_name)
    e_local = cfg.num_experts // ep
    inter = cfg.intermediate

    # per-(rank, expert) capacity, aligned for the grouped kernels
    cap = moe_capacity(t_count, k, cfg.num_experts, cfg.capacity_factor)
    rank, local, slot, kept, num_dropped = dispatch_indices(
        topk_idx, cfg.num_experts, e_local, cap)

    pair_t = jnp.repeat(jnp.arange(t_count, dtype=jnp.int32), k)
    pair_w = topk_weights.reshape(-1).astype(jnp.float32)

    # Scatter tokens into [ep, E_local, cap, H]; dropped pairs fall outside
    safe_slot = jnp.where(kept, slot, cap)       # OOB -> dropped by scatter
    send_x = jnp.zeros((ep, e_local, cap, hidden), x.dtype)
    send_x = send_x.at[rank, local, safe_slot].set(x[pair_t], mode='drop')
    send_w = jnp.zeros((ep, e_local, cap), jnp.float32)
    send_w = send_w.at[rank, local, safe_slot].set(pair_w, mode='drop')

    # Dispatch all-to-all over ICI (the analog of the mega kernel's NVLink
    # token pulls, sm100_fp8_fp4_mega_moe.cuh:538-559)
    recv_x = jax.lax.all_to_all(send_x, axis_name, 0, 0, tiled=False)
    recv_w = jax.lax.all_to_all(send_w, axis_name, 0, 0, tiled=False)

    # [E_local, ep*cap, H] per-expert row blocks (invalid rows are zero)
    rows = ep * cap
    a1 = recv_x.transpose(1, 0, 2, 3).reshape(e_local, rows, hidden)
    row_w = recv_w.transpose(1, 0, 2).reshape(e_local, rows)

    gate_up = _expert_gemm(a1, w1, w1_sf, cfg, gemm_cfg=gemm_cfg1)   # [E_local, rows, 2I]
    act_bf16 = swiglu_apply_weight(gate_up, row_w).astype(jnp.bfloat16)
    y_exp = _expert_gemm(act_bf16, w2, w2_sf, cfg, gemm_cfg=gemm_cfg2)  # [E_local, rows, H]

    # Combine: reverse all-to-all, then weighted scatter-add by source pair.
    back = y_exp.reshape(e_local, ep, cap, hidden).transpose(1, 0, 2, 3)
    recv_back = jax.lax.all_to_all(back, axis_name, 0, 0, tiled=False)
    y_pairs = recv_back[rank, local, safe_slot.clip(0, cap - 1)]
    y_pairs = jnp.where(kept[:, None], y_pairs, 0)
    out = jnp.zeros((t_count, hidden), jnp.float32)
    out = out.at[pair_t].add(y_pairs.astype(jnp.float32))
    return out.astype(jnp.bfloat16), num_dropped.reshape(1)


def _expert_gemm(a_bf16: jnp.ndarray, w, w_sf, cfg: MoEConfig,
                 gemm_cfg=None) -> jnp.ndarray:
    """Per-expert GEMM [E, R, K] @ [E, N, K]^T -> [E, R, N] (bf16 out).

    FP8 path: per-token quantize activations, then the batched Pallas scaled
    kernel. XLA path (differentiable): dequantized einsum. An explicit
    ``gemm_cfg`` pins the tile config (k-reduction order), which makes results
    bitwise-stable across different row counts — required by the fused
    (mega) vs unfused bitwise contract.
    """
    e_local, rows, k_dim = a_bf16.shape
    if w_sf is None:
        if cfg.fp8_training:
            # Differentiable FP8 kernel path (training): the contiguous
            # grouped autograd op — forward = FP8 grouped GEMM, dgrad =
            # grouped NT against w^T, wgrad = the k-grouped FP32-accumulate
            # kernel (ops/autograd.py; the reference's wgrad contract,
            # /root/reference/csrc/apis/gemm.hpp:328-390). Equal groups of
            # ``rows`` form the contiguous layout; the wgrad SF compaction
            # needs 128-aligned group starts.
            from ..ops.autograd import fp8_grouped_matmul
            assert rows % 128 == 0, \
                (rows, 'fp8_training needs 128-aligned per-expert row '
                 'blocks (pick capacity so ep * cap % 128 == 0)')
            ids = jnp.repeat(jnp.arange(e_local, dtype=jnp.int32), rows)
            out = fp8_grouped_matmul(
                a_bf16.reshape(e_local * rows, k_dim), w, ids)
            return out.reshape(e_local, rows, -1).astype(jnp.bfloat16)
        if cfg.use_kernels:
            full = jnp.full((e_local,), rows, dtype=jnp.int32)
            return m_grouped_gemm_masked(a_bf16, w, full, out_dtype=jnp.bfloat16,
                                         cfg=gemm_cfg)
        return jnp.einsum('erk,enk->ern', a_bf16.astype(jnp.float32),
                          w.astype(jnp.float32)).astype(jnp.bfloat16)

    if cfg.use_kernels:
        aq, asf = per_token_cast_to_fp8(a_bf16.reshape(-1, k_dim),
                                        use_ue8m0=False)
        aq = aq.reshape(e_local, rows, k_dim)
        asf = asf.reshape(e_local, rows, -1)
        sfb_t = _grouped_sfb_t(w_sf, e_local, w.shape[1], k_dim,
                               (128, 128), b_kmajor=True)
        full = jnp.full((e_local,), rows, dtype=jnp.int32)
        return m_grouped_gemm_masked(aq, w, full, sfa=asf, sfb_t=sfb_t,
                                     out_dtype=jnp.bfloat16, cfg=gemm_cfg)
    # Differentiable reference path: dequantize weights, einsum
    n_dim = w.shape[1]
    sf_full = jnp.repeat(jnp.repeat(w_sf, 128, axis=1)[:, :n_dim],
                         128, axis=2)[:, :, :k_dim]
    w_deq = w.astype(jnp.float32) * sf_full
    return jnp.einsum('erk,enk->ern', a_bf16.astype(jnp.float32),
                      w_deq).astype(jnp.bfloat16)
