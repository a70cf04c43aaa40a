"""Fused post-gather sparse attention (serving decode, r5).

The lightning-indexer serving step ends with exact attention over the
top-k-selected cache rows: ``k_sel/v_sel [rows, topk, h, d]`` (already made
contiguous by one XLA gather — per-token Pallas DMAs would be issue-bound:
512+ 2 KB copies per row at the measured ~14 ns/DMA issue cost) followed by
score/softmax/weighted-sum. As plain XLA ops the gather becomes the fusion
root and every intermediate — f32 scores, probs, the [rows, topk, h, d]
f32 product — round-trips HBM (~134 MB at the serving shape, measured
~790 us, scripts/measure_serving_donate.py). This kernel fuses the whole
post-gather chain into one Pallas program: each grid step streams one
row's K/V blocks through VMEM and nothing else touches HBM, so the floor
is the one unavoidable K/V read (~165 us at the serving shape).

The reference leaves this consumer to its serving stack (the kernels end
at the logits: /root/reference/csrc/apis/attention.hpp:119-199); on TPU we
own it because the XLA lowering is the measured bottleneck of the decode
step.

Numerics: f32 scores/softmax/accumulation (matches the XLA path's
``preferred_element_type`` chain); masked positions contribute exactly 0
(additive -inf bias). Rows whose mask is ALL-False return 0 (the XLA path
returns NaN there; the serving engine only reads active slots, and 0 is
the safer contract). VPU-only by design — the per-head score is a matvec
(topk x d), too narrow to earn an MXU pass; the kernel is K/V-stream
bound, not FLOP bound.
"""

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..runtime.cache import kernel_cache
from ..runtime.config import is_cpu_backend, get_env
from ..utils.math import ceil_div

NEG_INF = float('-inf')

# VMEM working-set budget for one grid step (bf16 K/V blocks + their f32
# casts + the f32 probs*V product + double-buffered input windows), kept
# well under the 12.5 MiB heuristics ceiling.
_VMEM_BUDGET = 10 * 2 ** 20


@dataclasses.dataclass(frozen=True)
class SparseAttnSpec:
    rows: int
    topk: int
    num_heads: int
    head_dim: int
    block_rows: int
    q_dtype: str
    # MXU variant (r5b): both per-head contractions run as ONE dense dot
    # each via a block-diagonal q / diagonal-block extraction — scores =
    # k2(t, h*d) @ q_bd(h*d, 128) and out = p(h, t) @ v2(t, h*d) with the
    # cross-head terms exactly zero / discarded. Kills the in-kernel f32
    # casts of K/V and the two big VPU reduce passes; the dots are tiny
    # (4.2 MFLOP/row at the serving shape) on an otherwise-idle MXU.
    mxu: bool = False


def _block_rows(rows: int, topk: int, h: int, d: int) -> int:
    # ONE row per grid step, always: batching rows would make every
    # reduction a 3D middle-dim multi_reduction with a leading unit dim,
    # which the device Mosaic rejects ("Unsupported output implicit
    # dimension" — hit on the relay at (1, 512, 8) -> (1, 8), 2026-08-20).
    # The single-row body keeps every reduce a plain 2D/3D->2D form. The
    # per-step work at small topk is small, but so are those calls.
    return 1


def _build(spec: SparseAttnSpec, scale: float):
    br, t, h, d = spec.block_rows, spec.topk, spec.num_heads, spec.head_dim
    grid = (ceil_div(spec.rows, br),)

    # One row per step; Mosaic reduction rules (device compiler, probed via
    # chipless AOT + the relay, 2026-08-20): minor-dim (lane) keepdims
    # reductions of 2D arrays and 3D->2D reductions with fully-real output
    # dims lower fine; SUBLANE-dim reductions of 2D arrays do NOT
    # ("Unsupported output implicit dimension" — the (512, 8) -> (8,)
    # softmax max/sum). So the softmax runs in the (h, t) orientation
    # (reduce over LANES), with two small f32 (t, h)<->(h, t) transposes —
    # the same per-tile transpose the swap-AB kernels compile on device.
    def kernel(q_ref, k_ref, v_ref, bias_ref, out_ref):
        q = q_ref[0].astype(jnp.float32)                     # (h, d)
        k = k_ref[0].astype(jnp.float32)                     # (t, h, d)
        # scores[t, h] = sum_d q[h, d] * k[t, h, d]
        s_th = jnp.sum(k * q[None], axis=2)                  # (t, h)
        s = s_th.T * scale + bias_ref[0]                     # (h, t); 0/-inf
        m = jnp.max(s, axis=1, keepdims=True)                # (h, 1)
        m_safe = jnp.maximum(m, -3.0e38)                     # all-masked row
        p = jnp.exp(s - m_safe)                              # masked -> 0
        den = jnp.sum(p, axis=1, keepdims=True)              # (h, 1)
        p = p / jnp.where(den > 0, den, 1.0)                 # (h, t)
        v = v_ref[0].astype(jnp.float32)                     # (t, h, d)
        o = jnp.sum(p.T[:, :, None] * v, axis=0)             # (h, d)
        out_ref[0] = o.astype(out_ref.dtype)

    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((br, h, d), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, t, h, d), lambda r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, t, h, d), lambda r: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((br, h, t), lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((br, h, d), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((spec.rows, h, d),
                                       jnp.dtype(spec.q_dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * spec.rows * t * h * d, bytes_accessed=0,
            transcendentals=spec.rows * t * h),
        interpret=is_cpu_backend(),
    )
    return jax.jit(call)


def fused_eligible(topk: int, num_heads: int, head_dim: int) -> bool:
    """Hardware lane/VMEM contract for the fused path (Mosaic): the minor
    dim rides lanes (d % 128), topk rides sublanes (t % 8), and one row's
    working set must fit the VMEM budget."""
    return (head_dim % 128 == 0 and topk % 8 == 0 and
            topk * num_heads * head_dim * 16 <= _VMEM_BUDGET)


def gathered_attention(q: jnp.ndarray, k_sel: jnp.ndarray,
                       v_sel: jnp.ndarray, valid: jnp.ndarray,
                       scale: float,
                       out_dtype=None) -> jnp.ndarray:
    """Fused attention over gathered rows.

    q [rows, h, d]; k_sel/v_sel [rows, topk, h, d] (any float dtype, cast
    to f32 in VMEM); valid [rows, topk] bool. Returns [rows, h, d] in
    ``out_dtype`` (default: q's dtype). All-masked rows return 0.
    """
    rows, h, d = q.shape
    t = k_sel.shape[1]
    out_dtype = jnp.dtype(out_dtype or q.dtype)
    spec = SparseAttnSpec(rows=rows, topk=t, num_heads=h, head_dim=d,
                          block_rows=_block_rows(rows, t, h, d),
                          q_dtype=str(out_dtype))
    fn = kernel_cache().get_or_build(
        (spec, float(scale)),
        functools.partial(_build, spec, float(scale)))
    # additive mask bias, pre-broadcast to (rows, h, topk) on the host (the
    # kernel's lane-major softmax orientation — no in-kernel relayout of
    # the mask; tiny: ~1 MB f32 at the serving shape)
    bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
    bias = jnp.broadcast_to(bias[:, None, :], (rows, h, t))
    return fn(q, k_sel, v_sel, bias)


@dataclasses.dataclass(frozen=True)
class PagedSparseAttnSpec:
    rows: int
    topk: int
    num_heads: int
    head_dim: int
    chunk: int           # tokens per staged chunk (divides topk)
    kv_dtype: str
    q_dtype: str


def _build_paged(spec: PagedSparseAttnSpec, scale: float):
    """GATHER-FUSED sparse attention: the serving decode step is
    gather-bound (the XLA token gather moves the 134 MB of selected K/V
    rows at the platform gather rate, ~79 GB/s = 2x846 us at the serving
    shape, and the attention tail rides in its shadow — measured
    2026-08-20, scripts/measure_serving_donate.py attn). This kernel
    replaces gather+attention entirely: the K/V caches stay in HBM
    (pl.ANY) and each grid step streams its row's selected tokens through
    VMEM with manual per-token async copies (2 KB each), double-buffered
    in chunks under an online-softmax accumulation — the zero-copy paged
    decode pattern (kernels/paged_mqa.py) with DATA-dependent indices
    (the top-k selection, read from SMEM). Projected floor is the
    per-DMA issue cost (~13.8 ns measured via scripts/zc_roofline.py):
    2*topk DMAs/row -> ~0.9 ms vs 1.7 ms for the XLA gathers at the
    serving shape."""
    b_sz, t, h, d = spec.rows, spec.topk, spec.num_heads, spec.head_dim
    C = spec.chunk
    n_chunks = t // C
    SLOTS = 2
    kv_dt = jnp.dtype(spec.kv_dtype)

    in_specs = [
        # tok rides FLAT [rows*t] as a WHOLE-ARRAY SMEM operand (the
        # zerocopy block-table pattern): 2-D SMEM blocks hit the (8, 128)
        # lane rule and rank-1 *blocked* SMEM hits tiling-layout rules
        pl.BlockSpec((b_sz * t,), lambda b: (0,),
                     memory_space=pltpu.SMEM),                 # tok (clipped)
        pl.BlockSpec((1, h, d), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),                 # q
        pl.BlockSpec((1, h, t), lambda b: (b, 0, 0),
                     memory_space=pltpu.VMEM),                 # bias 0/-inf
        pl.BlockSpec(memory_space=pl.ANY),                     # k rows (HBM)
        pl.BlockSpec(memory_space=pl.ANY),                     # v rows (HBM)
    ]
    out_spec = pl.BlockSpec((1, h, d), lambda b: (b, 0, 0),
                            memory_space=pltpu.VMEM)

    def kernel(tok_ref, q_ref, bias_ref, k_hbm, v_hbm, out_ref,
               k_stage, v_stage, sems):
        b = pl.program_id(0)

        def copy(cc, j, slot, which):
            tk = tok_ref[b * t + cc * C + j]
            hbm, stage = ((k_hbm, k_stage) if which == 0
                          else (v_hbm, v_stage))
            return pltpu.make_async_copy(
                hbm.at[pl.ds(tk, 1)],
                stage.at[slot, pl.ds(j, 1)],
                sems.at[slot, which])

        def issue(cc, slot):
            if cc < n_chunks:
                for j in range(C):
                    copy(cc, j, slot, 0).start()
                    copy(cc, j, slot, 1).start()

        def wait(cc, slot):
            for j in range(C):
                copy(cc, j, slot, 0).wait()
                copy(cc, j, slot, 1).wait()

        q = q_ref[0].astype(jnp.float32)                       # (h, d)
        m_run = jnp.full((h, 1), -3.0e38, jnp.float32)
        den = jnp.zeros((h, 1), jnp.float32)
        acc = jnp.zeros((h, d), jnp.float32)

        issue(0, 0)
        for cc in range(n_chunks):
            slot = cc % SLOTS
            issue(cc + 1, (cc + 1) % SLOTS)   # ride under this chunk's wait+compute
            wait(cc, slot)
            k = k_stage[slot].astype(jnp.float32)              # (C, h, d)
            s_th = jnp.sum(k * q[None], axis=2)                # (C, h)
            s = s_th.T * scale + bias_ref[0][:, cc * C:(cc + 1) * C]
            m_new = jnp.maximum(m_run, jnp.max(s, axis=1, keepdims=True))
            alpha = jnp.exp(m_run - m_new)                     # (h, 1)
            p = jnp.exp(s - m_new)                             # (h, C); masked->0
            den = den * alpha + jnp.sum(p, axis=1, keepdims=True)
            v = v_stage[slot].astype(jnp.float32)              # (C, h, d)
            pv = jnp.sum(p.T[:, :, None] * v, axis=0)          # (h, d)
            acc = acc * alpha + pv
            m_run = m_new
        out_ref[0] = (acc / jnp.where(den > 0, den, 1.0)) \
            .astype(out_ref.dtype)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(b_sz,),
        in_specs=in_specs,
        out_specs=out_spec,
        scratch_shapes=[
            pltpu.VMEM((SLOTS, C, h, d), kv_dt),
            pltpu.VMEM((SLOTS, C, h, d), kv_dt),
            pltpu.SemaphoreType.DMA((SLOTS, 2)),
        ],
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b_sz, h, d), jnp.dtype(spec.q_dtype)),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary',),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b_sz * t * h * d,
            bytes_accessed=2 * b_sz * t * h * d * kv_dt.itemsize,
            transcendentals=b_sz * t * h),
        interpret=is_cpu_backend(),
    )
    return jax.jit(call)


def paged_eligible(topk: int, num_heads: int, head_dim: int) -> bool:
    return head_dim % 128 == 0 and topk % 8 == 0


def _paged_chunk(topk: int) -> int:
    c = min(64, topk)
    while topk % c:
        c //= 2
    return max(c, 1)


def sparse_attention_paged(q: jnp.ndarray, k_rows: jnp.ndarray,
                           v_rows: jnp.ndarray, tok: jnp.ndarray,
                           valid: jnp.ndarray, scale: float,
                           out_dtype=None) -> jnp.ndarray:
    """Gather-fused attention over rows selected from an in-HBM cache.

    q [rows, h, d]; k_rows/v_rows [N, h, d] (flat cache views, any float
    dtype); tok [rows, topk] int32 flat row indices (clipped here; invalid
    entries may point anywhere); valid [rows, topk] bool. Returns
    [rows, h, d]. All-masked rows return 0.
    """
    rows, h, d = q.shape
    t = tok.shape[1]
    out_dtype = jnp.dtype(out_dtype or q.dtype)
    spec = PagedSparseAttnSpec(
        rows=rows, topk=t, num_heads=h, head_dim=d, chunk=_paged_chunk(t),
        kv_dtype=str(k_rows.dtype), q_dtype=str(out_dtype))
    fn = kernel_cache().get_or_build(
        (spec, float(scale)),
        functools.partial(_build_paged, spec, float(scale)))
    bias = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)
    bias = jnp.broadcast_to(bias[:, None, :], (rows, h, t))
    tok = jnp.clip(tok.astype(jnp.int32), 0,
                   k_rows.shape[0] - 1).reshape(rows * t)
    return fn(tok, q, bias, k_rows, v_rows)


def sparse_attn_mode() -> str:
    """'fused' | 'xla' | 'auto' (env pin DGT_SPARSE_ATTN)."""
    return get_env('DGT_SPARSE_ATTN', 'auto')


def use_fused(topk: int, num_heads: int, head_dim: int) -> bool:
    mode = sparse_attn_mode()
    if mode == 'fused':
        return True
    if mode == 'xla':
        return False
    return fused_eligible(topk, num_heads, head_dim)
