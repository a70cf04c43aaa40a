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
