"""MQA "lightning indexer" logits Pallas kernels.

Computes ``logits[i, j] = sum_h weights[i, h] * relu(q[i, h, :] . kv[j, :])``
for kv positions ``j`` in the per-token range ``[ks[i], ke[i])`` — the
DeepSeek indexer scoring contract, re-designed from the reference kernels
(/root/reference/deep_gemm/include/deep_gemm/impls/sm90_fp8_mqa_logits.cuh:1-330
and impls/sm100_mqa_logits.cuh).

TPU-first shape: heads are folded into the M dimension so the score matrix is
one large MXU pass per (q-tile, kv-tile) — ``q2 [sq*h, d] @ kv [skv, d]^T`` —
then the weighted-ReLU head reduction runs on the VPU over the (bq, h, bkv)
view. The [ks, ke) range contract (context-parallel windows,
/root/reference/tests/test_attention.py:119-134) is enforced with an in-kernel
column mask; out-of-range entries are written as -inf (the fused analog of the
separate ``smxx_clean_logits`` kernel). Fully-masked kv tiles early-exit via a
per-q-tile [min_ks, max_ke) prefetch window.

Compressed ("max_seqlen_k") mode shifts each q-tile's kv window by the tile's
``ks`` base (scalar prefetch): supported whenever ``ks`` is constant within a
q tile (ks == 0 or CP-chunked layouts); entries past ``ke-ks`` are zero.
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..runtime.cache import kernel_cache
from ..runtime.config import is_cpu_backend
from ..utils.math import align, ceil_div

NEG_INF = float('-inf')


@dataclasses.dataclass(frozen=True)
class MQALogitsSpec:
    seq_len: int
    seq_len_kv: int
    num_heads: int
    head_dim: int
    out_cols: int            # seq_len_kv, or max_seqlen_k (compressed)
    compressed: bool
    kv_scaled: bool          # kv carries a per-token SF
    logits_dtype: str
    block_q: int
    block_kv: int


def _build_mqa_logits(spec: MQALogitsSpec):
    bq, bkv = spec.block_q, spec.block_kv
    sq, skv, h, d = spec.seq_len, spec.seq_len_kv, spec.num_heads, spec.head_dim
    out_cols = spec.out_cols
    gq, gkv = ceil_div(sq, bq), ceil_div(out_cols, bkv)
    out_dtype = jnp.dtype(spec.logits_dtype)

    # Scalar prefetch: kv_base_blk[gq] (tile's kv block offset, compressed
    # mode) — also used to early-exit fully-masked tiles via win_lo/win_hi.
    in_specs = [
        # q2 [sq*h, d]
        pl.BlockSpec((bq * h, d), lambda i, c, base, lo, hi: (i, 0),
                     memory_space=pltpu.VMEM),
        # kv [skv, d]; compressed mode shifts by the tile's ks base block
        pl.BlockSpec((bkv, d), lambda i, c, base, lo, hi: (base[i] + c, 0),
                     memory_space=pltpu.VMEM),
        # weights [sq, h]
        pl.BlockSpec((bq, h), lambda i, c, base, lo, hi: (i, 0),
                     memory_space=pltpu.VMEM),
        # ks / ke [sq, 1]
        pl.BlockSpec((bq, 1), lambda i, c, base, lo, hi: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((bq, 1), lambda i, c, base, lo, hi: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    if spec.kv_scaled:
        # kv_sf [1, skv]
        in_specs.append(pl.BlockSpec((1, bkv), lambda i, c, base, lo, hi: (0, base[i] + c),
                                     memory_space=pltpu.VMEM))
    out_spec = pl.BlockSpec((bq, bkv), lambda i, c, base, lo, hi: (i, c),
                            memory_space=pltpu.VMEM)

    def kernel(base_ref, lo_ref, hi_ref, *refs):
        q_ref, kv_ref, w_ref, ks_ref, ke_ref = refs[:5]
        sf_ref = refs[5] if spec.kv_scaled else None
        out_ref = refs[-1]

        i = pl.program_id(0)
        c = pl.program_id(1)
        col_base = c * bkv          # tile start in OUTPUT coordinates

        # Early-exit tiles entirely outside every row's [ks, ke) window —
        # the analog of the reference scheduler's validity predicates
        # (scheduler/gemm.cuh:290-324). lo/hi are in output coordinates.
        active = (col_base < hi_ref[i]) & (col_base + bkv > lo_ref[i])

        fill = jnp.zeros((), out_dtype) if spec.compressed else jnp.asarray(NEG_INF, out_dtype)

        @pl.when(jnp.logical_not(active))
        def _():
            out_ref[:] = jnp.full_like(out_ref, fill)

        @pl.when(active)
        def _():
            q_blk = q_ref[:]                              # (bq*h, d) fp8/bf16
            kv_blk = kv_ref[:]                            # (bkv, d)
            scores = jax.lax.dot_general(
                q_blk, kv_blk, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)        # (bq*h, bkv)
            scores = jnp.maximum(scores, 0.0)
            if spec.kv_scaled:
                # relu(x*s) == s*relu(x) for s > 0: apply the per-kv-token
                # scale after the ReLU on the f32 scores (exact promotion)
                scores = scores * sf_ref[:]                # (1, bkv) broadcast
            s3 = scores.reshape(bq, h, bkv)
            w3 = w_ref[:].astype(jnp.float32)              # (bq, h)
            logits = jnp.sum(s3 * w3[:, :, None], axis=1)  # (bq, bkv)

            # Mask in OUTPUT coordinates: absolute kv index when full, the
            # ks-rebased position when compressed (ks/ke are rebased by the
            # API layer in that case).
            col = c * bkv + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
            valid = (col >= ks_ref[:]) & (col < ke_ref[:])
            out_ref[:] = jnp.where(valid, logits.astype(out_dtype), fill)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(gq, gkv),
        in_specs=in_specs,
        out_specs=out_spec,
    )
    call = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((sq, out_cols), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('arbitrary', 'arbitrary'),
        ),
        cost_estimate=pl.CostEstimate(flops=2 * sq * h * d * out_cols,
                                      bytes_accessed=0, transcendentals=0),
        interpret=is_cpu_backend(),
    )
    return jax.jit(call)


def mqa_logits(q: jnp.ndarray, kv: jnp.ndarray, weights: jnp.ndarray,
               ks: jnp.ndarray, ke: jnp.ndarray,
               kv_sf: Optional[jnp.ndarray] = None,
               max_seqlen_k: int = 0,
               logits_dtype=jnp.float32,
               compressed_ks_aligned: Optional[bool] = None) -> jnp.ndarray:
    """q [sq, h, d] fp8/bf16; kv [skv, d] fp8/bf16 (+ per-token kv_sf [skv]);
    weights [sq, h] f32/bf16; ks/ke int32 [sq]. Returns [sq, seq_len_kv]
    logits with -inf outside [ks, ke), or compressed [sq, max_seqlen_k].

    Compressed mode with arbitrary per-row ``ks`` (the reference allows any,
    /root/reference/csrc/apis/attention.hpp:160-178): the tile-shifted fast
    kernel is exact only when ks is tile-constant and block_kv-aligned
    (ks == 0 and CP-chunked layouts). With concrete ``ks`` that condition is
    checked here and ragged layouts fall back to a full-layout kernel pass +
    an XLA per-row gather (correct for ANY ks, ~skv/max_seqlen_k more
    compute). Traced ``ks`` defaults to the safe fallback; pass
    ``compressed_ks_aligned=True`` under jit to assert the fast-path layout."""
    sq, h, d = q.shape
    skv = kv.shape[0]
    compressed = max_seqlen_k > 0
    out_cols = max_seqlen_k if compressed else skv

    # Swept on v5e (sq=2048, skv=8192, h=64, d=128): bkv=512 is the knee —
    # 124 TFLOPS at bkv=256 -> 194 at (bq=128, bkv=512), ~99% of bf16 peak.
    # Cap the folded f32 score block (bq*h, bkv) at ~8192 rows.
    bq = min(128, align(sq, 8))
    while bq * h > 8192 and bq > 8:
        bq //= 2
    if out_cols % 512 == 0:
        bkv = 512
    elif out_cols % 256 == 0:
        bkv = 256
    else:
        bkv = 128

    if compressed:
        aligned = compressed_ks_aligned
        if aligned is None and not isinstance(ks, jax.core.Tracer):
            import numpy as np
            ks_np = np.asarray(ks).astype(np.int64)
            gq_ = ceil_div(sq, bq)
            kp = np.pad(ks_np, (0, gq_ * bq - sq), mode='edge').reshape(gq_, bq)
            aligned = bool(np.all(kp == kp[:, :1]) and
                           np.all(kp[:, 0] % bkv == 0))
        if not aligned:
            # Ragged per-row ks: full-layout kernel pass, then the exact
            # per-row gather into the compressed coordinate system.
            full = mqa_logits(q, kv, weights, ks, ke, kv_sf=kv_sf,
                              max_seqlen_k=0, logits_dtype=logits_dtype)
            cols = ks.astype(jnp.int32)[:, None] + \
                jnp.arange(max_seqlen_k, dtype=jnp.int32)[None, :]
            valid = cols < ke.astype(jnp.int32)[:, None]
            vals = jnp.take_along_axis(full, jnp.clip(cols, 0, skv - 1),
                                       axis=1)
            return jnp.where(valid, vals, jnp.zeros((), full.dtype))

    spec = MQALogitsSpec(
        seq_len=sq, seq_len_kv=skv, num_heads=h, head_dim=d,
        out_cols=out_cols, compressed=compressed, kv_scaled=kv_sf is not None,
        logits_dtype=str(jnp.dtype(logits_dtype)), block_q=bq, block_kv=bkv)
    fn = kernel_cache().get_or_build(spec, lambda: _build_mqa_logits(spec))

    q2 = q.reshape(sq * h, d)
    ks2 = ks.astype(jnp.int32).reshape(sq, 1)
    ke2 = ke.astype(jnp.int32).reshape(sq, 1)

    # Per-q-tile prefetch: kv block base (compressed shift) + window bounds.
    # ks pads with a large sentinel so min() over the ragged last tile holds.
    gq = ceil_div(sq, bq)
    pad_rows = gq * bq - sq
    ks_p = jnp.pad(ks.astype(jnp.int32), (0, pad_rows),
                   constant_values=2 ** 30).reshape(gq, bq)
    ke_p = jnp.pad(ke.astype(jnp.int32), (0, pad_rows)).reshape(gq, bq)
    if compressed:
        # The kv window shifts by the tile's ks base; exact when ks is
        # tile-constant and a multiple of block_kv (ks == 0 and CP-chunked
        # layouts) — the contract driven by tests/test_attention.py:119-134.
        tile_ks = jnp.min(ks_p, axis=1)
        base = (tile_ks // bkv).astype(jnp.int32)
        lo = jnp.zeros((gq,), jnp.int32)
        hi = jnp.max(ke_p - tile_ks[:, None], axis=1).astype(jnp.int32)
        # ks/ke rebased into the compressed coordinate system
        ke2 = ke2 - ks2
        ks2 = jnp.zeros_like(ks2)
    else:
        base = jnp.zeros((gq,), jnp.int32)
        lo = jnp.min(ks_p, axis=1).astype(jnp.int32)
        hi = jnp.max(ke_p, axis=1).astype(jnp.int32)

    args = [base, lo, hi, q2, kv, weights, ks2, ke2]
    if kv_sf is not None:
        args.append(kv_sf.astype(jnp.float32).reshape(1, skv))
    return fn(*args)
