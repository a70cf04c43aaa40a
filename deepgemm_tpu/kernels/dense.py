"""Dense GEMM Pallas kernels (BF16 and FP8 block-scaled).

TPU-native re-design of the reference dense kernels:
  * BF16 "NoSF" kernel (/root/reference/deep_gemm/include/deep_gemm/impls/sm90_bf16_gemm.cuh)
  * FP8 1D2D / 1D1D scaled kernels with the f32 "promotion" epilogue
    ``final += (sfa * sfb) * partial`` applied per scale-granularity k-block
    (/root/reference/deep_gemm/include/deep_gemm/impls/sm90_fp8_gemm_1d2d.cuh:332-347).

Design notes (TPU-first):
  * One persistent f32 accumulator block in VMEM scratch; grid (gm, gn, gk)
    with k innermost so the accumulator is revisited without HBM round-trips
    (the Pallas analog of the reference's persistent-kernel k-loop pipeline).
  * All four NT/NN/TN/TT layouts are handled with BlockSpec index maps +
    dot_general dimension numbers — no operand is ever materially transposed.
  * FP8 operands are upcast e4m3->bf16 in-register (exact) and fed to the MXU
    with f32 accumulation, so per-k-block partial products are bit-exact; the
    scale promotion then matches the reference numerics.
  * The scale tensor for B is consumed K-major (``sfb_t``): the API layer
    transposes it once (tiny) — the analog of
    ``transform_sf_into_required_layout`` (/root/reference/csrc/apis/layout.hpp:14-61).
"""

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..heuristics.configs import GemmConfig, get_gemm_config
from ..runtime.cache import kernel_cache
from ..runtime.config import is_cpu_backend
from ..utils.math import align, ceil_div
from .common import dot_mn, k_slice, onehot_cols, onehot_rows, mask_k_tail


@dataclasses.dataclass(frozen=True)
class DenseGemmSpec:
    """Static kernel specialization key (analog of GemmDesc + compiled_dims,
    /root/reference/csrc/jit_kernels/heuristics/config.hpp:12-56)."""
    m: int
    n: int
    k: int
    a_kmajor: bool
    b_kmajor: bool
    a_dtype: str
    b_dtype: str
    out_dtype: str
    accumulate: bool
    # None (bf16), 'pertoken' (1 x gran), or 'perblock' (gran x gran) for B;
    # A is always 'pertoken' when scaled.
    sf_kind_b: Optional[str]
    gran_k_a: int
    gran_k_b: int
    cfg: GemmConfig



def _build_dense_gemm(spec: DenseGemmSpec):
    cfg = spec.cfg
    bm, bn, bk = cfg.block_m, cfg.block_n, cfg.block_k
    m, n, k = spec.m, spec.n, spec.k
    gm, gn, gk = ceil_div(m, bm), ceil_div(n, bn), ceil_div(k, bk)
    a_dtype = jnp.dtype(spec.a_dtype)
    out_dtype = jnp.dtype(spec.out_dtype)
    is_scaled = spec.sf_kind_b is not None
    gka, gkb = spec.gran_k_a, spec.gran_k_b
    has_k_tail = (k % bk) != 0
    n_sf_a = ceil_div(k, gka)
    n_sf_b = ceil_div(k, gkb)

    # ---- Block specs -------------------------------------------------------
    a_spec = (pl.BlockSpec((bm, bk), lambda i, j, s: (i, s), memory_space=pltpu.VMEM)
              if spec.a_kmajor else
              pl.BlockSpec((bk, bm), lambda i, j, s: (s, i), memory_space=pltpu.VMEM))
    b_spec = (pl.BlockSpec((bn, bk), lambda i, j, s: (j, s), memory_space=pltpu.VMEM)
              if spec.b_kmajor else
              pl.BlockSpec((bk, bn), lambda i, j, s: (s, j), memory_space=pltpu.VMEM))
    in_specs = [a_spec, b_spec]

    if is_scaled:
        # SF blocks keep the k (scale) dim whole so lane/sublane tiling
        # constraints are met; the kernel selects the active scale entries
        # per k-step with one-hot matmuls (no dynamic lane slicing, which
        # Mosaic requires to be 128-aligned).
        # sfa: [m, ceil(k/gka)] f32, m-major
        in_specs.append(pl.BlockSpec((bm, n_sf_a), lambda i, j, s: (i, 0),
                                     memory_space=pltpu.VMEM))
        # sfb_t: [ceil(k/gkb), n] f32 — per-token rows (perblock SF is
        # broadcast to rows by the API layer, the analog of the reference's
        # 128x128 -> 1x128 row index_select, csrc/apis/layout.hpp:49-53)
        in_specs.append(pl.BlockSpec((n_sf_b, bn), lambda i, j, s: (0, j),
                                     memory_space=pltpu.VMEM))

    if spec.accumulate:
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, s: (i, j),
                                     memory_space=pltpu.VMEM))

    out_spec = pl.BlockSpec((bm, bn), lambda i, j, s: (i, j), memory_space=pltpu.VMEM)

    # ---- Kernel body -------------------------------------------------------
    def kernel(*refs):
        idx = 0
        a_ref, b_ref = refs[0], refs[1]
        idx = 2
        if is_scaled:
            sfa_ref, sfb_ref = refs[idx], refs[idx + 1]
            idx += 2
        c_ref = refs[idx] if spec.accumulate else None
        d_ref = refs[-2]
        acc_ref = refs[-1]

        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _():
            acc_ref[:] = jnp.zeros_like(acc_ref)

        a_blk = a_ref[:]
        b_blk = b_ref[:]
        if has_k_tail:
            # Zero out-of-range k columns in the (padded) final block so they
            # contribute nothing to the accumulation.
            a_blk = mask_k_tail(a_blk, spec.a_kmajor, ki * bk, k)
            b_blk = mask_k_tail(b_blk, spec.b_kmajor, ki * bk, k)

        if not is_scaled:
            acc_ref[:] += dot_mn(a_blk, b_blk, spec.a_kmajor, spec.b_kmajor)
        else:
            a_blk = a_blk.astype(jnp.bfloat16)   # e4m3 -> bf16 is exact
            b_blk = b_blk.astype(jnp.bfloat16)
            # Promotion loop over scale-granularity sub-blocks
            # (reference: sm90_fp8_gemm_1d2d.cuh:332-347).
            gsub = min(gka, gkb)
            nsub_a, nsub_b = bk // gka, bk // gkb
            # Gather this k-block's scale columns/rows with one-hot matmuls:
            # out-of-range sub-blocks (k tail) select nothing -> scale 0.
            sfa_sel = onehot_cols(sfa_ref[:], n_sf_a, nsub_a, ki * nsub_a)  # (bm, nsub_a)
            sfb_sel = onehot_rows(sfb_ref[:], n_sf_b, nsub_b, ki * nsub_b)  # (nsub_b, bn)
            for s in range(bk // gsub):
                a_s = k_slice(a_blk, spec.a_kmajor, s * gsub, gsub)
                b_s = k_slice(b_blk, spec.b_kmajor, s * gsub, gsub)
                p = dot_mn(a_s, b_s, spec.a_kmajor, spec.b_kmajor)
                sa = s * gsub // gka
                sb = s * gsub // gkb
                scale = sfa_sel[:, sa:sa + 1] * sfb_sel[sb:sb + 1, :]  # (bm, bn)
                acc_ref[:] += p * scale

        @pl.when(ki == gk - 1)
        def _():
            res = acc_ref[:]
            if spec.accumulate:
                res = res + c_ref[:].astype(jnp.float32)
            d_ref[:] = res.astype(out_dtype)

    flops = 2 * m * n * k
    call = pl.pallas_call(
        kernel,
        grid=(gm, gn, gk),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'parallel', 'arbitrary'),
        ),
        cost_estimate=pl.CostEstimate(flops=flops, bytes_accessed=0, transcendentals=0),
        interpret=is_cpu_backend(),
    )
    return jax.jit(call)


def dense_gemm(a: jnp.ndarray, b: jnp.ndarray,
               sfa: Optional[jnp.ndarray] = None,
               sfb_t: Optional[jnp.ndarray] = None,
               c: Optional[jnp.ndarray] = None,
               *,
               a_kmajor: bool = True,
               b_kmajor: bool = True,
               sf_kind_b: Optional[str] = None,
               gran_k_a: int = 128,
               gran_k_b: int = 128,
               out_dtype=jnp.bfloat16,
               cfg: Optional[GemmConfig] = None) -> jnp.ndarray:
    """d[m, n] (+= c) = a @ b^T with optional block-scale dequant promotion.

    ``a`` is [m, k] (k-major) or [k, m]; ``b`` is [n, k] (k-major, the NT
    layout) or [k, n]. ``sfa`` is [m, ceil(k/gran_k_a)]; ``sfb_t`` is K-major:
    [ceil(k/gran_k_b), ceil(n/gran_k_b)] ('perblock') or [ceil(k/gran_k_b), n]
    ('pertoken').
    """
    m = a.shape[1] if not a_kmajor else a.shape[0]
    k = a.shape[0] if not a_kmajor else a.shape[1]
    n = b.shape[0] if b_kmajor else b.shape[1]

    if cfg is None:
        cfg = get_gemm_config(m, n, k, a.dtype, b.dtype, out_dtype,
                              gran_k=min(gran_k_a, gran_k_b) if sf_kind_b else 128)
    spec = DenseGemmSpec(
        m=m, n=n, k=k, a_kmajor=a_kmajor, b_kmajor=b_kmajor,
        a_dtype=str(a.dtype), b_dtype=str(b.dtype), out_dtype=str(jnp.dtype(out_dtype)),
        accumulate=c is not None, sf_kind_b=sf_kind_b,
        gran_k_a=gran_k_a, gran_k_b=gran_k_b, cfg=cfg)
    fn = kernel_cache().get_or_build(spec, lambda: _build_dense_gemm(spec))

    args = [a, b]
    if sf_kind_b is not None:
        args += [sfa, sfb_t]
    if c is not None:
        args.append(c)
    return fn(*args)
