"""Dense GEMM Pallas kernels (BF16 and FP8 block-scaled).

TPU-native re-design of the reference dense kernels:
  * BF16 "NoSF" kernel (/root/reference/deep_gemm/include/deep_gemm/impls/sm90_bf16_gemm.cuh)
  * FP8 1D2D / 1D1D scaled kernels with two scale-application strategies:
      - 'promote': f32 promotion epilogue ``final += (sfa*sfb) * partial`` per
        scale-granularity k-block — exact reference numerics
        (/root/reference/deep_gemm/include/deep_gemm/impls/sm90_fp8_gemm_1d2d.cuh:332-347),
        but VPU-bound on TPU (2*m*n*k/128 vector FLOPs).
      - 'dequant': fold the scales into the bf16 operands and run one
        full-depth MXU pass per k step. Mathematically identical
        ((a_s*u_s) @ (b_s*v_s)^T == (a_s @ b_s^T) * u_s v_s^T) and BIT-exact
        whenever the scales are powers of two (UE8M0 recipes — the SM100
        reference path), since scaling is then a pure exponent shift on bf16.
        ~4-5x faster on TPU; the API layer selects it for UE8M0 scales.

Design notes (TPU-first):
  * One persistent f32 accumulator block in VMEM scratch; grid (gm, gn, gk)
    with k innermost so the accumulator is revisited without HBM round-trips
    (the Pallas analog of the reference's persistent-kernel k-loop pipeline).
  * All four NT/NN/TN/TT layouts are handled with BlockSpec index maps +
    dot_general dimension numbers — no operand is ever materially transposed.
  * FP8 operands are upcast e4m3->bf16 in-register (exact) and fed to the MXU
    with f32 accumulation, so per-k-block partial products are bit-exact.
  * SF tensors are consumed in a strategy/major-dependent "required layout"
    (the analog of ``transform_sf_into_required_layout``,
    /root/reference/csrc/apis/layout.hpp:14-61):
      - promote: sfa [m, ksf] (m-major), sfb [ksf, n] (k-major)
      - dequant: each SF follows its operand's orientation so the in-kernel
        scale expansion is a broadcast repeat along the operand's k axis.
"""

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..heuristics.configs import GemmConfig, get_gemm_config
from ..runtime.cache import kernel_cache
from ..runtime.config import is_cpu_backend
from ..utils.math import ceil_div
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
    is_scaled: bool
    gran_k_a: int
    gran_k_b: int
    cfg: GemmConfig


def _sf_spec(kmajor_like_operand: bool, n_sf: int, bdim: int, idx_pos: int):
    """BlockSpec for an SF tensor: [dim, n_sf] blocked (bdim, n_sf) when the
    operand is k-major, else [n_sf, dim] blocked (n_sf, bdim)."""
    if kmajor_like_operand:
        if idx_pos == 0:
            return pl.BlockSpec((bdim, n_sf), lambda i, j, s: (i, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((bdim, n_sf), lambda i, j, s: (j, 0),
                            memory_space=pltpu.VMEM)
    if idx_pos == 0:
        return pl.BlockSpec((n_sf, bdim), lambda i, j, s: (0, i),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((n_sf, bdim), lambda i, j, s: (0, j),
                        memory_space=pltpu.VMEM)


def _select_and_expand(sf_blk, operand_kmajor: bool, n_sf: int, nsub: int,
                       first, gran: int, bk: int):
    """Pick this k-step's scale entries and expand to the operand block's
    shape: (bdim, bk) for a k-major operand, (bk, bdim) otherwise."""
    if operand_kmajor:
        sel = onehot_cols(sf_blk, n_sf, nsub, first)      # (bdim, nsub)
        return jnp.repeat(sel, gran, axis=1)              # (bdim, bk)
    sel = onehot_rows(sf_blk, n_sf, nsub, first)          # (nsub, bdim)
    return jnp.repeat(sel, gran, axis=0)                  # (bk, bdim)


def _build_dense_gemm(spec: DenseGemmSpec):
    cfg = spec.cfg
    bm, bn, bk = cfg.block_m, cfg.block_n, cfg.block_k
    m, n, k = spec.m, spec.n, spec.k
    gm, gn, gk = ceil_div(m, bm), ceil_div(n, bn), ceil_div(k, bk)
    out_dtype = jnp.dtype(spec.out_dtype)
    is_scaled = spec.is_scaled
    dequant = cfg.scale_strategy == 'dequant'
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
        # SF blocks keep the k (scale) dim whole; the kernel selects this
        # k-step's entries with one-hot matmuls (Mosaic forbids unaligned
        # dynamic lane slicing). Out-of-range selections are 0, which also
        # implements the k-tail for free.
        sfa_kmaj = spec.a_kmajor if dequant else True
        sfb_kmaj = spec.b_kmajor if dequant else False
        in_specs.append(_sf_spec(sfa_kmaj, n_sf_a, bm, idx_pos=0))
        in_specs.append(_sf_spec(sfb_kmaj, n_sf_b, bn, idx_pos=1))

    if spec.accumulate:
        in_specs.append(pl.BlockSpec((bm, bn), lambda i, j, s: (i, j),
                                     memory_space=pltpu.VMEM))

    out_spec = pl.BlockSpec((bm, bn), lambda i, j, s: (i, j), memory_space=pltpu.VMEM)

    # ---- Kernel body -------------------------------------------------------
    def kernel(*refs):
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

        nsub_a, nsub_b = bk // gka, bk // gkb
        if not is_scaled:
            acc_ref[:] += dot_mn(a_blk, b_blk, spec.a_kmajor, spec.b_kmajor)
        elif dequant:
            sfa_exp = _select_and_expand(sfa_ref[:], spec.a_kmajor, n_sf_a,
                                         nsub_a, ki * nsub_a, gka, bk)
            sfb_exp = _select_and_expand(sfb_ref[:], spec.b_kmajor, n_sf_b,
                                         nsub_b, ki * nsub_b, gkb, bk)
            a_s = a_blk.astype(jnp.bfloat16) * sfa_exp.astype(jnp.bfloat16)
            b_s = b_blk.astype(jnp.bfloat16) * sfb_exp.astype(jnp.bfloat16)
            acc_ref[:] += dot_mn(a_s, b_s, spec.a_kmajor, spec.b_kmajor)
        else:
            # Promotion loop over scale-granularity sub-blocks
            # (reference: sm90_fp8_gemm_1d2d.cuh:332-347). FP8 operands feed
            # the MXU directly (Mosaic handles e4m3 natively; bit-identical
            # to an explicit bf16 upcast and ~4x faster on v5e).
            gsub = min(gka, gkb)
            sfa_sel = onehot_cols(sfa_ref[:], n_sf_a, nsub_a, ki * nsub_a)  # (bm, nsub_a)
            sfb_sel = onehot_rows(sfb_ref[:], n_sf_b, nsub_b, ki * nsub_b)  # (nsub_b, bn)
            for s in range(bk // gsub):
                a_s = k_slice(a_blk, spec.a_kmajor, s * gsub, gsub)
                b_s = k_slice(b_blk, spec.b_kmajor, s * gsub, gsub)
                p = dot_mn(a_s, b_s, spec.a_kmajor, spec.b_kmajor)
                sa = s * gsub // gka
                sb = s * gsub // gkb
                # two broadcast multiplies (row, then column FMA) instead of
                # materializing the outer-product scale matrix
                acc_ref[:] += (p * sfb_sel[sb:sb + 1, :]) * sfa_sel[:, sa:sa + 1]

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


def required_sf_orientation(strategy: str, a_kmajor: bool, b_kmajor: bool):
    """(sfa_kmajor_like, sfb_kmajor_like): whether each SF is consumed
    [dim, ksf] (True) or [ksf, dim] (False)."""
    if strategy == 'dequant':
        return a_kmajor, b_kmajor
    return True, False


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
               scale_strategy: str = 'promote',
               cfg: Optional[GemmConfig] = None) -> jnp.ndarray:
    """d[m, n] (+= c) = a @ b^T with optional block-scale dequant.

    ``a`` is [m, k] (k-major) or [k, m]; ``b`` is [n, k] (k-major, NT) or
    [k, n]. SFs must be pre-oriented per :func:`required_sf_orientation`
    (handled by the ops layer)."""
    m = a.shape[1] if not a_kmajor else a.shape[0]
    k = a.shape[0] if not a_kmajor else a.shape[1]
    n = b.shape[0] if b_kmajor else b.shape[1]
    is_scaled = sfa is not None

    if cfg is None:
        cfg = get_gemm_config(m, n, k, a.dtype, b.dtype, out_dtype,
                              gran_k=min(gran_k_a, gran_k_b) if is_scaled else 128,
                              scale_strategy=scale_strategy if is_scaled else None)
    spec = DenseGemmSpec(
        m=m, n=n, k=k, a_kmajor=a_kmajor, b_kmajor=b_kmajor,
        a_dtype=str(a.dtype), b_dtype=str(b.dtype), out_dtype=str(jnp.dtype(out_dtype)),
        accumulate=c is not None, is_scaled=is_scaled,
        gran_k_a=gran_k_a, gran_k_b=gran_k_b, cfg=cfg)
    fn = kernel_cache().get_or_build(spec, lambda: _build_dense_gemm(spec))

    args = [a, b]
    if is_scaled:
        args += [sfa, sfb_t]
    if c is not None:
        args.append(c)
    return fn(*args)
