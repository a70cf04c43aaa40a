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
from ..utils.math import align, ceil_div
from .common import (dot_mn, k_slice, mask_k_tail, promote_block,
                     promote_block_swapped)


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
    # B is planar-128-packed FP4 (int8, two e2m1 codes per byte): decoded to
    # bf16 IN-KERNEL — 4x less weight HBM traffic than a pre-decoded bf16 B.
    # Measured on v5e: the VPU nibble decode dominates (16 vs 143 TFLOPS at
    # the 128x4096x7168 decode shape), so this is an opt-in for HBM-capacity-
    # bound deployments; the default ops-layer decode runs ONCE at weight
    # load and serves from bf16.
    b_packed_fp4: bool = False
    # Swap-AB kernel body (TPU analog of the reference's mandatory swap-AB
    # m-grouped layouts, /root/reference/csrc/jit_kernels/heuristics/sm100.hpp:31-43):
    # each k-step dot is ``b_blk @ a_blk^T`` so the N/weight side is the MXU
    # LHS (sublane-tall) and the (small or group-pinned) M side rides the
    # lanes; the partial accumulates transposed (bn, bm) and ONE f32
    # transpose at the final k step restores (bm, bn). Same tiles, same
    # BlockSpecs, same HBM traffic — the variant isolates the MXU-pipeline
    # height effect. Bitwise-equal to the plain kernel (see
    # common.promote_block_swapped).
    swap_ab: bool = False


def _sf_spec(kmajor_like_operand: bool, nsub: int, bdim: int, idx_pos: int):
    """BlockSpec delivering this k-step's SF slice from a *stepped* SF array
    (see :func:`sf_to_stepped`): the array is [gk, dim, nsub] (operand
    k-major) or [gk, nsub, dim]; the leading dim indexes the grid k-step, so
    the kernel sees an exact f32 [bdim, nsub] / [nsub, bdim] block — the
    Pallas analog of the reference kernels' per-stage SF smem loads
    (sm90_fp8_gemm_1d2d.cuh:175-206) — while the block's minor dims stay
    whole (the Mosaic lane/sublane divisibility rule)."""
    if kmajor_like_operand:
        if idx_pos == 0:
            return pl.BlockSpec((1, bdim, nsub), lambda i, j, s: (s, i, 0),
                                memory_space=pltpu.VMEM)
        return pl.BlockSpec((1, bdim, nsub), lambda i, j, s: (s, j, 0),
                            memory_space=pltpu.VMEM)
    if idx_pos == 0:
        return pl.BlockSpec((1, nsub, bdim), lambda i, j, s: (s, 0, i),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((1, nsub, bdim), lambda i, j, s: (s, 0, j),
                        memory_space=pltpu.VMEM)


def pad_sf_k(sf: jnp.ndarray, n_sf_padded: int, k_last: bool) -> jnp.ndarray:
    """Pad an SF tensor's k (scale-block) dim to `n_sf_padded` with 1.0 so
    every grid k-step maps to a whole in-bounds SF block."""
    axis = sf.ndim - 1 if k_last else sf.ndim - 2
    pad = n_sf_padded - sf.shape[axis]
    if pad <= 0:
        return sf
    widths = [(0, 0)] * sf.ndim
    widths[axis] = (0, pad)
    return jnp.pad(sf, widths, constant_values=1.0)


def sf_to_stepped(sf: jnp.ndarray, gk: int, nsub: int,
                  k_last: bool) -> jnp.ndarray:
    """Reshape a (k-padded) SF tensor so the grid k-step is the LEADING dim:

      k_last:  [.., dim, gk*nsub] -> [gk, .., dim, nsub]
      else:    [.., gk*nsub, dim] -> [gk, .., nsub, dim]

    This keeps the per-step block's minor dims equal to the array's (Mosaic
    requires minor block dims divisible by the tile or whole)."""
    if k_last:
        r = sf.reshape(*sf.shape[:-1], gk, nsub)
        return jnp.moveaxis(r, -2, 0)
    r = sf.reshape(*sf.shape[:-2], gk, nsub, sf.shape[-1])
    return jnp.moveaxis(r, -3, 0)


def _expand_sf(sf_blk, operand_kmajor: bool, gran: int):
    """Expand a per-k-step SF block to the operand block's shape:
    (bdim, nsub) -> (bdim, bk) for a k-major operand, else transposed."""
    if operand_kmajor:
        return jnp.repeat(sf_blk, gran, axis=1)
    return jnp.repeat(sf_blk, gran, axis=0)


def decode_fp4_planar_block(p_blk, bn: int, bk: int):
    """In-kernel decode of a planar-128-packed FP4 block (bn, bk//2) int8 ->
    (bn, bk) bf16. Nibbles split into two 128-wide lane vectors per 256-code
    group, decoded arithmetically (e2m1: mag = (1 + m/2) * 2^(e-1), subnormal
    m/2), then lane-concatenated — all ops Mosaic can lower (validated on
    v5e; sub-lane interleaves are not)."""
    p = p_blk.astype(jnp.int32)
    lo, hi = p & 0xF, (p >> 4) & 0xF

    def dec(c):
        m = (c & 1).astype(jnp.float32)
        e = ((c >> 1) & 3).astype(jnp.float32)
        s = ((c >> 3) & 1).astype(jnp.float32)
        mag = jnp.where(e == 0, 0.5 * m, (1 + 0.5 * m) * jnp.exp2(e - 1))
        # code 0x8 (-0.0) -> +0.0, matching _dequantize_from_fp4_e2m1
        return jnp.where((s > 0) & ((c & 7) != 0), -mag, mag)

    nk256 = bk // 256
    lo_v = dec(lo).reshape(bn, nk256, 128)
    hi_v = dec(hi).reshape(bn, nk256, 128)
    return jnp.concatenate([lo_v, hi_v], axis=-1).reshape(bn, bk) \
        .astype(jnp.bfloat16)


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
    if spec.b_packed_fp4:
        assert spec.b_kmajor and bk % 256 == 0, (spec.b_kmajor, bk)
        b_spec = pl.BlockSpec((bn, bk // 2), lambda i, j, s: (j, s),
                              memory_space=pltpu.VMEM)
    elif spec.b_kmajor:
        b_spec = pl.BlockSpec((bn, bk), lambda i, j, s: (j, s),
                              memory_space=pltpu.VMEM)
    else:
        b_spec = pl.BlockSpec((bk, bn), lambda i, j, s: (s, j),
                              memory_space=pltpu.VMEM)
    in_specs = [a_spec, b_spec]

    nsub_a, nsub_b = bk // gka, bk // gkb
    if is_scaled:
        # Per-k-step SF blocks via index maps (see _sf_spec). The swap-AB
        # promote kernel consumes TRANSPOSED SF orientations (sfa k-first,
        # sfb dim-major) so its scale selects are natural row/column vectors
        # against the (bn, bm) partial — see promote_block_swapped.
        if spec.swap_ab and not dequant:
            sfa_kmaj, sfb_kmaj = False, True
        else:
            sfa_kmaj = spec.a_kmajor if dequant else True
            sfb_kmaj = spec.b_kmajor if dequant else False
        in_specs.append(_sf_spec(sfa_kmaj, nsub_a, bm, idx_pos=0))
        in_specs.append(_sf_spec(sfb_kmaj, nsub_b, bn, idx_pos=1))

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
        if gk == 1:
            d_ref, acc_ref = refs[-1], None
        else:
            d_ref, acc_ref = refs[-2], refs[-1]

        ki = pl.program_id(2)

        if gk > 1:
            @pl.when(ki == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

        a_blk = a_ref[:]
        b_blk = (decode_fp4_planar_block(b_ref[:], bn, bk)
                 if spec.b_packed_fp4 else b_ref[:])
        if has_k_tail:
            # Zero out-of-range k columns in the (padded) final block so they
            # contribute nothing to the accumulation.
            a_blk = mask_k_tail(a_blk, spec.a_kmajor, ki * bk, k)
            b_blk = mask_k_tail(b_blk, spec.b_kmajor, ki * bk, k)

        if not is_scaled:
            part = (dot_mn(b_blk, a_blk, spec.b_kmajor, spec.a_kmajor)
                    if spec.swap_ab else
                    dot_mn(a_blk, b_blk, spec.a_kmajor, spec.b_kmajor))
        elif dequant:
            sfa_exp = _expand_sf(sfa_ref[0], spec.a_kmajor, gka)
            sfb_exp = _expand_sf(sfb_ref[0], spec.b_kmajor, gkb)
            a_s = a_blk.astype(jnp.bfloat16) * sfa_exp.astype(jnp.bfloat16)
            b_s = b_blk.astype(jnp.bfloat16) * sfb_exp.astype(jnp.bfloat16)
            part = (dot_mn(b_s, a_s, spec.b_kmajor, spec.a_kmajor)
                    if spec.swap_ab else
                    dot_mn(a_s, b_s, spec.a_kmajor, spec.b_kmajor))
        elif spec.swap_ab:
            part = promote_block_swapped(spec, bk, k, a_blk, b_blk,
                                         sfa_ref[0], sfb_ref[0])
        else:
            # Exact promotion over scale-granularity sub-blocks (reference:
            # sm90_fp8_gemm_1d2d.cuh:332-347). FP8 operands feed the MXU
            # directly (bit-identical to a bf16 upcast, ~2x faster on this
            # TPU gen); SF slices arrive exact through the BlockSpecs.
            part = promote_block(spec, bk, k, a_blk, b_blk,
                                 sfa_ref[0], sfb_ref[0])

        def _store(res):
            # swap-AB: the partial lives transposed (bn, bm); ONE f32
            # transpose per output tile restores (bm, bn) — amortized over
            # the whole k depth, ~bm*bn VPU elements vs 2*bm*bn*k MXU flops.
            if spec.swap_ab:
                res = res.T
            if spec.accumulate:
                res = res + c_ref[:].astype(jnp.float32)
            d_ref[:] = res.astype(out_dtype)

        if gk == 1:
            # Single full-depth k step (the measured-best deep-k configs):
            # write d directly — no acc zero/read/write roundtrip, and the
            # freed (bm, bn) f32 scratch stays available to the pipeline.
            # Bitwise-identical: acc would be 0 + part.
            _store(part)
        else:
            acc_ref[:] += part

            @pl.when(ki == gk - 1)
            def _():
                _store(acc_ref[:])

    flops = 2 * m * n * k
    call = pl.pallas_call(
        kernel,
        grid=(gm, gn, gk),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        scratch_shapes=([] if gk == 1 else
                        [pltpu.VMEM((bn, bm) if spec.swap_ab else (bm, bn),
                                    jnp.float32)]),
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
               b_packed_fp4: bool = False,
               swap_ab: Optional[bool] = None,
               cfg: Optional[GemmConfig] = None) -> jnp.ndarray:
    """d[m, n] (+= c) = a @ b^T with optional block-scale dequant.

    ``a`` is [m, k] (k-major) or [k, m]; ``b`` is [n, k] (k-major, NT) or
    [k, n] — or planar-128-packed FP4 [n, k/2] int8 when ``b_packed_fp4``.
    SFs must be pre-oriented per :func:`required_sf_orientation` (handled by
    the ops layer)."""
    m = a.shape[1] if not a_kmajor else a.shape[0]
    k = a.shape[0] if not a_kmajor else a.shape[1]
    n = b.shape[0] if b_kmajor else b.shape[1]
    is_scaled = sfa is not None

    if cfg is None:
        cfg = get_gemm_config(m, n, k, a.dtype, b.dtype, out_dtype,
                              gran_k=min(gran_k_a, gran_k_b) if is_scaled else 128,
                              scale_strategy=scale_strategy if is_scaled else None)
    if b_packed_fp4 and cfg.block_k % 256 != 0:
        cfg = dataclasses.replace(cfg, block_k=max(256, cfg.block_k // 256 * 256))
    if swap_ab is None:
        # DGT_DENSE_SWAP_AB={0,1} pins for A/B profiling; the default is
        # measured policy (see heuristics/arch.py swap_ab_profitable).
        import os as _os
        env = _os.environ.get('DGT_DENSE_SWAP_AB')
        if env is not None:
            swap_ab = env == '1'
        else:
            from ..heuristics.arch import detect_arch
            swap_ab = detect_arch().swap_ab_profitable(
                m, n, k, cfg, is_scaled=is_scaled, is_grouped=False)
    if swap_ab and not is_cpu_backend() \
            and cfg.block_m % 128 != 0 and cfg.block_m != m:
        # Swap-AB puts block_m on the LANE dim (out tile, acc scratch, and
        # the swapped sfa's minor dim): Mosaic requires it be a multiple of
        # 128 or the whole array dim. Interpret mode still exercises the
        # swapped body on small test shapes.
        swap_ab = False
    spec = DenseGemmSpec(
        m=m, n=n, k=k, a_kmajor=a_kmajor, b_kmajor=b_kmajor,
        a_dtype=str(a.dtype), b_dtype=str(b.dtype), out_dtype=str(jnp.dtype(out_dtype)),
        accumulate=c is not None, is_scaled=is_scaled,
        gran_k_a=gran_k_a, gran_k_b=gran_k_b, cfg=cfg,
        b_packed_fp4=b_packed_fp4, swap_ab=bool(swap_ab))
    fn = kernel_cache().get_or_build(spec, lambda: _build_dense_gemm(spec))

    args = [a, b]
    if is_scaled:
        # pad the SF k dims to whole blocks, then lift the grid k-step into
        # the leading dim (Mosaic-friendly per-step SF delivery)
        gk = ceil_div(k, cfg.block_k)
        nsub_a, nsub_b = cfg.block_k // gran_k_a, cfg.block_k // gran_k_b
        if spec.swap_ab and cfg.scale_strategy == 'promote':
            # swapped kernel consumes transposed SF orientations (host-side
            # transposes of tiny f32 arrays; see promote_block_swapped)
            sfa, sfb_t = sfa.T, sfb_t.T
            sfa_kl, sfb_kl = False, True
        else:
            sfa_kl, sfb_kl = required_sf_orientation(cfg.scale_strategy,
                                                     a_kmajor, b_kmajor)
        sfa = sf_to_stepped(pad_sf_k(sfa, gk * nsub_a, k_last=sfa_kl),
                            gk, nsub_a, k_last=sfa_kl)
        sfb_t = sf_to_stepped(pad_sf_k(sfb_t, gk * nsub_b, k_last=sfb_kl),
                              gk, nsub_b, k_last=sfb_kl)
        args += [sfa, sfb_t]
    if c is not None:
        args.append(c)
    return fn(*args)
