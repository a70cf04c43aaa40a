"""HyperConnection prenorm GEMM: d = a @ b^T fused with per-row sum(a^2).

TPU re-design of the reference TF32 HC-prenorm kernel
(/root/reference/deep_gemm/include/deep_gemm/impls/sm90_tf32_hc_prenorm_gemm.cuh:163-241):
the RMSNorm statistic sum(a_i^2) is accumulated alongside the GEMM so ``a`` is
read from HBM exactly once. ``a`` is bf16, ``b``/outputs f32; the matmul runs
with HIGHEST f32 precision on the MXU (6-pass bf16 decomposition, >= TF32
mantissa quality).
"""

import dataclasses

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..runtime.cache import kernel_cache
from ..runtime.config import is_cpu_backend
from ..utils.math import align, ceil_div


@dataclasses.dataclass(frozen=True)
class HCPrenormSpec:
    m: int
    n: int
    k: int
    block_m: int
    block_n: int
    block_k: int


def _build_hc_prenorm(spec: HCPrenormSpec):
    bm, bn, bk = spec.block_m, spec.block_n, spec.block_k
    m, n, k = spec.m, spec.n, spec.k
    gm, gn, gk = ceil_div(m, bm), ceil_div(n, bn), ceil_div(k, bk)
    has_k_tail = (k % bk) != 0

    def kernel(a_ref, b_ref, d_ref, s_ref, *scratch):
        acc_ref, sacc_ref = scratch if gk > 1 else (None, None)
        j = pl.program_id(1)
        ki = pl.program_id(2)

        if gk > 1:
            @pl.when(ki == 0)
            def _():
                acc_ref[:] = jnp.zeros_like(acc_ref)

            @pl.when((ki == 0) & (j == 0))
            def _():
                sacc_ref[:] = jnp.zeros_like(sacc_ref)

        a_blk = a_ref[:].astype(jnp.float32)
        if has_k_tail:
            ids = jax.lax.broadcasted_iota(jnp.int32, a_blk.shape, 1)
            a_blk = jnp.where(ki * bk + ids < k, a_blk, jnp.zeros_like(a_blk))
        part = jax.lax.dot_general(
            a_blk, b_ref[:], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST)

        if gk == 1:
            # single full-depth k step: direct writes, no scratch roundtrip
            # (bitwise-identical: acc would be 0 + part)
            d_ref[:] = part

            @pl.when(j == 0)
            def _():
                s_ref[:] = jnp.sum(a_blk * a_blk, axis=1, keepdims=True)
            return

        acc_ref[:] += part

        # sum(a^2) accumulated once per (i, ki) — only on the first n-tile
        # (reference fuses this via warp shuffles,
        # sm90_tf32_hc_prenorm_gemm.cuh:163-241)
        @pl.when(j == 0)
        def _():
            sacc_ref[:] += jnp.sum(a_blk * a_blk, axis=1, keepdims=True)

        @pl.when(ki == gk - 1)
        def _():
            d_ref[:] = acc_ref[:]

        @pl.when((ki == gk - 1) & (j == 0))
        def _():
            s_ref[:] = sacc_ref[:]

    call = pl.pallas_call(
        kernel,
        grid=(gm, gn, gk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, s: (i, s), memory_space=pltpu.VMEM),
            pl.BlockSpec((bn, bk), lambda i, j, s: (j, s), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((bm, bn), lambda i, j, s: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, 1), lambda i, j, s: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m, n), jnp.float32),
            jax.ShapeDtypeStruct((m, 1), jnp.float32),
        ],
        scratch_shapes=([] if gk == 1 else
                        [pltpu.VMEM((bm, bn), jnp.float32),
                         pltpu.VMEM((bm, 1), jnp.float32)]),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=('parallel', 'arbitrary', 'arbitrary'),
        ),
        cost_estimate=pl.CostEstimate(flops=2 * m * n * k, bytes_accessed=0,
                                      transcendentals=0),
        interpret=is_cpu_backend(),
    )
    return jax.jit(call)


def hc_prenorm_gemm(a: jnp.ndarray, b: jnp.ndarray):
    """Returns (d [m,n] f32, sqr_sum [m] f32)."""
    m, k = a.shape
    n = b.shape[0]
    bm = min(256, align(m, 16))
    bn = min(256, align(n, 128) if n % 128 == 0 else min(512, align(n, 8)))
    bk = min(512, align(k, 128))
    spec = HCPrenormSpec(m=m, n=n, k=k, block_m=bm, block_n=bn, block_k=bk)
    fn = kernel_cache().get_or_build(spec, lambda: _build_hc_prenorm(spec))
    d, s = fn(a, b)
    return d, s[:, 0]
