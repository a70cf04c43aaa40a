"""Tile-config heuristics for Pallas GEMM kernels.

TPU analog of the reference's GemmDesc/ArchSpec config search
(/root/reference/csrc/jit_kernels/heuristics/common.hpp:13-52,
sm90.hpp:13-244, sm100.hpp:14-267). Instead of smem stages / cluster dims, we
choose Pallas (block_m, block_n, block_k) tiles under a VMEM budget, shaped by
the MXU (128x128 systolic array) and the dtype-dependent min sublane tile.
"""

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp

from ..utils.math import align, ceil_div

# Per-core VMEM budget in bytes (of ~16 MiB, the rest is reserved for
# Mosaic's own bookkeeping). 12.5 MiB validated on v5e with the
# (256, 1024, 4096) fp8 tile; (512, 1024, 4096) at ~16.5 MiB overflows.
VMEM_BUDGET = 12 * 1024 * 1024 + 512 * 1024
# NOTE (swept, then reverted): a single-k-step (128, 1024, 7168) fp8 tile at
# a 16.75 MiB estimate measured 163.6 vs 155 TFLOPS for the 2-step split, but
# compilation at that margin is FLAKY (the same config compiled in one
# harness and OOM'd in another once the stepped SF operands were live).
# Stay within VMEM_BUDGET; revisit if Mosaic exposes real occupancy.

MXU_DIM = 128

# Min sublane counts per dtype (lane dim is always 128)
_MIN_SUBLANES = {1: 32, 2: 16, 4: 8}


@dataclasses.dataclass(frozen=True)
class GemmConfig:
    block_m: int
    block_n: int
    block_k: int
    # 'promote': per-gran_k-block f32 promotion epilogue (exact FP8 semantics,
    #   matches /root/reference/deep_gemm/include/deep_gemm/impls/sm90_fp8_gemm_1d2d.cuh:332-347)
    # 'dequant': scale operands into bf16 before one big MXU pass (used for
    #   sub-128 scale granularities, e.g. FP4 (1,32) recipes)
    scale_strategy: str = 'promote'

    @property
    def grid_shape(self):
        return None


def _dtype_bytes(dtype) -> int:
    return jnp.dtype(dtype).itemsize


def _pick_block(dim: int, preferred: int, quantum: int) -> int:
    """Largest block <= preferred that is a multiple of `quantum`, covering
    `dim` without excessive padding."""
    if dim <= quantum:
        return quantum
    if dim <= preferred:
        return align(dim, quantum)
    return preferred


def get_gemm_config(m: int, n: int, k: int,
                    a_dtype, b_dtype, out_dtype,
                    gran_k: int = 128,
                    num_groups: int = 1,
                    is_grouped_m: bool = False,
                    mk_alignment: int = 128,
                    scale_strategy: Optional[str] = None) -> GemmConfig:
    """Pick Pallas tile sizes for a (possibly grouped) NT GEMM.

    Follows the reference heuristic intent (larger tiles for larger problems,
    block_m pinned to the contiguous-group alignment for m-grouped layouts —
    csrc/jit_kernels/heuristics/sm90.hpp:31-34) re-targeted at MXU/VMEM.
    Tile defaults are tuned on TPU v5e: 512x1024 for BF16, 512x512 for the
    scaled paths (the promote epilogue adds VPU pressure).
    """
    a_bytes, b_bytes = _dtype_bytes(a_dtype), _dtype_bytes(b_dtype)
    out_bytes = _dtype_bytes(out_dtype)
    is_scaled = scale_strategy is not None

    # Tile policy (swept on v5e at 4096^3): the k block should be as DEEP as
    # VMEM affords — each grid k-step re-reads/writes the f32 accumulator, so
    # fewer, deeper steps win (promote fp8: 160 TFLOPS at bk=512 -> 176 at
    # bk=4096 with (bm, bn) = (256, 1024)). Priority: bk >> bn > bm.
    if is_grouped_m:
        # Each m-tile must lie entirely inside one group: pin block_m to the
        # group start alignment (or a divisor of it).
        block_m = min(mk_alignment, 512)
    else:
        block_m = _pick_block(m, 256, _MIN_SUBLANES[_dtype_bytes(a_dtype)])

    # Lane-dim (n) blocks want multiples of the MXU width; ragged n keeps the
    # whole dim (Mosaic lane rule: divisible by 128 or whole).
    n_pref = 1024
    if n % MXU_DIM == 0:
        block_n = _pick_block(n, n_pref, MXU_DIM)
    else:
        block_n = n

    # k blocks are multiples of the scale granularity so each in-kernel
    # promotion step covers whole scale blocks.
    k_quantum = max(gran_k, MXU_DIM) if gran_k >= MXU_DIM else MXU_DIM
    k_full = align(k, k_quantum)

    def working_set(bm, bn, bk):
        return (bm * bk * a_bytes + bn * bk * b_bytes) * 2 \
            + bm * bn * 4 + bm * bn * out_bytes * 2

    def max_bk(bm, bn):
        fixed = bm * bn * 4 + bm * bn * out_bytes * 2
        per_k = (bm * a_bytes + bn * b_bytes) * 2
        fit = (VMEM_BUDGET - fixed) // per_k if VMEM_BUDGET > fixed else 0
        return min(k_full, max(fit // k_quantum * k_quantum, 0))

    fit = max_bk(block_m, block_n)
    # Shrink bn then bm until at least one k quantum fits. bn must stay
    # lane-legal: divisible by 128 (Mosaic rejects e.g. 3000 on real TPU even
    # though interpret mode accepts it). A ragged whole-dim bn that doesn't
    # fit falls back to a 128-aligned padded block first.
    if fit < k_quantum and block_n % MXU_DIM != 0:
        block_n = align(block_n, MXU_DIM)
        fit = max_bk(block_m, block_n)
    while fit < k_quantum and block_n > MXU_DIM:
        block_n = max((block_n // 2) // MXU_DIM * MXU_DIM, MXU_DIM)
        fit = max_bk(block_m, block_n)
    while fit < k_quantum and block_m > _MIN_SUBLANES[a_bytes]:
        block_m //= 2
        fit = max_bk(block_m, block_n)
    fit = max(fit, k_quantum)

    # Balance the k steps: a non-dividing bk leaves a ragged (masked) final
    # step that wrecks the pipeline (measured 110 vs 176 TFLOPS at 4096^3
    # with bk=3072). Pick the fewest equal steps that fit.
    if fit >= k_full:
        block_k = k_full
    else:
        steps = ceil_div(k_full, fit)
        block_k = align(ceil_div(k_full, steps), k_quantum)
        while block_k > fit:
            steps += 1
            block_k = align(ceil_div(k_full, steps), k_quantum)

    if scale_strategy is None:
        scale_strategy = 'promote'
    return GemmConfig(block_m=block_m, block_n=block_n, block_k=block_k,
                      scale_strategy=scale_strategy)
