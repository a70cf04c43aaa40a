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
# Mosaic's own double-buffering of the pipelined blocks). 12 MiB validated on
# v5e with the (512, 2048, 512) fp8 tile; (1024, 2048, 512) overflows.
VMEM_BUDGET = 12 * 1024 * 1024

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
    ab_bytes = _dtype_bytes(a_dtype) + _dtype_bytes(b_dtype)
    out_bytes = _dtype_bytes(out_dtype)
    is_scaled = scale_strategy is not None

    if is_grouped_m:
        # Each m-tile must lie entirely inside one group: pin block_m to the
        # group start alignment (or a divisor of it).
        block_m = min(mk_alignment, 512)
    else:
        block_m = _pick_block(m, 512, _MIN_SUBLANES[_dtype_bytes(a_dtype)])

    # Lane-dim (n) blocks want multiples of the MXU width; fall back to the
    # largest MXU-fraction divisor for ragged n (e.g. n=576 -> 192).
    # FP8 operands are 1 byte, so the scaled path affords a 2x wider n tile —
    # measured best on v5e: (512, 2048, 512) at 166 TFLOPS vs 160 at bn=1024.
    n_pref = 2048 if (is_scaled and ab_bytes <= 2) else 1024
    if n % MXU_DIM == 0:
        block_n = _pick_block(n, n_pref, MXU_DIM)
    else:
        block_n = n if n <= n_pref else align(n, MXU_DIM)
        block_n = min(block_n, n_pref)

    # k blocks are multiples of the scale granularity so each in-kernel
    # promotion step covers whole scale blocks.
    k_quantum = max(gran_k, MXU_DIM) if gran_k >= MXU_DIM else MXU_DIM
    block_k = _pick_block(k, 512, k_quantum)

    # Shrink block_k then block_n until the working set fits in VMEM.
    def working_set(bm, bn, bk):
        return (bm * bk * _dtype_bytes(a_dtype) + bn * bk * _dtype_bytes(b_dtype)) * 2 \
            + bm * bn * 4 + bm * bn * out_bytes * 2

    while working_set(block_m, block_n, block_k) > VMEM_BUDGET and block_k > k_quantum:
        block_k //= 2
    while working_set(block_m, block_n, block_k) > VMEM_BUDGET and block_n > MXU_DIM:
        block_n //= 2

    if scale_strategy is None:
        scale_strategy = 'promote'
    return GemmConfig(block_m=block_m, block_n=block_n, block_k=block_k,
                      scale_strategy=scale_strategy)
