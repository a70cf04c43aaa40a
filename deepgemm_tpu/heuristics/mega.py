"""Mega-MoE pipeline heuristics.

TPU analog of the reference's mega-MoE config search
(/root/reference/csrc/jit_kernels/heuristics/mega_moe.hpp:100-285), which
tiers block sizes by expected tokens per expert, searches experts-per-wave
under the smem budget, and sizes the NVLink pull chunks. Here the knobs are
the chunked software pipeline's chunk count (dispatch/combine granularity vs
ICI bandwidth) and the expected-m hint for the grouped GEMM tile search.
"""

import dataclasses
from typing import Optional

from ..utils.math import align, ceil_div
from .arch import ArchSpec, detect_arch

# Aggregate per-chip ICI bandwidth (GB/s, ballpark public numbers — used
# only as a ratio against MXU time to size the overlap granularity).
_ICI_GBPS = {'v4': 300.0, 'v5e': 200.0, 'v5p': 600.0, 'v6e': 400.0}

# Slot alignment of the per-(rank, expert) capacity (the analog of
# `get_token_alignment_for_mega_moe`); chunks should not shrink below a few
# alignment units or the grouped GEMMs degenerate.
_MIN_CHUNK_ROWS = 16
_MAX_CHUNKS = 8


@dataclasses.dataclass(frozen=True)
class MegaMoEConfig:
    num_chunks: int          # dispatch/combine pipeline granularity
    chunk_rows: int          # capacity rows per chunk
    expected_m: int          # tokens-per-expert hint for the GEMM tile search
    comm_compute_ratio: float  # modeled t_dispatch+combine / t_expert_gemms


def get_mega_moe_config(num_tokens_per_rank: int, hidden: int,
                        intermediate: int, num_experts: int, num_ranks: int,
                        topk: int, capacity: int,
                        use_fp8: bool = True,
                        arch: Optional[ArchSpec] = None) -> MegaMoEConfig:
    """Size the chunked mega pipeline.

    Policy (the reference's expected-tokens tiers + wave search re-targeted
    at the ICI/MXU overlap): the pipeline hides chunk c's all-to-all under
    chunk c-1's expert GEMMs, so the only EXPOSED communication is the first
    chunk's dispatch and the last chunk's combine — about
    ``t_comm / num_chunks`` each. More chunks shrink that bubble but
    fragment the grouped GEMMs; stop when chunks reach a few token-alignment
    units, and don't bother chunking at all when communication is a small
    fraction of compute.
    """
    arch = arch or detect_arch()
    ici = _ICI_GBPS.get(arch.name, _ICI_GBPS['v5e']) * 1e9
    e_local = max(1, num_experts // max(1, num_ranks))
    expected_m = max(1, ceil_div(num_tokens_per_rank * topk, num_experts))

    # Per-rank modeled times over one step (all experts, full capacity).
    rows = num_ranks * capacity * e_local
    x_bytes = 1 if use_fp8 else 2
    remote_frac = (num_ranks - 1) / max(1, num_ranks)
    # dispatch (tokens, x_bytes wide) + combine (bf16 partials back)
    comm_bytes = remote_frac * rows * hidden * (x_bytes + 2)
    flops = 2 * rows * (2 * intermediate * hidden + hidden * intermediate)
    peak = arch.bf16_tflops * 1e12 * (1.0 if (use_fp8 and arch.fp8_direct)
                                      else (0.5 if use_fp8 else 1.0))
    t_comm = comm_bytes / ici
    t_comp = flops / (peak * 0.7)        # grouped-GEMM efficiency derate
    ratio = t_comm / max(t_comp, 1e-12)

    if ratio < 0.05:
        chunks = 1                        # bubble already negligible
    else:
        # Aim the exposed bubble (t_comm / chunks) under ~12% of compute.
        chunks = ceil_div(int(ratio * 100), 12)
    chunks = max(1, min(chunks, _MAX_CHUNKS, capacity // _MIN_CHUNK_ROWS))
    chunk_rows = ceil_div(capacity, max(chunks, 1))
    return MegaMoEConfig(num_chunks=max(chunks, 1), chunk_rows=chunk_rows,
                         expected_m=expected_m,
                         comm_compute_ratio=round(ratio, 4))
