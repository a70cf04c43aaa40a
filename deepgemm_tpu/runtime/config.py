"""Runtime configuration: env-var layer + runtime knobs.

TPU analog of the reference's three-tier config system
(/root/reference/csrc/apis/runtime.hpp:11-49, csrc/utils/system.hpp:17-33,
csrc/jit_kernels/heuristics/runtime.hpp:9-61):
  1. ``DGT_*`` environment variables (reference: ``DG_*``);
  2. runtime setters (``set_num_cores`` as the analog of ``set_num_sms``,
     alignment knobs);
  3. per-call kwargs handled in the API layer.
"""

import functools
import os
from typing import Optional

import jax


def get_env(name: str, default=None, cast=str):
    value = os.environ.get(name)
    if value is None:
        return default
    return cast(value)


def get_bool_env(name: str, default: bool = False) -> bool:
    return get_env(name, '1' if default else '0') not in ('0', 'false', 'False', '')


class _Runtime:
    """Process-wide knobs (analog of DeviceRuntime + HeuristicsRuntime,
    /root/reference/csrc/jit/device_runtime.hpp:14-134)."""

    def __init__(self):
        self._num_cores: Optional[int] = get_env('DGT_NUM_CORES', None, int)
        # Alignment of each group's start row in contiguous grouped layouts
        # (reference default 128: csrc/jit_kernels/heuristics/runtime.hpp:47-57)
        self.mk_alignment: int = get_env('DGT_MK_ALIGNMENT', 128, int)
        self.block_m_multiple_of: int = 1
        self.block_n_multiple_of: int = 1
        self.ignore_compile_dims: bool = get_bool_env('DGT_IGNORE_COMPILE_DIMS')
        # Debug printing of chosen kernel configs (analog of DG_PRINT_CONFIGS)
        self.print_configs: bool = get_bool_env('DGT_PRINT_CONFIGS')
        # Full debug dump tier (analog of DG_JIT_DEBUG,
        # /root/reference/README.md:159-185): spec + derived grid shape +
        # VMEM working-set estimate on every kernel build.
        self.debug: bool = get_bool_env('DGT_DEBUG')
        # Force the FP8 scale-application strategy ('promote' | 'dequant');
        # default None = auto (dequant only for provably power-of-two scales).
        self.force_scale_strategy: Optional[str] = get_env('DGT_SCALE_STRATEGY', None)
        self._printed_specs = set()

    @property
    def num_cores(self) -> int:
        if self._num_cores is None:
            return jax.local_device_count()
        return self._num_cores

    @num_cores.setter
    def num_cores(self, value: int):
        self._num_cores = value

    def maybe_print_config(self, spec, config):
        if not (self.print_configs or self.debug):
            return
        if spec in self._printed_specs:
            return
        self._printed_specs.add(spec)
        line = f'[deepgemm_tpu] spec={spec} -> config={config}'
        if self.debug:
            line += _debug_details(spec, config)
        print(line)


def _debug_details(spec, config) -> str:
    """Best-effort grid shape + VMEM working-set estimate for the DGT_DEBUG
    dump tier (what DG_JIT_DEBUG's compile-time prints expose on GPU)."""
    if config is None or not hasattr(config, 'block_m'):
        return ''
    try:
        import jax.numpy as jnp
        bm, bn, bk = config.block_m, config.block_n, config.block_k
        m = getattr(spec, 'm', None)
        n = getattr(spec, 'n', None)
        k = getattr(spec, 'k', getattr(spec, 'total_k', None))
        a_b = jnp.dtype(getattr(spec, 'a_dtype', 'bfloat16')).itemsize
        b_b = jnp.dtype(getattr(spec, 'b_dtype', 'bfloat16')).itemsize
        o_b = jnp.dtype(getattr(spec, 'out_dtype', 'bfloat16')).itemsize
        vmem = (bm * bk * a_b + bn * bk * b_b) * 2 \
            + bm * bn * 4 + bm * bn * o_b * 2
        parts = [f' | tiles=({bm},{bn},{bk})',
                 f'vmem~{vmem / 2**20:.2f}MiB']
        if None not in (m, n, k):
            gm = -(-m // bm)
            gn = -(-n // bn)
            gk = -(-k // bk)
            parts.append(f'grid=({gm},{gn},{gk})')
        return ' '.join(parts)
    except Exception:
        return ''


@functools.lru_cache(maxsize=None)
def runtime() -> _Runtime:
    return _Runtime()


# ---------------------------------------------------------------------------
# Public runtime API (parity with /root/reference/csrc/apis/runtime.hpp:11-49)
# ---------------------------------------------------------------------------

def set_num_sms(num: int):
    """Analog of ``deep_gemm.set_num_sms`` — caps the core/device budget."""
    runtime().num_cores = num


def get_num_sms() -> int:
    return runtime().num_cores


def set_tc_util(percent: int):
    """Accepted for API parity; XLA owns MXU scheduling on TPU (no-op)."""
    runtime().tc_util = percent


def get_tc_util() -> int:
    return getattr(runtime(), 'tc_util', 100)


def set_pdl(enable: bool):
    """Programmatic dependent launch has no TPU analog (XLA fuses/pipes); no-op."""
    runtime().pdl = enable


def get_pdl() -> bool:
    return getattr(runtime(), 'pdl', False)


def set_ignore_compile_dims(value: bool):
    runtime().ignore_compile_dims = value


def set_block_size_multiple_of(block_m: int, block_n: int):
    runtime().block_m_multiple_of = block_m
    runtime().block_n_multiple_of = block_n


def set_mk_alignment_for_contiguous_layout(alignment: int):
    """Reference: csrc/apis/layout.hpp:142-150."""
    runtime().mk_alignment = alignment


def get_mk_alignment_for_contiguous_layout() -> int:
    return runtime().mk_alignment


def get_tma_aligned_size(x: int, element_size: int) -> int:
    """Kept for layout-contract parity (16-byte alignment,
    /root/reference/csrc/utils/math.hpp:23-27)."""
    alignment = 16 // element_size
    return align(x, alignment)


def align(x: int, y: int) -> int:
    return (x + y - 1) // y * y


def interpret_params():
    """InterpretParams for RDMA kernels on the CPU distributed interpreter,
    configurable for the DMA-schedule-adversarial tests:

      DGT_INTERPRET_DMA_MODE = 'on_wait' (default) | 'eager'
        on_wait completes every DMA only AT its semaphore wait (the
        maximally-late schedule: consuming un-waited data reads NaNs);
        eager completes at issue (maximally-early). Bitwise equality across
        BOTH schedules is the testable overlap contract — the interpreter
        cannot measure time, so schedule-insensitivity of the VALUE is the
        analog of "inject per-slab RDMA delays, assert step-time
        insensitivity" (the reference's dispatch/compute overlap property,
        sm100_fp8_fp4_mega_moe.cuh:432-601).
      DGT_INTERPRET_RACES = 1: enable the interpreter's vector-clock race
        detector (prints RACE DETECTED on unsynchronized access).
    """
    import os
    from jax.experimental.pallas import tpu as pltpu
    return pltpu.InterpretParams(
        dma_execution_mode=os.environ.get('DGT_INTERPRET_DMA_MODE',
                                          'on_wait'),
        detect_races=get_bool_env('DGT_INTERPRET_RACES'),
    )


def is_cpu_backend() -> bool:
    """True when Pallas kernels should run in INTERPRET mode: the CPU
    backend (tests / virtual meshes), or ``DGT_INTERPRET=1`` to force
    interpretation even on TPU (a debugging tier like running the reference
    under compute-sanitizer: python-level bounds/shape checking at the cost
    of speed). Remember interpret mode accepts lane-rule-violating block
    shapes Mosaic rejects — it's a numerics debugger, not a compile check."""
    if get_bool_env('DGT_INTERPRET'):
        return True
    # DGT_FORCE_MOSAIC=1: build the real Mosaic lowering even on a CPU host
    # — for `jax.export`-based cross-platform lowering checks (catches
    # lane-rule / block-shape errors at trace time without a chip; the
    # VMEM-limit class still needs the device compiler).
    if get_bool_env('DGT_FORCE_MOSAIC'):
        return False
    return jax.default_backend() == 'cpu'
