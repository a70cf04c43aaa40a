"""Environment-variable catalog — the analog of the reference's ``DG_*`` env
tier (/root/reference/README.md:159-185, csrc/utils/system.hpp:17-33, with
install-time defaults baked by setup.py:140-147).

All variables are read lazily at first use by runtime/config.py and
runtime/native.py; this module documents them and provides the same
"baked defaults" hook the reference wheel has.

| Variable | Meaning | Reference analog |
|---|---|---|
| ``DGT_JIT_CACHE_DIR``     | JAX persistent compilation cache dir        | ``DG_JIT_CACHE_DIR`` |
| ``DGT_NATIVE_CACHE_DIR``  | native helper-library build cache dir       | (jit cache) |
| ``DGT_CXX``               | host C++ compiler for the native runtime    | ``DG_JIT_NVCC_COMPILER`` |
| ``DGT_DISABLE_NATIVE``    | 1 = never build/load the C++ helpers        | ``DG_JIT_USE_NVRTC`` (tier switch) |
| ``DGT_NUM_CORES``         | override the core/device budget             | ``DG_NUM_SMS`` / set_num_sms |
| ``DGT_MK_ALIGNMENT``      | contiguous-layout group start alignment     | mk_alignment_for_contiguous_layout |
| ``DGT_IGNORE_COMPILE_DIMS`` | drop static-dim specialization hints      | ``DG_JIT_IGNORE_COMPILE_DIMS`` |
| ``DGT_PRINT_CONFIGS``     | print chosen kernel configs once per spec   | ``DG_PRINT_CONFIGS`` |
| ``DGT_DEBUG``             | full dump tier: spec + grid + VMEM estimate | ``DG_JIT_DEBUG`` |
| ``DGT_INTERPRET``         | force Pallas interpret mode (even on TPU)   | compute-sanitizer runs |
| ``DGT_DISABLE_KERNEL_CACHE`` | rebuild traced kernels on every call     | ``DG_JIT_DISABLE_CACHE`` |
| ``DGT_SCALE_STRATEGY``    | force 'promote' / 'dequant' FP8 scaling     | (recipe/arch dispatch) |
| ``DGT_TEST_PLATFORM``     | tests: 'cpu' (virtual mesh) or 'tpu'        | (CI matrix) |
| ``DGT_DUMP_DIR``          | dump lowered StableHLO (w/ embedded Mosaic  | ``DG_JIT_DUMP`` /
|                           | module) + spec per kernel into this dir     | ``DG_JIT_DUMP_ASM/PTX/SASS`` |
| ``DGT_DUMP_HLO``          | with DUMP_DIR: also dump post-XLA-opt HLO   | ``DG_JIT_DUMP_SASS`` |
|                           | (forces an extra compile per spec)          | |
| ``DGT_KG_TILES``          | pin k-grouped wgrad tiles "bm,bn[,bk]"      | (per-config JIT overrides) |
| ``DGT_KG_FORCE_PREFETCH`` | k-grouped: pin the dynamic scalar-prefetch  | (A/B profiling of the |
|                           | kernel even for equal host-concrete groups  | static-layout paths) |
| ``DGT_GROUPED_FORCE_PREFETCH`` | same for the contiguous grouped kernel | |
| ``DGT_BF16_GROUPED``      | 'ragged' pins bf16 contiguous grouped to    | (XLA-delegation |
|                           | XLA ragged_dot (default: Pallas, 160.8 vs   | escape hatch) |
|                           | 144.9 TFLOPS at the G8 bench shape)         | |
| ``DGT_FORCE_MOSAIC``      | build real Mosaic lowering on a CPU host    | (scripts/lowering_check.py |
|                           | (for jax.export cross-lowering checks)      | chip-free compile checks) |
"""

import os

# Install-time defaults may be baked here by setup.py (parity with the
# reference's generated deep_gemm/envs.py). Empty by default.
_BAKED_DEFAULTS = {}

for _k, _v in _BAKED_DEFAULTS.items():
    os.environ.setdefault(_k, _v)


def describe() -> dict:
    """Current values of every DGT_* variable (None = unset)."""
    names = ['DGT_JIT_CACHE_DIR', 'DGT_NATIVE_CACHE_DIR', 'DGT_CXX',
             'DGT_DISABLE_NATIVE', 'DGT_NUM_CORES', 'DGT_MK_ALIGNMENT',
             'DGT_IGNORE_COMPILE_DIMS', 'DGT_PRINT_CONFIGS', 'DGT_DEBUG',
             'DGT_INTERPRET', 'DGT_DISABLE_KERNEL_CACHE',
             'DGT_SCALE_STRATEGY', 'DGT_TEST_PLATFORM',
             'DGT_DUMP_DIR', 'DGT_DUMP_HLO', 'DGT_KG_TILES',
             'DGT_KG_FORCE_PREFETCH', 'DGT_GROUPED_FORCE_PREFETCH',
             'DGT_BF16_GROUPED', 'DGT_MEGA_TILES', 'DGT_FORCE_MOSAIC']
    return {n: os.environ.get(n) for n in names}
