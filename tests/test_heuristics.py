"""Heuristics-tier tests: tile configs must be Mosaic-legal for every shape
(the lane rule: block_n divisible by 128 or the whole dim — interpret mode
accepts illegal shapes that real TPU rejects, so this is host-checked), and
the generated .pyi stub must stay parseable (ADVICE r1).
"""

import ast
import os

import jax.numpy as jnp
import pytest

from deepgemm_tpu.heuristics.configs import get_gemm_config, MXU_DIM


def _assert_lane_legal(cfg, n):
    assert cfg.block_n % MXU_DIM == 0 or cfg.block_n == n, \
        f'lane-illegal block_n={cfg.block_n} for n={n}'
    assert cfg.block_m >= 1 and cfg.block_k >= 1


@pytest.mark.parametrize('m,n,k', [
    (4096, 6000, 8192),    # ADVICE r1 repro: ragged n + VMEM shrink
    (4096, 4096, 4096),
    (128, 24576, 1536),
    (64, 300, 512),
    (8192, 6000, 16384),   # ragged n, very deep k
    (16, 7168, 2048),
])
@pytest.mark.parametrize('dtype', [jnp.float8_e4m3fn, jnp.bfloat16])
def test_config_lane_legality(m, n, k, dtype):
    cfg = get_gemm_config(m, n, k, dtype, dtype, jnp.bfloat16,
                          scale_strategy='promote' if dtype != jnp.bfloat16
                          else None)
    _assert_lane_legal(cfg, n)


def test_config_headline_shapes_unchanged():
    """The measured v5e recipes (176 TFLOPS dense fp8) flow through specific
    tiles; keep them stable under heuristics refactors."""
    cfg = get_gemm_config(4096, 4096, 4096, jnp.float8_e4m3fn,
                          jnp.float8_e4m3fn, jnp.bfloat16,
                          scale_strategy='promote')
    assert (cfg.block_m, cfg.block_n) == (256, 1024)
    assert cfg.block_k % 128 == 0 and cfg.block_k >= 2048


def test_pyi_stub_parses():
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'deepgemm_tpu', '__init__.pyi')
    with open(path) as f:
        ast.parse(f.read())


def test_pyi_generator_output_parses(tmp_path):
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), 'scripts'))
    import generate_pyi
    out = str(tmp_path / 'stub.pyi')
    generate_pyi.main(out)
    with open(out) as f:
        ast.parse(f.read())
