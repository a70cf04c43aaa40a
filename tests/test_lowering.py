"""Chip-free TPU Mosaic-lowering regression checks.

``jax.export`` cross-lowers for platform 'tpu' on the CPU host with
DGT_FORCE_MOSAIC=1, exercising the real Pallas->Mosaic lowering (lane rules,
block shapes, SMEM operands) that interpret mode skips — the gap that made
every new kernel need a live-chip drive (CLAUDE.md: interpret mode accepts
lane-rule-violating shapes Mosaic rejects). Full bench-shaped sweep:
scripts/lowering_check.py. Small shapes here to keep CI fast."""

import numpy as np
import jax.numpy as jnp
import pytest

import deepgemm_tpu as dg


@pytest.fixture()
def mosaic_env(monkeypatch):
    monkeypatch.setenv('DGT_FORCE_MOSAIC', '1')
    monkeypatch.setenv('DGT_DISABLE_KERNEL_CACHE', '1')  # interpret-built
    yield                                                # callables differ


def _lower_tpu(f, *args):
    import jax
    from jax import export
    export.export(jax.jit(f), platforms=['tpu'])(*args)


def test_lower_dense_and_masked(mosaic_env):
    from jax import ShapeDtypeStruct as S
    f8 = jnp.float8_e4m3fn
    _lower_tpu(lambda a, sa, b, sb: dg.fp8_gemm_nt((a, sa), (b, sb)),
               S((256, 512), f8), S((256, 4), jnp.float32),
               S((256, 512), f8), S((2, 4), jnp.float32))
    _lower_tpu(lambda a, sa, b, sb, m: dg.m_grouped_fp8_gemm_nt_masked(
                   (a, sa), (b, sb), masked_m=m, expected_m=96),
               S((2, 128, 256), f8), S((2, 128, 2), jnp.float32),
               S((2, 256, 256), f8), S((2, 2, 2), jnp.float32),
               S((2,), jnp.int32))


def test_lower_k_grouped_static_and_prefetch(mosaic_env, monkeypatch):
    from jax import ShapeDtypeStruct as S
    from deepgemm_tpu.kernels.k_grouped import k_grouped_gemm
    f8 = jnp.float8_e4m3fn
    ks = [256, 256]
    tk = sum(ks)

    def f(a, b, sa, sb):
        return k_grouped_gemm(a, b, None, jnp.asarray(ks, jnp.int32),
                              use_psum_layout=False, sfa_t=sa, sfb_t=sb,
                              ks_cpu=ks, k_major=True)

    args = (S((tk, 128), f8), S((tk, 256), f8),
            S((tk // 128, 128), jnp.float32), S((tk // 128, 256), jnp.float32))
    _lower_tpu(f, *args)                                   # static path
    monkeypatch.setenv('DGT_KG_FORCE_PREFETCH', '1')
    _lower_tpu(f, *args)                                   # dynamic path


def test_lower_sparse_attn_and_dual_b(mosaic_env, monkeypatch):
    """r5 kernels through the real Mosaic lowering: the fused post-gather
    sparse attention (whose softmax orientation exists BECAUSE the device
    compiler rejects sublane-dim 2D reductions — interpret mode accepts
    them) and the dual-B straddle contiguous kernel."""
    import numpy as np
    from jax import ShapeDtypeStruct as S
    from deepgemm_tpu.kernels.sparse_attn import gathered_attention
    _lower_tpu(lambda q, ks, vs, valid: gathered_attention(
                   q, ks, vs, valid, 0.0883883),
               S((2, 2, 128), jnp.bfloat16),
               S((2, 16, 2, 128), jnp.bfloat16),
               S((2, 16, 2, 128), jnp.bfloat16),
               S((2, 16), jnp.bool_))

    monkeypatch.setenv('DGT_GROUPED_DUAL_B', '1')
    sizes = [128, 384, 256]
    ids = jnp.asarray(np.repeat(np.arange(3, dtype=np.int32), sizes))
    f8 = jnp.float8_e4m3fn
    _lower_tpu(lambda a, sa, b, sb: dg.m_grouped_fp8_gemm_nt_contiguous(
                   (a, sa), (b, sb), grouped_layout=ids,
                   use_psum_layout=False),
               S((768, 256), f8), S((768, 2), jnp.float32),
               S((3, 256, 256), f8), S((3, 2, 2), jnp.float32))
