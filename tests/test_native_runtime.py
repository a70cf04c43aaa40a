"""Native C++ host-runtime tests (csrc/dgt_runtime.cpp via runtime/native.py).

Checks the native implementations bit-exactly against the pure-Python
fallbacks and against the device-side schedule computation, mirroring how the
reference validates its layout kernels against torch reimplementations
(/root/reference/tests/test_layout.py:20-60).
"""

import os

import numpy as np
import jax.numpy as jnp
import pytest

from deepgemm_tpu.runtime import native
from deepgemm_tpu.kernels.grouped import compute_tile_gids


def _py_fallbacks(monkeypatch):
    monkeypatch.setattr(native, '_lib', lambda: None)


def test_native_builds():
    # the toolchain is present in this environment; the library must build
    assert native.native_available()


def test_fnv1a_matches_python():
    for data in [b'', b'a', b'deep_gemm', os.urandom(1000)]:
        assert native.fnv1a(data) == native._fnv1a_py(data)


def test_cache_roundtrip(tmp_path):
    d = str(tmp_path / 'cache')
    native.cache_put(d, 'kernel.test.1', b'\x00\x01payload')
    assert native.cache_get(d, 'kernel.test.1') == b'\x00\x01payload'
    assert native.cache_get(d, 'missing') is None
    # idempotent put (another writer already published)
    native.cache_put(d, 'kernel.test.1', b'different')
    assert native.cache_get(d, 'kernel.test.1') == b'\x00\x01payload'
    # no tmp litter left behind
    leftovers = [f for f in os.listdir(d) if f.startswith('.tmp.')]
    assert leftovers == []


@pytest.mark.parametrize('block_m', [4, 8, 32])
def test_tile_gids_from_ids_matches_device(block_m):
    rng = np.random.RandomState(0)
    num_groups, m = 5, 256
    # contiguous per-row ids with -1 padding tails, block-aligned groups
    ids = np.repeat(np.arange(num_groups), m // num_groups)
    ids = np.concatenate([ids, -np.ones(m - ids.size)]).astype(np.int32)
    g_nat, e_nat = native.tile_gids_from_ids(ids, block_m, num_groups)
    g_dev, e_dev = compute_tile_gids(jnp.asarray(ids), num_groups, m,
                                     block_m, use_psum_layout=False)
    np.testing.assert_array_equal(g_nat, np.asarray(g_dev))
    np.testing.assert_array_equal(e_nat, np.asarray(e_dev))


@pytest.mark.parametrize('block_m', [4, 8, 32])
def test_tile_gids_from_psum_matches_device(block_m):
    ends = np.array([32, 96, 96, 160, 256], np.int32)   # includes empty group
    m = 256
    g_nat, e_nat = native.tile_gids_from_psum(ends, m, block_m)
    g_dev, e_dev = compute_tile_gids(jnp.asarray(ends), ends.size, m,
                                     block_m, use_psum_layout=True)
    np.testing.assert_array_equal(g_nat, np.asarray(g_dev))
    np.testing.assert_array_equal(e_nat, np.asarray(e_dev))


def test_k_group_offsets(monkeypatch):
    ks = np.array([100, 200, 50, 0, 128], np.int32)
    got = native.k_group_offsets(ks, 128)
    np.testing.assert_array_equal(got, [0, 128, 384, 512, 512, 640])
    _py_fallbacks(monkeypatch)
    np.testing.assert_array_equal(native.k_group_offsets(ks, 128), got)


def test_paged_mqa_schedule_native_vs_python(monkeypatch):
    rng = np.random.RandomState(1)
    for batch, units in [(1, 4), (7, 8), (64, 16)]:
        lens = rng.randint(1, 5000, size=batch).astype(np.int32)
        out_nat, tot_nat = native.paged_mqa_schedule(lens, 256, units)
        _py_fallbacks(monkeypatch)
        out_py, tot_py = native.paged_mqa_schedule(lens, 256, units)
        monkeypatch.undo()
        assert tot_nat == tot_py
        np.testing.assert_array_equal(out_nat, out_py)
        # schedule invariants: cursors monotonically non-decreasing, cover all
        flat = out_nat[:, 0].astype(np.int64) * (2 ** 20) + out_nat[:, 1]
        assert np.all(np.diff(flat) >= 0)
        assert out_nat[0, 0] == 0 and out_nat[0, 1] == 0
        assert out_nat[-1, 0] == batch


def test_paged_mqa_schedule_zero_context_rows(monkeypatch):
    # Leading zero-context rows must not be pointed into by any start cursor
    # (ADVICE r1: phantom segment + cursor into an empty row).
    for lens in [[0, 512, 300], [0, 0, 256, 0, 1024], [0, 0, 0], [0, 256]]:
        lens = np.asarray(lens, np.int32)
        splits = -(-lens // 256)
        out_nat, tot_nat = native.paged_mqa_schedule(lens, 256, 4)
        _py_fallbacks(monkeypatch)
        out_py, tot_py = native.paged_mqa_schedule(lens, 256, 4)
        monkeypatch.undo()
        assert tot_nat == tot_py == int(splits.sum())
        np.testing.assert_array_equal(out_nat, out_py)
        for b, s in out_nat[:-1]:
            if b < lens.size:  # start cursors must land in non-empty rows
                assert s < splits[b], (lens, out_nat)
        # cursors monotone, all segments covered
        flat = out_nat[:, 0].astype(np.int64) * (2 ** 20) + out_nat[:, 1]
        assert np.all(np.diff(flat) >= 0)


def test_cache_python_fallback(tmp_path, monkeypatch):
    _py_fallbacks(monkeypatch)
    d = str(tmp_path / 'pycache')
    native.cache_put(d, 'entry', b'xyz')
    assert native.cache_get(d, 'entry') == b'xyz'
    assert native.fnv1a(b'abc') == native._fnv1a_py(b'abc')


def test_dump_dir_writes_artifacts(tmp_path, monkeypatch):
    """DGT_DUMP_DIR writes spec + lowered StableHLO on first kernel call
    (the DG_JIT_DUMP / DG_JIT_DUMP_ASM analog,
    /root/reference/csrc/jit/compiler.hpp:116-127,151-161)."""
    monkeypatch.setenv('DGT_DUMP_DIR', str(tmp_path / 'dump'))
    monkeypatch.setenv('DGT_DUMP_HLO', '1')
    # Rebuild so the wrapper is applied even if this spec was cached already.
    monkeypatch.setenv('DGT_DISABLE_KERNEL_CACHE', '1')
    import deepgemm_tpu as dg
    a = jnp.asarray(np.random.randn(128, 256), dtype=jnp.bfloat16)
    b = jnp.asarray(np.random.randn(128, 256), dtype=jnp.bfloat16)
    dg.fp8_gemm_nt(dg.per_token_cast_to_fp8(a, use_ue8m0=False),
                   dg.per_block_cast_to_fp8(b, use_ue8m0=False))
    dirs = list((tmp_path / 'dump').iterdir())
    assert len(dirs) == 1 and dirs[0].name.startswith('DenseGemmSpec_')
    names = {p.name for p in dirs[0].iterdir()}
    assert names == {'spec.txt', 'lowered_stablehlo.mlir', 'optimized_hlo.txt'}
    assert dirs[0].joinpath('spec.txt').read_text().startswith('DenseGemmSpec')
    assert 'stablehlo' in dirs[0].joinpath(
        'lowered_stablehlo.mlir').read_text() or dirs[0].joinpath(
        'lowered_stablehlo.mlir').stat().st_size > 0
