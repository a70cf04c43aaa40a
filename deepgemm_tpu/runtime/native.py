"""Native runtime loader — the TPU-native analog of the reference's JIT
compiler driver (/root/reference/csrc/jit/compiler.hpp:100-149).

The reference JIT-compiles CUDA kernel stubs with NVCC/NVRTC and caches cubins
on disk keyed by a content hash. Here the *device* code path is Pallas/XLA
(cached by the JAX persistent compilation cache, runtime/cache.py); what
remains native is the **host runtime**: schedule precompute, hashing, and the
crash-safe disk cache, implemented in C++ (csrc/dgt_runtime.cpp) and built on
first use by this driver with the same cache protocol:

    name  = 'dgt_runtime'
    key   = fnv1a(source + compiler signature + flags)
    dir   = <cache>/kernel.<name>.<key>/     (tmp dir + atomic rename + fsync)

Every entry point has a pure-Python fallback so the package works without a
toolchain (the analog of the reference's PyTorch fallbacks for odd shapes,
csrc/jit_kernels/impls/smxx_layout.hpp).
"""

import ctypes
import functools
import os
import shutil
import subprocess
import tempfile

import numpy as np

_PKG_DIR = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# repo checkout layout, then installed-wheel layout (setup.py ships csrc/ as
# deepgemm_tpu/_csrc — the analog of the reference shipping its include tree)
_SRC_CANDIDATES = [
    os.path.join(os.path.dirname(_PKG_DIR), 'csrc', 'dgt_runtime.cpp'),
    os.path.join(_PKG_DIR, '_csrc', 'dgt_runtime.cpp'),
]
_SRC_PATH = next((p for p in _SRC_CANDIDATES if os.path.exists(p)),
                 _SRC_CANDIDATES[0])


def _fnv1a_py(data: bytes) -> int:
    h = 0xcbf29ce484222325
    for b in data:
        h = ((h ^ b) * 0x100000001b3) & 0xFFFFFFFFFFFFFFFF
    return h


def _cache_root() -> str:
    return os.environ.get(
        'DGT_NATIVE_CACHE_DIR',
        os.path.expanduser('~/.deepgemm_tpu/native'))


def _compiler() -> str:
    return os.environ.get('DGT_CXX', shutil.which('g++') or 'g++')


def _build_library() -> str:
    """Compile csrc/dgt_runtime.cpp -> cached .so (atomic publish). Mirrors
    Compiler::build's flow: hash -> cache hit -> tmp build -> rename."""
    with open(_SRC_PATH, 'rb') as f:
        src = f.read()
    cxx = _compiler()
    try:
        sig = subprocess.run([cxx, '--version'], capture_output=True,
                             timeout=30).stdout[:200]
    except Exception:
        sig = b'unknown'
    flags = ['-O2', '-shared', '-fPIC', '-std=c++17']
    key = _fnv1a_py(src + sig + ' '.join(flags).encode())
    root = _cache_root()
    final_dir = os.path.join(root, f'kernel.dgt_runtime.{key:016x}')
    so_path = os.path.join(final_dir, 'libdgt_runtime.so')
    if os.path.exists(so_path):
        return so_path

    os.makedirs(root, exist_ok=True)
    tmp_dir = tempfile.mkdtemp(prefix='.tmp.', dir=root)
    tmp_so = os.path.join(tmp_dir, 'libdgt_runtime.so')
    subprocess.run([cxx, *flags, '-o', tmp_so, _SRC_PATH],
                   check=True, capture_output=True, timeout=120)
    # fsync the artifact, then atomically publish the directory
    with open(tmp_so, 'rb') as f:
        os.fsync(f.fileno())
    try:
        os.rename(tmp_dir, final_dir)
    except OSError:
        shutil.rmtree(tmp_dir, ignore_errors=True)   # lost the race
    dfd = os.open(root, os.O_RDONLY)
    try:
        os.fsync(dfd)
    finally:
        os.close(dfd)
    return so_path


@functools.lru_cache(maxsize=1)
def _lib():
    """Load (building if needed) the native library; None -> fallbacks."""
    if os.environ.get('DGT_DISABLE_NATIVE', '0') == '1':
        return None
    try:
        lib = ctypes.CDLL(_build_library())
    except Exception:
        return None
    lib.dgt_fnv1a.restype = ctypes.c_uint64
    lib.dgt_fnv1a.argtypes = [ctypes.c_void_p, ctypes.c_uint64]
    lib.dgt_cache_put.restype = ctypes.c_int
    lib.dgt_cache_put.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                  ctypes.c_void_p, ctypes.c_uint64]
    lib.dgt_cache_get.restype = ctypes.c_int64
    lib.dgt_cache_get.argtypes = [ctypes.c_char_p, ctypes.c_char_p,
                                  ctypes.c_void_p, ctypes.c_uint64]
    lib.dgt_tile_gids_from_ids.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int32,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.dgt_tile_gids_from_psum.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_void_p, ctypes.c_void_p]
    lib.dgt_k_group_offsets.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_void_p]
    lib.dgt_paged_mqa_schedule.restype = ctypes.c_int32
    lib.dgt_paged_mqa_schedule.argtypes = [
        ctypes.c_void_p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_void_p]
    return lib


def native_available() -> bool:
    return _lib() is not None


# ---------------------------------------------------------------------------
# Public wrappers (numpy in/out, host-side)
# ---------------------------------------------------------------------------

def fnv1a(data: bytes) -> int:
    """64-bit FNV1a hash (parity: /root/reference/csrc/utils/hash.hpp:7-40)."""
    lib = _lib()
    if lib is None:
        return _fnv1a_py(data)
    buf = ctypes.create_string_buffer(data, len(data))
    return int(lib.dgt_fnv1a(buf, len(data)))


def cache_put(cache_dir: str, name: str, payload: bytes) -> None:
    """Atomically publish a named cache entry (tmp dir + rename + fsync,
    parity: /root/reference/csrc/jit/compiler.hpp:108-143)."""
    lib = _lib()
    if lib is not None:
        rc = lib.dgt_cache_put(cache_dir.encode(), name.encode(),
                               payload, len(payload))
        if rc != 0:
            raise OSError(-rc, f'dgt_cache_put failed for {name}')
        return
    # Python fallback with the same protocol
    final_dir = os.path.join(cache_dir, name)
    if os.path.isdir(final_dir):
        return
    os.makedirs(cache_dir, exist_ok=True)
    tmp = tempfile.mkdtemp(prefix='.tmp.', dir=cache_dir)
    path = os.path.join(tmp, 'payload')
    with open(path, 'wb') as f:
        f.write(payload)
        f.flush()
        os.fsync(f.fileno())
    try:
        os.rename(tmp, final_dir)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)


def cache_get(cache_dir: str, name: str):
    """Fetch a cache entry's payload bytes, or None."""
    lib = _lib()
    if lib is None:
        path = os.path.join(cache_dir, name, 'payload')
        try:
            with open(path, 'rb') as f:
                return f.read()
        except OSError:
            return None
    size = lib.dgt_cache_get(cache_dir.encode(), name.encode(), None, 0)
    if size < 0:
        return None
    buf = ctypes.create_string_buffer(size)
    got = lib.dgt_cache_get(cache_dir.encode(), name.encode(), buf, size)
    if got != size:
        return None
    return buf.raw


def tile_gids_from_ids(ids: np.ndarray, block_m: int, num_groups: int):
    """Host-side contiguous-layout schedule (per-m-tile group id + row end);
    analog of the device scheduler reads, scheduler/gemm.cuh:160-162."""
    ids = np.ascontiguousarray(ids, dtype=np.int32)
    m = ids.shape[0]
    num_tiles = -(-m // block_m)
    gids = np.empty(num_tiles, np.int32)
    ends = np.empty(num_tiles, np.int32)
    lib = _lib()
    if lib is not None:
        lib.dgt_tile_gids_from_ids(
            ids.ctypes.data, m, block_m, num_groups,
            gids.ctypes.data, ends.ctypes.data)
        return gids, ends
    starts = np.arange(num_tiles) * block_m
    gids[:] = np.maximum(ids[starts], 0)
    # real per-group end rows (mirrors the device scatter-max and the C++)
    ends_real = np.zeros(max(num_groups, 1), np.int32)
    valid = ids >= 0
    np.maximum.at(ends_real, ids[valid], np.nonzero(valid)[0].astype(np.int32) + 1)
    ends[:] = ends_real[gids]
    return gids, ends


def tile_gids_from_psum(psum_ends: np.ndarray, m: int, block_m: int):
    """Host-side psum-layout schedule; analog of scheduler/gemm.cuh:253-262."""
    psum_ends = np.ascontiguousarray(psum_ends, dtype=np.int32)
    g = psum_ends.shape[0]
    num_tiles = -(-m // block_m)
    gids = np.empty(num_tiles, np.int32)
    ends = np.empty(num_tiles, np.int32)
    lib = _lib()
    if lib is not None:
        lib.dgt_tile_gids_from_psum(
            psum_ends.ctypes.data, g, m, block_m,
            gids.ctypes.data, ends.ctypes.data)
        return gids, ends
    starts = np.arange(num_tiles) * block_m
    gg = np.searchsorted(psum_ends, starts, side='right')
    gg = np.minimum(gg, g - 1)
    gids[:] = gg
    ends[:] = psum_ends[gg]
    return gids, ends


def k_group_offsets(ks: np.ndarray, alignment: int = 1) -> np.ndarray:
    """Aligned prefix offsets over per-group k sizes (host walk parity:
    /root/reference/csrc/apis/gemm.hpp:334-336)."""
    ks = np.ascontiguousarray(ks, dtype=np.int32)
    g = ks.shape[0]
    offs = np.empty(g + 1, np.int32)
    lib = _lib()
    if lib is not None:
        lib.dgt_k_group_offsets(ks.ctypes.data, g, alignment, offs.ctypes.data)
        return offs
    aligned = -(-ks // alignment) * alignment
    offs[0] = 0
    offs[1:] = np.cumsum(aligned)
    return offs


def paged_mqa_schedule(context_lens: np.ndarray, block_kv: int,
                       num_units: int):
    """Balanced (batch, kv-split) work assignment across `num_units` workers —
    host analog of the metadata kernel
    (scheduler/sm90_paged_mqa_logits.cuh:26-95). Returns ([num_units+1, 2]
    int32 cursors, total segments)."""
    context_lens = np.ascontiguousarray(context_lens, dtype=np.int32)
    batch = context_lens.shape[0]
    out = np.empty((num_units + 1, 2), np.int32)
    lib = _lib()
    if lib is not None:
        total = lib.dgt_paged_mqa_schedule(
            context_lens.ctypes.data, batch, block_kv, num_units,
            out.ctypes.data)
        return out, int(total)
    splits = -(-context_lens // block_kv)
    total = int(splits.sum())
    cum = np.concatenate([[0], np.cumsum(splits)])
    done, b, s = 0, 0, 0
    for u in range(num_units):
        # Normalize past empty (zero-context) rows before emitting the start
        # cursor (mirrors the C++ fix for a leading context_lens[0] == 0 row).
        while b < batch and s >= splits[b]:
            s = 0
            b += 1
        out[u] = (b, s)
        target = total * (u + 1) // num_units
        while done < target and b < batch:
            s += 1
            done += 1
            while b < batch and s >= splits[b]:
                s = 0
                b += 1
    out[num_units] = (b, s)
    return out, total
