// dgt_runtime — native host runtime for deepgemm_tpu.
//
// TPU-native counterpart of the reference's C++ host tier:
//   * FNV1a content hashing            (/root/reference/csrc/utils/hash.hpp:7-40)
//   * crash/multi-writer-safe disk cache: tmp dir + atomic rename + fsync
//                                      (/root/reference/csrc/jit/compiler.hpp:78-143)
//   * grouped-layout schedule precompute — the host-side analog of the
//     persistent GEMM block scheduler  (/root/reference/deep_gemm/include/deep_gemm/scheduler/gemm.cuh:160-287)
//   * paged-MQA balanced kv-split schedule — analog of the metadata kernel
//                                      (/root/reference/deep_gemm/include/deep_gemm/scheduler/sm90_paged_mqa_logits.cuh:26-95)
//
// On GPU these run as tiny device kernels because the data lives in HBM and
// the launch is async; on TPU the planning inputs (expert ids, context lens)
// are host-visible at dispatch time, so the idiomatic design is a fast native
// host pass feeding scalar-prefetch operands to the Pallas kernels.
//
// C ABI only (loaded via ctypes; no pybind11 dependency).

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

#include <dirent.h>
#include <fcntl.h>
#include <sys/stat.h>
#include <sys/types.h>
#include <unistd.h>

extern "C" {

// ---------------------------------------------------------------------------
// FNV1a (64-bit) content hash — parity with csrc/utils/hash.hpp:7-40.
// ---------------------------------------------------------------------------
uint64_t dgt_fnv1a(const void* data, uint64_t n) {
    const unsigned char* p = static_cast<const unsigned char*>(data);
    uint64_t h = 0xcbf29ce484222325ull;
    for (uint64_t i = 0; i < n; ++i) {
        h ^= static_cast<uint64_t>(p[i]);
        h *= 0x100000001b3ull;
    }
    return h;
}

// ---------------------------------------------------------------------------
// Atomic disk cache.
//
// put: write payload into "<dir>/.tmp.<pid>.<hash>/payload", fsync the file,
// atomically rename the tmp dir to "<dir>/<name>", fsync the parent so a
// shared (networked) filesystem cache is crash- and multi-writer-safe —
// the exact protocol of Compiler::build (csrc/jit/compiler.hpp:108-143).
// Returns 0 on success (or if the entry already exists), -errno on failure.
// ---------------------------------------------------------------------------
static int fsync_path(const char* path) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -errno;
    int rc = fsync(fd) ? -errno : 0;
    close(fd);
    return rc;
}

int dgt_cache_put(const char* cache_dir, const char* name,
                  const void* data, uint64_t n) {
    std::string final_dir = std::string(cache_dir) + "/" + name;
    struct stat st;
    if (stat(final_dir.c_str(), &st) == 0)
        return 0;  // someone already published this entry

    if (mkdir(cache_dir, 0755) != 0 && errno != EEXIST)
        return -errno;

    char tmp[4096];
    snprintf(tmp, sizeof(tmp), "%s/.tmp.%d.%016llx", cache_dir, (int)getpid(),
             (unsigned long long)dgt_fnv1a(name, strlen(name)));
    if (mkdir(tmp, 0755) != 0 && errno != EEXIST)
        return -errno;

    std::string payload = std::string(tmp) + "/payload";
    int fd = open(payload.c_str(), O_WRONLY | O_CREAT | O_TRUNC, 0644);
    if (fd < 0) return -errno;
    uint64_t off = 0;
    const char* p = static_cast<const char*>(data);
    while (off < n) {
        ssize_t w = write(fd, p + off, n - off);
        if (w < 0) { int e = -errno; close(fd); return e; }
        off += static_cast<uint64_t>(w);
    }
    if (fsync(fd) != 0) { int e = -errno; close(fd); return e; }
    close(fd);

    if (rename(tmp, final_dir.c_str()) != 0) {
        int e = errno;
        if (e == ENOTEMPTY || e == EEXIST) {  // lost the race: fine
            unlink(payload.c_str());
            rmdir(tmp);
            return 0;
        }
        return -e;
    }
    fsync_path(cache_dir);  // durably publish the rename
    return 0;
}

// get: read "<dir>/<name>/payload" into buf (up to cap bytes).
// Returns payload size (even if > cap; caller re-calls with a bigger buffer),
// or -1 if the entry does not exist / is invalid.
int64_t dgt_cache_get(const char* cache_dir, const char* name,
                      void* buf, uint64_t cap) {
    std::string payload = std::string(cache_dir) + "/" + name + "/payload";
    int fd = open(payload.c_str(), O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return -1; }
    int64_t size = st.st_size;
    uint64_t want = static_cast<uint64_t>(size) < cap
                        ? static_cast<uint64_t>(size) : cap;
    uint64_t off = 0;
    char* p = static_cast<char*>(buf);
    while (off < want) {
        ssize_t r = read(fd, p + off, want - off);
        if (r <= 0) { close(fd); return -1; }
        off += static_cast<uint64_t>(r);
    }
    close(fd);
    return size;
}

// ---------------------------------------------------------------------------
// Grouped-layout schedule precompute.
//
// Contiguous m-grouped layout: ids[m] are per-row expert ids (-1 = padding).
// For each m-tile, emit the tile's group id (clamped >= 0, like the device
// scheduler reading grouped_layout[m_block * BLOCK_M],
// scheduler/gemm.cuh:160-162) and the first-invalid-row bound.
// ---------------------------------------------------------------------------
void dgt_tile_gids_from_ids(const int32_t* ids, int64_t m, int64_t block_m,
                            int32_t num_groups,
                            int32_t* gids, int32_t* row_ends) {
    // Real end row of each group (last row with that id, +1), so the
    // zero-padding epilogue can blank id == -1 rows — mirrors the device
    // scatter-max in kernels/grouped.py:compute_tile_gids.
    std::vector<int32_t> ends_real(num_groups > 0 ? num_groups : 1, 0);
    for (int64_t r = 0; r < m; ++r) {
        int32_t id = ids[r];
        if (id >= 0 && id < num_groups)
            ends_real[id] = static_cast<int32_t>(r + 1);
    }
    int64_t num_tiles = (m + block_m - 1) / block_m;
    for (int64_t t = 0; t < num_tiles; ++t) {
        int32_t id = ids[t * block_m];
        gids[t] = id < 0 ? 0 : id;
        row_ends[t] = ends_real[gids[t]];
    }
}

// Psum layout: ends[g] are cumulative per-group end offsets
// (scheduler/gemm.cuh:253-262). For each tile: the group whose range contains
// the tile start, plus that group's end row (for `ensure_zero_padding`).
void dgt_tile_gids_from_psum(const int32_t* ends, int32_t num_groups,
                             int64_t m, int64_t block_m,
                             int32_t* gids, int32_t* row_ends) {
    int64_t num_tiles = (m + block_m - 1) / block_m;
    int32_t g = 0;
    for (int64_t t = 0; t < num_tiles; ++t) {
        int64_t start = t * block_m;
        while (g < num_groups - 1 && ends[g] <= start) ++g;
        gids[t] = g;
        row_ends[t] = ends[g];
    }
}

// K-grouped prefix offsets with per-group alignment — the host-side walk the
// reference does when transforming per-group SF with padding
// (csrc/apis/gemm.hpp:334-336). offs has g+1 entries.
void dgt_k_group_offsets(const int32_t* ks, int32_t g, int32_t alignment,
                         int32_t* offs) {
    int32_t acc = 0;
    offs[0] = 0;
    for (int32_t i = 0; i < g; ++i) {
        int32_t aligned = (ks[i] + alignment - 1) / alignment * alignment;
        acc += aligned;
        offs[i + 1] = acc;
    }
}

// ---------------------------------------------------------------------------
// Paged-MQA balanced schedule.
//
// Splits each batch row's context into ceil(ctx / block_kv) segments and
// assigns contiguous segment ranges to `num_units` workers so each gets
// ~total/num_units — the host analog of the single-warp metadata kernel
// (scheduler/sm90_paged_mqa_logits.cuh:26-95). Output: [num_units + 1] x 2
// int32 (batch index, kv split index) marking each worker's start cursor;
// the final row is the end cursor.  Returns total number of kv segments.
// ---------------------------------------------------------------------------
int32_t dgt_paged_mqa_schedule(const int32_t* context_lens, int32_t batch,
                               int32_t block_kv, int32_t num_units,
                               int32_t* out) {
    int64_t total = 0;
    for (int32_t b = 0; b < batch; ++b)
        total += (context_lens[b] + block_kv - 1) / block_kv;

    int64_t done = 0;   // segments consumed
    int32_t b = 0, s = 0;
    int32_t splits_b = batch > 0 ? (context_lens[0] + block_kv - 1) / block_kv : 0;
    for (int32_t u = 0; u < num_units; ++u) {
        // Normalize past empty (zero-context) rows BEFORE emitting the start
        // cursor, so a leading context_lens[0] == 0 row is never pointed into.
        while (b < batch && s >= splits_b) {
            s = 0; ++b;
            splits_b = b < batch
                ? (context_lens[b] + block_kv - 1) / block_kv : 0;
        }
        out[2 * u] = b;
        out[2 * u + 1] = s;
        // advance the cursor by this unit's share
        int64_t target = total * (u + 1) / num_units;
        while (done < target && b < batch) {
            ++s; ++done;
            while (b < batch && s >= splits_b) {
                s = 0; ++b;
                splits_b = b < batch
                    ? (context_lens[b] + block_kv - 1) / block_kv : 0;
            }
        }
    }
    out[2 * num_units] = b;
    out[2 * num_units + 1] = s;
    return static_cast<int32_t>(total);
}

}  // extern "C"
