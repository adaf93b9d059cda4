// drs_io: native host-side IO/repack engine for diffusion_rs_tpu.
//
// The reference's load path is native Rust: mmap'd safetensors with
// per-file loader threads (varbuilder_loading.rs), zero-copy DDUF zip
// slices (model_source.rs:225-233), and SIMD quant repack (k_quants.rs).
// This library provides the TPU build's equivalents for the host-side
// work that dominates checkpoint load time:
//
//   * drs_transpose_*    — parallel blocked 2-D transpose (torch [out,in]
//                          checkpoints -> K-major [in,out] device layout)
//   * drs_bnb_repack4    — bnb 4-bit nibble stream -> canonical split-block
//                          packed [K/2, N] layout (quant/qtensor.py contract)
//   * drs_file_read      — positioned parallel read of N file spans into
//                          caller buffers (thread pool, O_DIRECT-free)
//
// Built as a dependency-free shared library; Python binds via ctypes
// (diffusion_rs_tpu/io/native.py) and falls back to numpy when absent.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#if defined(__unix__) || defined(__APPLE__)
#include <fcntl.h>
#include <unistd.h>
#endif

namespace {

int hardware_threads() {
  unsigned n = std::thread::hardware_concurrency();
  return n ? static_cast<int>(n) : 4;
}

// Run fn(i) for i in [0, n) over a transient pool.
template <typename F>
void parallel_for(int64_t n, F fn, int max_threads = 0) {
  int nt = max_threads > 0 ? max_threads : hardware_threads();
  if (nt > n) nt = static_cast<int>(n);
  if (nt <= 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next(0);
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    pool.emplace_back([&] {
      for (;;) {
        int64_t i = next.fetch_add(1);
        if (i >= n) return;
        fn(i);
      }
    });
  }
  for (auto& th : pool) th.join();
}

constexpr int64_t kBlock = 64;  // cache-blocked transpose tile

template <typename T>
void transpose_blocked(const T* src, T* dst, int64_t rows, int64_t cols) {
  int64_t rb = (rows + kBlock - 1) / kBlock;
  int64_t cb = (cols + kBlock - 1) / kBlock;
  parallel_for(rb * cb, [&](int64_t idx) {
    int64_t bi = idx / cb, bj = idx % cb;
    int64_t r0 = bi * kBlock, r1 = std::min(rows, r0 + kBlock);
    int64_t c0 = bj * kBlock, c1 = std::min(cols, c0 + kBlock);
    for (int64_t r = r0; r < r1; ++r)
      for (int64_t c = c0; c < c1; ++c) dst[c * rows + r] = src[r * cols + c];
  });
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// Parallel transpose: src [rows, cols] row-major -> dst [cols, rows].
// elem_size in {1, 2, 4, 8}.
// ---------------------------------------------------------------------------
int drs_transpose_2d(const void* src, void* dst, int64_t rows, int64_t cols,
                     int elem_size) {
  switch (elem_size) {
    case 1:
      transpose_blocked(static_cast<const uint8_t*>(src),
                        static_cast<uint8_t*>(dst), rows, cols);
      return 0;
    case 2:
      transpose_blocked(static_cast<const uint16_t*>(src),
                        static_cast<uint16_t*>(dst), rows, cols);
      return 0;
    case 4:
      transpose_blocked(static_cast<const uint32_t*>(src),
                        static_cast<uint32_t*>(dst), rows, cols);
      return 0;
    case 8:
      transpose_blocked(static_cast<const uint64_t*>(src),
                        static_cast<uint64_t*>(dst), rows, cols);
      return 0;
    default:
      return -1;
  }
}

// ---------------------------------------------------------------------------
// bnb 4-bit repack: the checkpoint stores a flat nibble stream over the
// row-major [out, in] weight where byte i holds element 2i in the HIGH
// nibble (dequant.cu:148-152). Canonical target layout (quant/qtensor.py):
// K-major [K, N] (K = in features), nibble-packed split-block style —
// packed[kb*split/2 + r, n] holds k=kb*split+r (low nibble) and
// k=kb*split+split/2+r (high nibble).
//
// src:  n_out*n_in/2 bytes (flat bnb stream)
// dst:  (n_in/2) * n_out bytes
// ---------------------------------------------------------------------------
int drs_bnb_repack4(const uint8_t* src, uint8_t* dst, int64_t n_out,
                    int64_t n_in, int64_t split) {
  if (n_in % 2 || split % 2 || n_in % split) return -1;
  int64_t half = split / 2;
  // parallel over output columns (one source row each)
  parallel_for(n_out, [&](int64_t o) {
    const uint8_t* srow = src + o * (n_in / 2);
    // element e of row o = nibble at flat index o*n_in + e
    for (int64_t kb = 0; kb < n_in / split; ++kb) {
      for (int64_t r = 0; r < half; ++r) {
        int64_t k_lo = kb * split + r;
        int64_t k_hi = k_lo + half;
        uint8_t b_lo = srow[k_lo >> 1];
        uint8_t lo = (k_lo & 1) ? (b_lo & 0xF) : (b_lo >> 4);
        uint8_t b_hi = srow[k_hi >> 1];
        uint8_t hi = (k_hi & 1) ? (b_hi & 0xF) : (b_hi >> 4);
        dst[(kb * half + r) * n_out + o] =
            static_cast<uint8_t>(lo | (hi << 4));
      }
    }
  });
  return 0;
}

// ---------------------------------------------------------------------------
// Parallel positioned reads: for each span i, read sizes[i] bytes at
// offsets[i] from fd path into dsts[i]. Returns 0 on success.
// ---------------------------------------------------------------------------
int drs_file_read_spans(const char* path, int64_t n_spans,
                        const int64_t* offsets, const int64_t* sizes,
                        uint8_t** dsts, int threads) {
#if defined(__unix__) || defined(__APPLE__)
  int fd = open(path, O_RDONLY);
  if (fd < 0) return -1;
  std::atomic<int> err(0);
  parallel_for(
      n_spans,
      [&](int64_t i) {
        int64_t off = offsets[i], left = sizes[i];
        uint8_t* dst = dsts[i];
        while (left > 0) {
          ssize_t got = pread(fd, dst, static_cast<size_t>(left), off);
          if (got <= 0) {
            err.store(-2);
            return;
          }
          dst += got;
          off += got;
          left -= got;
        }
      },
      threads);
  close(fd);
  return err.load();
#else
  (void)path;
  (void)n_spans;
  (void)offsets;
  (void)sizes;
  (void)dsts;
  (void)threads;
  return -3;
#endif
}

int drs_version() { return 1; }

}  // extern "C"
