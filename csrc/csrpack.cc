// Native sparse weight packing: the WeightAlign hot path in C++.
//
// The reference's dense->CSR conversion and column-blocked repacking run in
// C++/cuSPARSE at model-load time (`src/caffe/layers/base_conv_layer.cpp:46-273`,
// `src/caffe/util/math_functions.cpp:77-126`). For large model zoos (VGG:
// 134M params) the numpy packer costs seconds per model; this native packer
// threads across block columns.
//
// Implements the padded per-block-column BSC layout of sparse/formats.py:
//   blocks   [n_bcols, max_bw, bk, bn]   (zero padded)
//   block_row[n_bcols, max_bw]
//   bcol_nnz [n_bcols]
// Two-phase C ABI (ctypes): scan (nnz pattern -> max_bw), then pack into
// caller-allocated numpy buffers.

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

struct Dims {
  int64_t rows, cols, bk, bn, n_brows, n_bcols;
};

Dims MakeDims(int64_t rows, int64_t cols, int64_t bk, int64_t bn) {
  Dims d;
  d.rows = rows;
  d.cols = cols;
  d.bk = bk;
  d.bn = bn;
  d.n_brows = (rows + bk - 1) / bk;
  d.n_bcols = (cols + bn - 1) / bn;
  return d;
}

bool BlockLive(const float* w, const Dims& d, int64_t br, int64_t bc) {
  const int64_t r0 = br * d.bk, c0 = bc * d.bn;
  const int64_t r1 = std::min(d.rows, r0 + d.bk);
  const int64_t c1 = std::min(d.cols, c0 + d.bn);
  for (int64_t r = r0; r < r1; ++r) {
    const float* row = w + r * d.cols;
    for (int64_t c = c0; c < c1; ++c) {
      if (row[c] != 0.0f) return true;
    }
  }
  return false;
}

void ParallelFor(int64_t n, int threads,
                 const std::function<void(int64_t)>& fn) {
  if (threads <= 1 || n <= 1) {
    for (int64_t i = 0; i < n; ++i) fn(i);
    return;
  }
  std::atomic<int64_t> next{0};
  std::vector<std::thread> pool;
  int t = std::min<int64_t>(threads, n);
  for (int i = 0; i < t; ++i) {
    pool.emplace_back([&] {
      for (int64_t j; (j = next.fetch_add(1)) < n;) fn(j);
    });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// Phase 1: per-block-column nnz counts. bcol_nnz: [n_bcols] int32 out.
// Returns max_bw (>= 1).
int64_t bsc_scan(const float* w, int64_t rows, int64_t cols, int64_t bk,
                 int64_t bn, int32_t* bcol_nnz, int threads) {
  Dims d = MakeDims(rows, cols, bk, bn);
  ParallelFor(d.n_bcols, threads, [&](int64_t bc) {
    int32_t n = 0;
    for (int64_t br = 0; br < d.n_brows; ++br) {
      if (BlockLive(w, d, br, bc)) ++n;
    }
    bcol_nnz[bc] = n;
  });
  int64_t max_bw = 1;
  for (int64_t bc = 0; bc < d.n_bcols; ++bc) {
    max_bw = std::max<int64_t>(max_bw, bcol_nnz[bc]);
  }
  return max_bw;
}

// Phase 2: pack. blocks: [n_bcols, max_bw, bk, bn] f32 (pre-zeroed by
// caller); block_row: [n_bcols, max_bw] int32 (pre-zeroed).
void bsc_pack(const float* w, int64_t rows, int64_t cols, int64_t bk,
              int64_t bn, int64_t max_bw, float* blocks, int32_t* block_row,
              int threads) {
  Dims d = MakeDims(rows, cols, bk, bn);
  ParallelFor(d.n_bcols, threads, [&](int64_t bc) {
    int64_t slot = 0;
    for (int64_t br = 0; br < d.n_brows && slot < max_bw; ++br) {
      if (!BlockLive(w, d, br, bc)) continue;
      float* dst = blocks + ((bc * max_bw + slot) * d.bk) * d.bn;
      const int64_t r0 = br * d.bk, c0 = bc * d.bn;
      const int64_t r1 = std::min(d.rows, r0 + d.bk);
      const int64_t c1 = std::min(d.cols, c0 + d.bn);
      for (int64_t r = r0; r < r1; ++r) {
        std::memcpy(dst + (r - r0) * d.bn, w + r * d.cols + c0,
                    (c1 - c0) * sizeof(float));
      }
      block_row[bc * max_bw + slot] = static_cast<int32_t>(br);
      ++slot;
    }
  });
}

// Element-wise magnitude stats used by sparsity logging.
void sparsity_stats(const float* w, int64_t n, int64_t* nnz_out,
                    double* l1_out) {
  int64_t nnz = 0;
  double l1 = 0.0;
  for (int64_t i = 0; i < n; ++i) {
    if (w[i] != 0.0f) {
      ++nnz;
      l1 += std::abs(w[i]);
    }
  }
  *nnz_out = nnz;
  *l1_out = l1;
}

}  // extern "C"
