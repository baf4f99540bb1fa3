// Native CPU blocked direct sparse convolution — the product-grade host
// path (the reference's AVX register-blocked `caffe_cpu_blocked_sconv`,
// `include/caffe/util/sconv.hpp:83-678`, rebuilt over this framework's
// BSC layout instead of column-blocked CSR).
//
// Executes the same decomposition as the XBSP unroll
// (kernels/xla_block_sparse.py): one accumulation per live
// (kernel-offset, cin-block, cout-block) weight block, shifted over the
// UNPADDED ifmap (halo handled by index clamping — the pad-free form).
// The inner (cin_lane x cout_lane) product is written so g++ -march=native
// autovectorizes it over the bn lane dimension (the SIMD abstraction the
// reference hand-rolled with intrinsics; sconv.hpp:24-40).
//
// Layouts (all row-major, f32):
//   x        [n, h, w, cin]           NHWC, unpadded
//   blocks   [n_bcols, max_bw, bk, bn]  (BSC of the K = kh*kw*cin_pad GEMM
//   block_row[n_bcols, max_bw]           view; formats.py)
//   bcol_nnz [n_bcols]
//   bias     [cout] or null
//   out      [n, ho, wo, cout]        caller-allocated
//
// Parallelism: threads stripe over (image, output-row) pairs — the same
// unit the reference threads with OpenMP (`base_conv_layer.cpp:627+`).

#include <algorithm>
#include <atomic>
#include <cstdint>
#include <cstring>
#include <functional>
#include <thread>
#include <vector>

namespace {

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

// Returns 0 on success. relu != 0 fuses max(0, .) into the epilogue.
int bsc_sconv(const float* x, int64_t n, int64_t h, int64_t w, int64_t cin,
              const float* blocks, const int32_t* block_row,
              const int32_t* bcol_nnz, int64_t n_bcols, int64_t max_bw,
              int64_t bk, int64_t bn, int64_t cin_pad, int64_t kh,
              int64_t kw, int64_t ph, int64_t pw, int64_t sh, int64_t sw,
              int64_t cout, const float* bias, int relu, float* out,
              int threads) {
  const int64_t ho = (h + 2 * ph - kh) / sh + 1;
  const int64_t wo = (w + 2 * pw - kw) / sw + 1;
  const int64_t n_cin_b = cin_pad / bk;
  if (ho <= 0 || wo <= 0 || n_cin_b <= 0) return 1;

  ParallelFor(n * ho, threads, [&](int64_t job) {
    const int64_t img = job / ho;
    const int64_t oy = job % ho;
    std::vector<float> acc(wo * bn);
    float* orow = out + ((img * ho + oy) * wo) * cout;
    for (int64_t j = 0; j < n_bcols; ++j) {
      const int64_t c_lo = j * bn;
      const int64_t c_hi = std::min(cout, c_lo + bn);
      const int64_t cw = c_hi - c_lo;
      if (cw <= 0) break;
      std::fill(acc.begin(), acc.end(), 0.0f);
      const int32_t nnz = bcol_nnz[j];
      for (int32_t s = 0; s < nnz; ++s) {
        const int64_t kblk = block_row[j * max_bw + s];
        const int64_t off = kblk / n_cin_b;
        const int64_t cb = kblk % n_cin_b;
        const int64_t ky = off / kw;
        const int64_t kx = off % kw;
        const int64_t iy = oy * sh + ky - ph;
        if (iy < 0 || iy >= h) continue;
        const int64_t cbase = cb * bk;
        if (cbase >= cin) continue;  // channel-pad block: all zero input
        const int64_t kb_eff = std::min(bk, cin - cbase);
        const float* blk = blocks + (j * max_bw + s) * bk * bn;
        const float* xrow0 = x + ((img * h + iy) * w) * cin + cbase;
        // valid ox range solved up front (no per-pixel branch): the
        // columns whose input ix = ox*sw + kx - pw lands in [0, w)
        const int64_t ox0 = std::max<int64_t>(
            0, (pw - kx + sw - 1) / sw);
        const int64_t ox1 = std::min(wo - 1, (w - 1 - kx + pw) / sw);
        // register-block 4 output pixels per weight-row stream: blk is
        // bk*bn floats (64 KB at 128x128, larger than L1) — amortizing
        // each wrow load across 4 accumulators quarters that traffic
        // (the reference's register blocking, sconv.hpp:83-91)
        int64_t ox = ox0;
        for (; ox + 3 <= ox1; ox += 4) {
          const float* __restrict x0 = xrow0 + (ox * sw + kx - pw) * cin;
          const float* __restrict x1 = x0 + sw * cin;
          const float* __restrict x2 = x1 + sw * cin;
          const float* __restrict x3 = x2 + sw * cin;
          float* __restrict a0 = acc.data() + ox * bn;
          float* __restrict a1 = a0 + bn;
          float* __restrict a2 = a1 + bn;
          float* __restrict a3 = a2 + bn;
          for (int64_t kk = 0; kk < kb_eff; ++kk) {
            const float k0 = x0[kk], k1 = x1[kk], k2 = x2[kk], k3 = x3[kk];
            const float* __restrict wrow = blk + kk * bn;
            for (int64_t nn = 0; nn < bn; ++nn) {
              const float wv = wrow[nn];
              a0[nn] += k0 * wv;
              a1[nn] += k1 * wv;
              a2[nn] += k2 * wv;
              a3[nn] += k3 * wv;
            }
          }
        }
        for (; ox <= ox1; ++ox) {
          const int64_t ix = ox * sw + kx - pw;
          const float* __restrict xv = xrow0 + ix * cin;
          float* __restrict a = acc.data() + ox * bn;
          for (int64_t kk = 0; kk < kb_eff; ++kk) {
            const float xk = xv[kk];
            const float* __restrict wrow = blk + kk * bn;
            for (int64_t nn = 0; nn < bn; ++nn) a[nn] += xk * wrow[nn];
          }
        }
      }
      for (int64_t ox = 0; ox < wo; ++ox) {
        const float* a = acc.data() + ox * bn;
        float* o = orow + ox * cout + c_lo;
        if (bias != nullptr) {
          const float* b = bias + c_lo;
          if (relu) {
            for (int64_t c = 0; c < cw; ++c)
              o[c] = std::max(0.0f, a[c] + b[c]);
          } else {
            for (int64_t c = 0; c < cw; ++c) o[c] = a[c] + b[c];
          }
        } else if (relu) {
          for (int64_t c = 0; c < cw; ++c) o[c] = std::max(0.0f, a[c]);
        } else {
          std::memcpy(o, a, cw * sizeof(float));
        }
      }
    }
  });
  return 0;
}

}  // extern "C"
