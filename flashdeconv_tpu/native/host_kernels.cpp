// Native host kernels for the O(nnz) CSR passes that feed the TPU solver.
//
// The TPU owns the iterative solve; these kernels own the single-pass host
// stages whose numpy implementations are memory-bound and GIL-threaded:
//
//   * log1p_cpm_moments_*  — per-gene sum / sum-of-squares of
//     log1p(count * per-row scale) over a CSR matrix (the Seurat-v3 HVG
//     moments, reference flashdeconv/utils/genes.py:52-83). One fused pass:
//     scale -> log1p -> two column accumulations, instead of numpy's four
//     materialized temporaries + two bincounts per block.
//
//   * countsketch_project_* — CountSketch projection out[r, bucket[g]] +=
//     weight[g] * Y[r, g] (reference flashdeconv/core/sketching.py:160-206).
//     Each CSR row writes one 8 KB output row: a pure scatter that a
//     sparse-sparse matmul (scipy) pays hash/sort overhead for.
//
// Determinism contract: results are bit-identical to the numpy block
// implementation they replace. Both kernels accumulate in float64 in nnz
// order within each 65536-row block / row, and block partials are reduced
// in block order on the calling thread — the same association order as the
// numpy path (bincount over blocks + ordered block reduction), so the f64
// pipeline stays byte-stable regardless of thread scheduling.
//
// Parallelism: std::thread over contiguous block ranges; each thread writes
// only its own blocks' partials (moments) or its own rows (projection), so
// there is no sharing and no atomics.
//
// Build: g++ -O3 -std=c++17 -shared -fPIC -pthread (see native/__init__.py;
// loaded via ctypes — no pybind11 dependency).

#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

constexpr int64_t kBlockRows = 65536;  // mirrors the numpy block size

inline int64_t n_blocks(int64_t n_rows) {
  return (n_rows + kBlockRows - 1) / kBlockRows;
}

// Launch `fn(block_index)` over all blocks on `n_threads` threads with a
// static contiguous partition (deterministic ownership, zero contention).
template <typename Fn>
void parallel_blocks(int64_t blocks, int n_threads, Fn fn) {
  if (n_threads <= 1 || blocks <= 1) {
    for (int64_t b = 0; b < blocks; ++b) fn(b);
    return;
  }
  int t_used = static_cast<int>(
      std::min<int64_t>(n_threads, blocks));
  std::vector<std::thread> threads;
  threads.reserve(t_used);
  for (int t = 0; t < t_used; ++t) {
    threads.emplace_back([=]() {
      // interleaved assignment balances skewed nnz distributions
      for (int64_t b = t; b < blocks; b += t_used) fn(b);
    });
  }
  for (auto& th : threads) th.join();
}

// CalcT is the intermediate precision: double mirrors numpy's float64 path
// (f64 data x f64 scale); float mirrors its float32 path (f32 CSR data, f32
// scale -> f32 product/log1p/square, accumulated in f64 by bincount).
template <typename DataT, typename IdxT, typename CalcT = double>
void log1p_cpm_moments_impl(const int64_t* indptr, const IdxT* indices,
                            const DataT* data, const double* scale,
                            int64_t n_rows, int64_t n_genes, int n_threads,
                            double* out_sum, double* out_sumsq) {
  const int64_t blocks = n_blocks(n_rows);
  // Per-block partials, reduced in block order afterwards (determinism).
  std::vector<double> partial(static_cast<size_t>(blocks) * n_genes * 2, 0.0);

  parallel_blocks(blocks, n_threads, [&](int64_t b) {
    double* psum = partial.data() + static_cast<size_t>(b) * n_genes * 2;
    double* psq = psum + n_genes;
    const int64_t r0 = b * kBlockRows;
    const int64_t r1 = std::min(r0 + kBlockRows, n_rows);
    for (int64_t r = r0; r < r1; ++r) {
      const CalcT s = static_cast<CalcT>(scale[r]);
      for (int64_t i = indptr[r]; i < indptr[r + 1]; ++i) {
        const CalcT v = std::log1p(static_cast<CalcT>(data[i]) * s);
        const IdxT g = indices[i];
        psum[g] += static_cast<double>(v);
        psq[g] += static_cast<double>(v * v);
      }
    }
  });

  std::memset(out_sum, 0, sizeof(double) * n_genes);
  std::memset(out_sumsq, 0, sizeof(double) * n_genes);
  for (int64_t b = 0; b < blocks; ++b) {
    const double* psum = partial.data() + static_cast<size_t>(b) * n_genes * 2;
    const double* psq = psum + n_genes;
    for (int64_t g = 0; g < n_genes; ++g) {
      out_sum[g] += psum[g];
      out_sumsq[g] += psq[g];
    }
  }
}

template <typename DataT, typename IdxT>
void countsketch_project_impl(const int64_t* indptr, const IdxT* indices,
                              const DataT* data, const int32_t* buckets,
                              const double* weights, int64_t n_rows,
                              int64_t sketch_dim, int n_threads,
                              double* out) {
  // Rows are independent outputs: parallelize over row blocks directly.
  // Each worker zeroes its own block region (not one big memset up front):
  // the output is a fresh allocation, and first-touch page faults serialize
  // brutally on ballooned/overcommitted VMs — faulting from all threads is
  // the difference between ~0.5 s and ~40 s at a 4 GB output.
  parallel_blocks(n_blocks(n_rows), n_threads, [&](int64_t b) {
    const int64_t r0 = b * kBlockRows;
    const int64_t r1 = std::min(r0 + kBlockRows, n_rows);
    std::memset(out + static_cast<size_t>(r0) * sketch_dim, 0,
                sizeof(double) * static_cast<size_t>(r1 - r0) * sketch_dim);
    for (int64_t r = r0; r < r1; ++r) {
      double* row = out + static_cast<size_t>(r) * sketch_dim;
      for (int64_t i = indptr[r]; i < indptr[r + 1]; ++i) {
        const IdxT g = indices[i];
        row[buckets[g]] += weights[g] * static_cast<double>(data[i]);
      }
    }
  });
}

// Column-subset of a CSR matrix via a gene lookup table (new_col[g] < 0
// drops gene g). Bit-identical to scipy's ``Y[:, gene_idx]`` for sorted
// unique gene_idx: kept entries stay in row order with unchanged values —
// the kernel only counts, remaps, and copies (no floating-point math, so
// no accumulation-order or libm concerns). Pass 1 counts kept entries per
// row; the caller exclusive-scans the counts into the output indptr;
// pass 2 writes remapped indices + values at final offsets.
template <typename DataT, typename IdxT>
void csr_subset_count_impl(const int64_t* indptr, const IdxT* indices,
                           const int32_t* new_col, int64_t n_rows,
                           int n_threads, int64_t* row_counts) {
  parallel_blocks(n_blocks(n_rows), n_threads, [&](int64_t b) {
    const int64_t r0 = b * kBlockRows;
    const int64_t r1 = std::min(r0 + kBlockRows, n_rows);
    for (int64_t r = r0; r < r1; ++r) {
      int64_t cnt = 0;
      for (int64_t i = indptr[r]; i < indptr[r + 1]; ++i) {
        cnt += new_col[indices[i]] >= 0;
      }
      row_counts[r] = cnt;
    }
  });
}

template <typename DataT, typename IdxT>
void csr_subset_fill_impl(const int64_t* indptr, const IdxT* indices,
                          const DataT* data, const int32_t* new_col,
                          const int64_t* out_indptr, int64_t n_rows,
                          int n_threads, int32_t* out_indices,
                          DataT* out_data) {
  parallel_blocks(n_blocks(n_rows), n_threads, [&](int64_t b) {
    const int64_t r0 = b * kBlockRows;
    const int64_t r1 = std::min(r0 + kBlockRows, n_rows);
    for (int64_t r = r0; r < r1; ++r) {
      int64_t o = out_indptr[r];
      for (int64_t i = indptr[r]; i < indptr[r + 1]; ++i) {
        const int32_t c = new_col[indices[i]];
        if (c >= 0) {
          out_indices[o] = c;
          out_data[o] = data[i];
          ++o;
        }
      }
    }
  });
}

}  // namespace

extern "C" {

// ---- moments: data {f32, f64} x indices {i32, i64} ------------------------
#define DEFINE_MOMENTS(SUFFIX, DATA_T, IDX_T)                                \
  void log1p_cpm_moments_##SUFFIX(                                           \
      const int64_t* indptr, const IDX_T* indices, const DATA_T* data,       \
      const double* scale, int64_t n_rows, int64_t n_genes, int n_threads,   \
      double* out_sum, double* out_sumsq) {                                  \
    log1p_cpm_moments_impl<DATA_T, IDX_T>(indptr, indices, data, scale,      \
                                          n_rows, n_genes, n_threads,        \
                                          out_sum, out_sumsq);               \
  }

DEFINE_MOMENTS(f32_i32, float, int32_t)
DEFINE_MOMENTS(f32_i64, float, int64_t)
DEFINE_MOMENTS(f64_i32, double, int32_t)
DEFINE_MOMENTS(f64_i64, double, int64_t)
#undef DEFINE_MOMENTS

// f32-intermediates variants (numpy float32-path semantics, see CalcT note).
#define DEFINE_MOMENTS_F32M(SUFFIX, IDX_T)                                   \
  void log1p_cpm_moments_##SUFFIX(                                           \
      const int64_t* indptr, const IDX_T* indices, const float* data,        \
      const double* scale, int64_t n_rows, int64_t n_genes, int n_threads,   \
      double* out_sum, double* out_sumsq) {                                  \
    log1p_cpm_moments_impl<float, IDX_T, float>(indptr, indices, data,       \
                                                scale, n_rows, n_genes,      \
                                                n_threads, out_sum,          \
                                                out_sumsq);                  \
  }

DEFINE_MOMENTS_F32M(f32m_i32, int32_t)
DEFINE_MOMENTS_F32M(f32m_i64, int64_t)
#undef DEFINE_MOMENTS_F32M

// ---- CountSketch projection: data {f32, f64} x indices {i32, i64} ---------
#define DEFINE_PROJECT(SUFFIX, DATA_T, IDX_T)                                \
  void countsketch_project_##SUFFIX(                                         \
      const int64_t* indptr, const IDX_T* indices, const DATA_T* data,       \
      const int32_t* buckets, const double* weights, int64_t n_rows,         \
      int64_t sketch_dim, int n_threads, double* out) {                      \
    countsketch_project_impl<DATA_T, IDX_T>(indptr, indices, data, buckets,  \
                                            weights, n_rows, sketch_dim,     \
                                            n_threads, out);                 \
  }

DEFINE_PROJECT(f32_i32, float, int32_t)
DEFINE_PROJECT(f32_i64, float, int64_t)
DEFINE_PROJECT(f64_i32, double, int32_t)
DEFINE_PROJECT(f64_i64, double, int64_t)
#undef DEFINE_PROJECT

// ---- CSR column subset: data {f32, f64} x indices {i32, i64} --------------
#define DEFINE_SUBSET(SUFFIX, DATA_T, IDX_T)                                 \
  void csr_subset_count_##SUFFIX(                                            \
      const int64_t* indptr, const IDX_T* indices, const int32_t* new_col,   \
      int64_t n_rows, int n_threads, int64_t* row_counts) {                  \
    csr_subset_count_impl<DATA_T, IDX_T>(indptr, indices, new_col, n_rows,   \
                                         n_threads, row_counts);             \
  }                                                                          \
  void csr_subset_fill_##SUFFIX(                                             \
      const int64_t* indptr, const IDX_T* indices, const DATA_T* data,       \
      const int32_t* new_col, const int64_t* out_indptr, int64_t n_rows,     \
      int n_threads, int32_t* out_indices, DATA_T* out_data) {               \
    csr_subset_fill_impl<DATA_T, IDX_T>(indptr, indices, data, new_col,      \
                                        out_indptr, n_rows, n_threads,       \
                                        out_indices, out_data);              \
  }

DEFINE_SUBSET(f32_i32, float, int32_t)
DEFINE_SUBSET(f32_i64, float, int64_t)
DEFINE_SUBSET(f64_i32, double, int32_t)
DEFINE_SUBSET(f64_i64, double, int64_t)
#undef DEFINE_SUBSET

// Self-test hook: log1p over a buffer so the loader can verify bitwise
// agreement with numpy's float64 log1p before enabling the moments path.
void log1p_buffer(const double* in, double* out, int64_t n) {
  for (int64_t i = 0; i < n; ++i) out[i] = std::log1p(in[i]);
}

// Zero a buffer from many threads. Functionally memset; exists because
// faulting fresh pages from one thread can run two orders of magnitude
// slower than from several on virtualized hosts (see
// utils/hostmem.reserve_host_arena, which uses this to pre-fault the heap).
void zero_fill(char* p, int64_t n, int n_threads) {
  const int64_t chunk = 64 * 1024 * 1024;
  parallel_blocks((n + chunk - 1) / chunk, n_threads, [&](int64_t b) {
    const int64_t lo = b * chunk;
    std::memset(p + lo, 0, std::min(chunk, n - lo));
  });
}

}  // extern "C"
