// Native kernel-map builder for the sparse-conv engine.
//
// The host-side dense per-offset neighbor tables
// (gmf_tpu/sparse/kernel_map.py) are the DGR pipeline's bottleneck on
// weak hosts: NumPy needs K x M int64 searchsorted lookups (hundreds of
// ms to minutes at 6-D scales). This C++ version uses an open-addressing
// hash table over packed int64 coordinate keys with OpenMP over offsets —
// the same job MinkowskiEngine's C++ coordinate manager does.
//
// ABI (ctypes):
//   int build_kernel_map(int N, int M, int D, int K,
//                        const int32* in_coords,   // [N, D]
//                        const int32* out_coords,  // [M, D]
//                        const int32* offsets,     // [K, D]
//                        int32* nbr)               // [K, M] out
// returns 0 on success, -1 if the coordinate extent cannot pack into
// int64 (caller falls back to the NumPy path). Missing neighbors are
// written as the sentinel N.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct HashTable {
  // open addressing, power-of-two capacity, empty = INT64_MIN
  std::vector<int64_t> keys;
  std::vector<int32_t> vals;
  uint64_t mask;

  explicit HashTable(size_t n) {
    size_t cap = 16;
    while (cap < n * 2) cap <<= 1;
    keys.assign(cap, INT64_MIN);
    vals.assign(cap, -1);
    mask = cap - 1;
  }

  static inline uint64_t hash(int64_t k) {
    uint64_t x = static_cast<uint64_t>(k);
    x ^= x >> 33;
    x *= 0xff51afd7ed558ccdULL;
    x ^= x >> 33;
    x *= 0xc4ceb9fe1a85ec53ULL;
    x ^= x >> 33;
    return x;
  }

  inline void insert(int64_t key, int32_t val) {
    uint64_t i = hash(key) & mask;
    while (keys[i] != INT64_MIN) {
      if (keys[i] == key) return;  // first occurrence wins (ME semantics)
      i = (i + 1) & mask;
    }
    keys[i] = key;
    vals[i] = val;
  }

  inline int32_t find(int64_t key) const {
    uint64_t i = hash(key) & mask;
    while (keys[i] != INT64_MIN) {
      if (keys[i] == key) return vals[i];
      i = (i + 1) & mask;
    }
    return -1;
  }
};

}  // namespace

extern "C" {

int build_kernel_map(int N, int M, int D, int K,
                     const int32_t* in_coords, const int32_t* out_coords,
                     const int32_t* offsets, int32_t* nbr) {
  if (N == 0 || M == 0) {
    for (long long i = 0; i < static_cast<long long>(K) * M; ++i)
      nbr[i] = N;
    return 0;
  }

  // shared packing frame covering in, out and out+offset coordinates
  std::vector<int64_t> lo(D, INT64_MAX), hi(D, INT64_MIN);
  for (int n = 0; n < N; ++n)
    for (int d = 0; d < D; ++d) {
      int64_t v = in_coords[n * D + d];
      if (v < lo[d]) lo[d] = v;
      if (v > hi[d]) hi[d] = v;
    }
  // span only needs to cover the INPUT coords; queries outside miss.
  std::vector<int64_t> span(D), stride(D);
  long double total = 1.0L;
  for (int d = 0; d < D; ++d) {
    span[d] = hi[d] - lo[d] + 1;
    total *= static_cast<long double>(span[d]);
  }
  if (total > 4.0e18L) return -1;  // cannot pack; caller falls back
  stride[D - 1] = 1;
  for (int d = D - 2; d >= 0; --d) stride[d] = stride[d + 1] * span[d + 1];

  HashTable table(static_cast<size_t>(N));
  for (int n = 0; n < N; ++n) {
    int64_t key = 0;
    for (int d = 0; d < D; ++d)
      key += (in_coords[n * D + d] - lo[d]) * stride[d];
    table.insert(key, n);
  }

#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int k = 0; k < K; ++k) {
    const int32_t* off = offsets + static_cast<long long>(k) * D;
    int32_t* row = nbr + static_cast<long long>(k) * M;
    for (int m = 0; m < M; ++m) {
      const int32_t* oc = out_coords + static_cast<long long>(m) * D;
      int64_t key = 0;
      bool ok = true;
      for (int d = 0; d < D; ++d) {
        int64_t c = static_cast<int64_t>(oc[d]) + off[d] - lo[d];
        if (c < 0 || c >= span[d]) { ok = false; break; }
        key += c * stride[d];
      }
      int32_t v = ok ? table.find(key) : -1;
      row[m] = v >= 0 ? v : N;
    }
  }
  return 0;
}

}  // extern "C"
