// Native host-side COO kernels for the activation cache.
//
// The cache hot loop on the host is: mask the (B, S, k) top-k activations by
// magnitude (and optionally by a feature filter), emit (row, seq, feature)
// triples with a global row offset, and partition the accumulated stream by
// feature ranges for the split writer (multimodal_sae_tpu/features/cache.py;
// the reference did this with torch.nonzero on a dense (B, S, 131072) buffer,
// reference features/cache.py:73-92).  numpy needs several passes and
// intermediate index arrays per batch; these single-pass C++ kernels keep the
// one-core host from becoming the bottleneck behind the TPU.
//
// Build: g++ -O3 -march=native -shared -fPIC coo.cpp -o libmmsae_coo.so

#include <cstdint>
#include <cstring>

extern "C" {

// Extract nonzero (|val| > threshold) triples from a (B, S, k) top-k batch.
// vals: float32[B*S*k], idx: int64[B*S*k] (feature ids, sorted or not)
// filter: optional sorted int64[filter_len] of allowed feature ids (NULL = all)
// out_locations: int64[cap*3], out_activations: float32[cap]
// row_offset is added to the batch-row coordinate.
// Returns the number of triples written (<= B*S*k).
int64_t coo_extract_topk(
    const float* vals,
    const int64_t* idx,
    int64_t B, int64_t S, int64_t K,
    float threshold,
    const int64_t* filter, int64_t filter_len,
    int64_t row_offset,
    int64_t* out_locations,
    float* out_activations) {
  int64_t n = 0;
  for (int64_t b = 0; b < B; ++b) {
    for (int64_t s = 0; s < S; ++s) {
      const int64_t base = (b * S + s) * K;
      for (int64_t j = 0; j < K; ++j) {
        const float v = vals[base + j];
        const float av = v < 0 ? -v : v;
        if (av <= threshold) continue;
        const int64_t f = idx[base + j];
        if (filter != nullptr) {
          // binary search in the sorted filter
          int64_t lo = 0, hi = filter_len;
          while (lo < hi) {
            const int64_t mid = (lo + hi) >> 1;
            if (filter[mid] < f) lo = mid + 1; else hi = mid;
          }
          if (lo >= filter_len || filter[lo] != f) continue;
        }
        out_locations[n * 3 + 0] = b + row_offset;
        out_locations[n * 3 + 1] = s;
        out_locations[n * 3 + 2] = f;
        out_activations[n] = v;
        ++n;
      }
    }
  }
  return n;
}

// Partition a COO stream into contiguous per-split segments by feature range.
// boundaries: int64[n_splits+1] ascending; split i covers
// [boundaries[i], boundaries[i+1]) (exclusive upper bound).
// Stable within each split (preserves input order, matching the sequential
// masked writes the python writer performs).
// out_counts: int64[n_splits]; out_locations/out_activations sized like input.
// Entries outside every range are dropped; returns total kept.
int64_t coo_partition_splits(
    const int64_t* locations,  // N x 3
    const float* activations,
    int64_t N,
    const int64_t* boundaries, int64_t n_splits,
    int64_t* out_counts,
    int64_t* out_locations,
    float* out_activations) {
  // Pass 1: count per split.
  for (int64_t i = 0; i < n_splits; ++i) out_counts[i] = 0;
  const int64_t lo_all = boundaries[0];
  const int64_t hi_all = boundaries[n_splits];
  for (int64_t r = 0; r < N; ++r) {
    const int64_t f = locations[r * 3 + 2];
    if (f < lo_all || f >= hi_all) continue;
    // binary search: greatest i with boundaries[i] <= f
    int64_t lo = 0, hi = n_splits;
    while (lo + 1 < hi) {
      const int64_t mid = (lo + hi) >> 1;
      if (boundaries[mid] <= f) lo = mid; else hi = mid;
    }
    ++out_counts[lo];
  }
  // Prefix offsets.
  int64_t total = 0;
  // reuse a small stack buffer when n_splits small; allocate otherwise
  int64_t* offsets = new int64_t[n_splits];
  for (int64_t i = 0; i < n_splits; ++i) {
    offsets[i] = total;
    total += out_counts[i];
  }
  // Pass 2: scatter.
  for (int64_t r = 0; r < N; ++r) {
    const int64_t f = locations[r * 3 + 2];
    if (f < lo_all || f >= hi_all) continue;
    int64_t lo = 0, hi = n_splits;
    while (lo + 1 < hi) {
      const int64_t mid = (lo + hi) >> 1;
      if (boundaries[mid] <= f) lo = mid; else hi = mid;
    }
    const int64_t dst = offsets[lo]++;
    std::memcpy(out_locations + dst * 3, locations + r * 3, 3 * sizeof(int64_t));
    out_activations[dst] = activations[r];
  }
  delete[] offsets;
  return total;
}

}  // extern "C"
