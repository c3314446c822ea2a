// Proximity-factor selection with Manhattan NMS — native control plane.
//
// The reference runs this edge-selection policy as a Python loop over the
// distance matrix (droid_slam/factor_graph.py:305-369): O(t²·log t) sort +
// O(edges·nms²) suppression per frontend update, which becomes a host
// bottleneck at backend scale (t ≈ 500 → 250k candidate pairs).  This is
// the C++ replacement invoked through ctypes; semantics are identical:
//
//   * candidate pairs (i, j) with i ∈ [t0, t), j ∈ [t1, t);
//   * pairs with i - rad < j, d > 100, or suppressed by existing edges are
//     excluded;
//   * temporal-radius pairs (and stereo self-pairs) are always added first;
//   * remaining pairs are taken greedily in ascending distance order while
//     d ≤ thresh and the factor budget allows, each suppressing a
//     Manhattan-ball of radius min(|i-j|-2, nms) around it (both
//     directions added).
//
// Build: g++ -O3 -shared -fPIC proximity.cpp -o libproximity.so

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <limits>
#include <vector>

namespace {

constexpr float kInf = std::numeric_limits<float>::infinity();

struct Ctx {
  float* d;         // (ni, nj) distance matrix, mutated in place
  int64_t t0, t1, t;
  int64_t ni, nj;
  int64_t nms;

  inline void suppress(int64_t i, int64_t j) {
    int64_t r = std::max<int64_t>(
        std::min<int64_t>(std::llabs(i - j) - 2, nms), 0);
    for (int64_t di = -nms; di <= nms; di++) {
      for (int64_t dj = -nms; dj <= nms; dj++) {
        if (std::llabs(di) + std::llabs(dj) <= r) {
          int64_t i1 = i + di, j1 = j + dj;
          if (t0 <= i1 && i1 < t && t1 <= j1 && j1 < t) {
            d[(i1 - t0) * nj + (j1 - t1)] = kInf;
          }
        }
      }
    }
  }
};

}  // namespace

extern "C" {

// Returns number of selected edges written to (out_ii, out_jj); both
// buffers must hold at least max_out entries.  `dist` is (ni, nj) and is
// consumed (mutated).
int64_t select_proximity_edges(
    float* dist, int64_t t0, int64_t t1, int64_t t,
    const int64_t* exist_ii, const int64_t* exist_jj, int64_t n_exist,
    int64_t rad, int64_t nms, float thresh, int64_t max_factors,
    int32_t stereo,
    int64_t* out_ii, int64_t* out_jj, int64_t max_out) {
  Ctx ctx{dist, t0, t1, t, t - t0, t - t1, nms};
  const int64_t ni = ctx.ni, nj = ctx.nj;

  // exclusions: i - rad < j, d > 100
  for (int64_t a = 0; a < ni; a++) {
    for (int64_t b = 0; b < nj; b++) {
      int64_t i = a + t0, j = b + t1;
      float& v = dist[a * nj + b];
      if (i - rad < j || v > 100.0f) v = kInf;
    }
  }

  // suppress around pre-existing edges
  for (int64_t k = 0; k < n_exist; k++) {
    ctx.suppress(exist_ii[k], exist_jj[k]);
  }

  int64_t n_out = 0;
  auto emit = [&](int64_t i, int64_t j) {
    if (n_out < max_out) {
      out_ii[n_out] = i;
      out_jj[n_out] = j;
      n_out++;
    }
  };

  // temporal-radius edges (always added; factor_graph.py:344-354)
  for (int64_t i = t0; i < t; i++) {
    if (stereo) {
      emit(i, i);
      if (t1 <= i) dist[(i - t0) * nj + (i - t1)] = kInf;
    }
    for (int64_t j = std::max<int64_t>(i - rad - 1, 0); j < i; j++) {
      emit(i, j);
      emit(j, i);
      if (t1 <= j) dist[(i - t0) * nj + (j - t1)] = kInf;
    }
  }

  // greedy distance-sorted selection
  std::vector<int64_t> order(ni * nj);
  for (int64_t k = 0; k < ni * nj; k++) order[k] = k;
  std::sort(order.begin(), order.end(),
            [&](int64_t a, int64_t b) { return dist[a] < dist[b]; });

  for (int64_t k : order) {
    if (dist[k] > thresh) continue;   // matches the reference's `continue`
    if (n_out > max_factors) break;
    int64_t i = k / nj + t0;
    int64_t j = k % nj + t1;
    emit(i, j);
    emit(j, i);
    ctx.suppress(i, j);
  }

  return n_out;
}

}  // extern "C"
