// Host-side blob detection: connected components + centroids over the
// packed 1-bit frames the ingest path already produces (ingest.cc).
//
// The device detector (ops/detect.py find_blobs / ops/detect_pallas.py)
// costs ~160 us/frame of per-dispatch device time (scatter + fused kernel)
// even though thresholded mocap frames hold a handful of tiny LED blobs.
// Detecting on the host during ingest removes both from the device step:
// the step then starts at track_from_blobs with a ~100-byte (K, 2)
// centroid upload instead of a bitmap/index upload + on-device CC.
//
// Semantics match ops.detect.find_blobs exactly (threshold -> 8-connected
// components -> binary-mass centroids, components in raster order of their
// topmost-leftmost pixel, first max_blobs kept): a BFS seeded in raster
// scan order discovers each component at its minimum raster index, and
// integer coordinate sums converted to float32 reproduce the device
// kernel's f32 arithmetic bit-for-bit (coordinate sums < 2^24 are exact in
// f32, and a single f32 divide is IEEE-identical).  The device kernel's
// min-label propagation is truncated at cc_iters sweeps, so components
// with geodesic diameter > cc_iters can split there; the BFS here is exact
// CC (documented superset — identical for real LED blobs, which are a few
// pixels across).
//
// One implementation serves both centroid modes (gray == nullptr selects
// binary mass): the component discovery, zero-word skip, generation-
// stamped visited array and slot bookkeeping are shared, so the
// weighted and binary detectors cannot de-synchronize.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline bool bit_at(const uint8_t* packed, int64_t idx) {
  return (packed[idx >> 3] >> (7 - (idx & 7))) & 1;
}

// Shared CC + centroid pass.  gray == nullptr: binary-mass centroids,
// f32 arithmetic identical to the device kernel (integer sums exact in
// f32 below 2^24, ONE f32 divide).  gray != nullptr: intensity-weighted
// centroids, sum(I*x)/sum(I) over the component's ORIGINAL uint8
// intensities — sub-pixel recovery of a blob's optical centre (a Gaussian
// spot's weighted mean is its true centre; the binary centroid quantises
// at the threshold boundary).  Integer sums in int64, one double divide:
// deterministic regardless of traversal order.
int32_t detect_impl(const uint8_t* packed, const uint8_t* gray, int32_t H,
                    int32_t W, int32_t max_blobs, float* centroids,
                    uint8_t* valid, float* sizes) {
  // generation-stamped visited array: no per-frame memset of H*W bytes
  static thread_local std::vector<uint32_t> visited;
  static thread_local uint32_t generation = 0;
  static thread_local std::vector<int32_t> stack;
  const int64_t n = static_cast<int64_t>(H) * W;
  if (static_cast<int64_t>(visited.size()) < n) {
    visited.assign(n, 0);
    generation = 0;
  }
  ++generation;
  if (generation == 0) {  // wrap: reset once every 4B frames
    std::fill(visited.begin(), visited.end(), 0);
    generation = 1;
  }
  const uint32_t gen = generation;
  stack.clear();

  std::memset(centroids, 0, sizeof(float) * 2 * max_blobs);
  std::memset(valid, 0, max_blobs);
  std::memset(sizes, 0, sizeof(float) * max_blobs);

  int32_t k = 0;
  const int64_t n_words = n >> 6;  // full 64-bit words of the bitmap
  for (int64_t wi = 0; wi <= n_words && k < max_blobs; ++wi) {
    // skip zero 64-pixel blocks (the overwhelmingly common case)
    if (wi < n_words) {
      uint64_t w;
      std::memcpy(&w, packed + (wi << 3), 8);
      if (w == 0) continue;
    }
    const int64_t base = wi << 6;
    const int64_t end = base + 64 < n ? base + 64 : n;
    for (int64_t p = base; p < end && k < max_blobs; ++p) {
      if (!bit_at(packed, p) || visited[p] == gen) continue;
      // new component; p is its minimum raster index (raster-order seed)
      int64_t count = 0, sum_x = 0, sum_y = 0;
      int64_t wsum = 0, wsum_x = 0, wsum_y = 0;
      visited[p] = gen;
      stack.push_back(static_cast<int32_t>(p));
      while (!stack.empty()) {
        const int64_t q = stack.back();
        stack.pop_back();
        const int32_t r = static_cast<int32_t>(q / W);
        const int32_t c = static_cast<int32_t>(q % W);
        ++count;
        sum_x += c;
        sum_y += r;
        if (gray) {
          const int64_t I = gray[q];
          wsum += I;
          wsum_x += I * c;
          wsum_y += I * r;
        }
        const int32_t r0 = r > 0 ? r - 1 : 0;
        const int32_t r1 = r < H - 1 ? r + 1 : H - 1;
        const int32_t c0 = c > 0 ? c - 1 : 0;
        const int32_t c1 = c < W - 1 ? c + 1 : W - 1;
        for (int32_t rr = r0; rr <= r1; ++rr)
          for (int32_t cc = c0; cc <= c1; ++cc) {
            const int64_t qq = static_cast<int64_t>(rr) * W + cc;
            if (visited[qq] != gen && bit_at(packed, qq)) {
              visited[qq] = gen;
              stack.push_back(static_cast<int32_t>(qq));
            }
          }
      }
      if (gray) {
        const double ws = wsum > 0 ? static_cast<double>(wsum) : 1.0;
        centroids[2 * k] = static_cast<float>(wsum_x / ws);
        centroids[2 * k + 1] = static_cast<float>(wsum_y / ws);
      } else {
        const float m00 = static_cast<float>(count);
        centroids[2 * k] = static_cast<float>(sum_x) / m00;
        centroids[2 * k + 1] = static_cast<float>(sum_y) / m00;
      }
      valid[k] = 1;
      sizes[k] = static_cast<float>(count);
      ++k;
    }
  }
  return k;
}

}  // namespace

extern "C" {

// One camera: packed (H*W/8 bytes, MSB-first rows), outputs
// centroids (max_blobs*2 f32, xy), valid (max_blobs u8),
// sizes (max_blobs f32).  Returns the number of slots filled.
int32_t lcm_detect_blobs(const uint8_t* packed, int32_t H, int32_t W,
                         int32_t max_blobs, float* centroids,
                         uint8_t* valid, float* sizes) {
  return detect_impl(packed, nullptr, H, W, max_blobs, centroids, valid,
                     sizes);
}

// All cameras in one call (amortizes the FFI crossing):
// packed (C, H*W/8) contiguous; outputs (C, max_blobs, ...) contiguous.
void lcm_detect_blobs_multi(const uint8_t* packed, int32_t n_cams,
                            int32_t H, int32_t W, int32_t max_blobs,
                            float* centroids, uint8_t* valid,
                            float* sizes) {
  const int64_t stride = (static_cast<int64_t>(H) * W) >> 3;
  for (int32_t c = 0; c < n_cams; ++c)
    detect_impl(packed + c * stride, nullptr, H, W, max_blobs,
                centroids + c * 2 * max_blobs, valid + c * max_blobs,
                sizes + c * max_blobs);
}

// Intensity-weighted variant: same components (8-connectivity over the
// thresholded bitmap), sub-pixel weighted centroids (see detect_impl).
int32_t lcm_detect_blobs_weighted(const uint8_t* packed,
                                  const uint8_t* gray, int32_t H,
                                  int32_t W, int32_t max_blobs,
                                  float* centroids, uint8_t* valid,
                                  float* sizes) {
  return detect_impl(packed, gray, H, W, max_blobs, centroids, valid,
                     sizes);
}

void lcm_detect_blobs_weighted_multi(const uint8_t* packed,
                                     const uint8_t* gray, int32_t n_cams,
                                     int32_t H, int32_t W,
                                     int32_t max_blobs, float* centroids,
                                     uint8_t* valid, float* sizes) {
  const int64_t fstride = static_cast<int64_t>(H) * W;
  const int64_t stride = fstride >> 3;
  for (int32_t c = 0; c < n_cams; ++c)
    detect_impl(packed + c * stride, gray + c * fstride, H, W, max_blobs,
                centroids + c * 2 * max_blobs, valid + c * max_blobs,
                sizes + c * max_blobs);
}

}  // extern "C"
