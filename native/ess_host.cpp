// Native host-side kernels for the ess-tpu ingest pipeline.
//
// Replaces the reference's numba @jit(nopython) window-boundary search
// (/root/reference/DSEC/utils/eventslicer.py:179-237) and the per-sample
// gather-pad of raw event windows into fixed-capacity buffers — the
// memcpy-heavy inner loop of host ingest. Loaded via ctypes
// (ess_tpu/data/native.py); pure-numpy fallbacks exist for every entry
// point.
//
// Build: g++ -O3 -shared -fPIC -o libess_host.so ess_host.cpp

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// First index i in sorted t[0..n) with t[i] >= q.
int64_t lower_bound_i64(const int64_t* t, int64_t n, int64_t q) {
  const int64_t* p = std::lower_bound(t, t + n, q);
  return p - t;
}

// Vectorized lower_bound over m queries.
void searchsorted_i64(const int64_t* t, int64_t n, const int64_t* q,
                      int64_t m, int64_t* out) {
  for (int64_t i = 0; i < m; ++i) {
    out[i] = lower_bound_i64(t, n, q[i]);
  }
}

// Gather-pad event windows into a fixed (T, cap, 4) float32 buffer with a
// (T, cap) uint8 validity mask. Sources are the DDD17 memmap layout:
// t (int64, ns) and xyp (int16 triplets). Windows longer than `cap` keep
// their most recent `cap` events; timestamps are re-zeroed per window so
// they stay exact in float32.
void pad_windows_i16(const int64_t* t, const int16_t* xyp, int64_t /*n_total*/,
                     const int64_t* starts, const int64_t* ends, int64_t T,
                     int64_t cap, float* out, uint8_t* valid) {
  for (int64_t w = 0; w < T; ++w) {
    int64_t s = starts[w];
    int64_t e = ends[w];
    int64_t n = e - s;
    if (n > cap) {
      s = e - cap;
      n = cap;
    }
    float* dst = out + w * cap * 4;
    uint8_t* vmask = valid + w * cap;
    if (n <= 0) {
      std::memset(dst, 0, sizeof(float) * cap * 4);
      std::memset(vmask, 0, cap);
      continue;
    }
    const int64_t t0 = t[s];
    for (int64_t i = 0; i < n; ++i) {
      const int16_t* src = xyp + (s + i) * 3;
      dst[i * 4 + 0] = static_cast<float>(src[0]);
      dst[i * 4 + 1] = static_cast<float>(src[1]);
      dst[i * 4 + 2] = static_cast<float>(t[s + i] - t0);
      dst[i * 4 + 3] = static_cast<float>(src[2]);
      vmask[i] = 1;
    }
    if (n < cap) {
      std::memset(dst + n * 4, 0, sizeof(float) * (cap - n) * 4);
      std::memset(vmask + n, 0, cap - n);
    }
  }
}

// Same gather-pad for pre-assembled float64 (N, 4) event arrays (the DSEC /
// generic path after slicing).
void pad_windows_f64(const double* events, const int64_t* starts,
                     const int64_t* ends, int64_t T, int64_t cap,
                     float* out, uint8_t* valid) {
  for (int64_t w = 0; w < T; ++w) {
    int64_t s = starts[w];
    int64_t e = ends[w];
    int64_t n = e - s;
    if (n > cap) {
      s = e - cap;
      n = cap;
    }
    float* dst = out + w * cap * 4;
    uint8_t* vmask = valid + w * cap;
    if (n <= 0) {
      std::memset(dst, 0, sizeof(float) * cap * 4);
      std::memset(vmask, 0, cap);
      continue;
    }
    const double t0 = events[s * 4 + 2];
    for (int64_t i = 0; i < n; ++i) {
      const double* src = events + (s + i) * 4;
      dst[i * 4 + 0] = static_cast<float>(src[0]);
      dst[i * 4 + 1] = static_cast<float>(src[1]);
      dst[i * 4 + 2] = static_cast<float>(src[2] - t0);
      dst[i * 4 + 3] = static_cast<float>(src[3]);
      vmask[i] = 1;
    }
    if (n < cap) {
      std::memset(dst + n * 4, 0, sizeof(float) * (cap - n) * 4);
      std::memset(vmask + n, 0, cap - n);
    }
  }
}

}  // extern "C"
