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

#include <cmath>
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

// ---------------------------------------------------------------------------
// Host voxelization kernels (alternative ingest mode).
//
// Build the reference's voxel representations directly on the host so the
// device step consumes dense grids: trilinear 8-corner splat over float
// (rectified) coords (DSEC/dataset/representations.py:15-55 semantics) and
// temporal-bilinear over integer coords (datasets/data_util.py:54-126).
// Single-threaded per call; the BatchLoader's worker threads provide
// sample-level parallelism. ~100-200M corner-updates/s/core: an 8-sample
// DSEC window batch (~51M updates) takes tens of ms across workers,
// fully overlapped with device compute via the prefetch pipeline.
// ---------------------------------------------------------------------------

// events: (n, 4) float32 rows (x, y, t, p); out: bins*h*w float32, pre-zeroed.
void voxelize_trilinear_f32(const float* ev, const uint8_t* valid, int64_t n,
                            int64_t bins, int64_t h, int64_t w, float* out) {
  if (n == 0) return;
  // first/last valid timestamp
  float t0 = 0.f, t1 = 0.f;
  bool seen = false;
  for (int64_t i = 0; i < n; ++i) {
    if (!valid[i]) continue;
    float t = ev[i * 4 + 2];
    if (!seen) { t0 = t1 = t; seen = true; }
    else { t0 = t < t0 ? t : t0; t1 = t > t1 ? t : t1; }
  }
  if (!seen) return;
  float dt = t1 - t0;
  if (dt <= 0.f) dt = 1.f;
  const float scale = (bins - 1) / dt;
  const int64_t cells = h * w;
  for (int64_t i = 0; i < n; ++i) {
    if (!valid[i]) continue;
    const float x = ev[i * 4 + 0];
    const float y = ev[i * 4 + 1];
    const float ts = (ev[i * 4 + 2] - t0) * scale;
    const float val = ev[i * 4 + 3] > 0.f ? 1.f : -1.f;
    const int64_t x0 = static_cast<int64_t>(x);
    const int64_t y0 = static_cast<int64_t>(y);
    const int64_t b0 = static_cast<int64_t>(ts);
    for (int dx = 0; dx < 2; ++dx) {
      const int64_t xl = x0 + dx;
      if (xl < 0 || xl >= w) continue;
      const float wx = 1.f - (xl > x ? xl - x : x - xl);
      for (int dy = 0; dy < 2; ++dy) {
        const int64_t yl = y0 + dy;
        if (yl < 0 || yl >= h) continue;
        const float wy = 1.f - (yl > y ? yl - y : y - yl);
        for (int db = 0; db < 2; ++db) {
          const int64_t bl = b0 + db;
          if (bl < 0 || bl >= bins) continue;
          const float wt = 1.f - (bl > ts ? bl - ts : ts - bl);
          out[bl * cells + yl * w + xl] += val * wx * wy * wt;
        }
      }
    }
  }
}

// Temporal-bilinear: integer pixel coords, |pol| split across 2 time bins.
// separate_pol: out has 2*bins channels (positive grids then negative).
void voxelize_temporal_f32(const float* ev, const uint8_t* valid, int64_t n,
                           int64_t bins, int64_t h, int64_t w,
                           int separate_pol, float* out) {
  if (n == 0) return;
  float t0 = 0.f, t1 = 0.f;
  bool seen = false;
  for (int64_t i = 0; i < n; ++i) {
    if (!valid[i]) continue;
    float t = ev[i * 4 + 2];
    if (!seen) { t0 = t1 = t; seen = true; }
    else { t0 = t < t0 ? t : t0; t1 = t > t1 ? t : t1; }
  }
  if (!seen) return;
  float dt = t1 - t0;
  if (dt <= 0.f) dt = 1.f;
  const float scale = (bins - 1) / dt;
  const int64_t cells = h * w;
  for (int64_t i = 0; i < n; ++i) {
    if (!valid[i]) continue;
    const int64_t x = static_cast<int64_t>(ev[i * 4 + 0]);
    const int64_t y = static_cast<int64_t>(ev[i * 4 + 1]);
    if (x < 0 || x >= w || y < 0 || y >= h) continue;
    const float ts = (ev[i * 4 + 2] - t0) * scale;
    if (ts < 0.f || ts >= static_cast<float>(bins)) continue;
    const bool pos = ev[i * 4 + 3] > 0.f;
    const int64_t b0 = static_cast<int64_t>(ts);
    const float frac = ts - b0;
    float* grid = out;
    float sign = pos ? 1.f : -1.f;
    if (separate_pol) {
      grid = out + (pos ? 0 : bins * cells);
      sign = 1.f;
    }
    const int64_t pix = y * w + x;
    if (b0 < bins) grid[b0 * cells + pix] += sign * (1.f - frac);
    if (b0 + 1 < bins) grid[(b0 + 1) * cells + pix] += sign * frac;
  }
}

// ---------------------------------------------------------------------------
// Tile binning for the device-side Pallas voxelizer (ops/voxel_pallas.py).
//
// Counting sort of each window's valid in-frame events by spatial tile id
// (ty * n_tiles_x + tx on the kernel-aligned padded grid). Stable (two
// ordered passes), O(n + n_tiles) per window — replaces the Python
// per-window argsort loop that was the host-ingest bottleneck. `counts` is
// caller-provided scratch of n_tiles int64.
// ---------------------------------------------------------------------------

void tile_bin_f32(const float* ev, const uint8_t* valid, int64_t T, int64_t n,
                  int64_t height, int64_t width, int64_t tile_h,
                  int64_t tile_w, int64_t n_tiles_x, int64_t n_tiles,
                  float* out, uint8_t* out_valid, int32_t* offsets,
                  int64_t* counts, int32_t* tid_scratch) {
  const float fw = static_cast<float>(width);
  const float fh = static_cast<float>(height);
  // tile coords via float multiply by reciprocal: exact for tile_w=128
  // (power of two); for tile_h the product is nudged just enough that
  // floor(y * inv_h) == y_int / tile_h for all in-range integers (y_int <
  // 2^15, so a 2^-20 relative bump cannot carry floor(y/h) past the next
  // integer but fixes the representation shortfall at exact multiples).
  const float inv_w = 1.0f / static_cast<float>(tile_w);
  const float inv_h = (1.0f + 9.5367431640625e-7f)  // 1 + 2^-20
                      / static_cast<float>(tile_h);
  for (int64_t wi = 0; wi < T; ++wi) {
    const float* src = ev + wi * n * 4;
    const uint8_t* vmask = valid + wi * n;
    float* dst = out + wi * n * 4;
    uint8_t* dvalid = out_valid + wi * n;
    int32_t* offs = offsets + wi * (n_tiles + 1);

    std::memset(counts, 0, sizeof(int64_t) * n_tiles);
    int64_t kept = 0;
    for (int64_t i = 0; i < n; ++i) {
      const float x = src[i * 4 + 0];
      const float y = src[i * 4 + 1];
      // (-1, 0) border coords keep their single in-frame corner: the
      // truncation below lands them in tile row/col 0, matching the
      // device-side prep (the kernel's tent factors place the weight)
      if (!vmask[i] || x <= -1.f || x >= fw || y <= -1.f || y >= fh) {
        tid_scratch[i] = -1;
        continue;
      }
      int32_t tx = static_cast<int32_t>(
          static_cast<float>(static_cast<int32_t>(x)) * inv_w);
      if (tx > n_tiles_x - 1) tx = static_cast<int32_t>(n_tiles_x) - 1;
      const int32_t ty = static_cast<int32_t>(
          static_cast<float>(static_cast<int32_t>(y)) * inv_h);
      const int32_t tid = ty * static_cast<int32_t>(n_tiles_x) + tx;
      tid_scratch[i] = tid;
      ++counts[tid];
      ++kept;
    }
    int64_t run = 0;
    for (int64_t t = 0; t < n_tiles; ++t) {
      offs[t] = static_cast<int32_t>(run);
      const int64_t c = counts[t];
      counts[t] = run;  // becomes the write cursor
      run += c;
    }
    offs[n_tiles] = static_cast<int32_t>(run);
    for (int64_t i = 0; i < n; ++i) {
      const int32_t tid = tid_scratch[i];
      if (tid < 0) continue;
      const int64_t at = counts[tid]++;
      std::memcpy(dst + at * 4, src + i * 4, sizeof(float) * 4);
      dvalid[at] = 1;
    }
    if (kept < n) {
      std::memset(dst + kept * 4, 0, sizeof(float) * (n - kept) * 4);
      std::memset(dvalid + kept, 0, n - kept);
    }
  }
}

// ---------------------------------------------------------------------------
// Fused DSEC ingest: rectify-map lookup + fixed-capacity window pad + tile
// counting sort, one pass over the raw h5 event columns. Replaces the
// loader's numpy chain (events_dict_to_xytp -> fancy-index rectify ->
// pad_windows -> tile bin), each step of which is a full GIL-holding pass —
// on a single-core host the fused native version is the difference between
// ingest keeping up with the device step and not.
//
// x, y: uint16 sensor coords; t: int64 us; p: uint8 polarity — arrays of
// length >= max(ends). starts/ends: (T,) window bounds (windows longer
// than `cap` keep their most recent `cap` events; per-window timestamps
// re-zeroed so they stay exact in float32). map: (mh, mw, 2) float32
// rectified (x, y) per integer pixel. Rectified coords landing outside
// [0, mw) x [0, mh) are dropped (the device scatter would mask them).
// ---------------------------------------------------------------------------

void ingest_rectify_bin_f32(
    const uint16_t* x, const uint16_t* y, const int64_t* t, const uint8_t* p,
    const int64_t* starts, const int64_t* ends, int64_t T, int64_t cap,
    const float* map, int64_t mh, int64_t mw,
    int64_t tile_h, int64_t tile_w, int64_t n_tiles_x, int64_t n_tiles,
    float* out, uint8_t* out_valid, int32_t* offsets,
    int64_t* counts, float* xy_scratch, int32_t* tid_scratch) {
  const float fw = static_cast<float>(mw);
  const float fh = static_cast<float>(mh);
  const float inv_w = 1.0f / static_cast<float>(tile_w);
  const float inv_h = (1.0f + 9.5367431640625e-7f)  // see tile_bin_f32
                      / static_cast<float>(tile_h);
  for (int64_t wi = 0; wi < T; ++wi) {
    int64_t s = starts[wi];
    const int64_t e = ends[wi];
    if (e - s > cap) s = e - cap;
    const int64_t n = e > s ? e - s : 0;
    float* dst = out + wi * cap * 4;
    uint8_t* dvalid = out_valid + wi * cap;
    int32_t* offs = offsets + wi * (n_tiles + 1);

    std::memset(counts, 0, sizeof(int64_t) * n_tiles);
    int64_t kept = 0;
    for (int64_t i = 0; i < n; ++i) {
      const int64_t src = s + i;
      const float* m = map + (static_cast<int64_t>(y[src]) * mw +
                              static_cast<int64_t>(x[src])) * 2;
      const float rx = m[0];
      const float ry = m[1];
      // (-1, 0) border coords keep their single in-frame corner
      if (rx <= -1.f || rx >= fw || ry <= -1.f || ry >= fh) {
        tid_scratch[i] = -1;
        continue;
      }
      xy_scratch[i * 2 + 0] = rx;
      xy_scratch[i * 2 + 1] = ry;
      int32_t tx = static_cast<int32_t>(
          static_cast<float>(static_cast<int32_t>(rx)) * inv_w);
      if (tx > n_tiles_x - 1) tx = static_cast<int32_t>(n_tiles_x) - 1;
      const int32_t ty = static_cast<int32_t>(
          static_cast<float>(static_cast<int32_t>(ry)) * inv_h);
      const int32_t tid = ty * static_cast<int32_t>(n_tiles_x) + tx;
      tid_scratch[i] = tid;
      ++counts[tid];
      ++kept;
    }
    int64_t run = 0;
    for (int64_t ti = 0; ti < n_tiles; ++ti) {
      offs[ti] = static_cast<int32_t>(run);
      const int64_t c = counts[ti];
      counts[ti] = run;
      run += c;
    }
    offs[n_tiles] = static_cast<int32_t>(run);
    const int64_t t0 = n > 0 ? t[s] : 0;
    for (int64_t i = 0; i < n; ++i) {
      const int32_t tid = tid_scratch[i];
      if (tid < 0) continue;
      const int64_t at = counts[tid]++;
      float* o = dst + at * 4;
      o[0] = xy_scratch[i * 2 + 0];
      o[1] = xy_scratch[i * 2 + 1];
      o[2] = static_cast<float>(t[s + i] - t0);
      o[3] = static_cast<float>(p[s + i]);
      dvalid[at] = 1;
    }
    if (kept < cap) {
      std::memset(dst + kept * 4, 0, sizeof(float) * (cap - kept) * 4);
      std::memset(dvalid + kept, 0, cap - kept);
    }
  }
}

// ---------------------------------------------------------------------------
// Packed variant of the fused ingest: emits quantized SoA columns instead of
// the (T, cap, 4) float32 AoS buffer — 7 bytes/event on the wire instead of
// 17 (incl. the validity mask, which packed mode derives from the tile
// offsets). Quantization: coords in 1/64 px (u16, exact for x < 1024),
// per-window time normalized to [0, 1] in 1/60000 steps (u16), polarity u8.
// Tile ids come from the QUANTIZED coords (>> 6), so host binning and the
// device kernel agree bit-for-bit.
// ---------------------------------------------------------------------------

void ingest_rectify_bin_packed(
    const uint16_t* x, const uint16_t* y, const int64_t* t, const uint8_t* p,
    const int64_t* starts, const int64_t* ends, int64_t T, int64_t cap,
    const float* map, int64_t mh, int64_t mw,
    int64_t tile_h, int64_t tile_w, int64_t n_tiles_x, int64_t n_tiles,
    uint16_t* out_x, uint16_t* out_y, uint16_t* out_t, uint8_t* out_p,
    int32_t* offsets, int64_t* counts, int32_t* q_scratch,
    int32_t* tid_scratch) {
  const float fw = static_cast<float>(mw);
  const float fh = static_cast<float>(mh);
  for (int64_t wi = 0; wi < T; ++wi) {
    int64_t s = starts[wi];
    const int64_t e = ends[wi];
    if (e - s > cap) s = e - cap;
    const int64_t n = e > s ? e - s : 0;
    uint16_t* dx = out_x + wi * cap;
    uint16_t* dy = out_y + wi * cap;
    uint16_t* dt = out_t + wi * cap;
    uint8_t* dp = out_p + wi * cap;
    int32_t* offs = offsets + wi * (n_tiles + 1);

    std::memset(counts, 0, sizeof(int64_t) * n_tiles);
    int64_t kept = 0;
    // Time normalization spans the window's RAW first/last timestamps, even
    // when those extremal events are dropped as out-of-frame below. This
    // matches the torch reference (DSEC/dataset/representations.py:30-32
    // normalizes before any spatial filtering); the f32 wire's on-device
    // _masked_time_norm instead normalizes over kept events only — a
    // documented divergence absorbed by the packed-vs-f32 parity test
    // tolerance (tests/test_datasets_integration.py).
    const int64_t t0 = n > 0 ? t[s] : 0;
    const int64_t t1 = n > 0 ? t[e - 1] : 0;
    const float tscale = t1 > t0 ? 60000.0f / static_cast<float>(t1 - t0)
                                 : 0.0f;
    for (int64_t i = 0; i < n; ++i) {
      const int64_t src = s + i;
      const float* m = map + (static_cast<int64_t>(y[src]) * mw +
                              static_cast<int64_t>(x[src])) * 2;
      const float rx = m[0];
      const float ry = m[1];
      // (-1, 0) border coords round/clamp to 0 (the wire format cannot
      // carry negative fixed-point values; the sub-pixel corner weight is
      // approximated at the frame edge — documented quantization loss)
      if (rx <= -1.f || rx >= fw || ry <= -1.f || ry >= fh) {
        tid_scratch[i] = -1;
        continue;
      }
      // quantize FIRST; bin by the quantized position so device tiling
      // agrees exactly. round-to-nearest can push a coord to the next
      // integer boundary (and across a tile edge) — that's fine, the
      // kernel sees the same quantized value.
      int32_t xq = static_cast<int32_t>(rx * 64.0f + 0.5f);
      int32_t yq = static_cast<int32_t>(ry * 64.0f + 0.5f);
      if (xq < 0) xq = 0;
      if (yq < 0) yq = 0;
      const int32_t xq_max = static_cast<int32_t>(mw) * 64 - 1;
      const int32_t yq_max = static_cast<int32_t>(mh) * 64 - 1;
      if (xq > xq_max) xq = xq_max;
      if (yq > yq_max) yq = yq_max;
      int32_t tx = (xq >> 6) / static_cast<int32_t>(tile_w);
      if (tx > n_tiles_x - 1) tx = static_cast<int32_t>(n_tiles_x) - 1;
      const int32_t ty = (yq >> 6) / static_cast<int32_t>(tile_h);
      const int32_t tid = ty * static_cast<int32_t>(n_tiles_x) + tx;
      tid_scratch[i] = tid;
      q_scratch[i * 2 + 0] = xq;
      q_scratch[i * 2 + 1] = yq;
      ++counts[tid];
      ++kept;
    }
    int64_t run = 0;
    for (int64_t ti = 0; ti < n_tiles; ++ti) {
      offs[ti] = static_cast<int32_t>(run);
      const int64_t c = counts[ti];
      counts[ti] = run;
      run += c;
    }
    offs[n_tiles] = static_cast<int32_t>(run);
    for (int64_t i = 0; i < n; ++i) {
      const int32_t tid = tid_scratch[i];
      if (tid < 0) continue;
      const int64_t at = counts[tid]++;
      dx[at] = static_cast<uint16_t>(q_scratch[i * 2 + 0]);
      dy[at] = static_cast<uint16_t>(q_scratch[i * 2 + 1]);
      float tq = static_cast<float>(t[s + i] - t0) * tscale + 0.5f;
      dt[at] = static_cast<uint16_t>(tq > 60000.f ? 60000.f : tq);
      dp[at] = p[s + i];
    }
    if (kept < cap) {
      std::memset(dx + kept, 0, sizeof(uint16_t) * (cap - kept));
      std::memset(dy + kept, 0, sizeof(uint16_t) * (cap - kept));
      std::memset(dt + kept, 0, sizeof(uint16_t) * (cap - kept));
      std::memset(dp + kept, 0, cap - kept);
    }
  }
}


// ---------------------------------------------------------------------------
// Ghost-folded band binning (the fold-free kernel mode,
// ess_tpu/ops/voxel_pallas.py voxelize_folded). Boundary-crossing trilinear
// events are rewritten to exact integer boundary coordinates with the
// crossing weight folded into a PRE-WEIGHTED polarity; the across-band part
// becomes a ghost record appended to the next band. Returns the max record
// count any window needed — when that exceeds cap2 the affected windows are
// emitted EMPTY and the caller must retry with a larger capacity.
// ---------------------------------------------------------------------------

static inline int fold_one_f32(float x, float y, float t, float pw,
                               float fw, float fh, int32_t th,
                               int32_t n_bands, int trilinear,
                               int32_t ntx, int32_t slot_w,
                               float* rec, int32_t* groups) {
  if (trilinear) {
    if (x < 0.f) { pw *= 1.f + x; x = 0.f; }
    else if (x > fw - 1.f) { pw *= fw - x; x = fw - 1.f; }
    if (y < 0.f) { pw *= 1.f + y; y = 0.f; }
    else if (y > fh - 1.f) { pw *= fh - y; y = fh - 1.f; }
  }
  int32_t band = static_cast<int32_t>(y) / th;
  if (band > n_bands - 1) band = n_bands - 1;
  // band-boundary split (rows) into a local staging pair
  float sx[2], sy[2], sp[2];
  int32_t sband[2];
  int nb = 0;
  if (trilinear) {
    const float yl = y - static_cast<float>(band * th);
    const float frac = yl - static_cast<float>(th - 1);
    if (frac > 0.f && band + 1 < n_bands) {
      sx[nb] = x; sy[nb] = static_cast<float>((band + 1) * th);
      sp[nb] = pw * frac; sband[nb] = band + 1;
      ++nb;
      pw *= static_cast<float>(th) - yl;
      y = static_cast<float>(band * th + (th - 1));
    }
  }
  sx[nb] = x; sy[nb] = y; sp[nb] = pw; sband[nb] = band;
  ++nb;
  // x-slot boundary split (columns): same bilinear tent as rows — the
  // right corner landing exactly on a slot_w multiple becomes a ghost on
  // the next slot's first column (ntx == 1 keeps legacy band grouping)
  int nrec = 0;
  for (int k = 0; k < nb; ++k) {
    float xx = sx[k];
    float pp = sp[k];
    if (trilinear && ntx > 1) {
      const float xf = std::floor(xx);
      const float fx = xx - xf;
      const float xr = xf + 1.f;
      const int32_t xri = static_cast<int32_t>(xr);
      if (fx > 0.f && (xri % slot_w) == 0 && xr <= fw - 1.f) {
        rec[nrec * 4 + 0] = xr; rec[nrec * 4 + 1] = sy[k];
        rec[nrec * 4 + 2] = t;  rec[nrec * 4 + 3] = pp * fx;
        groups[nrec] = sband[k] * ntx + xri / slot_w;
        ++nrec;
        pp *= 1.f - fx;
        xx = xf;
      }
    }
    int32_t slot = ntx > 1 ? static_cast<int32_t>(xx) / slot_w : 0;
    if (slot > ntx - 1) slot = ntx - 1;
    rec[nrec * 4 + 0] = xx; rec[nrec * 4 + 1] = sy[k];
    rec[nrec * 4 + 2] = t;  rec[nrec * 4 + 3] = pp;
    groups[nrec] = sband[k] * ntx + slot;
    ++nrec;
  }
  return nrec;
}

static inline void band_sort_write_f32(
    const float* rec_scratch, const int32_t* band_scratch, int64_t m,
    int64_t cap2, int64_t n_bands, float* dst, uint8_t* dvalid,
    int32_t* offs, int64_t* counts) {
  if (m > cap2) m = 0;  // overflow: empty window, caller retries bigger
  std::memset(counts, 0, sizeof(int64_t) * n_bands);
  for (int64_t i = 0; i < m; ++i) ++counts[band_scratch[i]];
  int64_t run = 0;
  for (int64_t b = 0; b < n_bands; ++b) {
    offs[b] = static_cast<int32_t>(run);
    const int64_t c = counts[b];
    counts[b] = run;
    run += c;
  }
  offs[n_bands] = static_cast<int32_t>(run);
  for (int64_t i = 0; i < m; ++i) {
    const int64_t at = counts[band_scratch[i]]++;
    std::memcpy(dst + at * 4, rec_scratch + i * 4, sizeof(float) * 4);
    dvalid[at] = 1;
  }
  if (m < cap2) {
    std::memset(dst + m * 4, 0, sizeof(float) * (cap2 - m) * 4);
    std::memset(dvalid + m, 0, cap2 - m);
  }
}

int64_t band_bin_folded_f32(
    const float* ev, const uint8_t* valid, int64_t T, int64_t n,
    int64_t cap2, int64_t height, int64_t width, int64_t tile_h,
    int64_t n_bands, int trilinear, int64_t ntx, int64_t slot_w,
    float* out, uint8_t* out_valid, int32_t* offsets,
    int64_t* counts, float* rec_scratch, int32_t* band_scratch) {
  const int64_t n_groups = n_bands * ntx;
  const float fw = static_cast<float>(width);
  const float fh = static_cast<float>(height);
  const int32_t th = static_cast<int32_t>(tile_h);
  int64_t max_needed = 0;
  for (int64_t wi = 0; wi < T; ++wi) {
    const float* src = ev + wi * n * 4;
    const uint8_t* vmask = valid + wi * n;
    int64_t m = 0;
    for (int64_t i = 0; i < n; ++i) {
      const float x = src[i * 4 + 0];
      const float y = src[i * 4 + 1];
      bool ok;
      if (trilinear) {
        ok = vmask[i] && x > -1.f && x < fw && y > -1.f && y < fh;
      } else {
        const float xf = std::floor(x);
        const float yf = std::floor(y);
        ok = vmask[i] && xf >= 0.f && xf < fw && yf >= 0.f && yf < fh;
      }
      if (!ok) continue;
      const float pw = src[i * 4 + 3] > 0.f ? 1.f : -1.f;
      m += fold_one_f32(x, y, src[i * 4 + 2], pw, fw, fh, th,
                        static_cast<int32_t>(n_bands), trilinear,
                        static_cast<int32_t>(ntx),
                        static_cast<int32_t>(slot_w),
                        rec_scratch + m * 4, band_scratch + m);
    }
    if (m > max_needed) max_needed = m;
    band_sort_write_f32(rec_scratch, band_scratch, m, cap2, n_groups,
                        out + wi * cap2 * 4, out_valid + wi * cap2,
                        offsets + wi * (n_groups + 1), counts);
  }
  return max_needed;
}

// Fused DSEC ingest, folded variant: rectify-map lookup + per-window time
// re-zero + ghost-folded band counting sort, one pass over the raw h5
// columns (the production loader path for the fold-free kernel).
int64_t ingest_rectify_bin_folded(
    const uint16_t* x, const uint16_t* y, const int64_t* t, const uint8_t* p,
    const int64_t* starts, const int64_t* ends, int64_t T, int64_t cap,
    int64_t cap2, const float* map, int64_t mh, int64_t mw,
    int64_t tile_h, int64_t n_bands, int64_t ntx, int64_t slot_w,
    float* out, uint8_t* out_valid, int32_t* offsets,
    int64_t* counts, float* rec_scratch, int32_t* band_scratch) {
  const int64_t n_groups = n_bands * ntx;
  const float fw = static_cast<float>(mw);
  const float fh = static_cast<float>(mh);
  const int32_t th = static_cast<int32_t>(tile_h);
  int64_t max_needed = 0;
  for (int64_t wi = 0; wi < T; ++wi) {
    int64_t s = starts[wi];
    const int64_t e = ends[wi];
    if (e - s > cap) s = e - cap;
    const int64_t n = e > s ? e - s : 0;
    const int64_t t0 = n > 0 ? t[s] : 0;
    int64_t m = 0;
    for (int64_t i = 0; i < n; ++i) {
      const int64_t srci = s + i;
      const float* mp = map + (static_cast<int64_t>(y[srci]) * mw +
                               static_cast<int64_t>(x[srci])) * 2;
      const float rx = mp[0];
      const float ry = mp[1];
      if (rx <= -1.f || rx >= fw || ry <= -1.f || ry >= fh) continue;
      const float pw = p[srci] > 0 ? 1.f : -1.f;
      m += fold_one_f32(rx, ry, static_cast<float>(t[srci] - t0), pw,
                        fw, fh, th, static_cast<int32_t>(n_bands), 1,
                        static_cast<int32_t>(ntx),
                        static_cast<int32_t>(slot_w),
                        rec_scratch + m * 4, band_scratch + m);
    }
    if (m > max_needed) max_needed = m;
    band_sort_write_f32(rec_scratch, band_scratch, m, cap2, n_groups,
                        out + wi * cap2 * 4, out_valid + wi * cap2,
                        offsets + wi * (n_groups + 1), counts);
  }
  return max_needed;
}

// ---------------------------------------------------------------------------
// Packed + folded wire: the ghost-folded band binning emitted as quantized
// SoA columns — 7 bytes/record (x,y u16 1/64-px fixed point; t u16 per-window
// normalized; PRE-WEIGHTED polarity i8 in 1/127 steps) instead of the 16-byte
// f32 record. Coordinates are quantized to the 1/64 grid BEFORE folding, so
// every fold invariant (band rows, x-slot columns, edge clamps) holds
// EXACTLY on the values the device dequantizes: xq/64 is exact in f32 for
// x < 1024, hence the host's group assignment and the kernel's tents agree
// bit-for-bit; the only loss is the 1/64-px coordinate rounding (shared with
// the halo packed wire) and the i8 weight rounding (|err| <= 1/254 per
// record). Validity is implied by offsets[n_groups] (records pack from 0).
// ---------------------------------------------------------------------------

static inline void band_sort_write_packed(
    const float* rec_scratch, const int32_t* band_scratch, int64_t m,
    int64_t cap2, int64_t n_groups, uint16_t* dx, uint16_t* dy,
    uint16_t* dt, int8_t* dp, int32_t* offs, int64_t* counts,
    float tscale) {
  if (m > cap2) m = 0;  // overflow: empty window, caller retries bigger
  std::memset(counts, 0, sizeof(int64_t) * n_groups);
  for (int64_t i = 0; i < m; ++i) ++counts[band_scratch[i]];
  int64_t run = 0;
  for (int64_t g = 0; g < n_groups; ++g) {
    offs[g] = static_cast<int32_t>(run);
    const int64_t c = counts[g];
    counts[g] = run;
    run += c;
  }
  offs[n_groups] = static_cast<int32_t>(run);
  for (int64_t i = 0; i < m; ++i) {
    const int64_t at = counts[band_scratch[i]]++;
    // coords arrive already on the 1/64 grid: *64 is exact
    dx[at] = static_cast<uint16_t>(rec_scratch[i * 4 + 0] * 64.0f + 0.5f);
    dy[at] = static_cast<uint16_t>(rec_scratch[i * 4 + 1] * 64.0f + 0.5f);
    float tq = rec_scratch[i * 4 + 2] * tscale + 0.5f;
    dt[at] = static_cast<uint16_t>(tq > 60000.f ? 60000.f : tq);
    const float pw = rec_scratch[i * 4 + 3] * 127.0f;
    const float pr = pw > 0.f ? pw + 0.5f : pw - 0.5f;
    dp[at] = static_cast<int8_t>(pr > 127.f ? 127.f
                                            : (pr < -127.f ? -127.f : pr));
  }
  if (m < cap2) {
    std::memset(dx + m, 0, sizeof(uint16_t) * (cap2 - m));
    std::memset(dy + m, 0, sizeof(uint16_t) * (cap2 - m));
    std::memset(dt + m, 0, sizeof(uint16_t) * (cap2 - m));
    std::memset(dp + m, 0, cap2 - m);
  }
}

// Fused DSEC ingest, packed + folded: rectify-map lookup + 1/64-px
// quantization + per-window time normalization + ghost-folded band counting
// sort, one pass over the raw h5 columns. Returns the max record count any
// window needed (> cap2 => affected windows emitted empty, caller retries).
int64_t ingest_rectify_bin_packed_folded(
    const uint16_t* x, const uint16_t* y, const int64_t* t, const uint8_t* p,
    const int64_t* starts, const int64_t* ends, int64_t T, int64_t cap,
    int64_t cap2, const float* map, int64_t mh, int64_t mw,
    int64_t tile_h, int64_t n_bands, int64_t ntx, int64_t slot_w,
    uint16_t* out_x, uint16_t* out_y, uint16_t* out_t, int8_t* out_p,
    int32_t* offsets, int64_t* counts, float* rec_scratch,
    int32_t* band_scratch) {
  const int64_t n_groups = n_bands * ntx;
  const float fw = static_cast<float>(mw);
  const float fh = static_cast<float>(mh);
  const int32_t th = static_cast<int32_t>(tile_h);
  int64_t max_needed = 0;
  for (int64_t wi = 0; wi < T; ++wi) {
    int64_t s = starts[wi];
    const int64_t e = ends[wi];
    if (e - s > cap) s = e - cap;
    const int64_t n = e > s ? e - s : 0;
    // time normalization spans the window's RAW first/last timestamps
    // (matches ingest_rectify_bin_packed; see that function's comment)
    const int64_t t0 = n > 0 ? t[s] : 0;
    const int64_t t1 = n > 0 ? t[e - 1] : 0;
    const float tscale = t1 > t0 ? 60000.0f / static_cast<float>(t1 - t0)
                                 : 0.0f;
    int64_t m = 0;
    for (int64_t i = 0; i < n; ++i) {
      const int64_t srci = s + i;
      const float* mp = map + (static_cast<int64_t>(y[srci]) * mw +
                               static_cast<int64_t>(x[srci])) * 2;
      // quantize FIRST (1/64-px grid, exact in f32), then fold on the
      // quantized coordinates — grouping and device tents agree exactly.
      // Edge-zone coords (dim-1, dim) and (-1, 0) stay negative/fractional
      // here: fold_one_f32 folds their sub-pixel weight and emits in-frame
      // records, so the u16 wire never sees an out-of-frame value (the
      // halo packed wire clamps instead and loses the edge weight).
      const float rx = std::floor(mp[0] * 64.0f + 0.5f) * (1.0f / 64.0f);
      const float ry = std::floor(mp[1] * 64.0f + 0.5f) * (1.0f / 64.0f);
      if (rx <= -1.f || rx >= fw || ry <= -1.f || ry >= fh) continue;
      const float pw = p[srci] > 0 ? 1.f : -1.f;
      m += fold_one_f32(rx, ry, static_cast<float>(t[srci] - t0), pw,
                        fw, fh, th, static_cast<int32_t>(n_bands), 1,
                        static_cast<int32_t>(ntx),
                        static_cast<int32_t>(slot_w),
                        rec_scratch + m * 4, band_scratch + m);
    }
    if (m > max_needed) max_needed = m;
    band_sort_write_packed(rec_scratch, band_scratch, m, cap2, n_groups,
                           out_x + wi * cap2, out_y + wi * cap2,
                           out_t + wi * cap2, out_p + wi * cap2,
                           offsets + wi * (n_groups + 1), counts, tscale);
  }
  return max_needed;
}

}  // extern "C"\n