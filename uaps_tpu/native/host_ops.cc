// Native host-side data-pipeline kernels for uaps-tpu.
//
// The reference's input pipeline is torch DataLoader workers running
// python transforms (utilities/dataloaders.py:60-119); our equivalent hot
// loop (decode -> geometric transform -> normalize -> batch assembly) runs
// here as a multithreaded C++ library called through ctypes, so a single
// host can feed multi-chip TPU throughput without Python in the per-pixel
// path.
//
// Exposed C ABI (all buffers caller-allocated, row-major):
//   uaps_normalize_batch   uint8 NHWC -> float32 NHWC, (x/255 - mean)/std
//   uaps_transform_batch   fused nearest-resize + hflip/vflip/rot90 +
//                          normalize in ONE pass over the output
//   uaps_transform_mask    same geometry for int32 masks (+ optional /255
//                          binarize), nearest only
//   uaps_rle_encode        column-major RLE (utilities/utilities.py:36-45)
//
// Build: see build.py (g++ -O3 -shared -fPIC -fopenmp).

#include <cstdint>
#include <cstring>
#include <algorithm>

#if defined(_OPENMP)
#include <omp.h>
#endif

extern "C" {

// ---------------------------------------------------------------------
// (x/255 - mean) / std, NHWC uint8 -> float32
// ---------------------------------------------------------------------
void uaps_normalize_batch(const uint8_t* src, float* dst, int64_t n,
                          int64_t h, int64_t w, int64_t c,
                          const float* mean, const float* std_) {
  float scale[8], shift[8];
  for (int64_t k = 0; k < c; ++k) {
    scale[k] = 1.0f / (255.0f * std_[k]);
    shift[k] = -mean[k] / std_[k];
  }
  const int64_t hw = h * w;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < n * hw; ++i) {
    const uint8_t* s = src + i * c;
    float* d = dst + i * c;
    for (int64_t k = 0; k < c; ++k) d[k] = s[k] * scale[k] + shift[k];
  }
}

// ---------------------------------------------------------------------
// Fused geometric transform + normalize.
// geometry: nearest resize (sh,sw)->(dh,dw), then optional hflip, vflip,
// rot90 k times. Implemented gather-style: for each OUTPUT pixel compute
// the source pixel, so the whole chain is one pass.
// flags per image: bit0 hflip, bit1 vflip, bits 2-3 rot90 k.
// ---------------------------------------------------------------------
static inline void map_coord(int64_t oy, int64_t ox, int64_t dh, int64_t dw,
                             int flags, int64_t* ty, int64_t* tx,
                             int64_t* th, int64_t* tw) {
  // invert the op chain output->input: rot90^k was applied last
  int64_t y = oy, x = ox, hh = dh, ww = dw;
  int k = (flags >> 2) & 3;
  // inverse of rot90(k) (numpy convention: rot90 once maps
  // (i,j) -> (w-1-j, i) on the output of shape (w,h))
  for (int t = 0; t < k; ++t) {
    int64_t ny = x, nx = hh - 1 - y;
    y = ny; x = nx;
    std::swap(hh, ww);
  }
  if (flags & 2) y = hh - 1 - y;  // vflip
  if (flags & 1) x = ww - 1 - x;  // hflip
  *ty = y; *tx = x; *th = hh; *tw = ww;
}

void uaps_transform_batch(const uint8_t* src, float* dst, int64_t n,
                          int64_t sh, int64_t sw, int64_t c,
                          int64_t dh, int64_t dw, const int32_t* flags,
                          const float* mean, const float* std_) {
  float scale[8], shift[8];
  for (int64_t k = 0; k < c; ++k) {
    scale[k] = 1.0f / (255.0f * std_[k]);
    shift[k] = -mean[k] / std_[k];
  }
#pragma omp parallel for schedule(static)
  for (int64_t img = 0; img < n; ++img) {
    const uint8_t* s = src + img * sh * sw * c;
    const int f = flags[img];
    const int k = (f >> 2) & 3;
    // output dims after rot90 of the (dh,dw) resized image
    const int64_t oh = (k % 2) ? dw : dh;
    const int64_t ow = (k % 2) ? dh : dw;
    float* d = dst + img * dh * dw * c;  // caller allocates dh*dw (oh*ow ==
                                         // dh*dw in element count)
    for (int64_t oy = 0; oy < oh; ++oy) {
      for (int64_t ox = 0; ox < ow; ++ox) {
        int64_t ry, rx, rh, rw;
        map_coord(oy, ox, oh, ow, f, &ry, &rx, &rh, &rw);
        // (ry, rx) indexes the resized (dh, dw) image; nearest map to src
        // (cv2 INTER_NEAREST: floor(i * s/d))
        int64_t sy = std::min<int64_t>(ry * sh / dh, sh - 1);
        int64_t sx = std::min<int64_t>(rx * sw / dw, sw - 1);
        const uint8_t* sp = s + (sy * sw + sx) * c;
        float* dp = d + (oy * ow + ox) * c;
        for (int64_t ch = 0; ch < c; ++ch)
          dp[ch] = sp[ch] * scale[ch] + shift[ch];
      }
    }
  }
}

void uaps_transform_mask(const uint8_t* src, int32_t* dst, int64_t n,
                         int64_t sh, int64_t sw, int64_t dh, int64_t dw,
                         const int32_t* flags, int binarize) {
#pragma omp parallel for schedule(static)
  for (int64_t img = 0; img < n; ++img) {
    const uint8_t* s = src + img * sh * sw;
    const int f = flags[img];
    const int k = (f >> 2) & 3;
    const int64_t oh = (k % 2) ? dw : dh;
    const int64_t ow = (k % 2) ? dh : dw;
    int32_t* d = dst + img * dh * dw;
    for (int64_t oy = 0; oy < oh; ++oy) {
      for (int64_t ox = 0; ox < ow; ++ox) {
        int64_t ry, rx, rh, rw;
        map_coord(oy, ox, oh, ow, f, &ry, &rx, &rh, &rw);
        int64_t sy = std::min<int64_t>(ry * sh / dh, sh - 1);
        int64_t sx = std::min<int64_t>(rx * sw / dw, sw - 1);
        int32_t v = s[sy * sw + sx];
        d[oy * ow + ox] = binarize ? (v > 127 ? 1 : 0) : v;
      }
    }
  }
}

// ---------------------------------------------------------------------
// Column-major RLE encode (1-indexed starts), binary mask input.
// Returns number of int32s written to out (pairs of start,len), or -1 if
// out_capacity was too small.
// ---------------------------------------------------------------------
int64_t uaps_rle_encode(const uint8_t* mask, int64_t h, int64_t w,
                        int32_t* out, int64_t out_capacity) {
  int64_t n_out = 0;
  int64_t run_start = -1;
  int64_t idx = 0;
  for (int64_t x = 0; x < w; ++x) {
    for (int64_t y = 0; y < h; ++y, ++idx) {
      const bool on = mask[y * w + x] != 0;
      if (on && run_start < 0) run_start = idx;
      if (!on && run_start >= 0) {
        if (n_out + 2 > out_capacity) return -1;
        out[n_out++] = (int32_t)(run_start + 1);
        out[n_out++] = (int32_t)(idx - run_start);
        run_start = -1;
      }
    }
  }
  if (run_start >= 0) {
    if (n_out + 2 > out_capacity) return -1;
    out[n_out++] = (int32_t)(run_start + 1);
    out[n_out++] = (int32_t)(idx - run_start);
  }
  return n_out;
}

int uaps_version() { return 1; }

}  // extern "C"
