// Native CPU compute backend: bit-exact C++ twins of the hot device ops,
// used by the stage engine when no accelerator is present (the XLA CPU
// backend interprets the same math an order of magnitude slower than a
// tight scalar loop on one core).
//
// Exactness contracts (each is pinned by tests against BOTH the JAX ops
// and the original library the op emulates):
//   - colormask: cv2 8U HSV fixed point (hsv_shift=12 division tables,
//     ops/color.py:rgb_to_hsv_u8) + cv2.inRange saturate-rounded bounds.
//   - enhance: PIL ImageEnhance semantics — truncating float32 blend
//     (Blend.c), integer luma ((19595R+38470G+7471B+0x8000)>>16), exact
//     round-half-up contrast mean, Pillow integer fixed-point box blur
//     (BoxBlur.c: ww = (uint32)(2^24/(fr*2+1)) with a FLOAT32 divide,
//     fw = leftover/2, (bulk + 2^23) >> 24), rint'd channel gains.
//     See ops/photometric.py for the derivations.
//
// Compile with -ffp-contract=off: the float32 expressions below must round
// per-operation exactly as the XLA CPU backend evaluates the same graphs
// (FMA contraction would perturb floor()/cast boundaries).
//
// Reference behavior anchors: filtres_liste.py:41-149 (color mask),
// tranfo.py:9-55 (enhance chain).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// cv2 8U HSV division tables (imgproc color_hsv, hsv_shift = 12).
// Entries are rint(1044480/v) and rint(122880/d) — exact ties never occur
// and double division rounds identically to cv2's cvRound (see
// ops/color.py:rgb_to_hsv_u8 for the proof sketch; verified exhaustively
// over all 2^24 RGB triples against cv2).
struct HsvTables {
  int32_t sdiv[256];
  int32_t hdiv[256];
  HsvTables() {
    sdiv[0] = hdiv[0] = 0;  // guarded: diff==0 forces S=0, h_num=0
    for (int i = 1; i < 256; ++i) {
      sdiv[i] = (int32_t)nearbyint(1044480.0 / i);
      hdiv[i] = (int32_t)nearbyint(122880.0 / i);
    }
  }
};
const HsvTables kHsv;

inline void rgb_to_hsv_u8(int r, int g, int b, int* h8, int* s8, int* v8) {
  int v = r > g ? (r > b ? r : b) : (g > b ? g : b);
  int mn = r < g ? (r < b ? r : b) : (g < b ? g : b);
  int diff = v - mn;
  int s = (diff * kHsv.sdiv[v > 0 ? v : 1] + 2048) >> 12;
  int hnum = (v == r)   ? g - b
             : (v == g) ? b - r + 2 * diff
                        : r - g + 4 * diff;
  int h = (hnum * kHsv.hdiv[diff > 0 ? diff : 1] + 2048) >> 12;
  if (h < 0) h += 180;
  *h8 = h;
  *s8 = s;
  *v8 = v;
}

// One image: accumulate F in-range∧zone masks over the valid region,
// invert, write alpha (canvas padding stays zero — caller zeroes `alpha`).
//
// Per-pixel work is table-driven: three 256-entry per-channel bitmasks
// (bit f set ⇔ the value is inside filter f's [lo, hi]) plus per-row /
// per-column zone bitmasks turn the F-filter loop into five loads and
// four ANDs.  Falls back to a scalar filter loop beyond 32 filters.
void colormask_one(const uint8_t* img, int H, int W, int h, int w,
                   const int32_t* bounds /* F x 6: lo(H,S,V), hi(H,S,V) */,
                   const int32_t* zones /* F x 4: top,bottom,left,right */,
                   int F, uint8_t* alpha) {
  const bool table = F <= 32;
  uint32_t mh[256] = {0}, ms[256] = {0}, mv[256] = {0};
  std::vector<uint32_t> colm;
  if (table) {
    for (int f = 0; f < F; ++f) {
      const int32_t* bo = bounds + 6 * f;
      const uint32_t bit = 1u << f;
      for (int v = bo[0]; v <= bo[3] && v < 256; ++v) mh[v] |= bit;
      for (int v = bo[1]; v <= bo[4] && v < 256; ++v) ms[v] |= bit;
      for (int v = bo[2]; v <= bo[5] && v < 256; ++v) mv[v] |= bit;
    }
    colm.assign((size_t)w, 0);
    for (int f = 0; f < F; ++f) {
      const int32_t* zn = zones + 4 * f;
      const uint32_t bit = 1u << f;
      for (int x = zn[2] > 0 ? zn[2] : 0; x < w - zn[3]; ++x)
        colm[x] |= bit;
    }
  }
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = img + (size_t)y * W * 3;
    uint8_t* arow = alpha + (size_t)y * W;
    if (table) {
      uint32_t rowm = 0;
      for (int f = 0; f < F; ++f) {
        const int32_t* zn = zones + 4 * f;
        if (y >= zn[0] && y < h - zn[1]) rowm |= 1u << f;
      }
      for (int x = 0; x < w; ++x) {
        int h8, s8, v8;
        rgb_to_hsv_u8(row[3 * x], row[3 * x + 1], row[3 * x + 2], &h8, &s8,
                      &v8);
        uint32_t m = mh[h8] & ms[s8] & mv[v8] & rowm & colm[x];
        arow[x] = m ? 0 : 255;
      }
    } else {
      for (int x = 0; x < w; ++x) {
        int h8, s8, v8;
        rgb_to_hsv_u8(row[3 * x], row[3 * x + 1], row[3 * x + 2], &h8, &s8,
                      &v8);
        int match = 0;
        for (int f = 0; f < F && !match; ++f) {
          const int32_t* bo = bounds + 6 * f;
          const int32_t* zn = zones + 4 * f;
          match = h8 >= bo[0] && h8 <= bo[3] && s8 >= bo[1] &&
                  s8 <= bo[4] && v8 >= bo[2] && v8 <= bo[5] && y >= zn[0] &&
                  y < h - zn[1] && x >= zn[2] && x < w - zn[3];
        }
        arow[x] = match ? 0 : 255;
      }
    }
  }
}

// ---------------------------------------------------------------------------
// PIL enhance chain (ops/photometric.py twins).

// PIL convert('L') fixed-point luma.
inline int luma_i(int r, int g, int b) {
  return (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16;
}

// PIL Image.blend: float32 lerp, clip, TRUNCATE.
inline uint8_t blend_trunc(float deg, float v, float factor) {
  float t = deg + factor * (v - deg);
  if (t < 0.0f) t = 0.0f;
  if (t > 255.0f) t = 255.0f;
  return (uint8_t)floorf(t);
}

// One Pillow fixed-point box pass over a contiguous edge-padded line:
// reads in[off-r-1 .. off+n+r], writes out[off .. off+n).
inline void box_pass(const uint32_t* in, uint32_t* out, int n, int r,
                     uint32_t ww, uint32_t fw, int off) {
  uint32_t sum = 0;
  for (int k = -r; k <= r; ++k) sum += in[off + k];
  for (int i = 0; i < n; ++i) {
    uint32_t bulk =
        ww * sum + fw * (in[off + i - r - 1] + in[off + i + r + 1]);
    out[off + i] = (bulk + (1u << 23)) >> 24;
    sum += in[off + i + r + 1] - in[off + i - r];
  }
}

inline void fill_edges(uint32_t* a, int n, int off) {
  for (int i = 0; i < off; ++i) a[i] = a[off];
  for (int i = 0; i < off; ++i) a[off + n + i] = a[off + n - 1];
}

// Three successive box passes over every row of a contiguous plane —
// horizontal passes are row-independent, so running all three while the
// row sits in L1 equals Pillow's whole-image pass-by-pass order.
void blur_plane_rows(uint8_t* plane, int h, int w, int r, uint32_t ww,
                     uint32_t fw, uint32_t* A, uint32_t* B) {
  const int off = r + 1;
  for (int y = 0; y < h; ++y) {
    uint8_t* row = plane + (size_t)y * w;
    for (int i = 0; i < w; ++i) A[off + i] = row[i];
    fill_edges(A, w, off);
    box_pass(A, B, w, r, ww, fw, off);
    fill_edges(B, w, off);
    box_pass(B, A, w, r, ww, fw, off);
    fill_edges(A, w, off);
    box_pass(A, B, w, r, ww, fw, off);
    for (int i = 0; i < w; ++i) row[i] = (uint8_t)B[off + i];
  }
}

// Cache-blocked byte transpose: dst[x, y] = src[y, x].
void transpose_u8(const uint8_t* src, uint8_t* dst, int h, int w) {
  const int B = 64;
  for (int y0 = 0; y0 < h; y0 += B)
    for (int x0 = 0; x0 < w; x0 += B) {
      const int y1 = y0 + B < h ? y0 + B : h;
      const int x1 = x0 + B < w ? x0 + B : w;
      for (int y = y0; y < y1; ++y)
        for (int x = x0; x < x1; ++x)
          dst[(size_t)x * h + y] = src[(size_t)y * w + x];
    }
}

// Pillow GaussianBlur(radius=sigma): 3 horizontal then 3 vertical
// fractional-radius box passes, integer fixed point (BoxBlur.c).  Operates
// in place on an h*w*3 interleaved buffer; per channel the plane is
// deinterleaved, row-blurred, transposed, row-blurred, transposed back
// (the same transpose trick Pillow's own BoxBlur.c uses).
void gaussian_blur_u8(uint8_t* buf, int h, int w, float sigma) {
  float sig = sigma < 1e-6f ? 1e-6f : sigma;
  // Box radius exactly as ops/photometric.py computes it (float32 ops,
  // per-operation rounding — hence -ffp-contract=off).
  float sigma2 = sig * sig / 3.0f;
  float L = sqrtf(12.0f * sigma2 + 1.0f);
  float l = floorf((L - 1.0f) / 2.0f);
  float a = (2.0f * l + 1.0f) * (l * (l + 1.0f) - 3.0f * sigma2);
  a = a / (6.0f * (sigma2 - (l + 1.0f) * (l + 1.0f)));
  float fr = l + a;
  int r = (int)fr;
  uint32_t ww = (uint32_t)((float)(1 << 24) / (fr * 2.0f + 1.0f));
  uint32_t fw = ((uint32_t)(1 << 24) - (uint32_t)(2 * r + 1) * ww) / 2u;
  const size_t npx = (size_t)h * w;
  const int nmax = (h > w ? h : w) + 2 * (r + 1);
  std::vector<uint32_t> A((size_t)nmax), B((size_t)nmax);
  std::vector<uint8_t> plane(npx), planeT(npx);
  for (int c = 0; c < 3; ++c) {
    const uint8_t* s = buf + c;
    for (size_t p = 0; p < npx; ++p) plane[p] = s[3 * p];
    blur_plane_rows(plane.data(), h, w, r, ww, fw, A.data(), B.data());
    transpose_u8(plane.data(), planeT.data(), h, w);
    blur_plane_rows(planeT.data(), w, h, r, ww, fw, A.data(), B.data());
    transpose_u8(planeT.data(), plane.data(), w, h);
    uint8_t* d = buf + c;
    for (size_t p = 0; p < npx; ++p) d[3 * p] = plane[p];
  }
}

// Full enhance chain on one canvas image.  `img` is the H*W*3 canvas with
// content in [0:h, 0:w]; `out` is a caller-zeroed H*W*3 canvas (padding
// stays zero = apply_mask).
void enhance_one(const uint8_t* img, int H, int W, int h, int w,
                 float b_factor, float c_factor, float col_factor,
                 float sigma, int apply_blur, const float* gains,
                 int apply_rgb, uint8_t* out) {
  std::vector<uint8_t> tmp((size_t)h * w * 3);
  // Pass A — brightness LUT (blend vs black = px * factor, truncated) and
  // the post-brightness luma total for the contrast mean.
  uint8_t lutB[256];
  for (int i = 0; i < 256; ++i) {
    float t = (float)i * b_factor;
    if (t < 0.0f) t = 0.0f;
    if (t > 255.0f) t = 255.0f;
    lutB[i] = (uint8_t)floorf(t);
  }
  uint64_t total = 0;
  for (int y = 0; y < h; ++y) {
    const uint8_t* src = img + (size_t)y * W * 3;
    uint8_t* dst = tmp.data() + (size_t)y * w * 3;
    for (int x = 0; x < w; ++x) {
      int r = lutB[src[3 * x]], g = lutB[src[3 * x + 1]],
          b = lutB[src[3 * x + 2]];
      dst[3 * x] = (uint8_t)r;
      dst[3 * x + 1] = (uint8_t)g;
      dst[3 * x + 2] = (uint8_t)b;
      total += (uint64_t)luma_i(r, g, b);
    }
  }
  // PIL Contrast mean: int(sum/n + 0.5) = floor((2T + n) / (2n)), exact in
  // integers (ops/photometric.py:exact_mean_round_half_up).
  uint64_t n = (uint64_t)h * w;
  int mean = (int)((2 * total + n) / (2 * n));
  if (mean > 255) mean = 255;
  // Pass B — contrast LUT then per-pixel color blend (the color luma is a
  // local function of the post-contrast pixel).  The color blend only ever
  // sees (lum, value) pairs from [0,255]² — precomputing the 64K blends
  // replaces three float lerps per pixel with three table loads.
  uint8_t lutC[256];
  for (int i = 0; i < 256; ++i)
    lutC[i] = blend_trunc((float)mean, (float)i, c_factor);
  std::vector<uint8_t> lutCol((size_t)256 * 256);
  for (int lm = 0; lm < 256; ++lm)
    for (int i = 0; i < 256; ++i)
      lutCol[(size_t)lm * 256 + i] =
          blend_trunc((float)lm, (float)i, col_factor);
  for (size_t p = 0; p < (size_t)h * w; ++p) {
    uint8_t* px = tmp.data() + 3 * p;
    int r = lutC[px[0]], g = lutC[px[1]], b = lutC[px[2]];
    const uint8_t* lc = lutCol.data() + (size_t)luma_i(r, g, b) * 256;
    px[0] = lc[r];
    px[1] = lc[g];
    px[2] = lc[b];
  }
  if (apply_blur) gaussian_blur_u8(tmp.data(), h, w, sigma);
  if (apply_rgb) {
    // channel_gains: clip(rint(px * gain), 0, 255) — rint is round half
    // to even (nearbyintf under the default rounding mode), matching
    // jnp.rint.
    uint8_t lutG[3][256];
    for (int c = 0; c < 3; ++c)
      for (int i = 0; i < 256; ++i) {
        float t = nearbyintf((float)i * gains[c]);
        if (t < 0.0f) t = 0.0f;
        if (t > 255.0f) t = 255.0f;
        lutG[c][i] = (uint8_t)t;
      }
    for (size_t p = 0; p < (size_t)h * w; ++p) {
      uint8_t* px = tmp.data() + 3 * p;
      px[0] = lutG[0][px[0]];
      px[1] = lutG[1][px[1]];
      px[2] = lutG[2][px[2]];
    }
  }
  for (int y = 0; y < h; ++y)
    memcpy(out + (size_t)y * W * 3, tmp.data() + (size_t)y * w * 3,
           (size_t)w * 3);
}

// Simple static work-queue batch driver (same shape as ipp_io.cpp's).
template <typename Fn>
void run_batch(int n, int n_threads, Fn fn) {
  if (n_threads < 1) n_threads = 1;
  const int nt = n_threads < n ? n_threads : n;
  if (nt <= 1) {
    for (int i = 0; i < n; ++i) fn(i);
    return;
  }
  std::vector<std::thread> pool;
  std::atomic<int> next{0};
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      fn(i);
    }
  };
  for (int t = 0; t < nt; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// imgs: N x H x W x 3 canvases; sizes: N x 2 (h, w) valid extents;
// bounds: F x 6 int32 (already cv2-saturate-rounded); zones: F x 4;
// alphas: N x H x W output (caller-zeroed).
void ipp_cpu_colormask_batch(const uint8_t* imgs, int n, int H, int W,
                             const int32_t* sizes, const int32_t* bounds,
                             const int32_t* zones, int F, uint8_t* alphas,
                             int n_threads) {
  run_batch(n, n_threads, [&](int i) {
    colormask_one(imgs + (size_t)i * H * W * 3, H, W, sizes[2 * i],
                  sizes[2 * i + 1], bounds, zones, F,
                  alphas + (size_t)i * H * W);
  });
}

// factors: N x 7 float32 (brightness, contrast, color, sigma, g0, g1, g2);
// flags: N x 2 uint8 (apply_blur, apply_rgb); outs: caller-zeroed
// N x H x W x 3 canvases.
void ipp_cpu_enhance_batch(const uint8_t* imgs, int n, int H, int W,
                           const int32_t* sizes, const float* factors,
                           const uint8_t* flags, uint8_t* outs,
                           int n_threads) {
  run_batch(n, n_threads, [&](int i) {
    const float* f = factors + 7 * i;
    enhance_one(imgs + (size_t)i * H * W * 3, H, W, sizes[2 * i],
                sizes[2 * i + 1], f[0], f[1], f[2], f[3], flags[2 * i],
                f + 4, flags[2 * i + 1], outs + (size_t)i * H * W * 3);
  });
}

}  // extern "C"
