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
// `C` is the interleaved channel stride (3 = RGB, 4 = RGBA; only the
// first three channels are read).
void colormask_one(const uint8_t* img, int C, int H, int W, int h, int w,
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
    const uint8_t* row = img + (size_t)y * W * C;
    uint8_t* arow = alpha + (size_t)y * W;
    if (table) {
      uint32_t rowm = 0;
      for (int f = 0; f < F; ++f) {
        const int32_t* zn = zones + 4 * f;
        if (y >= zn[0] && y < h - zn[1]) rowm |= 1u << f;
      }
      for (int x = 0; x < w; ++x) {
        int h8, s8, v8;
        rgb_to_hsv_u8(row[C * x], row[C * x + 1], row[C * x + 2], &h8, &s8,
                      &v8);
        uint32_t m = mh[h8] & ms[s8] & mv[v8] & rowm & colm[x];
        arow[x] = m ? 0 : 255;
      }
    } else {
      for (int x = 0; x < w; ++x) {
        int h8, s8, v8;
        rgb_to_hsv_u8(row[C * x], row[C * x + 1], row[C * x + 2], &h8, &s8,
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

// Full enhance chain on one canvas image.  `img` is the H*W*Cin canvas
// with content in [0:h, 0:w]; `out` is an H*W*Cout canvas whose padding
// the caller guarantees zero (= apply_mask).  Only the first three (RGB)
// channels are read/written — with Cout=4 the alpha channel of `out`
// passes through untouched (img may alias out for the in-place chain
// path: every source pixel is consumed before it is overwritten).
void enhance_one(const uint8_t* img, int Cin, int H, int W, int h, int w,
                 float b_factor, float c_factor, float col_factor,
                 float sigma, int apply_blur, const float* gains,
                 int apply_rgb, uint8_t* out, int Cout) {
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
    const uint8_t* src = img + (size_t)y * W * Cin;
    uint8_t* dst = tmp.data() + (size_t)y * w * 3;
    for (int x = 0; x < w; ++x) {
      int r = lutB[src[Cin * x]], g = lutB[src[Cin * x + 1]],
          b = lutB[src[Cin * x + 2]];
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
  if (Cout == 3) {
    for (int y = 0; y < h; ++y)
      memcpy(out + (size_t)y * W * 3, tmp.data() + (size_t)y * w * 3,
             (size_t)w * 3);
  } else {
    for (int y = 0; y < h; ++y) {
      const uint8_t* src = tmp.data() + (size_t)y * w * 3;
      uint8_t* dst = out + (size_t)y * W * Cout;
      for (int x = 0; x < w; ++x) {
        dst[Cout * x] = src[3 * x];
        dst[Cout * x + 1] = src[3 * x + 1];
        dst[Cout * x + 2] = src[3 * x + 2];
      }
    }
  }
}

// ---------------------------------------------------------------------------
// Fused-chain executor: bit-exact CPU twin of transforms/fused.py's
// FusedChain device program.  Works on RGBA canvases viewed as packed
// uint32 pixels (layout-identical to the [H, W, 4] uint8 array); ops run
// in sequence on a ping-pong pair of canvas buffers, maintaining the
// padded-canvas invariant (pixels outside [0:h, 0:w] are zero).
//
// The RANDOMNESS (rotation shear vectors, flip picks, enhance factors)
// is NOT drawn here: the Python side evaluates the same jax.random draws
// the device program makes (per-stage fold_in) and ships the results, so
// both backends apply the identical permutation/factors per seed
// (ops/geometry.py:shear_params is the shared source of truth).

enum ChainOpcode {
  OP_ROT_SHEAR = 0,   // center + quarter turn + Paeth 3-shear + fit crop
  OP_FLIP = 1,        // dihedral within the valid region
  OP_MASK = 2,        // HSV color mask: alpha = min(alpha, mask)
  OP_ENHANCE = 3,     // photometric chain on RGB, alpha untouched
  OP_FITCROP = 4,     // tight crop to nonzero content
  OP_BORDERCROP = 5,  // fractional/absolute margins off each side
  OP_CCL = 6,         // component cleanup + alpha-bbox tight crop
};

// Exact quarter-turn permutations of a square S*S u32 canvas
// (jnp semantics from ops/geometry.py:rotate_square_shear).
void quad_turn(const uint32_t* in, uint32_t* out, int S, int quad) {
  switch (quad) {
    case 1:  // 90° CCW: out[a,b] = in[b, S-1-a]
      for (int a = 0; a < S; ++a)
        for (int b = 0; b < S; ++b)
          out[(size_t)a * S + b] = in[(size_t)b * S + (S - 1 - a)];
      break;
    case 2:  // 180°
      for (int a = 0; a < S; ++a)
        for (int b = 0; b < S; ++b)
          out[(size_t)a * S + b] = in[(size_t)(S - 1 - a) * S + (S - 1 - b)];
      break;
    case 3:  // 270° CCW: out[a,b] = in[S-1-b, a]
      for (int a = 0; a < S; ++a)
        for (int b = 0; b < S; ++b)
          out[(size_t)a * S + b] = in[(size_t)(S - 1 - b) * S + a];
      break;
    default:
      memcpy(out, in, (size_t)S * S * 4);
  }
}

// Per-row x-shift (geometry.py:_row_shift axis=1): out[y, x] = in[y, x-t]
// for 0 <= x-t < W, zero elsewhere.  Shifts are pre-clipped by
// shear_params to the device path's static offset range.
void shear_x(const uint32_t* in, uint32_t* out, int H, int W,
             const int32_t* t) {
  for (int y = 0; y < H; ++y) {
    uint32_t* orow = out + (size_t)y * W;
    const uint32_t* irow = in + (size_t)y * W;
    int s = t[y];
    memset(orow, 0, (size_t)W * 4);
    int x0 = s > 0 ? s : 0;          // first valid output x
    int cnt = W - (s > 0 ? s : -s);  // surviving pixels
    if (cnt > 0) memcpy(orow + x0, irow + (x0 - s), (size_t)cnt * 4);
  }
}

// Per-column y-shift (axis=0): out[y, x] = in[y - t[x], x].
void shear_y(const uint32_t* in, uint32_t* out, int H, int W,
             const int32_t* t) {
  for (int y = 0; y < H; ++y) {
    uint32_t* orow = out + (size_t)y * W;
    for (int x = 0; x < W; ++x) {
      int sy = y - t[x];
      orow[x] = (unsigned)sy < (unsigned)H ? in[(size_t)sy * W + x] : 0;
    }
  }
}

// Tight crop to the content bbox within [0:h, 0:w], in place
// (geometry.py:fit_crop).  RGBA content ⇒ ALPHA-only bbox: Pillow >= 10
// Image.getbbox() defaults alpha_only=True on images with an alpha
// channel, so a colored-but-transparent pixel must not extend the bbox
// (packed little-endian RGBA u32: alpha = bits 24-31).
// Updates h/w; an EMPTY bbox (fully transparent image — PIL getbbox()
// None) keeps the image UNCROPPED, matching the reference's fallbacks
// (rotations.py:99-109 saves the un-cropped image, recadrages.py:74-76
// copies the original) and geometry.py:fit_crop.
void fitcrop_inplace(uint32_t* buf, int W, int* h, int* w) {
  int y0 = -1, y1 = -1, x0 = 1 << 30, x1 = -1;
  for (int y = 0; y < *h; ++y) {
    const uint32_t* row = buf + (size_t)y * W;
    int rx0 = -1, rx1 = -1;
    for (int x = 0; x < *w; ++x)
      if (row[x] & 0xFF000000u) { if (rx0 < 0) rx0 = x; rx1 = x; }
    if (rx0 >= 0) {
      if (y0 < 0) y0 = y;
      y1 = y;
      if (rx0 < x0) x0 = rx0;
      if (rx1 > x1) x1 = rx1;
    }
  }
  if (y0 < 0) return;  // empty bbox: keep uncropped
  int bh = y1 - y0 + 1, bw = x1 - x0 + 1;
  for (int y = 0; y < bh; ++y) {
    memmove(buf + (size_t)y * W, buf + (size_t)(y0 + y) * W + x0,
            (size_t)bw * 4);
    // stale original-row content right of the moved block
    if (*w > bw)
      memset(buf + (size_t)y * W + bw, 0, (size_t)(*w - bw) * 4);
  }
  for (int y = bh; y < *h; ++y)
    memset(buf + (size_t)y * W, 0, (size_t)*w * 4);
  *h = bh;
  *w = bw;
}

// Dihedral flip within the valid region (geometry.py:dihedral):
// code 0='o', 1='h' (mirror x), 2='v' (mirror y), 3='hv'.
void flip_inplace(uint32_t* buf, int W, int h, int w, int code,
                  uint32_t* rowtmp) {
  if (code == 1 || code == 3)
    for (int y = 0; y < h; ++y) {
      uint32_t* row = buf + (size_t)y * W;
      for (int x = 0; x < w / 2; ++x) {
        uint32_t t = row[x];
        row[x] = row[w - 1 - x];
        row[w - 1 - x] = t;
      }
    }
  if (code == 2 || code == 3)
    for (int y = 0; y < h / 2; ++y) {
      uint32_t* a = buf + (size_t)y * W;
      uint32_t* b = buf + (size_t)(h - 1 - y) * W;
      memcpy(rowtmp, a, (size_t)w * 4);
      memcpy(a, b, (size_t)w * 4);
      memcpy(b, rowtmp, (size_t)w * 4);
    }
}

// Crop margins off each side (geometry.py:border_crop / fused.py:
// BorderCrop): fractions < 1.0 resolve against the CURRENT extent with
// float32 multiply + truncation, exactly as the device program computes
// them per item.  Degenerate margins yield h/w <= 0 (reported as-is, like
// the device path; the canvas goes all-zero).
void bordercrop_inplace(uint32_t* buf, int W, int* h, int* w,
                        const float* m /* top, bottom, left, right */) {
  auto px = [](float v, int total) {
    return v < 1.0f ? (int)((float)total * v) : (int)v;
  };
  int t = px(m[0], *h), b = px(m[1], *h), l = px(m[2], *w), r = px(m[3], *w);
  int ch = *h - t - b, cw = *w - l - r;
  int vh = ch > 0 ? ch : 0, vw = cw > 0 ? cw : 0;
  for (int y = 0; y < vh; ++y) {
    memmove(buf + (size_t)y * W, buf + (size_t)(t + y) * W + l,
            (size_t)vw * 4);
    if (*w > vw)
      memset(buf + (size_t)y * W + vw, 0, (size_t)(*w - vw) * 4);
  }
  for (int y = vh; y < *h; ++y)
    memset(buf + (size_t)y * W, 0, (size_t)*w * 4);
  *h = ch;
  *w = cw;
}

// Component cleanup + alpha-bbox tight crop (ops/ccl.py:cleanup_and_fit;
// reference pixels_isolés.py:8-81).  Foreground = alpha > 1 within the
// valid region, 8-connected.  Keeps ONLY the largest component (ties:
// the device path's argmax picks the smallest min-linear-index root —
// row-major BFS discovery order reproduces that exactly); with
// keep_large, additionally keeps components >= min_size.  RGB of removed
// components survives inside the crop box, like the device op (only
// alpha is zeroed).  Crops to the bbox of the REMAINING alpha.
void ccl_inplace(uint32_t* buf, int W, int* h, int* w, int min_size,
                 int keep_large, std::vector<int32_t>& comp,
                 std::vector<int32_t>& stack) {
  int vh = *h > 0 ? *h : 0, vw = *w > 0 ? *w : 0;
  comp.assign((size_t)vh * vw, -1);
  auto alpha_of = [&](int y, int x) {
    return ((const uint8_t*)(buf + (size_t)y * W + x))[3];
  };
  std::vector<int64_t> sizes;  // by discovery order == ascending root
  for (int y = 0; y < vh; ++y)
    for (int x = 0; x < vw; ++x) {
      if (comp[(size_t)y * vw + x] >= 0 || alpha_of(y, x) <= 1) continue;
      int id = (int)sizes.size();
      int64_t count = 0;
      stack.clear();
      stack.push_back(y * vw + x);
      comp[(size_t)y * vw + x] = id;
      while (!stack.empty()) {
        int p = stack.back();
        stack.pop_back();
        ++count;
        int py = p / vw, px = p % vw;
        for (int dy = -1; dy <= 1; ++dy)
          for (int dx = -1; dx <= 1; ++dx) {
            int ny = py + dy, nx = px + dx;
            if ((dy | dx) == 0 || (unsigned)ny >= (unsigned)vh ||
                (unsigned)nx >= (unsigned)vw)
              continue;
            size_t q = (size_t)ny * vw + nx;
            if (comp[q] < 0 && alpha_of(ny, nx) > 1) {
              comp[q] = id;
              stack.push_back((int)q);
            }
          }
      }
      sizes.push_back(count);
    }
  int largest = 0;
  for (int i = 1; i < (int)sizes.size(); ++i)
    if (sizes[i] > sizes[largest]) largest = i;  // first max wins ties
  for (int y = 0; y < vh; ++y) {
    uint8_t* row = (uint8_t*)(buf + (size_t)y * W);
    for (int x = 0; x < vw; ++x) {
      int c = comp[(size_t)y * vw + x];
      bool keep = c >= 0 && (c == largest ||
                             (keep_large && sizes[c] >= min_size));
      if (!keep) row[4 * x + 3] = 0;
    }
  }
  // tight crop to the bbox of remaining ALPHA (not any-channel)
  int y0 = -1, y1 = -1, x0 = 1 << 30, x1 = -1;
  for (int y = 0; y < vh; ++y) {
    int rx0 = -1, rx1 = -1;
    for (int x = 0; x < vw; ++x)
      if (alpha_of(y, x)) { if (rx0 < 0) rx0 = x; rx1 = x; }
    if (rx0 >= 0) {
      if (y0 < 0) y0 = y;
      y1 = y;
      if (rx0 < x0) x0 = rx0;
      if (rx1 > x1) x1 = rx1;
    }
  }
  if (y0 < 0) {
    for (int y = 0; y < vh; ++y)
      memset(buf + (size_t)y * W, 0, (size_t)vw * 4);
    *h = 0;
    *w = 0;
    return;
  }
  int bh = y1 - y0 + 1, bw = x1 - x0 + 1;
  for (int y = 0; y < bh; ++y) {
    memmove(buf + (size_t)y * W, buf + (size_t)(y0 + y) * W + x0,
            (size_t)bw * 4);
    if (vw > bw)
      memset(buf + (size_t)y * W + bw, 0, (size_t)(vw - bw) * 4);
  }
  for (int y = bh; y < vh; ++y)
    memset(buf + (size_t)y * W, 0, (size_t)vw * 4);
  *h = bh;
  *w = bw;
}

struct ChainProg {
  const int32_t* ops;
  int n_ops;
  int n_rot, n_flip, n_mask, n_enh, n_bc;  // per-opcode slot counts
  const int32_t* rot_quad;   // [n, n_rot]
  const int32_t* rot_sh1;    // [n, n_rot, H]
  const int32_t* rot_sh2;    // [n, n_rot, H]
  const int32_t* flip_code;  // [n, n_flip]
  const int32_t* mask_F;     // [n_mask] filter counts (static per stage)
  const int32_t* mask_bounds;  // [sum F, 6] concatenated over stages
  const int32_t* mask_zones;   // [sum F, 4]
  const int32_t* mask_replace;  // [n_mask] 1 = replace input alpha
                                // (standalone cv2.imread parity), 0 = min
  const float* enh_factors;  // [n, n_enh, 7]
  const uint8_t* enh_flags;  // [n, n_enh, 2]
  const float* bc_margins;   // [n_bc, 4] (static per stage)
  const int32_t* ccl_params; // [n_ccl, 2] (min_size, keep_large; static)
};

void chain_one(const uint8_t* img, int H, int W, int h0, int w0,
               const ChainProg& P, int item, uint8_t* out,
               int32_t* out_size) {
  const size_t npx = (size_t)H * W;
  std::vector<uint32_t> bufA(npx), bufB(npx), rowtmp((size_t)W);
  std::vector<uint8_t> alpha;
  uint32_t* cur = bufA.data();
  uint32_t* scr = bufB.data();
  memcpy(cur, img, npx * 4);
  std::vector<int32_t> ccl_comp, ccl_stack;
  int h = h0, w = w0;
  int i_rot = 0, i_flip = 0, i_mask = 0, i_enh = 0, i_bc = 0, i_ccl = 0,
      mask_off = 0;
  for (int op = 0; op < P.n_ops; ++op) {
    int vh = h > 0 ? h : 0, vw = w > 0 ? w : 0;  // clamped loop extents
    switch (P.ops[op]) {
      case OP_ROT_SHEAR: {
        // fused.py:Rotate(method='shear'): center on the square diagonal
        // canvas, quarter-turn + 3-shear, tight crop.
        int quad = P.rot_quad[(size_t)item * P.n_rot + i_rot];
        const int32_t* sh1 =
            P.rot_sh1 + ((size_t)item * P.n_rot + i_rot) * H;
        const int32_t* sh2 =
            P.rot_sh2 + ((size_t)item * P.n_rot + i_rot) * H;
        ++i_rot;
        int dy = (H - vh) / 2, dx = (W - vw) / 2;
        memset(scr, 0, npx * 4);
        for (int y = 0; y < vh; ++y)
          memcpy(scr + (size_t)(y + dy) * W + dx, cur + (size_t)y * W,
                 (size_t)vw * 4);
        std::swap(cur, scr);
        if (quad) {
          quad_turn(cur, scr, H, quad);
          std::swap(cur, scr);
        }
        shear_x(cur, scr, H, W, sh1);
        std::swap(cur, scr);
        shear_y(cur, scr, H, W, sh2);
        std::swap(cur, scr);
        shear_x(cur, scr, H, W, sh1);
        std::swap(cur, scr);
        h = H;
        w = W;
        fitcrop_inplace(cur, W, &h, &w);
        break;
      }
      case OP_FLIP: {
        int code = P.flip_code[(size_t)item * P.n_flip + i_flip];
        ++i_flip;
        flip_inplace(cur, W, vh, vw, code, rowtmp.data());
        break;
      }
      case OP_MASK: {
        int F = P.mask_F[i_mask];
        const int32_t* bounds = P.mask_bounds + (size_t)mask_off * 6;
        const int32_t* zones = P.mask_zones + (size_t)mask_off * 4;
        int replace = P.mask_replace ? P.mask_replace[i_mask] : 0;
        mask_off += F;
        ++i_mask;
        if (alpha.empty()) alpha.assign(npx, 0);
        colormask_one((const uint8_t*)cur, 4, H, W, vh, vw, bounds, zones,
                      F, alpha.data());
        // fused.py:ColorMask — 'combine': masked pixels stay transparent
        // (min with carried alpha); 'replace': alpha = mask only (the
        // standalone step's cv2.imread drops the carried alpha,
        // filtres_liste.py:84)
        for (int y = 0; y < vh; ++y) {
          uint8_t* prow = (uint8_t*)(cur + (size_t)y * W);
          const uint8_t* arow = alpha.data() + (size_t)y * W;
          if (replace) {
            for (int x = 0; x < vw; ++x) prow[4 * x + 3] = arow[x];
          } else {
            for (int x = 0; x < vw; ++x) {
              uint8_t a = prow[4 * x + 3];
              prow[4 * x + 3] = arow[x] < a ? arow[x] : a;
            }
          }
        }
        break;
      }
      case OP_ENHANCE: {
        const float* f = P.enh_factors + ((size_t)item * P.n_enh + i_enh) * 7;
        const uint8_t* fl = P.enh_flags + ((size_t)item * P.n_enh + i_enh) * 2;
        ++i_enh;
        if (vh > 0 && vw > 0)
          enhance_one((const uint8_t*)cur, 4, H, W, vh, vw, f[0], f[1],
                      f[2], f[3], fl[0], f + 4, fl[1], (uint8_t*)cur, 4);
        break;
      }
      case OP_FITCROP: {
        h = vh;
        w = vw;
        fitcrop_inplace(cur, W, &h, &w);
        break;
      }
      case OP_BORDERCROP: {
        const float* m = P.bc_margins + 4 * i_bc;
        ++i_bc;
        h = vh;
        w = vw;
        bordercrop_inplace(cur, W, &h, &w, m);
        break;
      }
      case OP_CCL: {
        const int32_t* cp = P.ccl_params + 2 * i_ccl;
        ++i_ccl;
        h = vh;
        w = vw;
        ccl_inplace(cur, W, &h, &w, cp[0], cp[1], ccl_comp, ccl_stack);
        break;
      }
    }
  }
  int vh = h > 0 ? h : 0, vw = w > 0 ? w : 0;
  for (int y = 0; y < vh; ++y)
    memcpy(out + (size_t)y * W * 4, cur + (size_t)y * W, (size_t)vw * 4);
  out_size[0] = h;
  out_size[1] = w;
}

// Dihedral flip of the valid region into a caller-zeroed canvas
// (geometry.py:flip_h/flip_v/flip_hv — flip + roll == mirror the valid
// region in place; padding stays zero).  code 1='h', 2='v', 3='hv'.
void flip_copy(const uint8_t* src, uint8_t* dst, int H, int W, int C,
               int h, int w, int code) {
  if (code == 2) {  // vertical mirror: pure row reversal
    for (int y = 0; y < h; ++y)
      memcpy(dst + (size_t)y * W * C, src + (size_t)(h - 1 - y) * W * C,
             (size_t)w * C);
    return;
  }
  for (int y = 0; y < h; ++y) {
    const uint8_t* srow = src + (size_t)(code == 3 ? h - 1 - y : y) * W * C;
    uint8_t* drow = dst + (size_t)y * W * C;
    for (int x = 0; x < w; ++x) {
      const uint8_t* s = srow + (size_t)(w - 1 - x) * C;
      uint8_t* d = drow + (size_t)x * C;
      for (int c = 0; c < C; ++c) d[c] = s[c];
    }
  }
}

// ---------------------------------------------------------------------------
// Pillow LANCZOS resample + RGBA-mask paste (transforms/overlays.py twin).
//
// Exactness contract: byte-identical to PIL Image.resize(..., LANCZOS)
// followed by Image.paste(ov, (px, py), mask=ov) — i.e. to the reference's
// own composite at overlays.py:129-139 — via Pillow's 8bpc fixed-point
// resample (Resample.c: double coefficients, PRECISION_BITS = 32-8-2,
// round-half-away normalize, uint8 intermediate between the horizontal and
// vertical passes) and Paste.c's MULDIV255 blend.  This is a STRONGER
// parity than the jit path (ops/geometry.py:resize is float32 matmuls,
// PIL +-1); sizes/positions/labels still come from the device program's
// exact jax.random draws so only pixel values may differ +-1 across
// backends.

constexpr int kPrecisionBits = 32 - 8 - 2;  // Pillow Resample.c
constexpr double kPi = 3.14159265358979323846;  // M_PI (strict-ANSI safe)

inline double pil_sinc(double x) {
  if (x == 0.0) return 1.0;
  x *= kPi;
  return sin(x) / x;
}

inline double pil_lanczos(double x) {  // support = 3, bound [-3, 3)
  if (-3.0 <= x && x < 3.0) return pil_sinc(x) * pil_sinc(x / 3.0);
  return 0.0;
}

// Pillow precompute_coeffs + normalize_coeffs_8bpc for a full-extent box.
// Fills bounds[2*out] = (first input index, tap count) and kk[out * ksize]
// int32 fixed-point taps; returns ksize.
int pil_coeffs(int in_size, int out_size, int* bounds,
               std::vector<int32_t>& kk) {
  double scale = (double)in_size / out_size;
  double filterscale = scale < 1.0 ? 1.0 : scale;
  double support = 3.0 * filterscale;
  int ksize = (int)ceil(support) * 2 + 1;
  std::vector<double> prekk((size_t)ksize);
  kk.assign((size_t)out_size * ksize, 0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    double ww = 0.0, ss = 1.0 / filterscale;
    int xmin = (int)(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = (int)(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    xmax -= xmin;
    for (int x = 0; x < xmax; ++x) {
      double w = pil_lanczos((x + xmin - center + 0.5) * ss);
      prekk[x] = w;
      ww += w;
    }
    int32_t* k = kk.data() + (size_t)xx * ksize;
    for (int x = 0; x < xmax; ++x) {
      double w = ww != 0.0 ? prekk[x] / ww : prekk[x];
      // round half away from zero, exactly Pillow's normalize_coeffs_8bpc
      k[x] = (int32_t)(w < 0 ? w * (1 << kPrecisionBits) - 0.5
                             : w * (1 << kPrecisionBits) + 0.5);
    }
    bounds[2 * xx] = xmin;
    bounds[2 * xx + 1] = xmax;
  }
  return ksize;
}

// Pillow clip8: arithmetic shift out of the fixed point, clamp to u8.
inline uint8_t pil_clip8(int32_t ss) {
  int v = ss >> kPrecisionBits;
  return v < 0 ? 0 : (v > 255 ? 255 : (uint8_t)v);
}

// Horizontal pass: rows stay, columns resample (ImagingResampleHorizontal_8bpc).
void pil_resample_h(const uint8_t* in, int stride_in, int rows, int out_w,
                    int stride_out, const int* bounds, const int32_t* kk,
                    int ksize, int C, uint8_t* out) {
  for (int y = 0; y < rows; ++y) {
    const uint8_t* irow = in + (size_t)y * stride_in;
    uint8_t* orow = out + (size_t)y * stride_out;
    for (int xx = 0; xx < out_w; ++xx) {
      const int xmin = bounds[2 * xx], xmax = bounds[2 * xx + 1];
      const int32_t* k = kk + (size_t)xx * ksize;
      for (int c = 0; c < C; ++c) {
        uint32_t ss = 1u << (kPrecisionBits - 1);
        for (int x = 0; x < xmax; ++x)
          ss += (uint32_t)irow[(size_t)(x + xmin) * C + c] * (uint32_t)k[x];
        orow[(size_t)xx * C + c] = pil_clip8((int32_t)ss);
      }
    }
  }
}

// Vertical pass over the (already horizontally resampled) uint8 buffer.
void pil_resample_v(const uint8_t* in, int stride_in, int row_bytes,
                    int out_h, int stride_out, const int* bounds,
                    const int32_t* kk, int ksize, uint8_t* out) {
  for (int yy = 0; yy < out_h; ++yy) {
    const int ymin = bounds[2 * yy], ymax = bounds[2 * yy + 1];
    const int32_t* k = kk + (size_t)yy * ksize;
    uint8_t* orow = out + (size_t)yy * stride_out;
    for (int x = 0; x < row_bytes; ++x) {
      uint32_t ss = 1u << (kPrecisionBits - 1);
      for (int y = 0; y < ymax; ++y)
        ss += (uint32_t)in[(size_t)(y + ymin) * stride_in + x] *
              (uint32_t)k[y];
      orow[x] = pil_clip8((int32_t)ss);
    }
  }
}

// One overlay composite: LANCZOS-resize the overlay's valid region to
// (new_h, new_w), paste onto the background canvas at (py, px) with the
// resized alpha as mask.  `out` receives the full background canvas
// (padding included — it is zero there already).
//
// PIL Image.resize on RGBA goes through premultiplied alpha ("RGBa"):
// convert RGBA→RGBa (Convert.c rgbA2rgba: MULDIV255 each channel by
// alpha), resample, convert back (rgba2rgbA: (255*v)/alpha truncating
// division, alpha 0/255 pass through, CLIP8).  Replicated exactly here.
void overlay_one(const uint8_t* ov, int Wo, int ov_h, int ov_w,
                 const uint8_t* bg, int Wb, int bg_h, int bg_w, int new_h,
                 int new_w, int py, int px, int ok, int Hb, uint8_t* out) {
  memcpy(out, bg, (size_t)Hb * Wb * 3);
  if (!ok || new_h <= 0 || new_w <= 0) return;
  const bool same_size = (new_h == ov_h && new_w == ov_w);
  // RGBA → RGBa premultiply of the valid region (tight new buffer).
  // Image.resize short-circuits a same-size resize to a plain copy
  // BEFORE the RGBa wrapper — skip the premultiply round trip there.
  std::vector<uint8_t> pre((size_t)ov_h * ov_w * 4);
  if (same_size) {
    for (int y = 0; y < ov_h; ++y)
      memcpy(pre.data() + (size_t)y * ov_w * 4, ov + (size_t)y * Wo * 4,
             (size_t)ov_w * 4);
  } else
  for (int y = 0; y < ov_h; ++y) {
    const uint8_t* s = ov + (size_t)y * Wo * 4;
    uint8_t* d = pre.data() + (size_t)y * ov_w * 4;
    for (int x = 0; x < ov_w; ++x) {
      const int a = s[4 * x + 3];
      for (int c = 0; c < 3; ++c) {
        int t = s[4 * x + c] * a + 128;
        d[4 * x + c] = (uint8_t)((((t) >> 8) + t) >> 8);
      }
      d[4 * x + 3] = (uint8_t)a;
    }
  }
  // Pillow skips a pass whose extent is unchanged (ImagingResample).
  std::vector<uint8_t> tmp, res;
  const uint8_t* hsrc = pre.data();
  int hstride = ov_w * 4;
  if (new_w != ov_w) {
    std::vector<int> bounds(2 * (size_t)new_w);
    std::vector<int32_t> kk;
    int ksize = pil_coeffs(ov_w, new_w, bounds.data(), kk);
    tmp.assign((size_t)ov_h * new_w * 4, 0);
    pil_resample_h(pre.data(), ov_w * 4, ov_h, new_w, new_w * 4,
                   bounds.data(), kk.data(), ksize, 4, tmp.data());
    hsrc = tmp.data();
    hstride = new_w * 4;
  }
  const uint8_t* rsrc = hsrc;
  int rstride = hstride;
  if (new_h != ov_h) {
    std::vector<int> bounds(2 * (size_t)new_h);
    std::vector<int32_t> kk;
    int ksize = pil_coeffs(ov_h, new_h, bounds.data(), kk);
    res.assign((size_t)new_h * new_w * 4, 0);
    pil_resample_v(hsrc, hstride, new_w * 4, new_h, new_w * 4,
                   bounds.data(), kk.data(), ksize, res.data());
    rsrc = res.data();
    rstride = new_w * 4;
  }
  // RGBa → RGBA unpremultiply (Convert.c rgba2rgbA) fused into the
  // Paste.c BLEND ((in1*(255-mask) + in2*mask + 127) / 255), clipped to
  // the background's valid region (the device program's `inside` mask
  // does the same).
  const int ylim = new_h < bg_h - py ? new_h : bg_h - py;
  const int xlim = new_w < bg_w - px ? new_w : bg_w - px;
  for (int y = 0; y < ylim; ++y) {
    const uint8_t* s = rsrc + (size_t)y * rstride;
    uint8_t* d = out + ((size_t)(py + y) * Wb + px) * 3;
    for (int x = 0; x < xlim; ++x) {
      const int a = s[4 * x + 3];
      for (int c = 0; c < 3; ++c) {
        int v = s[4 * x + c];
        if (!same_size && a != 0 && a != 255) {
          v = (255 * v) / a;       // truncating division, then CLIP8
          if (v > 255) v = 255;
        }
        d[3 * x + c] =
            (uint8_t)((d[3 * x + c] * (255 - a) + v * a + 127) / 255);
      }
    }
  }
}

// ---------------------------------------------------------------------------
// PIL-exact nearest rotate-expand (transforms/rotations.py, reference
// rotations.py:96-109: Image.rotate(angle, expand=True) + getbbox crop).
//
// Pillow's NEAREST affine fast path (Geometry.c ImagingTransformAffine)
// walks the output in 16.16 fixed point: every coefficient of the
// out->in matrix is converted once with FIX(v) = floor(v*65536 + 0.5)
// and per-pixel coordinates are integer sums sx = FIX(m2 + m1*.5 + m0*.5)
// + x*FIX(m0) + y*FIX(m1), sampled at (sx >> 16) when inside the source.
// The model was fitted and then verified pixel-exact against
// Image.rotate over randomized sweeps (angles, sizes 20-700 px), which
// discriminated it from direct double evaluation, double accumulation,
// and the trunc/floor conversion variants (each fails a few pixels per
// image at floor boundaries).

inline int64_t pil_fix16(double v) {
  return (int64_t)std::floor(v * 65536.0 + 0.5);
}

// Half-open x-range where 0 <= v0 + x*dv < lim (all int64, exact).
inline void fix_range(int64_t v0, int64_t dv, int64_t lim, int64_t* a,
                      int64_t* b) {
  auto floor_div = [](int64_t p, int64_t q) {  // q > 0
    int64_t d = p / q;
    return d - ((p % q != 0) && ((p < 0) != (q < 0)) ? 1 : 0);
  };
  if (dv == 0) {
    if (v0 >= 0 && v0 < lim) { *a = INT64_MIN / 4; *b = INT64_MAX / 4; }
    else { *a = 0; *b = 0; }
  } else if (dv > 0) {
    *a = floor_div(-v0 + dv - 1, dv);      // ceil(-v0 / dv)
    *b = floor_div(lim - v0 + dv - 1, dv); // ceil((lim - v0) / dv)
  } else {
    *a = floor_div(v0 - lim, -dv) + 1;
    *b = floor_div(v0, -dv) + 1;
  }
}

// One rotation: sample the (nh, nw) expanded image into `scratch`
// (zero-filled outside the source), compute the content bbox (PIL
// getbbox on RGBA, Pillow >= 10: alpha_only=True — ONLY the alpha byte
// counts; colored-but-transparent pixels do not extend the bbox), and
// copy the tight crop to the canvas origin of `out` (caller-zeroed
// H x W x 4).  Writes (bh, bw).
void rotate_nearest_one(const uint8_t* src, int W, int h, int w,
                        const double* m, int nh, int nw, uint32_t* scratch,
                        uint8_t* out, int out_W, int32_t* out_size) {
  const int64_t dcx = pil_fix16(m[0]), drx = pil_fix16(m[1]);
  const int64_t dcy = pil_fix16(m[3]), dry = pil_fix16(m[4]);
  const int64_t s0x = pil_fix16(m[2] + m[1] * 0.5 + m[0] * 0.5);
  const int64_t s0y = pil_fix16(m[5] + m[4] * 0.5 + m[3] * 0.5);
  int miny = nh, maxy = -1, minx = nw, maxx = -1;
  for (int y = 0; y < nh; ++y) {
    const int64_t rx = s0x + drx * y;
    const int64_t ry = s0y + dry * y;
    int64_t ax, bx, ay, by;
    fix_range(rx, dcx, (int64_t)w << 16, &ax, &bx);
    fix_range(ry, dcy, (int64_t)h << 16, &ay, &by);
    int64_t a = ax > ay ? ax : ay;
    int64_t b = bx < by ? bx : by;
    if (a < 0) a = 0;
    if (b > nw) b = nw;
    uint32_t* orow = scratch + (size_t)y * nw;
    if (a >= b) { memset(orow, 0, (size_t)nw * 4); continue; }
    memset(orow, 0, (size_t)a * 4);
    memset(orow + b, 0, (size_t)(nw - b) * 4);
    int rminx = nw, rmaxx = -1;
    for (int64_t x = a; x < b; ++x) {
      const int xin = (int)((rx + x * dcx) >> 16);
      const int yin = (int)((ry + x * dcy) >> 16);
      uint32_t px;
      memcpy(&px, src + ((size_t)yin * W + xin) * 4, 4);
      orow[x] = px;
      if (px & 0xFF000000u) {  // alpha byte (little-endian RGBA)
        if ((int)x < rminx) rminx = (int)x;
        if ((int)x > rmaxx) rmaxx = (int)x;
      }
    }
    if (rmaxx >= 0) {
      if (y < miny) miny = y;
      maxy = y;
      if (rminx < minx) minx = rminx;
      if (rmaxx > maxx) maxx = rmaxx;
    }
  }
  if (maxy < 0) {
    // empty bbox (getbbox None): the reference saves the UNCROPPED
    // rotated image (rotations.py:99-109) — copy the full expanded
    // extents instead of skipping
    miny = 0; maxy = nh - 1; minx = 0; maxx = nw - 1;
  }
  const int bh = maxy - miny + 1, bw = maxx - minx + 1;
  for (int y = 0; y < bh; ++y)
    memcpy(out + (size_t)y * out_W * 4,
           scratch + ((size_t)(miny + y) * nw + minx), (size_t)bw * 4);
  out_size[0] = bh;
  out_size[1] = bw;
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
    colormask_one(imgs + (size_t)i * H * W * 3, 3, H, W, sizes[2 * i],
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
    enhance_one(imgs + (size_t)i * H * W * 3, 3, H, W, sizes[2 * i],
                sizes[2 * i + 1], f[0], f[1], f[2], f[3], flags[2 * i],
                f + 4, flags[2 * i + 1], outs + (size_t)i * H * W * 3, 3);
  });
}

// Batched dihedral flips (transforms/symmetry.py:GenerateSymmetries).
// imgs: n x H x W x C (C = 3 or 4); sizes: n x 2 (h, w); codes: the
// requested flips (1='h', 2='v', 3='hv'); outs: caller-zeroed
// [n_codes, n, H, W, C] — outs[k] is the codes[k] flip of every image.
void ipp_cpu_flips_batch(const uint8_t* imgs, int n, int H, int W, int C,
                         const int32_t* sizes, const int32_t* codes,
                         int n_codes, uint8_t* outs, int n_threads) {
  run_batch(n, n_threads, [&](int i) {
    const uint8_t* src = imgs + (size_t)i * H * W * C;
    for (int k = 0; k < n_codes; ++k)
      flip_copy(src, outs + ((size_t)k * n + i) * H * W * C, H, W, C,
                sizes[2 * i], sizes[2 * i + 1], codes[k]);
  });
}

// Fused-chain executor (transforms/fused.py:FusedChain.native_fn).
// imgs: n x H x W x 4 RGBA canvases; sizes: n x 2 (h, w);
// ops: the stage opcode sequence (ChainOpcode); per-opcode parameter
// arrays as documented on ChainProg (item-major, slot-minor);
// outs: caller-zeroed n x H x W x 4; out_sizes: n x 2 result extents.
void ipp_cpu_chain_batch(const uint8_t* imgs, int n, int H, int W,
                         const int32_t* sizes, const int32_t* ops, int n_ops,
                         const int32_t* rot_quad, const int32_t* rot_sh1,
                         const int32_t* rot_sh2, const int32_t* flip_code,
                         const int32_t* mask_F, const int32_t* mask_bounds,
                         const int32_t* mask_zones,
                         const int32_t* mask_replace,
                         const float* enh_factors,
                         const uint8_t* enh_flags, const float* bc_margins,
                         const int32_t* ccl_params, uint8_t* outs,
                         int32_t* out_sizes, int n_threads) {
  ChainProg P;
  P.ops = ops;
  P.n_ops = n_ops;
  P.n_rot = P.n_flip = P.n_mask = P.n_enh = P.n_bc = 0;
  for (int i = 0; i < n_ops; ++i) switch (ops[i]) {
      case OP_ROT_SHEAR: ++P.n_rot; break;
      case OP_FLIP: ++P.n_flip; break;
      case OP_MASK: ++P.n_mask; break;
      case OP_ENHANCE: ++P.n_enh; break;
      case OP_BORDERCROP: ++P.n_bc; break;
    }
  P.rot_quad = rot_quad;
  P.rot_sh1 = rot_sh1;
  P.rot_sh2 = rot_sh2;
  P.flip_code = flip_code;
  P.mask_F = mask_F;
  P.mask_bounds = mask_bounds;
  P.mask_zones = mask_zones;
  P.mask_replace = mask_replace;
  P.enh_factors = enh_factors;
  P.enh_flags = enh_flags;
  P.bc_margins = bc_margins;
  P.ccl_params = ccl_params;
  run_batch(n, n_threads, [&](int i) {
    chain_one(imgs + (size_t)i * H * W * 4, H, W, sizes[2 * i],
              sizes[2 * i + 1], P, i, outs + (size_t)i * H * W * 4,
              out_sizes + 2 * i);
  });
}

// Standalone component cleanup + alpha tight crop
// (transforms/cleanup.py:KeepLargestComponent.native_fn; reference
// pixels_isolés.py:8-81).  imgs: n x H x W x 4 RGBA canvases; sizes:
// n x 2 (h, w) valid extents; outs: caller-zeroed n x H x W x 4;
// out_sizes: n x 2 (bh, bw) tight-crop extents (0 x 0 when no opaque
// pixels remain).  Same ccl_inplace the fused-chain executor uses, so
// standalone == chain-stage bytes by construction.
void ipp_cpu_ccl_batch(const uint8_t* imgs, int n, int H, int W,
                       const int32_t* sizes, int min_size, int keep_large,
                       uint8_t* outs, int32_t* out_sizes, int n_threads) {
  run_batch(n, n_threads, [&](int i) {
    uint8_t* out = outs + (size_t)i * H * W * 4;
    memcpy(out, imgs + (size_t)i * H * W * 4, (size_t)H * W * 4);
    static thread_local std::vector<int32_t> comp, stack;
    int h = sizes[2 * i], w = sizes[2 * i + 1];
    ccl_inplace(reinterpret_cast<uint32_t*>(out), W, &h, &w, min_size,
                keep_large, comp, stack);
    out_sizes[2 * i] = h;
    out_sizes[2 * i + 1] = w;
  });
}

// PIL-exact nearest rotate-expand fan-out (transforms/rotations.py).
// imgs: n x H x W x 4 RGBA canvases; sizes: n x 2 (h, w) valid extents;
// mats: (n*N) x 6 float64 Pillow out->in affine matrices
// (ops/geometry.py:_pil_rotate_matrix, item-major rotation-minor);
// osizes: (n*N) x 2 int32 (nh, nw) expanded extents (must fit H x W —
// the Python wrapper declines otherwise); outs: caller-zeroed
// n x N x H x W x 4; out_sizes: (n*N) x 2 (bh, bw) tight-crop extents.
void ipp_cpu_rotations_batch(const uint8_t* imgs, int n, int H, int W,
                             const int32_t* sizes, const double* mats,
                             const int32_t* osizes, int N, uint8_t* outs,
                             int32_t* out_sizes, int n_threads) {
  run_batch(n * N, n_threads, [&](int k) {
    const int i = k / N;
    // per-thread scratch: on the inline (1-thread) path the main thread's
    // buffer persists across batches — no multi-MB malloc/munmap churn per
    // rotation (the page-fault pathology the engine's allocator tuning
    // removed); worker threads pay one grow per batch
    static thread_local std::vector<uint32_t> scratch;
    const size_t need = (size_t)osizes[2 * k] * osizes[2 * k + 1];
    if (scratch.capacity() > 4 * need && scratch.capacity() > (16u << 20)) {
      // shrink only on LARGE slack (one huge rotation must not pin its
      // canvas for the process life) — within a batch, rotations of one
      // canvas bucket vary < 2x, so normal batches never re-malloc
      std::vector<uint32_t>().swap(scratch);
    }
    if (scratch.size() < need) scratch.resize(need);
    rotate_nearest_one(imgs + (size_t)i * H * W * 4, W, sizes[2 * i],
                       sizes[2 * i + 1], mats + 6 * (size_t)k,
                       osizes[2 * k], osizes[2 * k + 1], scratch.data(),
                       outs + (size_t)k * H * W * 4, W, out_sizes + 2 * k);
  });
}

// Overlay compositing (transforms/overlays.py:PasteOverlayOntoBackground).
// ovs: n x Ho x Wo x 4 RGBA overlay canvases; bgs: n x Hb x Wb x 3 RGB
// background canvases; geo: n x 5 int32 (new_h, new_w, py, px, ok) from
// the device program's exact jax.random draws; outs: n x Hb x Wb x 3.
void ipp_cpu_overlay_batch(const uint8_t* ovs, int n, int Ho, int Wo,
                           const int32_t* ov_sizes, const uint8_t* bgs,
                           int Hb, int Wb, const int32_t* bg_sizes,
                           const int32_t* geo, uint8_t* outs,
                           int n_threads) {
  run_batch(n, n_threads, [&](int i) {
    const int32_t* g = geo + 5 * i;
    overlay_one(ovs + (size_t)i * Ho * Wo * 4, Wo, ov_sizes[2 * i],
                ov_sizes[2 * i + 1], bgs + (size_t)i * Hb * Wb * 3, Wb,
                bg_sizes[2 * i], bg_sizes[2 * i + 1], g[0], g[1], g[2],
                g[3], g[4], Hb, outs + (size_t)i * Hb * Wb * 3);
  });
}

}  // extern "C"
