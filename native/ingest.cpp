// Native ingest data plane for the serving frontend.
//
// The per-request host work before the TPU step is JPEG entropy decode +
// resize to the 256x256 analysis frame (reference: backend_server.py:140-142
// decode, frame_analysis.py:71 resize — both through OpenCV's C++). This
// library provides that path natively without OpenCV:
//
//   - libjpeg decode with DCT scaling (decode directly at 1/2, 1/4, 1/8
//     scale when the target is much smaller than the source — skips most of
//     the IDCT work cv2.imdecode always does at full size)
//   - bit-exact OpenCV INTER_LINEAR u8 resize (fixed-point two-pass,
//     INTER_RESIZE_COEF_BITS=11, incl. the exact-2x area-average rewrite)
//   - a pooled batch API decoding N requests concurrently
//
// C ABI, bound from Python via ctypes (utils/native_ingest.py).

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrMgr* err = reinterpret_cast<ErrMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// ---------------------------------------------------------------- decode

// Decodes JPEG bytes to BGR u8. If max_dim_hint > 0, picks the largest
// libjpeg DCT scale (8/8 .. 1/8) whose output still covers the hint on the
// larger dimension. Returns malloc'd buffer (caller frees via free_buffer).
uint8_t* decode_jpeg(const uint8_t* data, size_t len, int max_dim_hint,
                     int* out_h, int* out_w, int* src_h = nullptr,
                     int* src_w = nullptr) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  uint8_t* buf = nullptr;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    if (buf) free(buf);
    return nullptr;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return nullptr;
  }
  cinfo.out_color_space = JCS_EXT_BGR;
  // True source dims from the header, BEFORE any DCT scaling: the serving
  // layer needs them to return face boxes in client coordinate space even
  // when the fast path decodes at a reduced scale.
  if (src_h) *src_h = static_cast<int>(cinfo.image_height);
  if (src_w) *src_w = static_cast<int>(cinfo.image_width);

  if (max_dim_hint > 0) {
    const int full = std::max<int>(cinfo.image_width, cinfo.image_height);
    int num = 8;
    while (num > 1 && (full * (num - 1)) / 8 >= max_dim_hint) num--;
    cinfo.scale_num = num;
    cinfo.scale_denom = 8;
  }

  jpeg_start_decompress(&cinfo);
  const int h = cinfo.output_height;
  const int w = cinfo.output_width;
  // Reject absurd dimensions from crafted headers (JPEG allows 65535^2 ==
  // ~12.9 GB BGR) instead of letting an unchecked malloc return null and
  // the scanline loop write through it. 64 MP covers every real capture;
  // oversize inputs fall back to the caller's cv2 ladder / 400 path.
  if (h <= 0 || w <= 0 ||
      static_cast<int64_t>(h) * w > static_cast<int64_t>(64) * 1024 * 1024) {
    jpeg_destroy_decompress(&cinfo);
    return nullptr;
  }
  const int stride = w * 3;
  buf = static_cast<uint8_t*>(malloc(static_cast<size_t>(h) * stride));
  if (!buf) {
    jpeg_destroy_decompress(&cinfo);
    return nullptr;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = buf + static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *out_h = h;
  *out_w = w;
  return buf;
}

// ---------------------------------------------------------- exact resize

// OpenCV INTER_LINEAR u8 semantics, one axis table.
struct LinTab {
  std::vector<int> s0, s1;
  std::vector<int32_t> a0, a1;  // coefficients scaled by 2048
};

LinTab make_tab(int src, int dst) {
  LinTab t;
  t.s0.resize(dst);
  t.s1.resize(dst);
  t.a0.resize(dst);
  t.a1.resize(dst);
  const double scale = static_cast<double>(src) / dst;
  for (int x = 0; x < dst; ++x) {
    // OpenCV computes the position in double but keeps the RESIDUAL in
    // float: fxx = (float)((dx+0.5)*scale_x - 0.5); sx = cvFloor(fxx);
    // fxx -= sx;  (resize.cpp). Keeping the residual in double and casting
    // late flips the rounded Q11 coefficient on ~3% of columns for e.g.
    // 640->300 — found by a round-5 parity drive, fixed here and in
    // ops/resize.py in lockstep.
    float f = static_cast<float>((x + 0.5) * scale - 0.5);
    int sx = static_cast<int>(std::floor(f));
    f -= static_cast<float>(sx);
    if (sx < 0) {
      sx = 0;
      f = 0.0f;
    }
    if (sx >= src - 1) {
      sx = src - 1;
      f = 0.0f;
    }
    t.s0[x] = sx;
    t.s1[x] = std::min(sx + 1, src - 1);
    // cvRound == round-half-even; nearbyint with default rounding matches.
    t.a1[x] = static_cast<int32_t>(std::nearbyintf(f * 2048.0f));
    t.a0[x] = static_cast<int32_t>(std::nearbyintf((1.0f - f) * 2048.0f));
  }
  return t;
}

void resize_u8_cv2(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                   int dw) {
  if (sh == dh && sw == dw) {
    memcpy(dst, src, static_cast<size_t>(sh) * sw * 3);
    return;
  }
  if (sh == 2 * dh && sw == 2 * dw) {
    // OpenCV rewrites exact-2x INTER_LINEAR to the area-fast path.
    for (int y = 0; y < dh; ++y) {
      const uint8_t* r0 = src + static_cast<size_t>(2 * y) * sw * 3;
      const uint8_t* r1 = r0 + static_cast<size_t>(sw) * 3;
      uint8_t* d = dst + static_cast<size_t>(y) * dw * 3;
      for (int x = 0; x < dw; ++x) {
        for (int c = 0; c < 3; ++c) {
          const int i = (2 * x) * 3 + c;
          const int s = r0[i] + r0[i + 3] + r1[i] + r1[i + 3];
          d[x * 3 + c] = static_cast<uint8_t>((s + 2) >> 2);
        }
      }
    }
    return;
  }
  const LinTab tx = make_tab(sw, dw);
  const LinTab ty = make_tab(sh, dh);
  // horizontal pass: int32 rows scaled by 2^11
  std::vector<int32_t> hbuf(static_cast<size_t>(sh) * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* srow = src + static_cast<size_t>(y) * sw * 3;
    int32_t* hrow = hbuf.data() + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      const uint8_t* p0 = srow + tx.s0[x] * 3;
      const uint8_t* p1 = srow + tx.s1[x] * 3;
      for (int c = 0; c < 3; ++c) {
        hrow[x * 3 + c] = p0[c] * tx.a0[x] + p1[c] * tx.a1[x];
      }
    }
  }
  // vertical pass with OpenCV's exact fixed-point cast
  for (int y = 0; y < dh; ++y) {
    const int32_t* r0 = hbuf.data() + static_cast<size_t>(ty.s0[y]) * dw * 3;
    const int32_t* r1 = hbuf.data() + static_cast<size_t>(ty.s1[y]) * dw * 3;
    const int32_t b0 = ty.a0[y], b1 = ty.a1[y];
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * 3;
    for (int i = 0; i < dw * 3; ++i) {
      int32_t v = ((b0 * (r0[i] >> 4)) >> 16) + ((b1 * (r1[i] >> 4)) >> 16);
      v = (v + 2) >> 2;
      drow[i] = static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
  }
}

// ------------------------------------------------- heuristic face detect
//
// Exact port of models/heuristic_face.py detect_heuristic: YCrCb skin mask
// (float32 arithmetic in numpy's op order), 2/98 coordinate percentiles
// with numpy 'linear' interpolation, density/aspect gates.

bool detect_heuristic_native(const uint8_t* bgr, int h, int w, int box[4]) {
  if (h < 40 || w < 40) return false;
  std::vector<uint8_t> mask(static_cast<size_t>(h) * w);
  std::vector<int64_t> xhist(w, 0), yhist(h, 0);
  int64_t count = 0;
  for (int y = 0; y < h; ++y) {
    const uint8_t* row = bgr + static_cast<size_t>(y) * w * 3;
    for (int x = 0; x < w; ++x) {
      const float b = row[x * 3 + 0];
      const float g = row[x * 3 + 1];
      const float r = row[x * 3 + 2];
      const float yy = 0.299f * r + 0.587f * g + 0.114f * b;
      const float cr = (r - yy) * 0.713f + 128.0f;
      const float cb = (b - yy) * 0.564f + 128.0f;
      const bool skin = cr >= 133.0f && cr <= 173.0f && cb >= 77.0f &&
                        cb <= 127.0f;
      mask[static_cast<size_t>(y) * w + x] = skin;
      if (skin) {
        ++count;
        ++xhist[x];
        ++yhist[y];
      }
    }
  }
  const double frac = static_cast<double>(count) / (static_cast<double>(h) * w);
  if (frac < 0.04) return false;

  // k-th order statistic of the coordinate multiset via histogram walk
  auto order_stat = [](const std::vector<int64_t>& hist, int64_t k) {
    int64_t seen = 0;
    for (size_t v = 0; v < hist.size(); ++v) {
      seen += hist[v];
      if (seen > k) return static_cast<int64_t>(v);
    }
    return static_cast<int64_t>(hist.size() - 1);
  };
  auto percentile = [&](const std::vector<int64_t>& hist, double q) {
    // numpy 'linear': pos = (n-1)*q/100, val = a[lo] + (a[hi]-a[lo])*frac
    const double pos = static_cast<double>(count - 1) * q / 100.0;
    const int64_t lo = static_cast<int64_t>(std::floor(pos));
    const double f = pos - static_cast<double>(lo);
    const int64_t a = order_stat(hist, lo);
    const int64_t b = f > 0.0 ? order_stat(hist, lo + 1) : a;
    return static_cast<double>(a) + (static_cast<double>(b) - a) * f;
  };
  const int x1 = static_cast<int>(percentile(xhist, 2.0));
  const int x2 = static_cast<int>(percentile(xhist, 98.0));
  const int y1 = static_cast<int>(percentile(yhist, 2.0));
  const int y2 = static_cast<int>(percentile(yhist, 98.0));
  const int bw = x2 - x1, bh = y2 - y1;
  if (bw < 40 || bh < 40) return false;
  int64_t inner = 0;
  for (int y = y1; y < y2; ++y)
    for (int x = x1; x < x2; ++x)
      inner += mask[static_cast<size_t>(y) * w + x];
  const double density =
      static_cast<double>(inner) / (static_cast<double>(bw) * bh);
  if (density < 0.45) return false;
  const double ar = static_cast<double>(bw) / std::max(bh, 1);
  if (ar < 0.3 || ar > 2.5) return false;
  box[0] = x1;
  box[1] = y1;
  box[2] = bw;
  box[3] = bh;
  return true;
}

// ----------------------------------------------------------------- CLAHE
//
// Exact port of ops/clahe.py clahe_u8_numpy (itself matching cv2 up to
// cv2's own build-dependent f32 lerp ties — ops/clahe.py docstring):
// cv2 5.0's LITERAL padding rule (a divisible dim gets a FULL extra tile
// whenever the other dim triggers padding) with numpy 'reflect'
// (reflect-101), clip + uniform redistribution with residual stepping,
// rounded-CDF LUTs, float32 bilinear LUT interpolation in numpy's op order.

void clahe_u8_native(const uint8_t* src, int h, int w, double clip_limit,
                     int tiles, uint8_t* dst) {
  const bool pad = (h % tiles) != 0 || (w % tiles) != 0;
  const int ph = pad ? tiles - (h % tiles) : 0;
  const int pw = pad ? tiles - (w % tiles) : 0;
  const int tile_h = (h + ph) / tiles;
  const int tile_w = (w + pw) / tiles;
  const int H = h + ph, W = w + pw;
  std::vector<uint8_t> img(static_cast<size_t>(H) * W);
  for (int y = 0; y < H; ++y) {
    // numpy 'reflect' (reflect-101): index 2*(n-1) - i for i >= n
    const int sy = y < h ? y : 2 * (h - 1) - y;
    for (int x = 0; x < W; ++x) {
      const int sx = x < w ? x : 2 * (w - 1) - x;
      img[static_cast<size_t>(y) * W + x] =
          src[static_cast<size_t>(sy) * w + sx];
    }
  }
  const int tile_area = tile_h * tile_w;
  const int clip =
      clip_limit > 0.0
          ? std::max(static_cast<int>(clip_limit * tile_area / 256), 1)
          : 0;

  std::vector<uint8_t> luts(static_cast<size_t>(tiles) * tiles * 256);
  std::vector<int64_t> hist(256);
  for (int ty = 0; ty < tiles; ++ty) {
    for (int tx = 0; tx < tiles; ++tx) {
      std::fill(hist.begin(), hist.end(), 0);
      for (int y = ty * tile_h; y < (ty + 1) * tile_h; ++y)
        for (int x = tx * tile_w; x < (tx + 1) * tile_w; ++x)
          ++hist[img[static_cast<size_t>(y) * W + x]];
      if (clip > 0) {
        int64_t excess = 0;
        for (int i = 0; i < 256; ++i)
          if (hist[i] > clip) {
            excess += hist[i] - clip;
            hist[i] = clip;
          }
        const int64_t batch = excess / 256;
        const int64_t residual = excess - batch * 256;
        for (int i = 0; i < 256; ++i) hist[i] += batch;
        if (residual) {
          const int step = std::max(static_cast<int>(256 / residual), 1);
          for (int64_t r = 0; r < residual; ++r) hist[r * step] += 1;
        }
      }
      const double scale = 255.0 / tile_area;
      int64_t cdf = 0;
      uint8_t* lut = luts.data() + (static_cast<size_t>(ty) * tiles + tx) * 256;
      for (int i = 0; i < 256; ++i) {
        cdf += hist[i];
        double v = std::nearbyint(cdf * scale);  // round-half-even
        lut[i] = static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
      }
    }
  }

  for (int y = 0; y < h; ++y) {
    const float tyf = y * (1.0f / tile_h) - 0.5f;
    const int ty1 = static_cast<int>(std::floor(tyf));
    const float ya = tyf - ty1;
    const int ty1c = std::min(std::max(ty1, 0), tiles - 1);
    const int ty2c = std::min(std::max(ty1 + 1, 0), tiles - 1);
    for (int x = 0; x < w; ++x) {
      const float txf = x * (1.0f / tile_w) - 0.5f;
      const int tx1 = static_cast<int>(std::floor(txf));
      const float xa = txf - tx1;
      const int tx1c = std::min(std::max(tx1, 0), tiles - 1);
      const int tx2c = std::min(std::max(tx1 + 1, 0), tiles - 1);
      const uint8_t v = img[static_cast<size_t>(y) * W + x];
      const float tl = luts[(static_cast<size_t>(ty1c) * tiles + tx1c) * 256 + v];
      const float tr = luts[(static_cast<size_t>(ty1c) * tiles + tx2c) * 256 + v];
      const float bl = luts[(static_cast<size_t>(ty2c) * tiles + tx1c) * 256 + v];
      const float br = luts[(static_cast<size_t>(ty2c) * tiles + tx2c) * 256 + v];
      const float top = tl * (1.0f - xa) + tr * xa;
      const float bot = bl * (1.0f - xa) + br * xa;
      float out = top * (1.0f - ya) + bot * ya;
      out = std::nearbyintf(out);
      dst[static_cast<size_t>(y) * w + x] =
          static_cast<uint8_t>(out < 0 ? 0 : (out > 255 ? 255 : out));
    }
  }
}

// ------------------------------------------------------------- LAB (f32)
//
// Float-formula sRGB<->LAB (D65). Within +-2 LSB of cv2's fixed-point u8
// tables (measured); the deviation is gated by a served-probability parity
// test (tests/test_native_prep.py). Used only inside the native fast prep.

inline float srgb_to_linear(float c) {
  return c <= 0.04045f ? c / 12.92f : std::pow((c + 0.055f) / 1.055f, 2.4f);
}

inline float linear_to_srgb(float c) {
  return c <= 0.0031308f ? c * 12.92f
                         : 1.055f * std::pow(c, 1.0f / 2.4f) - 0.055f;
}

// u8 -> linear gamma table (exact: one powf per table entry, not per pixel)
struct GammaTab {
  float fwd[256];
  // linear -> sRGB via 4097-point lerp table (max abs error < 1e-4, far
  // below the documented +-2 LSB LAB tolerance)
  float inv[4097];
  GammaTab() {
    for (int i = 0; i < 256; ++i) fwd[i] = srgb_to_linear(i / 255.0f);
    for (int i = 0; i <= 4096; ++i) inv[i] = linear_to_srgb(i / 4096.0f);
  }
};
const GammaTab kGamma;

inline float linear_to_srgb_fast(float c) {
  c = std::min(std::max(c, 0.0f), 1.0f) * 4096.0f;
  const int i = static_cast<int>(c);
  const float f = c - i;
  return i >= 4096 ? kGamma.inv[4096]
                   : kGamma.inv[i] * (1.0f - f) + kGamma.inv[i + 1] * f;
}

inline float lab_f(float t) {
  return t > 0.008856f ? std::cbrt(t) : 7.787f * t + 16.0f / 116.0f;
}

void bgr_to_lab_u8(const uint8_t* bgr, int n, uint8_t* lab) {
  const float Xn = 0.950456f, Zn = 1.088754f;
  for (int i = 0; i < n; ++i) {
    const float b = kGamma.fwd[bgr[i * 3 + 0]];
    const float g = kGamma.fwd[bgr[i * 3 + 1]];
    const float r = kGamma.fwd[bgr[i * 3 + 2]];
    const float X = (0.412453f * r + 0.357580f * g + 0.180423f * b) / Xn;
    const float Y = 0.212671f * r + 0.715160f * g + 0.072169f * b;
    const float Z = (0.019334f * r + 0.119193f * g + 0.950227f * b) / Zn;
    const float fy = lab_f(Y);
    const float L =
        Y > 0.008856f ? 116.0f * std::cbrt(Y) - 16.0f : 903.3f * Y;
    const float a = 500.0f * (lab_f(X) - fy) + 128.0f;
    const float bb = 200.0f * (fy - lab_f(Z)) + 128.0f;
    auto q = [](float v) {
      v = std::nearbyintf(v);
      return static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
    };
    lab[i * 3 + 0] = q(L * 255.0f / 100.0f);
    lab[i * 3 + 1] = q(a);
    lab[i * 3 + 2] = q(bb);
  }
}

void lab_to_bgr_u8(const uint8_t* lab, int n, uint8_t* bgr) {
  const float Xn = 0.950456f, Zn = 1.088754f;
  for (int i = 0; i < n; ++i) {
    const float L = lab[i * 3 + 0] * 100.0f / 255.0f;
    const float a = lab[i * 3 + 1] - 128.0f;
    const float bb = lab[i * 3 + 2] - 128.0f;
    const float fy = (L + 16.0f) / 116.0f;
    const float fx = fy + a / 500.0f;
    const float fz = fy - bb / 200.0f;
    auto finv = [](float t) {
      const float t3 = t * t * t;
      return t3 > 0.008856f ? t3 : (t - 16.0f / 116.0f) / 7.787f;
    };
    const float Y = L > 8.0f ? fy * fy * fy : L / 903.3f;
    const float X = finv(fx) * Xn;
    const float Z = finv(fz) * Zn;
    const float r = 3.240479f * X - 1.537150f * Y - 0.498535f * Z;
    const float g = -0.969256f * X + 1.875991f * Y + 0.041556f * Z;
    const float b = 0.055648f * X - 0.204043f * Y + 1.057311f * Z;
    auto q = [](float v) {
      v = std::nearbyintf(linear_to_srgb_fast(v) * 255.0f);
      return static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
    };
    bgr[i * 3 + 0] = q(b);
    bgr[i * 3 + 1] = q(g);
    bgr[i * 3 + 2] = q(r);
  }
}

// ------------------------------------------------ wire-format ingest planes
//
// The serving tick can split the JPEG codec across host and device at two
// natural boundaries (reference equivalent: backend_server.py:140-142 does
// the FULL decode on host through cv2):
//
//   "coef"     host does Huffman/entropy decode ONLY (the memory-bound
//              fraction); quantized DCT coefficients + quant tables ship to
//              the TPU, which runs dequant -> islow IDCT -> fancy upsample
//              -> YCbCr->BGR (ops/jpeg_decode.py — the same bit-exact
//              libjpeg integer math used for ELA).
//   "ycbcr420" host runs entropy decode + IDCT but SKIPS upsample/color;
//              raw 4:2:0 planes (1.5 B/px, half of BGR) ship to the TPU.
//
// Both are bit-exact vs the full host decode (islow + fancy upsample +
// ycc_rgb defaults). Eligibility: baseline/progressive 8-bit 3-component
// YCbCr with 2x2,1x1,1x1 sampling and dims EXACTLY the fixed capture shape
// (divisible by 16). Anything else -> ok=0, caller falls back to the full
// decode ladder.

bool check_420_header(jpeg_decompress_struct& cinfo, int eh, int ew) {
  if (cinfo.data_precision != 8 || cinfo.num_components != 3) return false;
  if (cinfo.jpeg_color_space != JCS_YCbCr) return false;
  if (static_cast<int>(cinfo.image_height) != eh ||
      static_cast<int>(cinfo.image_width) != ew)
    return false;
  if (eh % 16 != 0 || ew % 16 != 0) return false;
  const jpeg_component_info* c = cinfo.comp_info;
  if (c[0].h_samp_factor != 2 || c[0].v_samp_factor != 2) return false;
  if (c[1].h_samp_factor != 1 || c[1].v_samp_factor != 1) return false;
  if (c[2].h_samp_factor != 1 || c[2].v_samp_factor != 1) return false;
  if (c[1].quant_tbl_no != c[2].quant_tbl_no) return false;
  return true;
}

// Entropy-only decode: quantized coefficients in natural (raster) order, as
// the libjpeg entropy decoder leaves them, plus the two quant tables.
// cy: (yb, 64) i16 with yb = (eh/8)*(ew/8), block raster order;
// cc: (2, cb, 64) i16 with cb = yb/4 (Cb then Cr); qt: (2, 64) u16.
bool decode_coefs_one(const uint8_t* data, size_t len, int eh, int ew,
                      int16_t* cy, int16_t* cc, uint16_t* qt) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK ||
      !check_420_header(cinfo, eh, ew)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jvirt_barray_ptr* arrays = jpeg_read_coefficients(&cinfo);
  if (!arrays) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  for (int t = 0; t < 2; ++t) {
    const int tno = cinfo.comp_info[t].quant_tbl_no;
    const JQUANT_TBL* q =
        (tno >= 0 && tno < NUM_QUANT_TBLS) ? cinfo.quant_tbl_ptrs[tno]
                                           : nullptr;
    if (!q) {
      jpeg_destroy_decompress(&cinfo);
      return false;
    }
    for (int i = 0; i < 64; ++i) qt[t * 64 + i] = q->quantval[i];
  }
  for (int ci = 0; ci < 3; ++ci) {
    jpeg_component_info* comp = cinfo.comp_info + ci;
    const int wb = ci == 0 ? ew / 8 : ew / 16;
    const int hb = ci == 0 ? eh / 8 : eh / 16;
    if (static_cast<int>(comp->width_in_blocks) != wb ||
        static_cast<int>(comp->height_in_blocks) != hb) {
      jpeg_destroy_decompress(&cinfo);
      return false;
    }
    int16_t* dst = ci == 0 ? cy : cc + static_cast<size_t>(ci - 1) * hb * wb * 64;
    for (int r = 0; r < hb; ++r) {
      JBLOCKARRAY rows = (*cinfo.mem->access_virt_barray)(
          reinterpret_cast<j_common_ptr>(&cinfo), arrays[ci],
          static_cast<JDIMENSION>(r), 1, FALSE);
      static_assert(sizeof(JCOEF) == sizeof(int16_t), "JCOEF must be i16");
      memcpy(dst + static_cast<size_t>(r) * wb * 64, rows[0],
             static_cast<size_t>(wb) * 64 * sizeof(JCOEF));
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Entropy decode + IDCT, raw 4:2:0 sample planes out (no upsample/color).
// y: (eh, ew) u8; c: (2, eh/2, ew/2) u8 (Cb then Cr).
bool decode_raw420_one(const uint8_t* data, size_t len, int eh, int ew,
                       uint8_t* y, uint8_t* c) {
  jpeg_decompress_struct cinfo;
  ErrMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK ||
      !check_420_header(cinfo, eh, ew)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.raw_data_out = TRUE;
  cinfo.out_color_space = JCS_YCbCr;
  jpeg_start_decompress(&cinfo);
  const int cw = ew / 2;
  uint8_t* cb = c;
  uint8_t* cr = c + static_cast<size_t>(eh / 2) * cw;
  JSAMPROW yrows[16], cbrows[8], crrows[8];
  JSAMPARRAY planes[3] = {yrows, cbrows, crrows};
  while (cinfo.output_scanline < cinfo.output_height) {
    const int base = static_cast<int>(cinfo.output_scanline);
    for (int i = 0; i < 16; ++i)
      yrows[i] = y + static_cast<size_t>(base + i) * ew;
    for (int i = 0; i < 8; ++i) {
      cbrows[i] = cb + static_cast<size_t>(base / 2 + i) * cw;
      crrows[i] = cr + static_cast<size_t>(base / 2 + i) * cw;
    }
    if (jpeg_read_raw_data(&cinfo, planes, 16) == 0) {
      jpeg_destroy_decompress(&cinfo);
      return false;
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

}  // namespace

extern "C" {

// ABI contract version for the ctypes bindings (utils/native_ingest.py).
// Bump whenever any exported signature changes: the loader checks this
// after dlopen and forces a rebuild on mismatch, so a stale cached
// .build/libingest.so (e.g. restored with a newer-than-source mtime)
// fails safe instead of corrupting argument marshalling.
int ingest_abi_version(void) { return 4; }

// Decode one JPEG; returns buffer (BGR u8) or null. Caller must free_buffer.
uint8_t* ingest_decode(const uint8_t* data, size_t len, int max_dim_hint,
                       int* out_h, int* out_w) {
  return decode_jpeg(data, len, max_dim_hint, out_h, out_w);
}

void ingest_free(uint8_t* buf) { free(buf); }

// Decode + exact-cv2 resize into a caller-provided (dh, dw, 3) buffer.
// Returns 0 on success. full_h/full_w receive the pre-resize decode dims.
int ingest_decode_resize(const uint8_t* data, size_t len, uint8_t* out,
                         int dh, int dw, int* full_h, int* full_w) {
  int h = 0, w = 0;
  // Decode with a scale hint of 2x target: DCT-scaled decode must stay
  // ABOVE the target so the final resize is a downscale (matching cv2's
  // full-decode-then-resize numerics requires full decode; hint<=0 does
  // that. A positive hint trades exactness for speed.)
  uint8_t* buf = decode_jpeg(data, len, 0, &h, &w);
  if (!buf) return -1;
  resize_u8_cv2(buf, h, w, out, dh, dw);
  free(buf);
  if (full_h) *full_h = h;
  if (full_w) *full_w = w;
  return 0;
}

// Fast variant: allows DCT-scaled decode at >= max(2*target, hint) for the
// serving path where the analysis resize dominates (numerics then differ
// from cv2's full-size pipeline; used only when exact=0).
int ingest_decode_resize_fast(const uint8_t* data, size_t len, uint8_t* out,
                              int dh, int dw, int* src_h, int* src_w) {
  int h = 0, w = 0;
  uint8_t* buf = decode_jpeg(data, len, 2 * std::max(dh, dw), &h, &w,
                             src_h, src_w);
  if (!buf) return -1;
  resize_u8_cv2(buf, h, w, out, dh, dw);
  free(buf);
  return 0;
}

// Batch decode+resize with a thread pool. jobs arrays have length n.
// fast != 0 routes through the DCT-scaled decode (numerics differ from the
// exact cv2 pipeline; opt-in). Returns number of successful decodes;
// failures leave ok[i] == 0.
// src_hw (nullable) receives the TRUE pre-scaling source dims as
// (h, w) pairs: src_hw[2i], src_hw[2i+1]; 0 for failed decodes.
int ingest_decode_resize_batch(const uint8_t** datas, const size_t* lens,
                               uint8_t* out, int dh, int dw, int n,
                               int n_threads, int fast, int* ok,
                               int* src_hw) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
  }
  n_threads = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> pool;
  std::vector<int> success(n, 0);
  const size_t frame_bytes = static_cast<size_t>(dh) * dw * 3;
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([&, t]() {
      for (int i = t; i < n; i += n_threads) {
        int sh = 0, sw = 0;
        int rc = fast ? ingest_decode_resize_fast(datas[i], lens[i],
                                                  out + i * frame_bytes,
                                                  dh, dw, &sh, &sw)
                      : ingest_decode_resize(datas[i], lens[i],
                                             out + i * frame_bytes, dh, dw,
                                             &sh, &sw);
        success[i] = (rc == 0);
        if (src_hw) {
          src_hw[2 * i] = (rc == 0) ? sh : 0;
          src_hw[2 * i + 1] = (rc == 0) ? sw : 0;
        }
      }
    });
  }
  for (auto& th : pool) th.join();
  int total = 0;
  for (int i = 0; i < n; ++i) {
    if (ok) ok[i] = success[i];
    total += success[i];
  }
  return total;
}

// Batched entropy-only decode ("coef" wire plane). Layouts per entry i:
//   coef_y + i*yb*64   (yb, 64) i16, yb = (expect_h/8)*(expect_w/8)
//   coef_c + i*2*cb*64 (2, cb, 64) i16, cb = yb/4
//   qtab  + i*2*64     (2, 64) u16 natural order (luma, chroma)
// ok[i] = 1 when the entry was decoded via coefficients, 0 -> caller must
// fall back to the full-decode path. Returns the number of 1s.
int ingest_decode_coefs_batch(const uint8_t** datas, const size_t* lens,
                              int expect_h, int expect_w, int16_t* coef_y,
                              int16_t* coef_c, uint16_t* qtab, int n,
                              int n_threads, int* ok) {
  if (expect_h % 16 != 0 || expect_w % 16 != 0) return 0;
  const size_t yb = static_cast<size_t>(expect_h / 8) * (expect_w / 8);
  const size_t cb = yb / 4;
  if (n_threads <= 0)
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
  n_threads = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> pool;
  std::vector<int> success(n, 0);
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([&, t]() {
      for (int i = t; i < n; i += n_threads) {
        success[i] = decode_coefs_one(
            datas[i], lens[i], expect_h, expect_w,
            coef_y + static_cast<size_t>(i) * yb * 64,
            coef_c + static_cast<size_t>(i) * 2 * cb * 64,
            qtab + static_cast<size_t>(i) * 2 * 64);
      }
    });
  }
  for (auto& th : pool) th.join();
  int total = 0;
  for (int i = 0; i < n; ++i) {
    if (ok) ok[i] = success[i];
    total += success[i];
  }
  return total;
}

// Batched raw 4:2:0 decode ("ycbcr420" wire plane). Layouts per entry i:
//   y + i*h*w          (h, w) u8
//   c + i*2*(h/2)*(w/2) (2, h/2, w/2) u8 (Cb then Cr)
int ingest_decode_raw420_batch(const uint8_t** datas, const size_t* lens,
                               int expect_h, int expect_w, uint8_t* y,
                               uint8_t* c, int n, int n_threads, int* ok) {
  if (expect_h % 16 != 0 || expect_w % 16 != 0) return 0;
  const size_t ybytes = static_cast<size_t>(expect_h) * expect_w;
  const size_t cbytes = ybytes / 2;
  if (n_threads <= 0)
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
  n_threads = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> pool;
  std::vector<int> success(n, 0);
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([&, t]() {
      for (int i = t; i < n; i += n_threads) {
        success[i] = decode_raw420_one(
            datas[i], lens[i], expect_h, expect_w,
            y + static_cast<size_t>(i) * ybytes,
            c + static_cast<size_t>(i) * cbytes);
      }
    });
  }
  for (auto& th : pool) th.join();
  int total = 0;
  for (int i = 0; i < n; ++i) {
    if (ok) ok[i] = success[i];
    total += success[i];
  }
  return total;
}

int ingest_resize_u8(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                     int dw) {
  resize_u8_cv2(src, sh, sw, dst, dh, dw);
  return 0;
}

// Heuristic face detector on a BGR frame. Returns 1 + box when a face is
// found, 0 otherwise.
int ingest_detect_heuristic(const uint8_t* bgr, int h, int w, int* box) {
  return detect_heuristic_native(bgr, h, w, box) ? 1 : 0;
}

// CLAHE on a single-channel u8 image (clip_limit 2.0 / tiles 8 is the
// reference preprocessing).
int ingest_clahe_u8(const uint8_t* src, int h, int w, double clip_limit,
                    int tiles, uint8_t* dst) {
  clahe_u8_native(src, h, w, clip_limit, tiles, dst);
  return 0;
}

int ingest_bgr2lab(const uint8_t* bgr, int n, uint8_t* lab) {
  bgr_to_lab_u8(bgr, n, lab);
  return 0;
}

int ingest_lab2bgr(const uint8_t* lab, int n, uint8_t* bgr) {
  lab_to_bgr_u8(lab, n, bgr);
  return 0;
}

// Full per-request prep for the batched serving engine, one GIL-free call:
//   JPEG decode -> analysis resize (ah, aw) -> heuristic face detect ->
//   crop -> LAB -> CLAHE(L) -> BGR -> RGB align resize (align, align).
// out_frame: (ah, aw, 3) u8 BGR analysis frame (always written on success)
// out_aligned: (align, align, 3) u8 RGB aligned face (written iff face)
// out_box: x, y, w, h on the decoded frame (written iff face)
// Returns: -1 decode failure, 0 ok / no face, 1 ok / face.
int ingest_prep_frame(const uint8_t* data, size_t len, uint8_t* out_frame,
                      int ah, int aw, uint8_t* out_aligned, int align,
                      int* out_box) {
  int h = 0, w = 0;
  uint8_t* frame = decode_jpeg(data, len, 0, &h, &w);
  if (!frame) return -1;
  resize_u8_cv2(frame, h, w, out_frame, ah, aw);

  int box[4];
  if (!detect_heuristic_native(frame, h, w, box)) {
    free(frame);
    return 0;
  }
  const int x = box[0], y = box[1], bw = box[2], bh = box[3];
  // crop
  std::vector<uint8_t> crop(static_cast<size_t>(bh) * bw * 3);
  for (int yy = 0; yy < bh; ++yy)
    memcpy(crop.data() + static_cast<size_t>(yy) * bw * 3,
           frame + (static_cast<size_t>(y + yy) * w + x) * 3,
           static_cast<size_t>(bw) * 3);
  free(frame);
  // LAB -> CLAHE(L) -> BGR  (preprocess_face_quality)
  const int n = bh * bw;
  std::vector<uint8_t> lab(static_cast<size_t>(n) * 3);
  bgr_to_lab_u8(crop.data(), n, lab.data());
  std::vector<uint8_t> lch(n), lch2(n);
  for (int i = 0; i < n; ++i) lch[i] = lab[static_cast<size_t>(i) * 3];
  clahe_u8_native(lch.data(), bh, bw, 2.0, 8, lch2.data());
  for (int i = 0; i < n; ++i) lab[static_cast<size_t>(i) * 3] = lch2[i];
  lab_to_bgr_u8(lab.data(), n, crop.data());
  // BGR -> RGB, align resize (the _ResizeAligner path)
  for (int i = 0; i < n; ++i)
    std::swap(crop[static_cast<size_t>(i) * 3],
              crop[static_cast<size_t>(i) * 3 + 2]);
  resize_u8_cv2(crop.data(), bh, bw, out_aligned, align, align);
  out_box[0] = x;
  out_box[1] = y;
  out_box[2] = bw;
  out_box[3] = bh;
  return 1;
}

}  // extern "C"
