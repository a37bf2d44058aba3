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
                     int* out_h, int* out_w) {
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
  const int stride = w * 3;
  buf = static_cast<uint8_t*>(malloc(static_cast<size_t>(h) * stride));
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
    double fx = (x + 0.5) * scale - 0.5;
    int sx = static_cast<int>(std::floor(fx));
    fx -= sx;
    if (sx < 0) {
      sx = 0;
      fx = 0.0;
    }
    if (sx >= src - 1) {
      sx = src - 1;
      fx = 0.0;
    }
    t.s0[x] = sx;
    t.s1[x] = std::min(sx + 1, src - 1);
    const float f = static_cast<float>(fx);
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

}  // namespace

extern "C" {

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
                              int dh, int dw) {
  int h = 0, w = 0;
  uint8_t* buf = decode_jpeg(data, len, 2 * std::max(dh, dw), &h, &w);
  if (!buf) return -1;
  resize_u8_cv2(buf, h, w, out, dh, dw);
  free(buf);
  return 0;
}

// Batch decode+resize with a thread pool. jobs arrays have length n.
// Returns number of successful decodes; failures leave ok[i] == 0.
int ingest_decode_resize_batch(const uint8_t** datas, const size_t* lens,
                               uint8_t* out, int dh, int dw, int n,
                               int n_threads, int* ok) {
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
        int rc = ingest_decode_resize(datas[i], lens[i], out + i * frame_bytes,
                                      dh, dw, nullptr, nullptr);
        success[i] = (rc == 0);
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

}  // extern "C"
