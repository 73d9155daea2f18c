// fastimage: native JPEG decode + crop + bilinear resize + normalize for the
// input pipeline.
//
// TPU-native replacement for the native decode path the reference gets from
// torch DataLoader workers + PIL-SIMD/accimage in the NVIDIA container
// (SURVEY §2.3.6). The Python loader calls this via ctypes from its worker
// pool; one call fuses decode -> crop -> resize -> (NHWC f32 normalize),
// avoiding PIL's intermediate buffers and Python-side loops.
//
// Build: make -C native  (produces libfastimage.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Separable fixed-point bilinear resize of a crop region, half-pixel
// centers (PIL/torch align_corners=False semantics). Two passes with
// precomputed per-column taps: ~3x the naive fused loop (weight reuse +
// sequential access), which mattered once decode stopped dominating.
inline void bilinear_resize_crop(const uint8_t* src, int sw, int sh,
                                 int cx, int cy, int cw, int ch,
                                 uint8_t* dst, int dw, int dh) {
  constexpr int kBits = 12;           // 4096 weight steps per tap
  constexpr int kOne = 1 << kBits;
  const float sx = static_cast<float>(cw) / dw;
  const float sy = static_cast<float>(ch) / dh;

  std::vector<int> x0s(dw), x1s(dw), wxs(dw);
  for (int x = 0; x < dw; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f + cx;
    fx = std::min(std::max(fx, static_cast<float>(cx)),
                  static_cast<float>(cx + cw - 1));
    int x0 = static_cast<int>(fx);
    x0s[x] = x0;
    x1s[x] = std::min(x0 + 1, cx + cw - 1);
    wxs[x] = static_cast<int>((fx - x0) * kOne + 0.5f);
  }

  // horizontal pass rows cached by source-row index (each source row is
  // used by at most two adjacent output rows when downscaling)
  std::vector<uint16_t> rowbuf(2 * dw * 3);
  int cached[2] = {-1, -1};
  auto hpass = [&](int ysrc) -> uint16_t* {
    for (int s = 0; s < 2; ++s)
      if (cached[s] == ysrc) return rowbuf.data() + s * dw * 3;
    int slot = (cached[0] <= cached[1]) ? 0 : 1;  // evict older
    cached[slot] = ysrc;
    uint16_t* out = rowbuf.data() + slot * dw * 3;
    const uint8_t* row = src + static_cast<size_t>(ysrc) * sw * 3;
    for (int x = 0; x < dw; ++x) {
      const uint8_t* p0 = row + x0s[x] * 3;
      const uint8_t* p1 = row + x1s[x] * 3;
      const int wx = wxs[x];
      // 8-bit * 12-bit fits u16 after >> 4: keep kBits precision in u16
      out[x * 3 + 0] = static_cast<uint16_t>(
          (p0[0] * (kOne - wx) + p1[0] * wx) >> 4);
      out[x * 3 + 1] = static_cast<uint16_t>(
          (p0[1] * (kOne - wx) + p1[1] * wx) >> 4);
      out[x * 3 + 2] = static_cast<uint16_t>(
          (p0[2] * (kOne - wx) + p1[2] * wx) >> 4);
    }
    return out;
  };

  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f + cy;
    fy = std::min(std::max(fy, static_cast<float>(cy)),
                  static_cast<float>(cy + ch - 1));
    int y0 = static_cast<int>(fy);
    int y1 = std::min(y0 + 1, cy + ch - 1);
    const int wy = static_cast<int>((fy - y0) * kOne + 0.5f);
    const uint16_t* r0 = hpass(y0);
    const uint16_t* r1 = (y1 == y0) ? r0 : hpass(y1);
    uint8_t* drow = dst + static_cast<size_t>(y) * dw * 3;
    for (int i = 0; i < dw * 3; ++i) {
      // r* carry 8 fractional bits (12 - 4); total 8 + 12 = 20 bits
      int v = r0[i] * (kOne - wy) + r1[i] * wy;
      drow[i] = static_cast<uint8_t>(
          std::min((v + (1 << 19)) >> 20, 255));
    }
  }
}

}  // namespace

extern "C" {

// Decode a JPEG from memory. Returns 0 on success; fills *out_w/*out_h.
// Caller provides `rgb` of capacity cap_bytes (w*h*3). If rgb == nullptr,
// only the header is parsed (dimension probe).
int fi_decode_jpeg(const uint8_t* data, long size, uint8_t* rgb,
                   long cap_bytes, int* out_w, int* out_h) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  *out_w = cinfo.image_width;
  *out_h = cinfo.image_height;
  if (rgb == nullptr) {
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  if (static_cast<long>(cinfo.image_width) * cinfo.image_height * 3 >
      cap_bytes) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  jpeg_start_decompress(&cinfo);
  int stride = cinfo.output_width * cinfo.output_components;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = rgb + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Fused decode + crop + bilinear resize to (dw, dh) RGB8.
// crop box: (cx, cy, cw, ch) in source pixels.
//
// Fast paths PIL's decode-everything pipeline cannot take:
//  * DCT-domain scaled decode (libjpeg-turbo scale_num/denom) when the
//    crop will be downscaled by >=2x anyway — decode cost drops
//    quadratically;
//  * jpeg_crop_scanline + jpeg_skip_scanlines to decode only the rows and
//    MCU columns the crop touches.
int fi_decode_crop_resize(const uint8_t* data, long size, int cx, int cy,
                          int cw, int ch, uint8_t* dst, int dw, int dh) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(size));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  const int sw = cinfo.image_width, sh = cinfo.image_height;
  cx = std::min(std::max(cx, 0), sw - 1);
  cy = std::min(std::max(cy, 0), sh - 1);
  cw = std::min(cw, sw - cx);
  ch = std::min(ch, sh - cy);
  if (cw <= 0 || ch <= 0) {
    jpeg_destroy_decompress(&cinfo);
    return -3;
  }
  // pick the smallest DCT scale M/8 (libjpeg-turbo supports all of
  // 1/8..8/8, not just powers of two) keeping the scaled crop
  // comfortably above the target (12.5% margin preserves resampling
  // quality) — IDCT cost drops ~quadratically with M
  int num = 8;
  while (num > 1 &&
         (static_cast<long>(cw) * (num - 1)) / 8 >= dw + dw / 8 &&
         (static_cast<long>(ch) * (num - 1)) / 8 >= dh + dh / 8)
    --num;
  cinfo.scale_num = num;
  cinfo.scale_denom = 8;
  jpeg_start_decompress(&cinfo);
  // crop in scaled coordinates
  int scx = static_cast<int>(static_cast<long>(cx) * num / 8);
  int scy = static_cast<int>(static_cast<long>(cy) * num / 8);
  int scw = std::max(static_cast<int>(static_cast<long>(cw) * num / 8), 1);
  int sch = std::max(static_cast<int>(static_cast<long>(ch) * num / 8), 1);
  scw = std::min(scw, static_cast<int>(cinfo.output_width) - scx);
  sch = std::min(sch, static_cast<int>(cinfo.output_height) - scy);
  JDIMENSION xoff = scx, xw = scw;
  jpeg_crop_scanline(&cinfo, &xoff, &xw);  // rounds to MCU boundary
  const int adj = scx - static_cast<int>(xoff);
  std::vector<uint8_t> rows(static_cast<size_t>(xw) * 3 *
                            static_cast<size_t>(sch));
  jpeg_skip_scanlines(&cinfo, scy);
  for (int y = 0; y < sch; ++y) {
    uint8_t* row = rows.data() + static_cast<size_t>(y) * xw * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_skip_scanlines(&cinfo, cinfo.output_height - scy - sch);
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  bilinear_resize_crop(rows.data(), static_cast<int>(xw), sch, adj, 0,
                       scw, sch, dst, dw, dh);
  return 0;
}

// Inverse-mapped affine warp of an RGB8 image with bilinear sampling and
// constant fill — the single kernel behind RandAugment's geometric ops
// (Rotate / ShearX / ShearY / TranslateX / TranslateY; reference gets
// these from PIL Image.transform(AFFINE)/rotate inside timm's
// rand_augment_transform). PIL convention: output pixel (x, y) samples
// the source at (m0*(x+.5) + m1*(y+.5) + m2 - .5, m3.. m5), out-of-range
// taps use the fill color.
void fi_affine_u8(const uint8_t* src, int h, int w, const double* m,
                  const uint8_t* fill, uint8_t* dst) {
  for (int y = 0; y < h; ++y) {
    const double base_x = m[1] * (y + 0.5) + m[2] - 0.5;
    const double base_y = m[4] * (y + 0.5) + m[5] - 0.5;
    uint8_t* q = dst + static_cast<size_t>(y) * w * 3;
    for (int x = 0; x < w; ++x) {
      const double xs = m[0] * (x + 0.5) + base_x;
      const double ys = m[3] * (x + 0.5) + base_y;
      const int x0 = static_cast<int>(std::floor(xs));
      const int y0 = static_cast<int>(std::floor(ys));
      if (x0 < -1 || y0 < -1 || x0 >= w || y0 >= h) {
        q[x * 3 + 0] = fill[0];
        q[x * 3 + 1] = fill[1];
        q[x * 3 + 2] = fill[2];
        continue;
      }
      const float wx = static_cast<float>(xs - x0);
      const float wy = static_cast<float>(ys - y0);
      const int x1 = x0 + 1;
      const int y1 = y0 + 1;
      for (int c = 0; c < 3; ++c) {
        const float v00 = (x0 >= 0 && y0 >= 0)
                              ? src[(y0 * w + x0) * 3 + c] : fill[c];
        const float v01 = (x1 < w && y0 >= 0)
                              ? src[(y0 * w + x1) * 3 + c] : fill[c];
        const float v10 = (x0 >= 0 && y1 < h)
                              ? src[(y1 * w + x0) * 3 + c] : fill[c];
        const float v11 = (x1 < w && y1 < h)
                              ? src[(y1 * w + x1) * 3 + c] : fill[c];
        const float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                        v10 * wy * (1 - wx) + v11 * wy * wx;
        q[x * 3 + c] = static_cast<uint8_t>(
            std::min(std::max(v + 0.5f, 0.0f), 255.0f));
      }
    }
  }
}

namespace {
// PIL's integer luma (Convert.c L24): (R*19595 + G*38470 + B*7471) >> 16
inline int pil_luma(const uint8_t* p) {
  return (p[0] * 19595 + p[1] * 38470 + p[2] * 7471 + 0x8000) >> 16;
}
}  // namespace

// ImageEnhance.{Brightness=0, Color=1, Contrast=2, Sharpness=3} applied
// in place: out = degenerate + factor * (src - degenerate), where the
// degenerate image is black / per-pixel luma / mean luma / SMOOTH-
// filtered (3x3 [1 1 1; 1 5 1; 1 1 1]/13, borders copied), matching PIL.
void fi_enhance_u8(uint8_t* buf, int h, int w, int mode, float factor) {
  const size_t n = static_cast<size_t>(h) * w;
  auto blend = [factor](float deg, float v) -> uint8_t {
    // PIL Blend.c CLIP8 truncates the float result — no +0.5 rounding
    const float r = deg + factor * (v - deg);
    return static_cast<uint8_t>(std::min(std::max(r, 0.0f), 255.0f));
  };
  if (mode == 0) {  // brightness: degenerate = black
    for (size_t i = 0; i < n * 3; ++i) buf[i] = blend(0.0f, buf[i]);
  } else if (mode == 1) {  // color: degenerate = per-pixel luma
    for (size_t i = 0; i < n; ++i) {
      uint8_t* p = buf + i * 3;
      const float l = static_cast<float>(pil_luma(p));
      p[0] = blend(l, p[0]);
      p[1] = blend(l, p[1]);
      p[2] = blend(l, p[2]);
    }
  } else if (mode == 2) {  // contrast: degenerate = mean luma
    long sum = 0;
    for (size_t i = 0; i < n; ++i) sum += pil_luma(buf + i * 3);
    const float mean = std::floor(
        static_cast<float>(sum) / static_cast<float>(n) + 0.5f);
    for (size_t i = 0; i < n * 3; ++i) buf[i] = blend(mean, buf[i]);
  } else if (mode == 3) {  // sharpness: degenerate = SMOOTH filter
    std::vector<uint8_t> deg(buf, buf + n * 3);
    for (int y = 1; y < h - 1; ++y) {
      for (int x = 1; x < w - 1; ++x) {
        for (int c = 0; c < 3; ++c) {
          int acc = 0;
          for (int dy = -1; dy <= 1; ++dy)
            for (int dx = -1; dx <= 1; ++dx)
              acc += buf[((y + dy) * w + (x + dx)) * 3 + c] *
                     ((dy == 0 && dx == 0) ? 5 : 1);
          deg[(y * w + x) * 3 + c] = static_cast<uint8_t>(
              std::min(std::max((acc + 6) / 13, 0), 255));
        }
      }
    }
    for (size_t i = 0; i < n * 3; ++i)
      buf[i] = blend(deg[i], buf[i]);
  }
}

// uint8 RGB [h, w, 3] -> normalized f32 NHWC with optional horizontal flip.
void fi_normalize(const uint8_t* rgb, int w, int h, const float* mean,
                  const float* stdv, int hflip, float* out) {
  const float inv255 = 1.0f / 255.0f;
  float inv_std[3] = {1.0f / stdv[0], 1.0f / stdv[1], 1.0f / stdv[2]};
  for (int y = 0; y < h; ++y) {
    for (int x = 0; x < w; ++x) {
      int sx = hflip ? (w - 1 - x) : x;
      const uint8_t* p = rgb + (y * w + sx) * 3;
      float* q = out + (y * w + x) * 3;
      for (int c = 0; c < 3; ++c) {
        q[c] = (p[c] * inv255 - mean[c]) * inv_std[c];
      }
    }
  }
}

}  // extern "C"
