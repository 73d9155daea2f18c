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

// Bilinear sample with half-pixel centers (matches PIL/torch
// align_corners=False semantics used by the eval protocol).
inline void bilinear_resize_crop(const uint8_t* src, int sw, int sh,
                                 int cx, int cy, int cw, int ch,
                                 uint8_t* dst, int dw, int dh) {
  const float sx = static_cast<float>(cw) / dw;
  const float sy = static_cast<float>(ch) / dh;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f + cy;
    fy = std::min(std::max(fy, static_cast<float>(cy)),
                  static_cast<float>(cy + ch - 1));
    int y0 = static_cast<int>(fy);
    int y1 = std::min(y0 + 1, cy + ch - 1);
    float wy = fy - y0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f + cx;
      fx = std::min(std::max(fx, static_cast<float>(cx)),
                    static_cast<float>(cx + cw - 1));
      int x0 = static_cast<int>(fx);
      int x1 = std::min(x0 + 1, cx + cw - 1);
      float wx = fx - x0;
      for (int c = 0; c < 3; ++c) {
        float v00 = src[(y0 * sw + x0) * 3 + c];
        float v01 = src[(y0 * sw + x1) * 3 + c];
        float v10 = src[(y1 * sw + x0) * 3 + c];
        float v11 = src[(y1 * sw + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[(y * dw + x) * 3 + c] =
            static_cast<uint8_t>(std::min(std::max(v + 0.5f, 0.0f), 255.0f));
      }
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
  // pick the largest 1/s in {1,2,4,8} keeping the scaled crop comfortably
  // above the target (12.5% margin preserves resampling quality)
  int denom = 1;
  while (denom < 8 && cw / (denom * 2) >= dw + dw / 8 &&
         ch / (denom * 2) >= dh + dh / 8)
    denom *= 2;
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  jpeg_start_decompress(&cinfo);
  // crop in scaled coordinates
  int scx = cx / denom, scy = cy / denom;
  int scw = std::max(cw / denom, 1), sch = std::max(ch / denom, 1);
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
