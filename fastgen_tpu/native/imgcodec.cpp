// fastgen-tpu native JPEG codec (libjpeg), bytes-level.
//
// The WDS image path (fastgen_tpu/data/wds.py decode_member — counterpart of
// the reference's fastgen/datasets/decoders.py PIL decode) decodes .jpg tar
// members on the single host core that also feeds the TPU; this routes the
// decode through libjpeg with the GIL released (ctypes callers), like the
// zip/PNG core in zipreader.cpp.
//
// Contract mirrors fg_png_*: probe dims first, then decode into a caller
// buffer of w*h*3. Any unsupported input (CMYK, arithmetic coding, truncated
// stream) returns a negative code and Python falls back to PIL.
//
// Build (one .so with zipreader.cpp):
//   g++ -O3 -shared -fPIC -std=c++17 zipreader.cpp imgcodec.cpp -lz -ljpeg \
//       -o libfgnative.so

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>

namespace {

// libjpeg's default error handler exit()s the process; longjmp out instead.
struct JmpErrorMgr {
  jpeg_error_mgr base;
  std::jmp_buf env;
};

void on_jpeg_error(j_common_ptr cinfo) {
  auto* mgr = reinterpret_cast<JmpErrorMgr*>(cinfo->err);
  std::longjmp(mgr->env, 1);
}

void on_jpeg_message(j_common_ptr) {}  // silence warnings

struct Decoder {
  jpeg_decompress_struct cinfo;
  JmpErrorMgr err;
  bool live = false;

  bool init(const uint8_t* buf, int64_t len) {
    cinfo.err = jpeg_std_error(&err.base);
    err.base.error_exit = on_jpeg_error;
    err.base.output_message = on_jpeg_message;
    if (setjmp(err.env)) return false;
    jpeg_create_decompress(&cinfo);
    live = true;
    jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf),
                 static_cast<unsigned long>(len));
    return jpeg_read_header(&cinfo, TRUE) == JPEG_HEADER_OK;
  }

  ~Decoder() {
    if (live) jpeg_destroy_decompress(&cinfo);
  }
};

}  // namespace

extern "C" {

// Returns 0 and fills w/h, or negative (not a decodable JPEG).
int fg_jpeg_probe(const uint8_t* buf, int64_t len, int32_t* w, int32_t* h) {
  if (len < 4 || buf[0] != 0xFF || buf[1] != 0xD8) return -1;
  Decoder d;
  if (!d.init(buf, len)) return -2;
  if (setjmp(d.err.env)) return -3;
  *w = int32_t(d.cinfo.image_width);
  *h = int32_t(d.cinfo.image_height);
  return 0;
}

// Decode to RGB uint8 (grayscale expanded); out must hold w*h*3 bytes.
// Returns 0, or negative for anything PIL should handle instead.
int fg_jpeg_decode_rgb(const uint8_t* buf, int64_t len, uint8_t* out,
                       int64_t out_cap) {
  if (len < 4 || buf[0] != 0xFF || buf[1] != 0xD8) return -1;
  Decoder d;
  if (!d.init(buf, len)) return -2;
  if (setjmp(d.err.env)) return -3;

  // YCbCr/RGB sources convert to RGB in-library; grayscale decodes native
  // and is expanded below; anything else (CMYK/YCCK) falls back to PIL.
  if (d.cinfo.jpeg_color_space == JCS_GRAYSCALE) {
    d.cinfo.out_color_space = JCS_GRAYSCALE;
  } else if (d.cinfo.jpeg_color_space == JCS_YCbCr ||
             d.cinfo.jpeg_color_space == JCS_RGB) {
    d.cinfo.out_color_space = JCS_RGB;
  } else {
    return -4;
  }
  jpeg_start_decompress(&d.cinfo);
  const int64_t w = d.cinfo.output_width, h = d.cinfo.output_height;
  const int comps = d.cinfo.output_components;
  if (w * h * 3 > out_cap || (comps != 1 && comps != 3)) return -5;

  if (comps == 3) {
    while (d.cinfo.output_scanline < d.cinfo.output_height) {
      uint8_t* row = out + int64_t(d.cinfo.output_scanline) * w * 3;
      jpeg_read_scanlines(&d.cinfo, &row, 1);
    }
  } else {
    std::vector<uint8_t> gray(w);
    while (d.cinfo.output_scanline < d.cinfo.output_height) {
      uint8_t* g = gray.data();
      int64_t y = d.cinfo.output_scanline;
      jpeg_read_scanlines(&d.cinfo, &g, 1);
      uint8_t* row = out + y * w * 3;
      for (int64_t x = 0; x < w; x++)
        row[x * 3] = row[x * 3 + 1] = row[x * 3 + 2] = gray[x];
    }
  }
  jpeg_finish_decompress(&d.cinfo);
  return 0;
}

}  // extern "C"
