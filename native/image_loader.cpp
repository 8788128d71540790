// Native image loader for the data pipeline: fused decode -> cover-resize ->
// crop, called from Python via ctypes (no pybind11 in this environment).
//
// The win over PIL: libjpeg's DCT-scaled decoding decodes directly at
// 1/1..1/8 scale, so a 4000px photo headed for a 1024px bucket never
// materializes at full resolution; the bilinear resample then runs over far
// fewer pixels, in C, without the Python object layer.
//
// The reference framework has no native code (pure torch); this replaces its
// PIL ObjectCoverResize + random_crop hot path
// (src/dataset/transform.py:11-55, src/dataset/text_to_image.py:170-183).
//
// API (all return 0 on success, negative errno-style codes on failure):
//   vptpu_probe(path, &w, &h)        -> image dimensions without full decode
//   vptpu_load_cover_crop(path, target_w, target_h, crop_x, crop_y, out)
//       decode; resize so the image covers (target_w, target_h) preserving
//       aspect (cover_w = max(target_w, round(w*target_h/h)) etc.); crop the
//       (crop_x, crop_y, target_w, target_h) window; write RGB8 rows to out.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <csetjmp>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <webp/decode.h>

namespace {

constexpr int kOk = 0;
constexpr int kErrOpen = -1;
constexpr int kErrDecode = -2;
constexpr int kErrFormat = -3;
constexpr int kErrArgs = -4;

struct Image {
  int w = 0;
  int h = 0;
  std::vector<uint8_t> rgb;  // h * w * 3
};

// ------------------------------------------------------------------ jpeg

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jmp, 1);
}

bool has_suffix(const char* path, const char* a, const char* b = nullptr) {
  size_t n = strlen(path);
  auto ends = [&](const char* s) {
    size_t m = strlen(s);
    if (m > n) return false;
    for (size_t i = 0; i < m; i++) {
      char c = path[n - m + i];
      if (c >= 'A' && c <= 'Z') c += 32;
      if (c != s[i]) return false;
    }
    return true;
  };
  return ends(a) || (b && ends(b));
}

// decode a JPEG with DCT scaling chosen so the decoded size stays >= the
// cover size (never upscale from a scaled decode)
int decode_jpeg(FILE* f, double min_scale, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return kErrDecode;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  // pick the smallest DCT scale 1/1..1/8 that still covers min_scale
  // (min_scale = cover_w / src_w <= 1 when downscaling)
  cinfo.scale_num = 1;
  cinfo.scale_denom = 1;
  for (int denom = 8; denom >= 1; denom--) {
    if (1.0 / denom >= min_scale) {
      cinfo.scale_denom = denom;
      break;
    }
  }
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  int comps = cinfo.output_components;
  if (comps != 3 && comps != 1) {
    jpeg_destroy_decompress(&cinfo);
    return kErrFormat;
  }
  out->rgb.resize(static_cast<size_t>(out->w) * out->h * 3);
  std::vector<uint8_t> row(static_cast<size_t>(out->w) * comps);
  uint8_t* rowp = row.data();
  for (int y = 0; y < out->h; y++) {
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    uint8_t* dst = out->rgb.data() + static_cast<size_t>(y) * out->w * 3;
    if (comps == 3) {
      memcpy(dst, rowp, static_cast<size_t>(out->w) * 3);
    } else {
      for (int x = 0; x < out->w; x++) {
        dst[3 * x] = dst[3 * x + 1] = dst[3 * x + 2] = rowp[x];
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return kOk;
}

int probe_jpeg(FILE* f, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    return kErrDecode;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return kOk;
}

// ------------------------------------------------------------------- png

int decode_png(FILE* f, Image* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return kErrDecode;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return kErrDecode;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return kErrDecode;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  size_t rowbytes = png_get_rowbytes(png, info);
  if (rowbytes < static_cast<size_t>(out->w) * 3) {
    png_destroy_read_struct(&png, &info, nullptr);
    return kErrFormat;
  }
  out->rgb.resize(static_cast<size_t>(out->w) * out->h * 3);
  std::vector<uint8_t> row(rowbytes);
  for (int y = 0; y < out->h; y++) {
    png_read_row(png, row.data(), nullptr);
    memcpy(out->rgb.data() + static_cast<size_t>(y) * out->w * 3, row.data(),
           static_cast<size_t>(out->w) * 3);
  }
  png_destroy_read_struct(&png, &info, nullptr);
  return kOk;
}

int probe_png(FILE* f, int* w, int* h) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return kErrDecode;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return kErrDecode;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return kErrDecode;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  *w = png_get_image_width(png, info);
  *h = png_get_image_height(png, info);
  png_destroy_read_struct(&png, &info, nullptr);
  return kOk;
}

// ------------------------------------------------------------------ webp

int read_all(FILE* f, std::vector<uint8_t>* buf) {
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (n <= 0) return kErrOpen;
  buf->resize(n);
  if (fread(buf->data(), 1, n, f) != static_cast<size_t>(n)) return kErrOpen;
  return kOk;
}

int decode_webp(FILE* f, Image* out) {
  std::vector<uint8_t> data;
  int rc = read_all(f, &data);
  if (rc != kOk) return rc;
  int w, h;
  if (!WebPGetInfo(data.data(), data.size(), &w, &h)) return kErrDecode;
  out->w = w;
  out->h = h;
  out->rgb.resize(static_cast<size_t>(w) * h * 3);
  if (!WebPDecodeRGBInto(data.data(), data.size(), out->rgb.data(),
                         out->rgb.size(), w * 3)) {
    return kErrDecode;
  }
  return kOk;
}

int probe_webp(FILE* f, int* w, int* h) {
  uint8_t header[32];
  size_t n = fread(header, 1, sizeof(header), f);
  if (!WebPGetInfo(header, n, w, h)) return kErrDecode;
  return kOk;
}

// ---------------------------------------------------------------- resize

// PIL-style separable triangle (antialiased bilinear) resampling, fused with
// the crop: only the tw x th output window is computed. When downscaling, the
// filter support widens by the scale factor — PIL's antialias behavior — so
// the result tracks Image.resize(..., BILINEAR) closely.
struct FilterTaps {
  std::vector<int> start;       // first source index per output pixel
  std::vector<int> count;       // taps per output pixel
  std::vector<double> weights;  // flattened, max_taps per output pixel
  int max_taps = 0;
};

FilterTaps build_taps(int src_size, int out_size_full, int crop0, int out_n) {
  FilterTaps taps;
  const double scale = static_cast<double>(src_size) / out_size_full;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = 1.0 * filterscale;  // triangle filter support
  taps.max_taps = static_cast<int>(std::ceil(support) * 2 + 1);
  taps.start.resize(out_n);
  taps.count.resize(out_n);
  taps.weights.assign(static_cast<size_t>(out_n) * taps.max_taps, 0.0);
  for (int o = 0; o < out_n; o++) {
    double center = (crop0 + o + 0.5) * scale;
    int lo = static_cast<int>(center - support + 0.5);
    int hi = static_cast<int>(center + support + 0.5);
    if (lo < 0) lo = 0;
    if (hi > src_size) hi = src_size;
    taps.start[o] = lo;
    taps.count[o] = hi - lo;
    double total = 0.0;
    double* w = taps.weights.data() + static_cast<size_t>(o) * taps.max_taps;
    for (int i = 0; i < hi - lo; i++) {
      double d = (lo + i - center + 0.5) / filterscale;
      double v = d < 0 ? 1.0 + d : 1.0 - d;
      if (v < 0) v = 0;
      w[i] = v;
      total += v;
    }
    if (total > 0) {
      for (int i = 0; i < hi - lo; i++) w[i] /= total;
    }
  }
  return taps;
}

void resize_crop_bilinear(const Image& src, int cover_w, int cover_h,
                          int crop_x, int crop_y, int tw, int th,
                          uint8_t* out) {
  FilterTaps hx = build_taps(src.w, cover_w, crop_x, tw);
  FilterTaps vy = build_taps(src.h, cover_h, crop_y, th);

  // horizontal pass over only the source rows the vertical pass touches
  int row_lo = vy.start[0];
  int row_hi = vy.start[th - 1] + vy.count[th - 1];
  int n_rows = row_hi - row_lo;
  std::vector<float> tmp(static_cast<size_t>(n_rows) * tw * 3);
  for (int y = 0; y < n_rows; y++) {
    const uint8_t* srow =
        src.rgb.data() + static_cast<size_t>(row_lo + y) * src.w * 3;
    float* drow = tmp.data() + static_cast<size_t>(y) * tw * 3;
    for (int ox = 0; ox < tw; ox++) {
      const double* w =
          hx.weights.data() + static_cast<size_t>(ox) * hx.max_taps;
      int s0 = hx.start[ox];
      double r = 0, g = 0, b = 0;
      for (int i = 0; i < hx.count[ox]; i++) {
        const uint8_t* p = srow + 3 * (s0 + i);
        r += w[i] * p[0];
        g += w[i] * p[1];
        b += w[i] * p[2];
      }
      drow[3 * ox] = static_cast<float>(r);
      drow[3 * ox + 1] = static_cast<float>(g);
      drow[3 * ox + 2] = static_cast<float>(b);
    }
  }
  // vertical pass
  for (int oy = 0; oy < th; oy++) {
    const double* w =
        vy.weights.data() + static_cast<size_t>(oy) * vy.max_taps;
    int s0 = vy.start[oy] - row_lo;
    uint8_t* dst = out + static_cast<size_t>(oy) * tw * 3;
    for (int ox = 0; ox < tw; ox++) {
      double acc[3] = {0, 0, 0};
      for (int i = 0; i < vy.count[oy]; i++) {
        const float* p =
            tmp.data() + (static_cast<size_t>(s0 + i) * tw + ox) * 3;
        acc[0] += w[i] * p[0];
        acc[1] += w[i] * p[1];
        acc[2] += w[i] * p[2];
      }
      for (int c = 0; c < 3; c++) {
        double v = acc[c] + 0.5;
        if (v < 0) v = 0;
        if (v > 255) v = 255;
        dst[3 * ox + c] = static_cast<uint8_t>(v);
      }
    }
  }
}

int decode_any(const char* path, double min_scale, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return kErrOpen;
  int rc;
  if (has_suffix(path, ".jpg", ".jpeg")) {
    rc = decode_jpeg(f, min_scale, out);
  } else if (has_suffix(path, ".png")) {
    rc = decode_png(f, out);
  } else if (has_suffix(path, ".webp")) {
    rc = decode_webp(f, out);
  } else {
    rc = kErrFormat;
  }
  fclose(f);
  return rc;
}

}  // namespace

extern "C" {

// cover dims for (src_w, src_h) -> at least (target_w, target_h), preserving
// aspect; mirrors ObjectCoverResize (round half away from zero like PIL)
void vptpu_cover_dims(int src_w, int src_h, int target_w, int target_h,
                      int* cover_w, int* cover_h) {
  double scale_w = static_cast<double>(target_w) / src_w;
  double scale_h = static_cast<double>(target_h) / src_h;
  double scale = scale_w > scale_h ? scale_w : scale_h;
  int cw = static_cast<int>(std::lround(src_w * scale));
  int ch = static_cast<int>(std::lround(src_h * scale));
  *cover_w = cw > target_w ? cw : target_w;
  *cover_h = ch > target_h ? ch : target_h;
}

int vptpu_probe(const char* path, int* w, int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return kErrOpen;
  int rc;
  if (has_suffix(path, ".jpg", ".jpeg")) {
    rc = probe_jpeg(f, w, h);
  } else if (has_suffix(path, ".png")) {
    rc = probe_png(f, w, h);
  } else if (has_suffix(path, ".webp")) {
    rc = probe_webp(f, w, h);
  } else {
    rc = kErrFormat;
  }
  fclose(f);
  return rc;
}

int vptpu_load_cover_crop(const char* path, int target_w, int target_h,
                          int crop_x, int crop_y, uint8_t* out) {
  if (target_w <= 0 || target_h <= 0 || crop_x < 0 || crop_y < 0 || !out) {
    return kErrArgs;
  }
  int src_w, src_h;
  int rc = vptpu_probe(path, &src_w, &src_h);
  if (rc != kOk) return rc;
  int cover_w, cover_h;
  vptpu_cover_dims(src_w, src_h, target_w, target_h, &cover_w, &cover_h);
  if (crop_x + target_w > cover_w || crop_y + target_h > cover_h) {
    return kErrArgs;
  }
  double min_scale = static_cast<double>(cover_w) / src_w;
  Image img;
  rc = decode_any(path, min_scale, &img);
  if (rc != kOk) return rc;
  resize_crop_bilinear(img, cover_w, cover_h, crop_x, crop_y, target_w,
                       target_h, out);
  return kOk;
}

}  // extern "C"
