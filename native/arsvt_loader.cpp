// arsvt native data-loader core.
//
// The reference outsources its input pipeline to OpenCV C++ inside 16
// fork'd python DataLoader workers (/root/reference/train.py:15-17,
// 1528-1545; cv2.imread at train.py:100). This is the TPU framework's
// first-party native equivalent: a C++ thread pool that decodes JPEG/PNG
// (libjpeg/libpng), converts to fp32 RGB [0,1], resizes the longest side
// to a square canvas (bilinear) and center-pads with reflection — writing
// every image of a batch directly into one contiguous caller-owned
// (B, canvas, canvas, 3) buffer ready for the host→device transfer. No
// per-image Python objects, no pickling, no fork.
//
// Exposed C ABI (ctypes-bound in arsvt_tpu/data/native_loader.py):
//   arsvt_load_batch(paths, n, canvas, threads, out_images, out_meta)
//     out_meta per image: [scale, pad_x, pad_y, ok]
//   arsvt_decode_image(path, &w, &h)  (debug/single-image helper)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <type_traits>
#include <vector>

#include <jpeglib.h>
#include <png.h>
#include <setjmp.h>

namespace {

struct Image {
  int w = 0, h = 0;
  std::vector<uint8_t> rgb;  // h*w*3
};

// ----------------------------------------------------------- JPEG decode

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

bool decode_jpeg(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->rgb.resize(size_t(out->w) * out->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->rgb.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ------------------------------------------------------------ PNG decode

bool decode_png(FILE* f, Image* out) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_expand(png);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out->w = png_get_image_width(png, info);
  out->h = png_get_image_height(png, info);
  out->rgb.resize(size_t(out->w) * out->h * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; y++)
    rows[y] = out->rgb.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t n = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  if (n >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out);
  } else if (n >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, out);
  }
  fclose(f);
  return ok && out->w > 0 && out->h > 0;
}

// --------------------------------------------- resize + letterbox to fp32

inline int reflect101(int i, int n) {
  // OpenCV BORDER_REFLECT_101: ... 2 1 | 0 1 2 ... n-1 | n-2 n-3 ...
  if (n == 1) return 0;
  while (i < 0 || i >= n) {
    if (i < 0) i = -i;
    if (i >= n) i = 2 * n - 2 - i;
  }
  return i;
}

// Bilinear resize (nh, nw) then center reflect-pad into the canvas.
// OutT=float writes fp32 RGB [0,1]; OutT=uint8_t writes raw 0..255 bytes —
// 4x less host RAM and H2D traffic (the device casts/scales at the top of
// the jitted step). Returns scale/pads via meta.
//
// The resize is SEPARABLE (horizontal pass into a (h, nw) temp, then
// vertical pass) with per-axis coefficients precomputed once — the naive
// per-output-pixel 4-tap gather thrashed the cache and fell off a cliff
// (223 -> 7 img/s) once the working set passed ~1.5 MB.
template <typename OutT>
void letterbox_into(const Image& img_in, int canvas, OutT* out, float* meta) {
  // Antialias large downscales: 2-tap bilinear aliases badly past ~2x, so
  // box-reduce by the integer factor first (PIL/cv2 area semantics), then
  // bilinear the remainder.
  Image reduced;
  const Image* img_p = &img_in;
  {
    const float s0 = float(canvas) / float(std::max(img_in.w, img_in.h));
    const int k = std::max(1, int(1.0f / std::max(s0, 1e-6f)));
    if (k >= 2) {
      const int rw = std::max(1, img_in.w / k), rh = std::max(1, img_in.h / k);
      reduced.w = rw;
      reduced.h = rh;
      reduced.rgb.resize(size_t(rw) * rh * 3);
      const float inv = 1.0f / float(k * k);
      for (int y = 0; y < rh; y++) {
        for (int x = 0; x < rw; x++) {
          int acc[3] = {0, 0, 0};
          for (int dy = 0; dy < k; dy++) {
            const uint8_t* row =
                &img_in.rgb[(size_t(y * k + dy) * img_in.w + x * k) * 3];
            for (int dx = 0; dx < k; dx++) {
              acc[0] += row[dx * 3 + 0];
              acc[1] += row[dx * 3 + 1];
              acc[2] += row[dx * 3 + 2];
            }
          }
          uint8_t* dst = &reduced.rgb[(size_t(y) * rw + x) * 3];
          dst[0] = uint8_t(std::lround(acc[0] * inv));
          dst[1] = uint8_t(std::lround(acc[1] * inv));
          dst[2] = uint8_t(std::lround(acc[2] * inv));
        }
      }
      img_p = &reduced;
    }
  }
  const Image& img = *img_p;
  const int w = img.w, h = img.h;
  const float scale = float(canvas) / float(std::max(w, h));
  const int nw = std::max(1, int(std::lround(w * scale)));
  const int nh = std::max(1, int(std::lround(h * scale)));
  const int pad_x = (canvas - nw) / 2;
  const int pad_y = (canvas - nh) / 2;

  // precompute taps (align_corners=False, matches PIL/cv2 bilinear)
  const float sx = float(w) / nw, sy = float(h) / nh;
  std::vector<int> x0(nw), x1(nw);
  std::vector<float> wx(nw);
  for (int x = 0; x < nw; x++) {
    float fx = (x + 0.5f) * sx - 0.5f;
    int xi = int(std::floor(fx));
    wx[x] = fx - xi;
    x0[x] = std::clamp(xi, 0, w - 1);
    x1[x] = std::clamp(xi + 1, 0, w - 1);
  }
  std::vector<int> y0(nh), y1(nh);
  std::vector<float> wy(nh);
  for (int y = 0; y < nh; y++) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int yi = int(std::floor(fy));
    wy[y] = fy - yi;
    y0[y] = std::clamp(yi, 0, h - 1);
    y1[y] = std::clamp(yi + 1, 0, h - 1);
  }

  // horizontal pass: (h, w) -> (h, nw), sequential reads and writes
  std::vector<float> hpass(size_t(h) * nw * 3);
  for (int y = 0; y < h; y++) {
    const uint8_t* src = &img.rgb[size_t(y) * w * 3];
    float* dst = &hpass[size_t(y) * nw * 3];
    for (int x = 0; x < nw; x++) {
      const uint8_t* a = &src[size_t(x0[x]) * 3];
      const uint8_t* b = &src[size_t(x1[x]) * 3];
      const float t = wx[x];
      dst[x * 3 + 0] = a[0] + (b[0] - a[0]) * t;
      dst[x * 3 + 1] = a[1] + (b[1] - a[1]) * t;
      dst[x * 3 + 2] = a[2] + (b[2] - a[2]) * t;
    }
  }

  // vertical pass: (h, nw) -> (nh, nw), two sequential row reads per row.
  // fp32 output scales to [0,1]; uint8 output rounds back to bytes.
  std::vector<OutT> resized(size_t(nh) * nw * 3);
  constexpr float inv255 = 1.0f / 255.0f;
  for (int y = 0; y < nh; y++) {
    const float* a = &hpass[size_t(y0[y]) * nw * 3];
    const float* b = &hpass[size_t(y1[y]) * nw * 3];
    const float t = wy[y];
    OutT* dst = &resized[size_t(y) * nw * 3];
    for (int i = 0; i < nw * 3; i++) {
      const float v = a[i] + (b[i] - a[i]) * t;
      if constexpr (std::is_same_v<OutT, uint8_t>) {
        dst[i] = uint8_t(std::lround(std::min(std::max(v, 0.0f), 255.0f)));
      } else {
        dst[i] = v * inv255;
      }
    }
  }
  for (int y = 0; y < canvas; y++) {
    int sy_i = reflect101(y - pad_y, nh);
    const OutT* src_row = &resized[size_t(sy_i) * nw * 3];
    OutT* dst_row = out + size_t(y) * canvas * 3;
    for (int x = 0; x < canvas; x++) {
      int sx_i = reflect101(x - pad_x, nw);
      const OutT* s = &src_row[size_t(sx_i) * 3];
      OutT* d = &dst_row[size_t(x) * 3];
      d[0] = s[0];
      d[1] = s[1];
      d[2] = s[2];
    }
  }
  // scale reported against the ORIGINAL dims (box transforms recompute
  // nw/nh from it); with the box prefilter the internal dims may differ by
  // <=1px of rounding, which is negligible for boxes.
  meta[0] = float(canvas) / float(std::max(img_in.w, img_in.h));
  meta[1] = float(pad_x);
  meta[2] = float(pad_y);
  meta[3] = 1.0f;  // ok
}

template <typename OutT>
int load_batch_impl(const char** paths, int n, int canvas, int threads,
                    OutT* out_images, float* out_meta) {
  if (n <= 0 || canvas <= 0) return -1;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      OutT* out = out_images + size_t(i) * canvas * canvas * 3;
      float* meta = out_meta + size_t(i) * 4;
      Image img;
      if (decode_file(paths[i], &img)) {
        letterbox_into(img, canvas, out, meta);
      } else {
        std::memset(out, 0, size_t(canvas) * canvas * 3 * sizeof(OutT));
        meta[0] = 1.0f;
        meta[1] = meta[2] = 0.0f;
        meta[3] = 0.0f;
        failures.fetch_add(1);
      }
    }
  };
  int nt = std::max(1, std::min(threads, n));
  std::vector<std::thread> pool;
  pool.reserve(nt - 1);
  for (int t = 1; t < nt; t++) pool.emplace_back(worker);
  worker();
  for (auto& t : pool) t.join();
  return failures.load();
}

}  // namespace

extern "C" {

// paths: array of n C strings. out_images: n*canvas*canvas*3 fp32 [0,1].
// out_meta: n*4 fp32 = [scale, pad_x, pad_y, ok] per image (ok=0 -> image
// unreadable; its pixels are zeroed).
int arsvt_load_batch(const char** paths, int n, int canvas, int threads,
                     float* out_images, float* out_meta) {
  return load_batch_impl(paths, n, canvas, threads, out_images, out_meta);
}

// uint8 variant: out_images is n*canvas*canvas*3 raw bytes — 4x less host
// RAM and host->device traffic; the device rescales to [0,1] in the step.
int arsvt_load_batch_u8(const char** paths, int n, int canvas, int threads,
                        uint8_t* out_images, float* out_meta) {
  return load_batch_impl(paths, n, canvas, threads, out_images, out_meta);
}

// Single-image decode helper (streaming sorter path): returns 0 on success
// and fills w/h; caller then calls arsvt_load_batch for the pixel data.
int arsvt_probe_image(const char* path, int* w, int* h) {
  Image img;
  if (!decode_file(path, &img)) return -1;
  *w = img.w;
  *h = img.h;
  return 0;
}
}
