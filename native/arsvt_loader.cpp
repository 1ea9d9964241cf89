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
//   arsvt_load_batch_ex(..., flags, ...) — flags bit0 enables DCT-domain
//     scaled JPEG decode (libjpeg scale_num/8: decode directly at the
//     smallest 1/8-step scale whose longest side is still >= canvas —
//     skips most IDCT + color-convert work on downscales, e.g. ~(3/8)^2
//     of the full-decode cost for 640x480 -> 224); out_meta rows are 6
//     wide: [scale, pad_x, pad_y, ok, dec_w, dec_h] where dec_* are the
//     post-EXIF dims the letterbox actually consumed (box transforms use
//     them instead of re-deriving scaled dims in Python)
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

// Minimal EXIF parse: APP1 "Exif\0\0" -> TIFF IFD0 -> tag 0x0112
// (Orientation, SHORT). Returns 1-8, or 0 when absent/garbled. Sorter
// cameras write rotated frames with only this tag to say so — ignoring
// it (as the reference's cv2.imread does, train.py:100) silently feeds
// sideways images to the model.
int parse_exif_orientation(const uint8_t* d, unsigned len) {
  if (len < 14 || memcmp(d, "Exif\0\0", 6) != 0) return 0;
  const uint8_t* t = d + 6;
  const unsigned n = len - 6;
  bool le;
  if (t[0] == 'I' && t[1] == 'I') le = true;
  else if (t[0] == 'M' && t[1] == 'M') le = false;
  else return 0;
  auto u16 = [&](unsigned off) -> unsigned {
    if (off + 2 > n) return 0;
    return le ? (t[off] | (t[off + 1] << 8))
              : ((t[off] << 8) | t[off + 1]);
  };
  auto u32 = [&](unsigned off) -> unsigned {
    if (off + 4 > n) return 0;
    return le ? (t[off] | (t[off + 1] << 8) | (t[off + 2] << 16) |
                 (unsigned(t[off + 3]) << 24))
              : ((unsigned(t[off]) << 24) | (t[off + 1] << 16) |
                 (t[off + 2] << 8) | t[off + 3]);
  };
  if (u16(2) != 42) return 0;
  const unsigned ifd = u32(4);
  if (ifd == 0 || ifd + 2 > n) return 0;
  const unsigned count = u16(ifd);
  for (unsigned i = 0; i < count; i++) {
    const unsigned e = ifd + 2 + i * 12;
    if (e + 12 > n) break;
    if (u16(e) == 0x0112 && u16(e + 2) == 3) {  // Orientation, SHORT
      const unsigned v = u16(e + 8);
      if (v >= 1 && v <= 8) return int(v);
    }
  }
  return 0;
}

// Rewrite the pixel buffer so the image displays upright (the same
// transforms as PIL.ImageOps.exif_transpose; validated against it in
// tests/test_native_loader.py).
void apply_orientation(Image* img, int o) {
  if (o <= 1 || o > 8) return;
  const int w = img->w, h = img->h;
  const bool swap = o >= 5;
  const int nw = swap ? h : w, nh = swap ? w : h;
  std::vector<uint8_t> out(size_t(nw) * nh * 3);
  for (int y = 0; y < h; y++) {
    const uint8_t* src = &img->rgb[size_t(y) * w * 3];
    for (int x = 0; x < w; x++) {
      int dx = x, dy = y;
      switch (o) {
        case 2: dx = w - 1 - x; dy = y; break;          // mirror H
        case 3: dx = w - 1 - x; dy = h - 1 - y; break;  // rotate 180
        case 4: dx = x; dy = h - 1 - y; break;          // mirror V
        case 5: dx = y; dy = x; break;                  // transpose
        case 6: dx = h - 1 - y; dy = x; break;          // rotate 90 CW
        case 7: dx = h - 1 - y; dy = w - 1 - x; break;  // transverse
        case 8: dx = y; dy = w - 1 - x; break;          // rotate 90 CCW
      }
      memcpy(&out[(size_t(dy) * nw + dx) * 3], src + size_t(x) * 3, 3);
    }
  }
  img->rgb.swap(out);
  img->w = nw;
  img->h = nh;
}

// Smallest libjpeg scale_num M in 1..8 with ceil(longest*M/8) >=
// min_longest (libjpeg computes output dims as ceil(dim*M/8)); 8 = full.
int jpeg_scale_num(int longest, int min_longest) {
  if (min_longest <= 0 || longest <= min_longest) return 8;
  for (int m = 1; m < 8; m++) {
    if (((long long)longest * m + 7) / 8 >= (long long)min_longest) {
      return m;
    }
  }
  return 8;
}

bool decode_jpeg(FILE* f, Image* out, int* orientation,
                 int min_longest = 0) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_save_markers(&cinfo, JPEG_APP0 + 1, 0xFFFF);  // keep EXIF APP1
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  for (jpeg_saved_marker_ptr m = cinfo.marker_list; m; m = m->next) {
    if (m->marker == JPEG_APP0 + 1 && *orientation == 0) {
      *orientation = parse_exif_orientation(m->data, m->data_length);
    }
  }
  cinfo.out_color_space = JCS_RGB;
  if (min_longest > 0) {
    // Scaling happens pre-EXIF-rotation; the longest side is invariant
    // under the transposing orientations, so the M choice is too.
    const int longest = (int)std::max(cinfo.image_width,
                                      cinfo.image_height);
    const int m = jpeg_scale_num(longest, min_longest);
    if (m < 8) {
      cinfo.scale_num = m;
      cinfo.scale_denom = 8;
    }
  }
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

bool decode_file(const char* path, Image* out, int min_longest = 0) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[8] = {0};
  size_t n = fread(magic, 1, 8, f);
  rewind(f);
  bool ok = false;
  int orientation = 0;
  if (n >= 2 && magic[0] == 0xFF && magic[1] == 0xD8) {
    ok = decode_jpeg(f, out, &orientation, min_longest);
  } else if (n >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, out);  // PNG has no DCT scaling; full decode
  }
  fclose(f);
  if (ok && orientation > 1) apply_orientation(out, orientation);
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
  // scale reported against the ORIGINAL dims; box transforms recompute
  // the exact resized dims by replicating the box-reduce + lround math
  // above IN FP32 (native_loader._native_resized_dims — the reciprocal
  // for k must be fp32 like this file's, or exact >=3x ratios diverge),
  // so boxes align with the pixels even when the prefilter changed the
  // rounding by 1px.
  meta[0] = float(canvas) / float(std::max(img_in.w, img_in.h));
  meta[1] = float(pad_x);
  meta[2] = float(pad_y);
  meta[3] = 1.0f;  // ok
}

template <typename OutT>
int load_batch_impl(const char** paths, int n, int canvas, int threads,
                    OutT* out_images, float* out_meta, int flags = 0,
                    int meta_stride = 4) {
  if (n <= 0 || canvas <= 0) return -1;
  const int min_longest = (flags & 1) ? canvas : 0;
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      OutT* out = out_images + size_t(i) * canvas * canvas * 3;
      float* meta = out_meta + size_t(i) * meta_stride;
      Image img;
      if (decode_file(paths[i], &img, min_longest)) {
        letterbox_into(img, canvas, out, meta);
        if (meta_stride >= 6) {
          meta[4] = float(img.w);  // post-EXIF dims the letterbox consumed
          meta[5] = float(img.h);
        }
      } else {
        std::memset(out, 0, size_t(canvas) * canvas * 3 * sizeof(OutT));
        meta[0] = 1.0f;
        meta[1] = meta[2] = 0.0f;
        meta[3] = 0.0f;
        if (meta_stride >= 6) meta[4] = meta[5] = 0.0f;
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

// _ex variants: `flags` bit0 = DCT-domain scaled JPEG decode (header
// comment). out_meta rows are SIX floats: [scale, pad_x, pad_y, ok,
// dec_w, dec_h]; dec_* are the post-EXIF decoded dims (full dims for
// PNG/unscaled JPEG), 0 on decode failure.
int arsvt_load_batch_ex(const char** paths, int n, int canvas, int threads,
                        int flags, float* out_images, float* out_meta) {
  return load_batch_impl(paths, n, canvas, threads, out_images, out_meta,
                         flags, 6);
}

int arsvt_load_batch_u8_ex(const char** paths, int n, int canvas,
                           int threads, int flags, uint8_t* out_images,
                           float* out_meta) {
  return load_batch_impl(paths, n, canvas, threads, out_images, out_meta,
                         flags, 6);
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

// Raw upright RGB bytes for one image (debug/test surface): probe first
// for w/h, then call with an h*w*3 buffer. EXIF orientation is applied —
// w/h are the upright dimensions. Returns 0 ok, -1 undecodable, -2 cap
// too small.
int arsvt_decode_raw(const char* path, uint8_t* out, long long cap) {
  Image img;
  if (!decode_file(path, &img)) return -1;
  const long long need = (long long)img.w * img.h * 3;
  if (need > cap) return -2;
  memcpy(out, img.rgb.data(), size_t(need));
  return 0;
}
}
