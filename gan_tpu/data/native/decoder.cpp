// gan_tpu native host loader: multi-threaded PNG/JPEG decode + preprocess.
//
// The host-side hot loop of the input pipeline (the role tf.data's C++
// runtime played for the reference — SURVEY §2.9 "decode_png/jpeg"): decode,
// grayscale/RGB channel conversion, pair split at w/2, and TF-parity
// nearest-neighbor resize, all in C++ with a std::thread pool. Exposed as a
// C ABI consumed via ctypes (gan_tpu/data/native/__init__.py); results are
// bit-identical to the PIL path (tests/test_native.py).
//
// Build: make -C gan_tpu/data/native   (links libpng, libjpeg, libz)

#include <png.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

extern "C" {
#include <jpeglib.h>
}

namespace {

struct Image {
  std::vector<uint8_t> data;  // H * W * C, C in {1, 3}
  int h = 0, w = 0, c = 0;
};

// ---------------------------------------------------------------- decode

bool decode_png_file(FILE* f, Image* out) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
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

  png_uint_32 w, h;
  int bit_depth, color_type;
  png_get_IHDR(png, info, &w, &h, &bit_depth, &color_type, nullptr, nullptr,
               nullptr);

  // normalize to 8-bit gray or RGB
  if (bit_depth == 16) png_set_strip_16(png);
  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  out->h = static_cast<int>(h);
  out->w = static_cast<int>(w);
  out->c = channels;
  out->data.resize(static_cast<size_t>(h) * w * channels);
  std::vector<png_bytep> rows(h);
  size_t stride = static_cast<size_t>(w) * channels;
  for (png_uint_32 y = 0; y < h; ++y) rows[y] = out->data.data() + y * stride;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  return channels == 1 || channels == 3;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jump, 1);
}

bool decode_jpeg_file(FILE* f, Image* out) {
  jpeg_decompress_struct cinfo;
  JpegErr err;
  cinfo.err = jpeg_std_error(&err.mgr);
  err.mgr.error_exit = jpeg_err_exit;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = cinfo.num_components == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->c = cinfo.output_components;
  out->data.resize(static_cast<size_t>(out->h) * out->w * out->c);
  size_t stride = static_cast<size_t>(out->w) * out->c;
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->data.data() + cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return out->c == 1 || out->c == 3;
}

bool decode_file(const char* path, Image* out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[2] = {0, 0};
  if (std::fread(magic, 1, 2, f) != 2) {
    std::fclose(f);
    return false;
  }
  std::rewind(f);
  bool ok = (magic[0] == 0x89 && magic[1] == 'P') ? decode_png_file(f, out)
                                                  : decode_jpeg_file(f, out);
  std::fclose(f);
  return ok;
}

// ------------------------------------------------------- channel convert

// PIL convert("L") integer luma: (R*19595 + G*38470 + B*7471 + 0x8000) >> 16
void to_channels(const Image& in, int channels, Image* out) {
  if (in.c == channels) {
    *out = in;
    return;
  }
  out->h = in.h;
  out->w = in.w;
  out->c = channels;
  size_t n = static_cast<size_t>(in.h) * in.w;
  out->data.resize(n * channels);
  if (channels == 1) {  // RGB -> L
    for (size_t i = 0; i < n; ++i) {
      const uint8_t* p = &in.data[i * 3];
      out->data[i] = static_cast<uint8_t>(
          (p[0] * 19595u + p[1] * 38470u + p[2] * 7471u + 0x8000u) >> 16);
    }
  } else {  // L -> RGB
    for (size_t i = 0; i < n; ++i) {
      uint8_t v = in.data[i];
      out->data[i * 3] = v;
      out->data[i * 3 + 1] = v;
      out->data[i * 3 + 2] = v;
    }
  }
}

// ------------------------------------------------------------ nearest NN

// TF2 half-pixel nearest (ops/resize.py): src = min(floor((d+0.5)*in/out), in-1)
void nearest_indices(int in_size, int out_size, std::vector<int>* idx) {
  idx->resize(out_size);
  double scale = static_cast<double>(in_size) / out_size;
  for (int d = 0; d < out_size; ++d) {
    int s = static_cast<int>((d + 0.5) * scale);
    (*idx)[d] = s < in_size - 1 ? s : in_size - 1;
  }
}

// resize a subrect [x0, x1) of src into dst (out_h, out_w, c)
void resize_nearest(const Image& src, int x0, int x1, int out_h, int out_w,
                    uint8_t* dst) {
  int in_w = x1 - x0;
  std::vector<int> rows, cols;
  nearest_indices(src.h, out_h, &rows);
  nearest_indices(in_w, out_w, &cols);
  int c = src.c;
  size_t src_stride = static_cast<size_t>(src.w) * c;
  for (int y = 0; y < out_h; ++y) {
    const uint8_t* srow = src.data.data() + rows[y] * src_stride;
    uint8_t* drow = dst + static_cast<size_t>(y) * out_w * c;
    for (int x = 0; x < out_w; ++x) {
      std::memcpy(drow + static_cast<size_t>(x) * c,
                  srow + static_cast<size_t>(x0 + cols[x]) * c, c);
    }
  }
}

int load_pair_one(const char* path, int channels, int orient_left, int size,
                  uint8_t* out) {
  Image raw, img;
  if (!decode_file(path, &raw)) return 1;
  to_channels(raw, channels, &img);
  int w2 = img.w / 2;
  // halves: left [0, w2), right [w2, img.w) — pix2pix.py:43-52
  int in_x0 = orient_left ? 0 : w2, in_x1 = orient_left ? w2 : img.w;
  int tr_x0 = orient_left ? w2 : 0, tr_x1 = orient_left ? img.w : w2;
  size_t half = static_cast<size_t>(size) * size * channels;
  resize_nearest(img, in_x0, in_x1, size, size, out);
  resize_nearest(img, tr_x0, tr_x1, size, size, out + half);
  return 0;
}

int load_single_one(const char* path, int channels, int img_size, int out_size,
                    uint8_t* out) {
  Image raw, img;
  if (!decode_file(path, &raw)) return 1;
  to_channels(raw, channels, &img);
  if (img_size == out_size) {
    resize_nearest(img, 0, img.w, out_size, out_size, out);
    return 0;
  }
  // chain: load-resize to img_size, then jitter pre-resize to out_size
  // (cycle_gan.py:55,71 — two nearest resizes, not one)
  Image mid;
  mid.h = mid.w = img_size;
  mid.c = channels;
  mid.data.resize(static_cast<size_t>(img_size) * img_size * channels);
  resize_nearest(img, 0, img.w, img_size, img_size, mid.data.data());
  resize_nearest(mid, 0, img_size, out_size, out_size, out);
  return 0;
}

template <typename Fn>
int parallel_files(const char** paths, int n, int n_threads, size_t item_bytes,
                   uint8_t* out, Fn fn) {
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> threads;
  std::vector<int> errors(n_threads, 0);
  int per = (n + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    threads.emplace_back([=, &errors]() {
      int lo = t * per, hi = lo + per < n ? lo + per : n;
      for (int i = lo; i < hi; ++i) {
        if (fn(paths[i], out + static_cast<size_t>(i) * item_bytes) != 0)
          errors[t] = i + 1;
      }
    });
  }
  for (auto& th : threads) th.join();
  for (int e : errors)
    if (e) return e;  // 1-based index of a failed file
  return 0;
}

}  // namespace

extern "C" {

// out: (n, 2, size, size, channels) uint8. Returns 0 or 1-based failed index.
int gt_load_pair_batch(const char** paths, int n, int channels, int orient_left,
                       int size, uint8_t* out, int n_threads) {
  size_t item = 2ull * size * size * channels;
  return parallel_files(paths, n, n_threads, item, out,
                        [=](const char* p, uint8_t* dst) {
                          return load_pair_one(p, channels, orient_left, size, dst);
                        });
}

// out: (n, out_size, out_size, channels) uint8.
int gt_load_single_batch(const char** paths, int n, int channels, int img_size,
                         int out_size, uint8_t* out, int n_threads) {
  size_t item = static_cast<size_t>(out_size) * out_size * channels;
  return parallel_files(paths, n, n_threads, item, out,
                        [=](const char* p, uint8_t* dst) {
                          return load_single_one(p, channels, img_size, out_size, dst);
                        });
}

// Decode only (native twin of data/decode.py): caller passes a buffer of
// cap bytes; returns 0 and fills h/w, or nonzero on error/overflow.
int gt_decode(const char* path, int channels, uint8_t* out, long cap, int* h,
              int* w) {
  Image raw, img;
  if (!decode_file(path, &raw)) return 1;
  to_channels(raw, channels, &img);
  long need = static_cast<long>(img.h) * img.w * img.c;
  if (need > cap) return 2;
  std::memcpy(out, img.data.data(), need);
  *h = img.h;
  *w = img.w;
  return 0;
}

int gt_version() { return 1; }

}  // extern "C"
