// matryio: native data-loading runtime for matryodshka-tpu.
//
// The reference delegates its hot host-side work (JPEG decode,
// tf.image.resize_area, tf.data's parallel map) to TensorFlow's C++
// runtime. This is the equivalent for the JAX pipeline: libjpeg decode +
// separable fractional box resize (resize_area semantics) + a batch
// loader that fans decode jobs across threads, exposed through a C ABI
// for ctypes (no pybind11 dependency).
//
// Build: make -C runtime   (produces libmatryio.so)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode a JPEG file to packed RGB8. When target_w/h are positive,
// uses libjpeg's DCT-domain scaling to decode near (but not below) the
// target size — a large win for big-to-small pipelines. Returns true on
// success.
bool DecodeJpeg(const char* path, std::vector<uint8_t>* pixels, int* width,
                int* height, int target_w = 0, int target_h = 0) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(fp);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  if (target_w > 0 && target_h > 0) {
    // largest power-of-two denominator that keeps the decode >= target
    int denom = 1;
    while (denom < 8 &&
           static_cast<int>(cinfo.image_width) / (denom * 2) >= target_w &&
           static_cast<int>(cinfo.image_height) / (denom * 2) >= target_h) {
      denom *= 2;
    }
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }
  jpeg_start_decompress(&cinfo);

  *width = cinfo.output_width;
  *height = cinfo.output_height;
  const int stride = *width * 3;
  pixels->resize(static_cast<size_t>(*height) * stride);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = pixels->data() +
                   static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(fp);
  return true;
}

// Separable fractional box resize RGB8 -> float32 [0,1].
void ResizeArea(const uint8_t* src, int in_h, int in_w, float* dst,
                int out_h, int out_w) {
  const double sx = static_cast<double>(in_w) / out_w;
  const double sy = static_cast<double>(in_h) / out_h;

  // Horizontal pass into a temp [in_h, out_w, 3].
  std::vector<float> tmp(static_cast<size_t>(in_h) * out_w * 3);
  for (int j = 0; j < out_w; ++j) {
    const double x0 = j * sx, x1 = (j + 1) * sx;
    const int ix0 = static_cast<int>(std::floor(x0));
    const int ix1 = std::min(static_cast<int>(std::ceil(x1)), in_w);
    for (int y = 0; y < in_h; ++y) {
      double acc[3] = {0, 0, 0};
      double wsum = 0;
      for (int x = ix0; x < ix1; ++x) {
        const double cover =
            std::min<double>(x + 1, x1) - std::max<double>(x, x0);
        if (cover <= 0) continue;
        const uint8_t* p = src + (static_cast<size_t>(y) * in_w + x) * 3;
        acc[0] += cover * p[0];
        acc[1] += cover * p[1];
        acc[2] += cover * p[2];
        wsum += cover;
      }
      float* q = tmp.data() + (static_cast<size_t>(y) * out_w + j) * 3;
      q[0] = static_cast<float>(acc[0] / wsum);
      q[1] = static_cast<float>(acc[1] / wsum);
      q[2] = static_cast<float>(acc[2] / wsum);
    }
  }

  // Vertical pass into dst [out_h, out_w, 3], scaled to [0, 1].
  for (int i = 0; i < out_h; ++i) {
    const double y0 = i * sy, y1 = (i + 1) * sy;
    const int iy0 = static_cast<int>(std::floor(y0));
    const int iy1 = std::min(static_cast<int>(std::ceil(y1)), in_h);
    for (int j = 0; j < out_w; ++j) {
      double acc[3] = {0, 0, 0};
      double wsum = 0;
      for (int y = iy0; y < iy1; ++y) {
        const double cover =
            std::min<double>(y + 1, y1) - std::max<double>(y, y0);
        if (cover <= 0) continue;
        const float* p = tmp.data() +
                         (static_cast<size_t>(y) * out_w + j) * 3;
        acc[0] += cover * p[0];
        acc[1] += cover * p[1];
        acc[2] += cover * p[2];
        wsum += cover;
      }
      float* q = dst + (static_cast<size_t>(i) * out_w + j) * 3;
      const double norm = 1.0 / (255.0 * wsum);
      q[0] = static_cast<float>(acc[0] * norm);
      q[1] = static_cast<float>(acc[1] * norm);
      q[2] = static_cast<float>(acc[2] * norm);
    }
  }
}

}  // namespace

extern "C" {

int matryio_decode_resize_opt(const char* path, int out_h, int out_w,
                              int fast_scale, float* out);

// Decode one JPEG and area-resize into out[out_h * out_w * 3] float32
// in [0, 1]. Returns 0 on success, nonzero on failure.
int matryio_decode_resize(const char* path, int out_h, int out_w,
                          float* out) {
  return matryio_decode_resize_opt(path, out_h, out_w, /*fast_scale=*/1,
                                   out);
}

// fast_scale=1 enables DCT-domain scaled decoding (decode at >= target
// size, then area-resize the rest of the way); fast_scale=0 decodes at
// full resolution first (bit-compatible with the PIL/TF reference path).
int matryio_decode_resize_opt(const char* path, int out_h, int out_w,
                              int fast_scale, float* out) {
  std::vector<uint8_t> pixels;
  int w = 0, h = 0;
  if (!DecodeJpeg(path, &pixels, &w, &h,
                  fast_scale ? out_w : 0, fast_scale ? out_h : 0)) {
    return 1;
  }
  if (w <= 0 || h <= 0) return 2;
  ResizeArea(pixels.data(), h, w, out, out_h, out_w);
  return 0;
}

// Decode + resize a batch of n images in parallel into
// out[n * out_h * out_w * 3]. Returns the number of failures.
int matryio_load_batch(const char** paths, int n, int out_h, int out_w,
                       int n_threads, float* out) {
  std::atomic<int> next(0);
  std::atomic<int> failures(0);
  const size_t img_elems = static_cast<size_t>(out_h) * out_w * 3;

  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      if (matryio_decode_resize(paths[i], out_h, out_w,
                                out + i * img_elems) != 0) {
        failures.fetch_add(1);
      }
    }
  };

  const int k = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> threads;
  threads.reserve(k);
  for (int t = 0; t < k; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return failures.load();
}

int matryio_version() { return 1; }

}  // extern "C"
