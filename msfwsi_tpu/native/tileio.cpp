// tileio: parallel tile decoding for the MSF-WSI/TPU host data path.
//
// The training hot loop consumes batches of fixed-size PNG tiles
// (1024x1024x3 images, single-channel masks). Python-side decoding via PIL
// needs one Image object + one numpy copy per file and holds the allocator
// hot; this library decodes a whole batch directly into the caller's
// contiguous buffer with a C++ thread pool over libpng/libjpeg —
// the native-runtime equivalent of the reference's torch DataLoader worker
// processes (reference: tools/ssl_train.py:267-275).
//
// Exposed via a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: see build.sh (g++ -O3 -shared -fPIC tileio.cpp -lpng -ljpeg -lz).

#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <png.h>

extern "C" {
#include <jpeglib.h>
}

namespace {

// Error codes (negative), or 0 on success.
constexpr int kOk = 0;
constexpr int kOpenFailed = -1;
constexpr int kDecodeFailed = -2;
constexpr int kShapeMismatch = -3;
constexpr int kBadArgs = -4;

// libjpeg's default fatal-error handler calls exit(): a single corrupt
// JPEG would kill the whole training process from a decoder thread,
// defeating the Python-side PIL fallback. Standard setjmp override: fatal
// errors longjmp back into the decoder, which returns kDecodeFailed.
struct JpegErrorMgr {
  jpeg_error_mgr pub;
  std::jmp_buf env;
};

void jpeg_error_longjmp(j_common_ptr cinfo) {
  std::longjmp(reinterpret_cast<JpegErrorMgr*>(cinfo->err)->env, 1);
}

bool has_suffix(const char* path, const char* suffix) {
  size_t lp = std::strlen(path), ls = std::strlen(suffix);
  if (ls > lp) return false;
  for (size_t i = 0; i < ls; ++i) {
    char a = path[lp - ls + i], b = suffix[i];
    if (a >= 'A' && a <= 'Z') a += 32;
    if (a != b) return false;
  }
  return true;
}

int decode_png_one(const char* path, uint8_t* out, int height, int width,
                   int channels) {
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;

  if (!png_image_begin_read_from_file(&image, path)) return kOpenFailed;

  image.format = (channels == 1) ? PNG_FORMAT_GRAY : PNG_FORMAT_RGB;
  if ((int)image.width != width || (int)image.height != height) {
    png_image_free(&image);
    return kShapeMismatch;
  }
  if (!png_image_finish_read(&image, /*background=*/nullptr, out,
                             /*row_stride=*/width * channels,
                             /*colormap=*/nullptr)) {
    png_image_free(&image);
    return kDecodeFailed;
  }
  return kOk;
}

int decode_jpeg_one(const char* path, uint8_t* out, int height, int width,
                    int channels) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return kOpenFailed;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_longjmp;
  if (setjmp(jerr.env)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return kDecodeFailed;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return kDecodeFailed;
  }
  cinfo.out_color_space = (channels == 1) ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if ((int)cinfo.output_width != width || (int)cinfo.output_height != height ||
      (int)cinfo.output_components != channels) {
    jpeg_abort_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return kShapeMismatch;
  }
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + size_t(cinfo.output_scanline) * width * channels;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return kOk;
}

int decode_one(const char* path, uint8_t* out, int height, int width,
               int channels) {
  if (has_suffix(path, ".jpg") || has_suffix(path, ".jpeg"))
    return decode_jpeg_one(path, out, height, width, channels);
  return decode_png_one(path, out, height, width, channels);
}

}  // namespace

extern "C" {

// Decode n images (all height x width x channels) into `out`
// (n * height * width * channels contiguous uint8). Returns 0 on success or
// the first error code encountered; `status` (optional, length n) receives
// the per-file code.
int tileio_decode_batch(const char** paths, int n, uint8_t* out, int height,
                        int width, int channels, int n_threads, int* status) {
  if (n <= 0 || height <= 0 || width <= 0 ||
      (channels != 1 && channels != 3) || !paths || !out)
    return kBadArgs;
  if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
  if (n_threads > n) n_threads = n;

  const size_t stride = size_t(height) * width * channels;
  std::atomic<int> next(0);
  std::atomic<int> first_error(kOk);

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rc = decode_one(paths[i], out + stride * i, height, width, channels);
      if (status) status[i] = rc;
      if (rc != kOk) {
        int expected = kOk;
        first_error.compare_exchange_strong(expected, rc);
      }
    }
  };

  std::vector<std::thread> threads;
  threads.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return first_error.load();
}

// Probe an image's dimensions: returns 0 and fills height/width/channels
// (channels as stored: 1, 3, or 4) or a negative error code.
int tileio_probe(const char* path, int* height, int* width, int* channels) {
  if (has_suffix(path, ".jpg") || has_suffix(path, ".jpeg")) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return kOpenFailed;
    jpeg_decompress_struct cinfo;
    JpegErrorMgr jerr;
    cinfo.err = jpeg_std_error(&jerr.pub);
    jerr.pub.error_exit = jpeg_error_longjmp;
    if (setjmp(jerr.env)) {
      jpeg_destroy_decompress(&cinfo);
      std::fclose(f);
      return kDecodeFailed;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
      jpeg_destroy_decompress(&cinfo);
      std::fclose(f);
      return kDecodeFailed;
    }
    *height = (int)cinfo.image_height;
    *width = (int)cinfo.image_width;
    *channels = (int)cinfo.num_components;
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return kOk;
  }
  png_image image;
  std::memset(&image, 0, sizeof(image));
  image.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&image, path)) return kOpenFailed;
  *height = (int)image.height;
  *width = (int)image.width;
  *channels = (int)PNG_IMAGE_SAMPLE_CHANNELS(image.format);
  png_image_free(&image);
  return kOk;
}

int tileio_version() { return 1; }

}  // extern "C"
