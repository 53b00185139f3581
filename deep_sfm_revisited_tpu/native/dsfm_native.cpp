// Native data-pipeline kernels for deep_sfm_revisited_tpu.
//
// The reference's native layer is the CUDA RANSAC extension
// (RANSAC_FiveP/, replaced on TPU by the JAX engine in ops/essential.py);
// its *data* path is pure python. For a production TPU feeder the
// host-side hot loops live here instead: velodyne->depth projection
// (per-sample during KITTI-raw training, ≙ kitti_utils.py:44
// generate_depth_map) and image normalization/padding, both called from
// the threaded BatchLoader via ctypes (data/native.py). OpenMP threads
// scale the per-sample work across loader workers without the GIL.
//
// Build: make -C deep_sfm_revisited_tpu/native   (-> libdsfm_native.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>

#if defined(__has_include)
#if __has_include(<png.h>)
#include <png.h>
#define DSFM_HAVE_PNG 1
#endif
#endif

extern "C" {

// Project homogeneous velodyne points through M = P @ R @ T (3x4,
// row-major) into an (h, w) closest-depth map. Matches
// data/velodyne.py::project_depth, including the reference's
// round()-then-minus-1 pixel convention (kitti_utils.py:72-74).
void velodyne_project_depth(const float* pts, int64_t n_pts,
                            const double* M, float* out, int64_t h,
                            int64_t w) {
  std::memset(out, 0, sizeof(float) * h * w);
  for (int64_t i = 0; i < n_pts; ++i) {
    const float x = pts[4 * i + 0];
    const float y = pts[4 * i + 1];
    const float z = pts[4 * i + 2];
    if (x < 1e-3f) continue;  // behind the sensor
    const double cx = M[0] * x + M[1] * y + M[2] * z + M[3];
    const double cy = M[4] * x + M[5] * y + M[6] * z + M[7];
    const double cz = M[8] * x + M[9] * y + M[10] * z + M[11];
    if (cz <= 0.0) continue;
    const int64_t u = static_cast<int64_t>(std::llround(cx / cz)) - 1;
    const int64_t v = static_cast<int64_t>(std::llround(cy / cz)) - 1;
    if (u < 0 || u >= w || v < 0 || v >= h) continue;
    float& cell = out[v * w + u];
    const float d = static_cast<float>(cz);
    if (cell == 0.0f || d < cell) cell = d;  // closest depth wins
  }
}

// uint8 HWC image -> float32 [-1, 1] with optional replicate padding to
// (out_h, out_w) >= (h, w). One pass, no temporaries
// (≙ Normalize + pad_to_multiple, data/transforms.py + data/loader.py).
void normalize_pad_u8(const uint8_t* img, int64_t h, int64_t w, int64_t c,
                      float* out, int64_t out_h, int64_t out_w) {
  const float scale = 1.0f / 127.5f;
  for (int64_t y = 0; y < out_h; ++y) {
    const int64_t sy = std::min(y, h - 1);
    for (int64_t x = 0; x < out_w; ++x) {
      const int64_t sx = std::min(x, w - 1);
      const uint8_t* src = img + (sy * w + sx) * c;
      float* dst = out + (y * out_w + x) * c;
      for (int64_t k = 0; k < c; ++k) dst[k] = src[k] * scale - 1.0f;
    }
  }
}

// uint16 depth png payload (already decoded rows) -> metres (/256) with
// replicate padding (≙ disparity_loader_png, KITTI_loader.py:31-39).
void depth_u16_to_f32(const uint16_t* img, int64_t h, int64_t w,
                      float* out, int64_t out_h, int64_t out_w) {
  const float scale = 1.0f / 256.0f;
  for (int64_t y = 0; y < out_h; ++y) {
    const int64_t sy = std::min(y, h - 1);
    for (int64_t x = 0; x < out_w; ++x) {
      const int64_t sx = std::min(x, w - 1);
      out[y * out_w + x] = img[sy * w + sx] * scale;
    }
  }
}

// ---------------------------------------------------------------------
// PNG decode (libpng). The loader's host hot path is two full-size KITTI
// PNG decodes per sample (KITTI_loader.py:107-119 img_loader); python
// imageio/cv2 decoders serialize on interpreter overhead, so the decode
// + normalize + pad chain lives here as one GIL-free call. Camera frames
// are 8-bit RGB, GT depth maps 16-bit grayscale (KITTI_loader.py:31-39).
// Every entry returns 0 on success, <0 on error (-2 = built w/o libpng).

#ifdef DSFM_HAVE_PNG

namespace {

struct MemReader {
  const uint8_t* buf;
  int64_t size;
  int64_t pos;
};

void mem_read(png_structp png, png_bytep out, png_size_t n) {
  MemReader* r = static_cast<MemReader*>(png_get_io_ptr(png));
  if (r->pos + static_cast<int64_t>(n) > r->size) {
    png_error(png, "read past end of buffer");
    return;
  }
  std::memcpy(out, r->buf + r->pos, n);
  r->pos += static_cast<int64_t>(n);
}

// Shared open/IHDR-parse. Caller must png_destroy_read_struct on 0.
int open_png(const uint8_t* buf, int64_t n, MemReader* reader,
             png_structp* png_out, png_infop* info_out) {
  if (n < 8 || png_sig_cmp(buf, 0, 8) != 0) return -3;  // not a PNG
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return -4;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -4;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -5;  // corrupt stream
  }
  *reader = {buf, n, 0};
  png_set_read_fn(png, reader, mem_read);
  png_read_info(png, info);
  *png_out = png;
  *info_out = info;
  return 0;
}

}  // namespace

// Parse IHDR only: dims + channel count + bit depth of the DECODED
// (post-transform) image: palette counts as 3 channels, alpha stripped.
int png_probe(const uint8_t* buf, int64_t n, int64_t* h, int64_t* w,
              int32_t* channels, int32_t* bit_depth) {
  MemReader reader;
  png_structp png;
  png_infop info;
  int rc = open_png(buf, n, &reader, &png, &info);
  if (rc != 0) return rc;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -5;
  }
  *h = png_get_image_height(png, info);
  *w = png_get_image_width(png, info);
  const int color = png_get_color_type(png, info);
  const int depth = png_get_bit_depth(png, info);
  const bool gray =
      color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA;
  *channels = gray ? 1 : 3;
  *bit_depth = depth == 16 ? 16 : 8;
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// Decode to 8-bit RGB, whatever the source format (palette expanded,
// gray widened, 16-bit narrowed, alpha stripped). out: (h, w, 3) u8,
// dims from png_probe.
int png_decode_rgb8(const uint8_t* buf, int64_t n, uint8_t* out, int64_t h,
                    int64_t w) {
  MemReader reader;
  png_structp png;
  png_infop info;
  int rc = open_png(buf, n, &reader, &png, &info);
  if (rc != 0) return rc;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -5;
  }
  if (png_get_image_height(png, info) != static_cast<png_uint_32>(h) ||
      png_get_image_width(png, info) != static_cast<png_uint_32>(w)) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -6;  // caller's buffer doesn't match the stream
  }
  png_set_expand(png);            // palette -> rgb, bit-packed gray -> 8
  png_set_strip_16(png);          // 16 -> 8
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  if (png_get_rowbytes(png, info) != static_cast<png_size_t>(w * 3)) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -7;
  }
  const int passes = png_set_interlace_handling(png);
  for (int p = 0; p < passes; ++p)
    for (int64_t y = 0; y < h; ++y)
      png_read_row(png, out + y * w * 3, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// Decode a 16-bit grayscale PNG (KITTI GT depth / flow channels) to host-
// endian u16. out: (h, w) u16.
int png_decode_gray16(const uint8_t* buf, int64_t n, uint16_t* out,
                      int64_t h, int64_t w) {
  MemReader reader;
  png_structp png;
  png_infop info;
  int rc = open_png(buf, n, &reader, &png, &info);
  if (rc != 0) return rc;
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -5;
  }
  if (png_get_image_height(png, info) != static_cast<png_uint_32>(h) ||
      png_get_image_width(png, info) != static_cast<png_uint_32>(w) ||
      png_get_bit_depth(png, info) != 16 ||
      png_get_color_type(png, info) != PNG_COLOR_TYPE_GRAY) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -6;
  }
#if __BYTE_ORDER__ == __ORDER_LITTLE_ENDIAN__
  png_set_swap(png);  // PNG is big-endian on the wire
#endif
  png_read_update_info(png, info);
  const int passes = png_set_interlace_handling(png);
  for (int p = 0; p < passes; ++p)
    for (int64_t y = 0; y < h; ++y)
      png_read_row(png, reinterpret_cast<png_bytep>(out + y * w), nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

// Fused loader hot path: PNG -> float32 [-1, 1] RGB with replicate
// padding to (out_h, out_w), one pass, no intermediate image
// (decode + Normalize + pad_to_multiple in a single GIL-free call;
// ≙ KITTI_loader img_loader + flow_transforms NormalizeCo + the /128
// pad of main.py:315-338). Rows stream through a single row buffer.
int png_decode_norm_pad(const uint8_t* buf, int64_t n, float* out,
                        int64_t h, int64_t w, int64_t out_h, int64_t out_w) {
  if (out_h < h || out_w < w) return -8;
  uint8_t* row = new uint8_t[w * 3];
  MemReader reader;
  png_structp png;
  png_infop info;
  int rc = open_png(buf, n, &reader, &png, &info);
  if (rc != 0) {
    delete[] row;
    return rc;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    delete[] row;
    return -5;
  }
  if (png_get_image_height(png, info) != static_cast<png_uint_32>(h) ||
      png_get_image_width(png, info) != static_cast<png_uint_32>(w) ||
      png_get_interlace_type(png, info) != PNG_INTERLACE_NONE) {
    png_destroy_read_struct(&png, &info, nullptr);
    delete[] row;
    return -6;
  }
  png_set_expand(png);
  png_set_strip_16(png);
  png_set_strip_alpha(png);
  png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  if (png_get_rowbytes(png, info) != static_cast<png_size_t>(w * 3)) {
    png_destroy_read_struct(&png, &info, nullptr);
    delete[] row;
    return -7;
  }
  for (int64_t y = 0; y < h; ++y) {
    png_read_row(png, row, nullptr);
    float* dst = out + y * out_w * 3;
    // divide (not reciprocal-multiply): bit-exact with numpy's
    // `img.astype(f32) / 127.5 - 1.0` so the native and python loader
    // paths produce identical batches
    for (int64_t x = 0; x < w * 3; ++x) dst[x] = row[x] / 127.5f - 1.0f;
    for (int64_t x = w; x < out_w; ++x)  // replicate-pad columns
      std::memcpy(dst + x * 3, dst + (w - 1) * 3, 3 * sizeof(float));
  }
  for (int64_t y = h; y < out_h; ++y)  // replicate-pad rows
    std::memcpy(out + y * out_w * 3, out + (h - 1) * out_w * 3,
                out_w * 3 * sizeof(float));
  png_destroy_read_struct(&png, &info, nullptr);
  delete[] row;
  return 0;
}

#else  // !DSFM_HAVE_PNG

int png_probe(const uint8_t*, int64_t, int64_t*, int64_t*, int32_t*,
              int32_t*) {
  return -2;
}
int png_decode_rgb8(const uint8_t*, int64_t, uint8_t*, int64_t, int64_t) {
  return -2;
}
int png_decode_gray16(const uint8_t*, int64_t, uint16_t*, int64_t, int64_t) {
  return -2;
}
int png_decode_norm_pad(const uint8_t*, int64_t, float*, int64_t, int64_t,
                        int64_t, int64_t) {
  return -2;
}

#endif  // DSFM_HAVE_PNG

}  // extern "C"
