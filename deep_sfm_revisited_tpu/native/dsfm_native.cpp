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

}  // extern "C"
