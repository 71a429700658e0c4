// Host-side image preprocessing — the native hot path of the data loader.
//
// The reference's input pipeline leans on OpenCV/PIL inside Python dataloader
// workers (SURVEY.md §2.4); its only first-party native code is the TensorRT
// C++ demo (deploy/trt_cc, letterbox at demo_yolox.cc:42). This library is
// the TPU framework's native equivalent for the *host* side: bilinear
// letterbox-resize + gray padding + batch packing, multithreaded with plain
// std::thread, zero external dependencies. Python binds via ctypes
// (native/__init__.py); the device side of preprocessing is the Pallas
// fused-normalize kernel (ops/pallas_preprocess.py).
//
// Build: make -C yolov7_d2_tpu/native   (produces libyolo_preprocess.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Bilinear resize of an HWC uint8 image (C=3) into a sub-rectangle of the
// output canvas. Matches cv2.INTER_LINEAR geometry (half-pixel centers).
void resize_bilinear_into(const uint8_t* src, int sh, int sw,
                          uint8_t* dst, int dst_stride_row,
                          int nh, int nw) {
  const float sy = static_cast<float>(sh) / nh;
  const float sx = static_cast<float>(sw) / nw;
  for (int y = 0; y < nh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = static_cast<int>(std::floor(fy));
    float wy = fy - y0;
    int y1 = std::min(y0 + 1, sh - 1);
    y0 = std::max(y0, 0);
    uint8_t* out_row = dst + y * dst_stride_row;
    const uint8_t* row0 = src + static_cast<size_t>(y0) * sw * 3;
    const uint8_t* row1 = src + static_cast<size_t>(y1) * sw * 3;
    for (int x = 0; x < nw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = static_cast<int>(std::floor(fx));
      float wx = fx - x0;
      int x1 = std::min(x0 + 1, sw - 1);
      x0 = std::max(x0, 0);
      for (int c = 0; c < 3; ++c) {
        float v00 = row0[x0 * 3 + c], v01 = row0[x1 * 3 + c];
        float v10 = row1[x0 * 3 + c], v11 = row1[x1 * 3 + c];
        float top = v00 + (v01 - v00) * wx;
        float bot = v10 + (v11 - v10) * wx;
        out_row[x * 3 + c] =
            static_cast<uint8_t>(std::lround(top + (bot - top) * wy));
      }
    }
  }
}

}  // namespace

extern "C" {

// Letterbox one image: keep aspect, resize into the top-left corner of a
// (th, tw) canvas filled with pad_value. Returns the resize scale.
float letterbox_u8(const uint8_t* src, int sh, int sw,
                   uint8_t* dst, int th, int tw, uint8_t pad_value) {
  const float r = std::min(static_cast<float>(th) / sh,
                           static_cast<float>(tw) / sw);
  const int nh = std::max(1, static_cast<int>(std::lround(sh * r)));
  const int nw = std::max(1, static_cast<int>(std::lround(sw * r)));
  std::memset(dst, pad_value, static_cast<size_t>(th) * tw * 3);
  resize_bilinear_into(src, sh, sw, dst, tw * 3, nh, nw);
  return r;
}

// Batch letterbox: N independent images -> one [N, th, tw, 3] uint8 buffer,
// work-stealing across ``num_threads`` host threads (cv2-free).
// srcs: array of N pointers; shapes: [N*2] (h, w) pairs; scales_out: [N].
void letterbox_batch_u8(const uint8_t** srcs, const int* shapes, int n,
                        uint8_t* dst, int th, int tw, uint8_t pad_value,
                        float* scales_out, int num_threads) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      scales_out[i] = letterbox_u8(
          srcs[i], shapes[i * 2], shapes[i * 2 + 1],
          dst + static_cast<size_t>(i) * th * tw * 3, th, tw, pad_value);
    }
  };
  int nt = std::max(1, std::min(num_threads, n));
  std::vector<std::thread> threads;
  threads.reserve(nt);
  for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
}

// Scale + clip a box array [N, 4] xyxy in-place (box geometry tail of the
// letterbox transform).
void scale_clip_boxes(float* boxes, int n, float scale,
                      float max_w, float max_h) {
  for (int i = 0; i < n; ++i) {
    float* b = boxes + i * 4;
    b[0] = std::min(std::max(b[0] * scale, 0.0f), max_w);
    b[1] = std::min(std::max(b[1] * scale, 0.0f), max_h);
    b[2] = std::min(std::max(b[2] * scale, 0.0f), max_w);
    b[3] = std::min(std::max(b[3] * scale, 0.0f), max_h);
  }
}

}  // extern "C"
