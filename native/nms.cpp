// Native NMS kernels (C ABI, loaded via ctypes).
//
// TPU-native counterpart of the reference's compiled NMS modules
// (lib/nms/cpu_nms.pyx Cython and lib/nms/nms_kernel.cu CUDA): the primary
// implementation in this framework runs on-device (i2rnet_tpu/ops/nms.py);
// this C++ path serves host-side evaluation pipelines where detections are
// already on CPU and a device round-trip would cost more than the op.
//
// Build: make -C native   (produces build/libi2rnms.so)

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <numeric>
#include <vector>

extern "C" {

// Greedy box IoU NMS over dets [n, 5] = (x1, y1, x2, y2, score), +1 area
// convention (py-faster-rcnn style, reference lib/nms/nms.py:35-72).
// keep: out buffer of capacity n; returns number kept.
int i2r_box_nms(const float* dets, int n, float thresh, int* keep) {
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    return dets[a * 5 + 4] > dets[b * 5 + 4];
  });
  std::vector<float> areas(n);
  for (int i = 0; i < n; ++i) {
    const float* d = dets + i * 5;
    areas[i] = (d[2] - d[0] + 1.f) * (d[3] - d[1] + 1.f);
  }
  std::vector<uint8_t> suppressed(n, 0);
  int n_keep = 0;
  for (int oi = 0; oi < n; ++oi) {
    int i = order[oi];
    if (suppressed[i]) continue;
    keep[n_keep++] = i;
    const float* di = dets + i * 5;
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (suppressed[j]) continue;
      const float* dj = dets + j * 5;
      float xx1 = std::max(di[0], dj[0]);
      float yy1 = std::max(di[1], dj[1]);
      float xx2 = std::min(di[2], dj[2]);
      float yy2 = std::min(di[3], dj[3]);
      float w = std::max(0.f, xx2 - xx1 + 1.f);
      float h = std::max(0.f, yy2 - yy1 + 1.f);
      float inter = w * h;
      float ovr = inter / (areas[i] + areas[j] - inter);
      if (ovr > thresh) suppressed[j] = 1;
    }
  }
  return n_keep;
}

static inline float oks(const float* g, const float* d, float area_sum,
                        const float* vars, int k) {
  float acc = 0.f;
  for (int j = 0; j < k; ++j) {
    float dx = d[j * 3] - g[j * 3];
    float dy = d[j * 3 + 1] - g[j * 3 + 1];
    float e = (dx * dx + dy * dy) / vars[j] / (area_sum + 2.220446e-16f) / 2.f;
    acc += std::exp(-e);
  }
  return acc / k;
}

// Greedy OKS NMS. kpts [n, k, 3]; sigmas [k]; keep capacity n; returns count.
// Matches reference lib/nms/nms.py:101-128.
int i2r_oks_nms(const float* kpts, const float* areas, const float* scores,
                int n, int k, const float* sigmas, float thresh, int* keep) {
  std::vector<float> vars(k);
  for (int j = 0; j < k; ++j) vars[j] = (2.f * sigmas[j]) * (2.f * sigmas[j]);
  std::vector<int> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::stable_sort(order.begin(), order.end(), [&](int a, int b) {
    return scores[a] > scores[b];
  });
  std::vector<uint8_t> suppressed(n, 0);
  int n_keep = 0;
  for (int oi = 0; oi < n; ++oi) {
    int i = order[oi];
    if (suppressed[i]) continue;
    keep[n_keep++] = i;
    for (int oj = oi + 1; oj < n; ++oj) {
      int j = order[oj];
      if (suppressed[j]) continue;
      float v = oks(kpts + i * k * 3, kpts + j * k * 3,
                    (areas[i] + areas[j]) / 2.f, vars.data(), k);
      if (v > thresh) suppressed[j] = 1;
    }
  }
  return n_keep;
}

// Soft (gaussian) OKS NMS: rescore survivors by s *= exp(-oks^2 / thresh),
// pick up to max_dets by running max (reference nms.py:142-181).
int i2r_soft_oks_nms(const float* kpts, const float* areas, float* scores,
                     int n, int k, const float* sigmas, float thresh,
                     int max_dets, int* keep) {
  std::vector<float> vars(k);
  for (int j = 0; j < k; ++j) vars[j] = (2.f * sigmas[j]) * (2.f * sigmas[j]);
  std::vector<uint8_t> used(n, 0);
  int n_keep = 0;
  while (n_keep < max_dets) {
    int best = -1;
    float best_s = -1e30f;
    for (int i = 0; i < n; ++i) {
      if (!used[i] && scores[i] > best_s) { best_s = scores[i]; best = i; }
    }
    if (best < 0) break;
    used[best] = 1;
    keep[n_keep++] = best;
    for (int j = 0; j < n; ++j) {
      if (used[j]) continue;
      float v = oks(kpts + best * k * 3, kpts + j * k * 3,
                    (areas[best] + areas[j]) / 2.f, vars.data(), k);
      scores[j] *= std::exp(-v * v / thresh);
    }
  }
  return n_keep;
}

}  // extern "C"
