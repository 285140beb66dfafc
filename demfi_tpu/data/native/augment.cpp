// Native host-side augmentation for the training input pipeline.
//
// Fuses the reference's per-sample augmentation chain
// (/root/reference/utils.py:346-361: random crop -> horizontal flip ->
// rot90 x k -> [-1,1] float normalization) into a single pass that writes
// the final NHWC float32 batch buffer directly — no intermediate numpy
// copies, no negative strides. Decoding stays in OpenCV (already native);
// this covers the Python-side hot loop between decode and device transfer.
//
// Built as a plain shared library, bound via ctypes
// (demfi_tpu/data/native/__init__.py).

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Map an output pixel (i, j) of the ps x ps augmented patch back to the
// cropped source pixel, inverting: flip (cols) then rot90 x k
// (numpy rot90 semantics: out[i,j] = in[j, n-1-i] for k=1).
inline void source_index(int i, int j, int ps, int flip, int rot,
                         int* sy, int* sx) {
  // numpy rot90(m, k, (0,1)) forward maps: k=1: out[i,j] = m[j, n-1-i];
  // k=2: m[n-1-i, n-1-j]; k=3: m[n-1-j, i]. Flip (cols) applied before.
  int y, x;
  switch (rot & 3) {
    default: y = i;          x = j;          break;
    case 1:  y = j;          x = ps - 1 - i; break;
    case 2:  y = ps - 1 - i; x = ps - 1 - j; break;
    case 3:  y = ps - 1 - j; x = i;          break;
  }
  if (flip) x = ps - 1 - x;
  *sy = y;
  *sx = x;
}

void augment_one(const uint8_t* frame, int H, int W, int cy, int cx,
                 int ps, int flip, int rot, float* out) {
  // frame: [H, W, 3] uint8; out: [ps, ps, 3] float32 in [-1, 1]
  for (int i = 0; i < ps; ++i) {
    float* orow = out + (size_t)i * ps * 3;
    for (int j = 0; j < ps; ++j) {
      int sy, sx;
      source_index(i, j, ps, flip, rot, &sy, &sx);
      const uint8_t* p = frame + ((size_t)(cy + sy) * W + (cx + sx)) * 3;
      orow[j * 3 + 0] = (p[0] / 255.0f - 0.5f) * 2.0f;
      orow[j * 3 + 1] = (p[1] / 255.0f - 0.5f) * 2.0f;
      orow[j * 3 + 2] = (p[2] / 255.0f - 0.5f) * 2.0f;
    }
  }
}

}  // namespace

extern "C" {

// frames: [T, H, W, 3] uint8 (one sample's stacked window)
// out:    [T, ps, ps, 3] float32
void demfi_augment_pack(const uint8_t* frames, int T, int H, int W,
                        int cy, int cx, int ps, int flip, int rot,
                        float* out) {
  for (int t = 0; t < T; ++t) {
    augment_one(frames + (size_t)t * H * W * 3, H, W, cy, cx, ps, flip,
                rot, out + (size_t)t * ps * ps * 3);
  }
}

// Batch variant with one worker thread per sample.
// frames_b: B pointers packed as [B, T, H, W, 3]; params per sample.
void demfi_augment_pack_batch(const uint8_t* frames_b, int B, int T,
                              int H, int W, const int* cy, const int* cx,
                              int ps, const int* flip, const int* rot,
                              float* out_b, int n_threads) {
  const size_t in_stride = (size_t)T * H * W * 3;
  const size_t out_stride = (size_t)T * ps * ps * 3;
  if (n_threads <= 1 || B == 1) {
    for (int b = 0; b < B; ++b) {
      demfi_augment_pack(frames_b + b * in_stride, T, H, W, cy[b], cx[b],
                         ps, flip[b], rot[b], out_b + b * out_stride);
    }
    return;
  }
  std::vector<std::thread> threads;
  for (int b = 0; b < B; ++b) {
    threads.emplace_back([=]() {
      demfi_augment_pack(frames_b + b * in_stride, T, H, W, cy[b], cx[b],
                         ps, flip[b], rot[b], out_b + b * out_stride);
    });
  }
  for (auto& th : threads) th.join();
}

// Plain normalization pack for eval frames: [N, H, W, 3] uint8 ->
// [N, H, W, 3] float32 in [-1, 1] (utils.py:224-238).
void demfi_normalize(const uint8_t* frames, int64_t n, float* out) {
  for (int64_t i = 0; i < n; ++i) out[i] = (frames[i] / 255.0f - 0.5f) * 2.0f;
}

}  // extern "C"
