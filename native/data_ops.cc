// Native data-path kernels for the host side of the input pipeline.
//
// The reference leans on TensorFlow's C++ tf.data runtime for its hot host
// loops (SURVEY.md §2.9); this library supplies the TPU build's own native
// fast paths for the per-batch Python-side work that remains outside tf.data:
// token-sequence collation (pad + stack), uniform-bin action tokenization,
// and uint8 -> normalized-float image conversion. Called through ctypes
// (which releases the GIL for the duration of each call), so batch assembly
// overlaps device compute.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libdata_ops.so data_ops.cc
// (openvla_oft_tpu/utils/native.py builds and caches this automatically.)

#include <cstdint>
#include <cstring>
#include <cmath>

extern "C" {

// Pad + stack variable-length int32 sequences into a (n, target) matrix.
// flat: concatenated sequences; lengths[n]; fill: pad value.
// Returns 0 on success, -1 if any sequence exceeds target.
int pad_stack_i32(const int32_t* flat, const int32_t* lengths, int n,
                  int target, int32_t fill, int32_t* out) {
  int64_t offset = 0;
  for (int i = 0; i < n; ++i) {
    const int len = lengths[i];
    if (len > target) return -1;
    int32_t* row = out + static_cast<int64_t>(i) * target;
    std::memcpy(row, flat + offset, sizeof(int32_t) * len);
    for (int j = len; j < target; ++j) row[j] = fill;
    offset += len;
  }
  return 0;
}

// Attention mask for right-padded rows: 1 for j < lengths[i], else 0.
void attention_mask_i32(const int32_t* lengths, int n, int target,
                        int32_t* out) {
  for (int i = 0; i < n; ++i) {
    int32_t* row = out + static_cast<int64_t>(i) * target;
    const int len = lengths[i];
    for (int j = 0; j < target; ++j) row[j] = j < len ? 1 : 0;
  }
}

// Uniform-bin action tokenization (reference action_tokenizer.py:38-46):
// clip to [min, max], digitize over `bins` uniform edges, id = vocab - bin.
void encode_actions_i32(const float* actions, int64_t n, int bins,
                        float min_action, float max_action, int vocab_size,
                        int32_t* out) {
  const float scale = (bins - 1) / (max_action - min_action);
  for (int64_t i = 0; i < n; ++i) {
    float a = actions[i];
    if (a < min_action) a = min_action;
    if (a > max_action) a = max_action;
    // np.digitize with `bins` uniform edges returns in [1, bins]; edge
    // semantics: index of first edge strictly greater than a, capped.
    int idx = static_cast<int>(std::floor((a - min_action) * scale)) + 1;
    if (a >= max_action) idx = bins;
    if (idx > bins) idx = bins;
    out[i] = vocab_size - idx;
  }
}

// Decode token ids back to bin-center actions
// (reference action_tokenizer.py:56-72).
void decode_actions_f32(const int32_t* ids, int64_t n, int bins,
                        float min_action, float max_action, int vocab_size,
                        float* out) {
  const float step = (max_action - min_action) / (bins - 1);
  for (int64_t i = 0; i < n; ++i) {
    int d = vocab_size - ids[i] - 1;
    if (d < 0) d = 0;
    if (d > bins - 2) d = bins - 2;
    out[i] = min_action + step * d + step * 0.5f;
  }
}

// uint8 HWC image -> normalized float32 with per-channel mean/std.
void normalize_image_f32(const uint8_t* img, int64_t pixels,
                         const float* mean, const float* stddev, float* out) {
  const float inv255 = 1.0f / 255.0f;
  for (int64_t p = 0; p < pixels; ++p) {
    const int64_t base = p * 3;
    for (int c = 0; c < 3; ++c) {
      out[base + c] = (img[base + c] * inv255 - mean[c]) / stddev[c];
    }
  }
}

}  // extern "C"
