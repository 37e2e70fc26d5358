// mmor_native: C++ host data-path kernels for the TPU framework.
//
// Native equivalent of the reference's hot host-side mask operations
// (the reference leans on cv2/numpy C code; its only first-party native code
// is the MSDeformAttn CUDA op, whose device role Pallas/XLA covers — this
// library covers the host preprocessing loops that feed the device):
//
//  - priority_downsample: class-priority-preserving 32x32 mask pooling
//    (create_take_sample_segmasks.py:47-81)
//  - clean_mask: small-connected-component removal
//    (datasets/or_dataset.py:50-85)
//  - panoptic_encode: label map -> panoptic id map + per-category areas
//    (datasets/or_dataset.py:142-189)
//  - rgb_to_labels: color-coded prediction dump -> label map
//    (create_take_sample_segmasks.py:144-150)
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
// Build: g++ -O3 -march=native -shared -fPIC mmor_native.cpp -o libmmor_native.so

#include <cstdint>
#include <cstring>
#include <vector>
#include <queue>

extern "C" {

// Class-priority-preserving downsample. mask: (h, w) uint8 class labels.
// out: (out_res, out_res) uint8. Rarer classes win pooling ties.
void priority_downsample(const uint8_t* mask, int h, int w, int out_res,
                         uint8_t* out) {
  const int scale_h = h / out_res;
  const int scale_w = w / out_res;
  const int eff_h = out_res * scale_h;
  const int eff_w = out_res * scale_w;

  // class frequencies over the trimmed mask
  double freq[256];
  std::memset(freq, 0, sizeof(freq));
  for (int y = 0; y < eff_h; ++y)
    for (int x = 0; x < eff_w; ++x)
      freq[mask[y * w + x]] += 1.0;

  double priority[256];
  for (int c = 0; c < 256; ++c) priority[c] = 1.0 / (freq[c] + 1e-6);

  for (int oy = 0; oy < out_res; ++oy) {
    for (int ox = 0; ox < out_res; ++ox) {
      bool present[256];
      std::memset(present, 0, sizeof(present));
      for (int dy = 0; dy < scale_h; ++dy) {
        const uint8_t* row = mask + (oy * scale_h + dy) * w + ox * scale_w;
        for (int dx = 0; dx < scale_w; ++dx) present[row[dx]] = true;
      }
      int best = 0;
      double best_score = -1.0;
      for (int c = 0; c < 256; ++c) {
        if (!present[c]) continue;
        if (priority[c] > best_score) { best_score = priority[c]; best = c; }
      }
      out[oy * out_res + ox] = static_cast<uint8_t>(best);
    }
  }
}

// Remove connected components (4-connectivity) smaller than area_threshold.
// In-place on a copy: mask_in -> mask_out, both (h, w) uint8.
void clean_mask(const uint8_t* mask_in, int h, int w, int area_threshold,
                uint8_t* mask_out) {
  std::memcpy(mask_out, mask_in, static_cast<size_t>(h) * w);
  std::vector<int32_t> comp(static_cast<size_t>(h) * w, -1);
  std::vector<int> stack;
  for (int start = 0; start < h * w; ++start) {
    if (comp[start] != -1 || mask_in[start] == 0) continue;
    const uint8_t label = mask_in[start];
    // flood fill
    stack.clear();
    stack.push_back(start);
    comp[start] = start;
    std::vector<int> pixels;
    while (!stack.empty()) {
      int p = stack.back();
      stack.pop_back();
      pixels.push_back(p);
      const int y = p / w, x = p % w;
      const int neighbors[4] = {p - w, p + w, p - 1, p + 1};
      const bool ok[4] = {y > 0, y < h - 1, x > 0, x < w - 1};
      for (int k = 0; k < 4; ++k) {
        if (!ok[k]) continue;
        const int q = neighbors[k];
        if (comp[q] == -1 && mask_in[q] == label) {
          comp[q] = start;
          stack.push_back(q);
        }
      }
    }
    if (static_cast<int>(pixels.size()) < area_threshold) {
      for (int p : pixels) mask_out[p] = 0;
    }
  }
}

// Label map -> panoptic id map (category*divisor) + category map + areas.
// label_to_category: (256,) int32, -1 for unknown labels (skipped).
// areas: (max_categories,) int64 output.
void panoptic_encode(const uint8_t* mask, int h, int w,
                     const int32_t* label_to_category, int divisor,
                     int32_t* pan_out, int32_t* cat_out, int64_t* areas,
                     int max_categories) {
  std::memset(areas, 0, sizeof(int64_t) * max_categories);
  for (int i = 0; i < h * w; ++i) {
    const uint8_t label = mask[i];
    const int32_t cat = label ? label_to_category[label] : 0;
    if (label == 0 || cat < 0) {
      pan_out[i] = 0;
      cat_out[i] = 0;
      continue;
    }
    pan_out[i] = cat * divisor;
    cat_out[i] = cat;
    if (cat < max_categories) areas[cat] += 1;
  }
}

// Color-coded RGB mask -> label map. colors: (n_classes, 3) uint8 table,
// labels_table: (n_classes,) uint8.
void rgb_to_labels(const uint8_t* rgb, int h, int w, const uint8_t* colors,
                   const uint8_t* labels_table, int n_classes, uint8_t* out) {
  // hash colors into a 24-bit direct-mapped table
  static_assert(sizeof(int) >= 4, "int too small");
  std::vector<uint8_t> lut(1 << 24, 0);
  for (int c = 0; c < n_classes; ++c) {
    const int key = (colors[c * 3] << 16) | (colors[c * 3 + 1] << 8) | colors[c * 3 + 2];
    lut[key] = labels_table[c];
  }
  for (int i = 0; i < h * w; ++i) {
    const int key = (rgb[i * 3] << 16) | (rgb[i * 3 + 1] << 8) | rgb[i * 3 + 2];
    out[i] = lut[key];
  }
}

}  // extern "C"
