// Native host-side runtime kernels for markushgrapher_tpu.
//
// The reference runs its host hot paths in pure Python (SMILES atom-wise
// tokenization via SmilesPE, per-sample string metrics); the heavy native
// work lives in its dependencies (RDKit C++, HF tokenizers Rust). This
// library provides the framework's own native hot paths, exposed via ctypes
// (markushgrapher_tpu/utils/native.py):
//
//   - atomwise SMILES tokenization (same lexical grammar as
//     chem/smiles_tokenize.py),
//   - Levenshtein distance (eval metric, utils_evaluation.py NLP metrics),
//   - bbox quantization to the <loc_N> 0..500 grid (tokenizer hot path).
//
// Build: g++ -O3 -shared -fPIC -o libmarkush_native.so markush_native.cpp

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

extern "C" {

// ---- Levenshtein ----------------------------------------------------------

int mg_levenshtein(const char* a, const char* b) {
  const size_t la = std::strlen(a), lb = std::strlen(b);
  if (la == 0) return static_cast<int>(lb);
  if (lb == 0) return static_cast<int>(la);
  std::vector<int> prev(lb + 1), cur(lb + 1);
  for (size_t j = 0; j <= lb; ++j) prev[j] = static_cast<int>(j);
  for (size_t i = 1; i <= la; ++i) {
    cur[0] = static_cast<int>(i);
    for (size_t j = 1; j <= lb; ++j) {
      const int cost = (a[i - 1] == b[j - 1]) ? 0 : 1;
      cur[j] = std::min({prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost});
    }
    std::swap(prev, cur);
  }
  return prev[lb];
}

// ---- atomwise SMILES tokenizer ---------------------------------------------

// Writes token start offsets and lengths; returns token count (or -1 if the
// output buffers are too small). Grammar mirrors chem/smiles_tokenize.py.
int mg_atomwise_tokenize(const char* smiles, int32_t* starts, int32_t* lens,
                         int max_tokens) {
  const size_t n = std::strlen(smiles);
  int count = 0;
  size_t pos = 0;
  auto emit = [&](size_t start, size_t len) -> bool {
    if (count >= max_tokens) return false;
    starts[count] = static_cast<int32_t>(start);
    lens[count] = static_cast<int32_t>(len);
    ++count;
    return true;
  };
  while (pos < n) {
    const char c = smiles[pos];
    size_t len = 1;
    if (c == '[') {
      size_t end = pos + 1;
      while (end < n && smiles[end] != ']') ++end;
      len = (end < n) ? end - pos + 1 : 1;
    } else if ((c == 'B' && pos + 1 < n && smiles[pos + 1] == 'r') ||
               (c == 'C' && pos + 1 < n && smiles[pos + 1] == 'l')) {
      len = 2;
    } else if (c == '%' && pos + 2 < n && isdigit(smiles[pos + 1]) &&
               isdigit(smiles[pos + 2])) {
      len = 3;
    } else if (c == '>' && pos + 1 < n && smiles[pos + 1] == '>') {
      len = 2;
    }
    if (!emit(pos, len)) return -1;
    pos += len;
  }
  return count;
}

// ---- bbox quantization -------------------------------------------------------

// boxes: n*4 floats in [0,1]; out: n*4 int32 clamped to [0, scale].
void mg_quantize_boxes(const float* boxes, int n, int scale, int32_t* out) {
  for (int i = 0; i < n * 4; ++i) {
    float v = boxes[i] * static_cast<float>(scale);
    if (v < 0.0f) v = 0.0f;
    if (v > static_cast<float>(scale)) v = static_cast<float>(scale);
    out[i] = static_cast<int32_t>(v);
  }
}

// ---- batched cell box splitting ------------------------------------------------
// Proportional word-width split (data_preprocessing.py:24-48 semantics):
// given per-word estimated widths, compute per-word boxes inside a cell box.
void mg_split_cell_box(const float* cell_box, const int32_t* word_widths,
                       int n_words, float* out_boxes) {
  float total = 0.0f;
  for (int i = 0; i < n_words; ++i) total += static_cast<float>(word_widths[i]);
  if (total <= 0.0f) total = 1.0f;
  const float x0 = cell_box[0], y0 = cell_box[1];
  const float x1 = cell_box[2], y1 = cell_box[3];
  float left = x0;
  for (int i = 0; i < n_words; ++i) {
    const float w = (x1 - x0) * static_cast<float>(word_widths[i]) / total;
    out_boxes[i * 4 + 0] = left;
    out_boxes[i * 4 + 1] = y0;
    out_boxes[i * 4 + 2] = left + w;
    out_boxes[i * 4 + 3] = y1;
    left += w;
  }
}

}  // extern "C"
