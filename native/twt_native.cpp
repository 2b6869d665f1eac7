// Native kernels for taiwan_whisper_tpu host-side work.
//
// The reference delegates metric hot loops to the `editdistance` C++ wheel
// (utils/evaluation.py imports; SURVEY.md §2.4 item 5). This library is the
// in-repo replacement, exposed to Python via ctypes (no pybind11 in image).
//
// Build: see taiwan_whisper_tpu/utils/native.py (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Levenshtein distance over token-id sequences (two-row DP, O(min(n,m)) mem).
int32_t tw_edit_distance_u32(const uint32_t* a, int32_t n,
                             const uint32_t* b, int32_t m) {
  if (n < m) {
    std::swap(a, b);
    std::swap(n, m);
  }
  if (m == 0) return n;
  std::vector<int32_t> prev(m + 1), cur(m + 1);
  for (int32_t j = 0; j <= m; ++j) prev[j] = j;
  for (int32_t i = 1; i <= n; ++i) {
    cur[0] = i;
    const uint32_t ca = a[i - 1];
    for (int32_t j = 1; j <= m; ++j) {
      const int32_t sub = prev[j - 1] + (ca != b[j - 1]);
      const int32_t del = prev[j] + 1;
      const int32_t ins = cur[j - 1] + 1;
      cur[j] = std::min(sub, std::min(del, ins));
    }
    std::swap(prev, cur);
  }
  return prev[m];
}

// Batched variant: k pairs laid out back-to-back with offset arrays.
// Cuts Python->C crossing overhead for the prefilter stage, which scores
// millions of 30 s chunks (reference fan-out:
// utils/hallucination_detector.py:168-196 uses 32 processes for this).
void tw_edit_distance_batch_u32(const uint32_t* a, const int32_t* a_off,
                                const uint32_t* b, const int32_t* b_off,
                                int32_t k, int32_t* out) {
  for (int32_t i = 0; i < k; ++i) {
    out[i] = tw_edit_distance_u32(a + a_off[i], a_off[i + 1] - a_off[i],
                                  b + b_off[i], b_off[i + 1] - b_off[i]);
  }
}

// Character n-gram repetition detector over UTF-32 text, skipping marker
// spans ('<|' .. '|>'): returns max n-gram count (reference semantics:
// utils/hallucination_detector.py:95-114 — hallucinated iff result > thresh).
// Uses sorting of n-gram hashes instead of a hash map.
int32_t tw_max_ngram_count_u32(const uint32_t* text, int32_t len, int32_t n) {
  if (len < n) return 0;
  // positions inside '<|...|>' markers are excluded like the Python version:
  // an n-gram is skipped if it contains the 2-char sequences '<|' or '|>'
  std::vector<uint64_t> hashes;
  hashes.reserve(len - n + 1);
  for (int32_t i = 0; i + n <= len; ++i) {
    bool skip = false;
    for (int32_t j = 0; j + 1 < n; ++j) {
      const uint32_t c0 = text[i + j], c1 = text[i + j + 1];
      if ((c0 == '<' && c1 == '|') || (c0 == '|' && c1 == '>')) {
        skip = true;
        break;
      }
    }
    if (skip) continue;
    uint64_t h = 1469598103934665603ull;  // FNV-1a
    for (int32_t j = 0; j < n; ++j) {
      h ^= text[i + j];
      h *= 1099511628211ull;
    }
    hashes.push_back(h);
  }
  if (hashes.empty()) return 0;
  std::sort(hashes.begin(), hashes.end());
  int32_t best = 1, run = 1;
  for (size_t i = 1; i < hashes.size(); ++i) {
    run = (hashes[i] == hashes[i - 1]) ? run + 1 : 1;
    best = std::max(best, run);
  }
  return best;
}

}  // extern "C"
