// Mock of rapidfuzz-cpp's fuzz::ratio / fuzz::partial_ratio for the
// reference-parity harness (the submodule is empty in this snapshot).
// Semantics mirror rapidfuzz (and mcaat_tpu/report/fuzz.py, whose Python
// implementation is parity-tested against the real rapidfuzz algorithm):
//   ratio(a, b)         = 100 * 2*LCS(a,b) / (|a|+|b|)   (indel similarity)
//   partial_ratio(a, b) = best ratio of the shorter string against every
//                         alignment window of the longer (clipped edges too)
// LCS via Hyyrö's bit-parallel algorithm; the reference only scores spacers
// and repeats (<= 50 bp, include/post_processing.h:114,135), so one 64-bit
// word per block suffices — a multi-word fallback covers longer inputs.
#ifndef MOCK_RAPIDFUZZ_FUZZ_HPP
#define MOCK_RAPIDFUZZ_FUZZ_HPP

#include <algorithm>
#include <cstdint>
#include <string>
#include <vector>

namespace rapidfuzz {
namespace fuzz {

namespace detail {

inline int popcount64(uint64_t x) { return __builtin_popcountll(x); }

// Hyyrö bit-parallel LCS, multi-word (handles |a| > 64).
inline int lcs_length(const std::string &a, const std::string &b) {
  const size_t m = a.size();
  if (m == 0 || b.empty()) return 0;
  const size_t words = (m + 63) / 64;
  std::vector<uint64_t> masks(256 * words, 0);
  for (size_t i = 0; i < m; ++i) {
    unsigned char c = static_cast<unsigned char>(a[i]);
    masks[c * words + i / 64] |= uint64_t(1) << (i % 64);
  }
  std::vector<uint64_t> s(words, ~uint64_t(0));
  if (m % 64) s[words - 1] = (uint64_t(1) << (m % 64)) - 1;
  std::vector<uint64_t> u(words), add(words), sub(words);
  for (char bc : b) {
    unsigned char c = static_cast<unsigned char>(bc);
    const uint64_t *mv = &masks[c * words];
    // u = s & mv; s = ((s + u) | (s - u)) & full  (with carries/borrows)
    uint64_t carry = 0, borrow = 0;
    for (size_t w = 0; w < words; ++w) {
      u[w] = s[w] & mv[w];
      uint64_t t = s[w] + u[w] + carry;
      carry = (t < s[w] || (carry && t == s[w])) ? 1 : 0;
      add[w] = t;
      uint64_t d = s[w] - u[w] - borrow;
      borrow = (s[w] < u[w] + borrow || (u[w] == ~uint64_t(0) && borrow)) ? 1 : 0;
      sub[w] = d;
    }
    for (size_t w = 0; w < words; ++w) s[w] = add[w] | sub[w];
    if (m % 64) s[words - 1] &= (uint64_t(1) << (m % 64)) - 1;
  }
  int ones = 0;
  for (size_t w = 0; w < words; ++w) ones += popcount64(s[w]);
  return static_cast<int>(m) - ones;
}

}  // namespace detail

inline double ratio(const std::string &a, const std::string &b) {
  const size_t total = a.size() + b.size();
  if (total == 0) return 100.0;
  return 100.0 * (2.0 * detail::lcs_length(a, b)) / static_cast<double>(total);
}

inline double partial_ratio(const std::string &a, const std::string &b) {
  const std::string &shorter = a.size() <= b.size() ? a : b;
  const std::string &longer = a.size() <= b.size() ? b : a;
  const long ls = static_cast<long>(shorter.size());
  const long ll = static_cast<long>(longer.size());
  if (ls == 0) return ll == 0 ? 100.0 : 0.0;
  if (ls == ll) return ratio(shorter, longer);
  double best = 0.0;
  for (long start = -(ls - 1); start < ll; ++start) {
    long lo = std::max(start, 0L);
    long hi = std::min(start + ls, ll);
    if (hi <= lo) continue;
    double score = ratio(shorter, longer.substr(lo, hi - lo));
    if (score > best) {
      best = score;
      if (best >= 100.0) break;
    }
  }
  return best;
}

}  // namespace fuzz
}  // namespace rapidfuzz

#endif  // MOCK_RAPIDFUZZ_FUZZ_HPP
