// Mock of cft's Environment + run() for the reference-parity harness.
// The real cft is a sophisticated set-covering heuristic with a 10 s time
// budget (reference src/spacer_ordering.cpp:303-313); the instances mcaat
// feeds it are tiny (one column per candidate cycle of one subproblem), so
// an exact branch-and-bound (<= 24 columns) / greedy fallback finds the
// same minimum-cardinality covers. Mirrors
// mcaat_tpu/ordering/ordering.py::solve_min_cover_problem so both sides of
// the parity test solve cover identically.
#ifndef MOCK_CFT_CFT_HPP
#define MOCK_CFT_CFT_HPP

#include <algorithm>
#include <cstdint>
#include <functional>  // the real cft headers provide std::function
                       // transitively; spacer_ordering.cpp:497 relies on it
#include <vector>

#include "Instance.hpp"

namespace cft {

struct Timer {
  void restart() {}
};

struct Environment {
  double time_limit = 0.0;
  int verbose = 0;
  Timer timer;
};

struct Solution {
  std::vector<std::size_t> idxs;
};

struct RunResult {
  Solution sol;
};

namespace detail {

inline int popcount64(uint64_t x) { return __builtin_popcountll(x); }

inline int mask_popcount(const std::vector<uint64_t> &m) {
  int c = 0;
  for (uint64_t w : m) c += popcount64(w);
  return c;
}

inline void mask_or(std::vector<uint64_t> &a, const std::vector<uint64_t> &b) {
  for (std::size_t i = 0; i < a.size(); ++i) a[i] |= b[i];
}

inline int gain(const std::vector<uint64_t> &m,
                const std::vector<uint64_t> &covered) {
  int c = 0;
  for (std::size_t i = 0; i < m.size(); ++i)
    c += popcount64(m[i] & ~covered[i]);
  return c;
}

inline bool covers(const std::vector<uint64_t> &covered,
                   const std::vector<uint64_t> &full) {
  for (std::size_t i = 0; i < covered.size(); ++i)
    if ((covered[i] & full[i]) != full[i]) return false;
  return true;
}

struct Exact {
  const std::vector<std::vector<uint64_t>> &masks;
  const std::vector<uint64_t> &full;
  std::vector<std::size_t> order;
  std::vector<std::size_t> best;
  bool have_best = false;

  Exact(const std::vector<std::vector<uint64_t>> &m,
        const std::vector<uint64_t> &f)
      : masks(m), full(f) {
    order.resize(masks.size());
    for (std::size_t i = 0; i < order.size(); ++i) order[i] = i;
    std::stable_sort(order.begin(), order.end(),
                     [&](std::size_t a, std::size_t b) {
                       return mask_popcount(masks[a]) > mask_popcount(masks[b]);
                     });
  }

  bool bound_possible(std::vector<uint64_t> covered, std::size_t start) {
    for (std::size_t p = start; p < order.size(); ++p)
      mask_or(covered, masks[order[p]]);
    return covers(covered, full);
  }

  void rec(std::size_t start, std::vector<uint64_t> covered,
           std::vector<std::size_t> &picked) {
    if (covers(covered, full)) {
      if (!have_best || picked.size() < best.size()) {
        best = picked;
        have_best = true;
      }
      return;
    }
    if (have_best && picked.size() + 1 >= best.size()) return;
    if (!bound_possible(covered, start)) return;
    for (std::size_t pos = start; pos < order.size(); ++pos) {
      std::size_t idx = order[pos];
      if (gain(masks[idx], covered) == 0) continue;
      picked.push_back(idx);
      std::vector<uint64_t> nxt = covered;
      mask_or(nxt, masks[idx]);
      rec(pos + 1, nxt, picked);
      picked.pop_back();
      if (have_best && picked.size() + 1 >= best.size()) return;
    }
  }
};

}  // namespace detail

// Minimum-cardinality set cover (all costs are 1.0 at the call site).
inline RunResult run(const Environment &, const Instance &inst) {
  std::size_t n_rows = inst.rows.size();
  std::size_t words = (n_rows + 63) / 64;
  if (words == 0) words = 1;
  std::vector<std::vector<uint64_t>> masks(inst.cols.size(),
                                           std::vector<uint64_t>(words, 0));
  std::vector<uint64_t> full(words, 0);
  for (std::size_t e = 0; e < n_rows; ++e)
    full[e / 64] |= uint64_t(1) << (e % 64);
  for (std::size_t j = 0; j < inst.cols.size(); ++j)
    for (uint32_t e : inst.cols[j])
      if (e < n_rows) masks[j][e / 64] |= uint64_t(1) << (e % 64);

  std::vector<uint64_t> union_all(words, 0);
  for (const auto &m : masks) detail::mask_or(union_all, m);

  RunResult res;
  std::vector<std::size_t> chosen;
  if (union_all == full && inst.cols.size() <= 24) {
    detail::Exact solver(masks, full);
    std::vector<std::size_t> picked;
    solver.rec(0, std::vector<uint64_t>(words, 0), picked);
    chosen = solver.best;
  } else {
    // greedy + redundancy elimination (also the best-effort path when the
    // universe is not coverable)
    std::vector<uint64_t> covered(words, 0);
    const std::vector<uint64_t> &target = union_all == full ? full : union_all;
    while (!detail::covers(covered, target)) {
      long best = -1;
      int best_gain = 0;
      for (std::size_t i = 0; i < masks.size(); ++i) {
        int g = detail::gain(masks[i], covered);
        if (g > best_gain) {
          best = static_cast<long>(i);
          best_gain = g;
        }
      }
      if (best < 0) break;
      chosen.push_back(static_cast<std::size_t>(best));
      detail::mask_or(covered, masks[best]);
    }
    std::vector<std::size_t> kept = chosen;
    for (std::size_t i : chosen) {
      std::vector<uint64_t> others(words, 0);
      for (std::size_t j : kept)
        if (j != i) detail::mask_or(others, masks[j]);
      if (others == covered)
        kept.erase(std::find(kept.begin(), kept.end(), i));
    }
    chosen = kept;
  }
  std::sort(chosen.begin(), chosen.end());
  res.sol.idxs = chosen;
  return res;
}

}  // namespace cft

#endif  // MOCK_CFT_CFT_HPP
