// Mock of cft's Instance for the reference-parity harness (the cft
// submodule is unavailable). Field surface = what the reference consumes
// (src/spacer_ordering.cpp:293-313): cols/costs push_back + rows filled by
// fill_rows_from_cols.
#ifndef MOCK_CFT_INSTANCE_HPP
#define MOCK_CFT_INSTANCE_HPP

#include <cstdint>
#include <vector>

namespace cft {

struct Instance {
  std::vector<std::vector<uint32_t>> cols;  // each column = element indices
  std::vector<double> costs;                // per-column cost (always 1.0 here)
  std::vector<std::vector<uint32_t>> rows;  // element -> covering column ids
};

inline void fill_rows_from_cols(const std::vector<std::vector<uint32_t>> &cols,
                                std::size_t n_rows,
                                std::vector<std::vector<uint32_t>> &rows) {
  rows.assign(n_rows, {});
  for (std::size_t j = 0; j < cols.size(); ++j)
    for (uint32_t e : cols[j])
      if (e < n_rows) rows[e].push_back(static_cast<uint32_t>(j));
}

}  // namespace cft

#endif  // MOCK_CFT_INSTANCE_HPP
