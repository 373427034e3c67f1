// Mock of parallel-hashmap for the reference-parity harness (the submodule
// is fetched via FetchContent in the reference build and unavailable here).
// The reference only consumes phmap::flat_hash_set<uint64_t> as a visited set
// (src/cycle_finder.cpp:256, src/phage_curator.cpp:50) — std::unordered_set
// is a behavior-identical drop-in (iteration order is never observable in
// those call sites: both loops only test membership / insert / clear).
#ifndef MOCK_PHMAP_H
#define MOCK_PHMAP_H

#include <unordered_map>
#include <unordered_set>

namespace phmap {

template <class Key, class... Rest>
using flat_hash_set = std::unordered_set<Key, Rest...>;

template <class Key, class Value, class... Rest>
using flat_hash_map = std::unordered_map<Key, Value, Rest...>;

}  // namespace phmap

#endif  // MOCK_PHMAP_H
