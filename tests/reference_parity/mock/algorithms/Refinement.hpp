// Mock placeholder: the reference includes cft's Refinement.hpp
// (include/spacer_ordering.h:31) but consumes nothing from it directly —
// the solve lives behind cft::run (see core/cft.hpp).
#ifndef MOCK_CFT_REFINEMENT_HPP
#define MOCK_CFT_REFINEMENT_HPP
#include "../core/cft.hpp"
#endif
