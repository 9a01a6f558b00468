// Force-included (gcc -include) ahead of every golden-engine TU.
//
// The reference seeds its RANSAC generator from std::random_device
// (src/core_support/inline_utils.hpp:13-17), which makes PreSync /
// Sync outputs non-reproducible run to run. For golden-file
// generation we need the compiled reference engine to be
// deterministic, so the token `random_device` is redirected to a
// fixed-seed source AFTER <random> is fully included (the real class
// stays intact; only later uses of the token see the override).
// Combined with the serial PSTL backend (-D_GLIBCXX_USE_TBB_PAR_BACKEND=0,
// single thread => single thread_local generator => stable draw
// order), every golden artifact is exactly reproducible.
#pragma once

#include <random>

namespace golden_shim {
struct deterministic_random_device {
    using result_type = unsigned int;
    static constexpr result_type min() { return 0; }
    static constexpr result_type max() { return 4294967295u; }
    result_type operator()() { return 0x5EED5EEDu; }
};
}  // namespace golden_shim

namespace std {
using golden_shim::deterministic_random_device;
}

#define random_device deterministic_random_device
