"""Similarity scoring tests: bit-parallel LCS vs naive DP, rapidfuzz
semantics for ratio/partial_ratio, Levenshtein evaluation helpers."""

import numpy as np
import pytest

from mcaat_tpu.evaluation import (
    get_levenshtein_distance,
    get_most_similar_sequence,
    get_number_of_duplicate_spacers,
    get_string_similarity,
)
from mcaat_tpu.report.fuzz import indel_distance, lcs_length, partial_ratio, ratio


def naive_lcs(a: str, b: str) -> int:
    dp = [[0] * (len(b) + 1) for _ in range(len(a) + 1)]
    for i in range(1, len(a) + 1):
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                dp[i][j] = dp[i - 1][j - 1] + 1
            else:
                dp[i][j] = max(dp[i - 1][j], dp[i][j - 1])
    return dp[-1][-1]


def naive_levenshtein(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i in range(1, len(a) + 1):
        prev = dp[0]
        dp[0] = i
        for j in range(1, len(b) + 1):
            cur = dp[j]
            dp[j] = min(prev + (a[i - 1] != b[j - 1]), dp[j - 1] + 1, dp[j] + 1)
            prev = cur
    return dp[-1]


@pytest.mark.parametrize("seed", range(5))
def test_lcs_matches_naive(seed):
    rng = np.random.default_rng(seed)
    for _ in range(20):
        a = "".join("ACGT"[i] for i in rng.integers(0, 4, size=rng.integers(0, 40)))
        b = "".join("ACGT"[i] for i in rng.integers(0, 4, size=rng.integers(0, 40)))
        assert lcs_length(a, b) == naive_lcs(a, b), (a, b)


def test_ratio_known_values():
    assert ratio("abcd", "abcd") == 100.0
    assert ratio("", "") == 100.0
    assert ratio("abcd", "wxyz") == 0.0
    # rapidfuzz: ratio("this is a test", "this is a test!") ~ 96.55
    assert abs(ratio("this is a test", "this is a test!") - 96.5517) < 0.01


def test_indel_distance():
    assert indel_distance("abc", "abc") == 0
    assert indel_distance("abc", "abd") == 2  # substitution costs 2
    assert indel_distance("abc", "ab") == 1


def test_partial_ratio_substring():
    assert partial_ratio("bcd", "abcde") == 100.0
    assert partial_ratio("abcde", "bcd") == 100.0
    assert partial_ratio("AAAA", "CCCCCC") == 0.0


def test_partial_ratio_near_substring():
    # one mismatch in a window of 10 -> ratio = 2*9/(10+10)*100 = 90
    assert partial_ratio("AAAAAAAAAA", "GGAAAAATAAAAAGG") >= 90.0


@pytest.mark.parametrize("seed", range(3))
def test_levenshtein_matches_naive(seed):
    rng = np.random.default_rng(100 + seed)
    for _ in range(15):
        a = "".join("ACGT"[i] for i in rng.integers(0, 4, size=rng.integers(0, 30)))
        b = "".join("ACGT"[i] for i in rng.integers(0, 4, size=rng.integers(0, 30)))
        assert get_levenshtein_distance(a, b) == naive_levenshtein(a, b), (a, b)


def test_string_similarity():
    assert get_string_similarity("ACGT", "ACGT") == 1.0
    assert abs(get_string_similarity("ACGT", "ACGA") - 0.75) < 1e-6


def test_duplicate_spacers():
    assert get_number_of_duplicate_spacers(["AB"], "ABxABxAB") == 2
    assert get_number_of_duplicate_spacers(["AB", "CD"], "ABCDAB") == 1
    assert get_number_of_duplicate_spacers(["ZZ"], "ABCD") == 0


def test_most_similar_sequence():
    assert get_most_similar_sequence("ACGT", ["TTTT", "ACGA", "GGGG"]) == "ACGA"
    assert get_most_similar_sequence("ACGT", []) == ""
