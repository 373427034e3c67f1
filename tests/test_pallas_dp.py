"""Pallas banded-DP kernel parity vs the lax.scan and host scorers."""

import numpy as np
import pytest

from mcaat_tpu.report.batched_fuzz import encode_batch, lcs_batch, ratio_batch
from mcaat_tpu.report.pallas_dp import lcs_batch_pallas, ratio_batch_pallas


def _rand_strings(rng, n, lo=5, hi=64):
    out = []
    for _ in range(n):
        m = int(rng.integers(lo, hi + 1))
        out.append("".join("ACGT"[i] for i in rng.integers(0, 4, size=m)))
    return out


def test_lcs_pallas_matches_scan():
    rng = np.random.default_rng(0)
    a = _rand_strings(rng, 300)
    b = _rand_strings(rng, 300)
    a_c, a_l = encode_batch(a)
    b_c, b_l = encode_batch(b)
    want = np.asarray(lcs_batch(a_c, a_l, b_c, b_l))
    got = np.asarray(lcs_batch_pallas(a_c, a_l, b_c, b_l, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_ratio_pallas_matches_host():
    from mcaat_tpu.report.fuzz import ratio

    rng = np.random.default_rng(1)
    a = _rand_strings(rng, 64, lo=20, hi=50)
    b = _rand_strings(rng, 64, lo=20, hi=50)
    a_c, a_l = encode_batch(a)
    b_c, b_l = encode_batch(b)
    got = np.asarray(ratio_batch_pallas(a_c, a_l, b_c, b_l, interpret=True))
    for i in range(len(a)):
        assert abs(got[i] - ratio(a[i], b[i])) < 1e-4, (a[i], b[i])


def test_lcs_pallas_identical_and_empty():
    a_c, a_l = encode_batch(["ACGTACGTACGTACGTACGTACGT", "", "AAAA"])
    b_c, b_l = encode_batch(["ACGTACGTACGTACGTACGTACGT", "ACGT", "TTTT"])
    got = np.asarray(lcs_batch_pallas(a_c, a_l, b_c, b_l, interpret=True))
    assert got[0] == 24
    assert got[1] == 0
    assert got[2] == 0


def test_lcs_pallas_odd_batch_sizes():
    """Padding to the 1024-lane tile must not disturb live lanes."""
    rng = np.random.default_rng(2)
    for n in (1, 127, 1025):
        a = _rand_strings(rng, n)
        b = _rand_strings(rng, n)
        a_c, a_l = encode_batch(a)
        b_c, b_l = encode_batch(b)
        want = np.asarray(lcs_batch(a_c, a_l, b_c, b_l))
        got = np.asarray(lcs_batch_pallas(a_c, a_l, b_c, b_l, interpret=True))
        np.testing.assert_array_equal(got, want)
