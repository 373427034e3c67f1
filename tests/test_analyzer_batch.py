"""The analyzer's batched fast path must match the scalar path exactly."""

import numpy as np

from mcaat_tpu.report.analyzer import CRISPRAnalyzer


def rand_spacers(rng, n, base_len=30):
    out = []
    for _ in range(n):
        out.append("".join("ACGT"[i] for i in rng.integers(0, 4, size=base_len)))
    # add near-duplicates and substrings to exercise the filters
    out.append(out[0][:-2])
    out.append(out[1][2:])
    out.append(out[2][:-1] + "A")
    return out


def test_filter_substring_spacers_batch_matches_scalar(tmp_path):
    rng = np.random.default_rng(12)
    spacers = rand_spacers(rng, 30)
    an = CRISPRAnalyzer({}, str(tmp_path / "r.txt"))
    batch = an.filter_substring_spacers(spacers)  # n > threshold -> batch
    an.BATCH_THRESHOLD = 10**9  # force scalar
    scalar = an.filter_substring_spacers(spacers)
    assert batch == scalar


def test_diversity_batch_matches_scalar(tmp_path):
    rng = np.random.default_rng(13)
    spacers = rand_spacers(rng, 30)
    an = CRISPRAnalyzer({}, str(tmp_path / "r.txt"))
    batch = an.validate_spacer_diversity(spacers)
    an.BATCH_THRESHOLD = 10**9
    scalar = an.validate_spacer_diversity(spacers)
    assert batch == scalar
