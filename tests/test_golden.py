"""Golden-output regression test (SURVEY §4: golden-output equality).

The fixture input (``tests/data/golden_reads.fq``) holds a planted CRISPR
array (ground truth in ``golden_truth.json``); the committed
``golden_CRISPR_Arrays.txt`` is the pipeline's canonical output for it.
Any semantic change to graph build, cycle search, ordering, systems
extraction, or the report cascade shows up as a diff here.
"""

import json
import os

import pytest

from mcaat_tpu.pipeline import run_pipeline
from mcaat_tpu.settings import Settings

DATA = os.path.join(os.path.dirname(__file__), "data")


@pytest.mark.slow
def test_golden_report_byte_identical(tmp_path):
    s = Settings(
        input_files=os.path.join(DATA, "golden_reads.fq"),
        output_file=str(tmp_path / "CRISPR_Arrays.txt"),
    )
    result = run_pipeline(s, verbose=False)
    expected = open(os.path.join(DATA, "golden_CRISPR_Arrays.txt")).read()
    assert result.report_text == expected


@pytest.mark.slow
def test_golden_truth_recovered(tmp_path):
    truth = json.load(open(os.path.join(DATA, "golden_truth.json")))
    s = Settings(
        input_files=os.path.join(DATA, "golden_reads.fq"),
        output_file=str(tmp_path / "CRISPR_Arrays.txt"),
    )
    result = run_pipeline(s, verbose=False)
    # the reported repeat is the planted repeat minus its final base
    # (reference quirk) on one strand or the other
    from mcaat_tpu.io.fastq import reverse_complement

    repeat = truth[0]["repeat"]
    assert (
        repeat[:-1] in result.report_text
        or reverse_complement(repeat)[:-1] in result.report_text
    )
    assert "Number of Systems: 1" in result.report_text
