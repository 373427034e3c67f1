"""True reference-output parity: the REFERENCE's own pipeline sources
(compiled unmodified from /root/reference/src against mock support headers,
see tests/reference_parity/) run over a graph built by mcaat_tpu, and the
two CRISPR_Arrays.txt reports are compared.

This covers everything downstream of the graph build — CycleFinder (FBCE),
read mapping, spacer ordering, get_systems, CRISPRAnalyzer — against the
actual reference implementation, not a fixture this repo generated itself
(VERDICT r1 "What's missing" #3). The build stage itself cannot be
cross-checked: the megahit submodule is empty in the reference snapshot.

Canonicalization (SURVEY §7.3 risk 2): the reference iterates
unordered_map/unordered_set when emitting systems and spacers, so block
order and in-block spacer order are hash-order artifacts. Reports are
compared as {repeat: set(spacers)} plus the footer counters.

Scope of the parity claim: the driver pins ``threads=1``
(ref_driver.cpp) — the reference's multi-threaded output is
schedule-dependent (shared ``visited`` races decide which start nodes
are suppressed, src/cycle_finder.cpp:217-223,476), so only its
deterministic single-thread schedule is a comparable oracle.

Security note: this harness COMPILES AND EXECUTES unmodified sources
from /root/reference (untrusted public content) with the test runner's
privileges. That is inherent to a true-parity oracle; the tests are
opt-in (@slow, auto-skip when the tree or compiler is absent) — do not
point MCAAT_REFERENCE_DIR at a tree you have not reviewed.
"""

from __future__ import annotations

import os
import re
import shutil
import subprocess

import pytest

from mcaat_tpu.pipeline import build_graph_from_settings, run_pipeline
from mcaat_tpu.settings import Settings
from tests.synthetic import make_metagenome, write_fastq

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HARNESS = os.path.join(REPO, "tests", "reference_parity")
REFERENCE_DIR = os.environ.get("MCAAT_REFERENCE_DIR", "/root/reference")


@pytest.fixture(scope="module")
def ref_driver():
    if not os.path.isdir(os.path.join(REFERENCE_DIR, "src")):
        pytest.skip(f"reference tree not available at {REFERENCE_DIR}")
    if shutil.which("g++") is None and shutil.which("c++") is None:
        pytest.skip("no C++ compiler available")
    build = subprocess.run(
        ["make", f"REFERENCE_DIR={REFERENCE_DIR}"],
        cwd=HARNESS,
        capture_output=True,
        text=True,
    )
    if build.returncode != 0:
        pytest.skip(f"reference driver build failed:\n{build.stderr[-2000:]}")
    return os.path.join(HARNESS, "build", "ref_driver")


def parse_report(text: str):
    """Report -> (set of (repeat, frozenset(spacers)), footer dict)."""
    sep = "-" * 50
    lines = text.splitlines()
    systems = set()
    i = 0
    while i < len(lines):
        # a system block is: sep, repeat, sep, spacers..., sep,
        # "Number of Spacers: n", sep
        if (
            lines[i] == sep
            and i + 2 < len(lines)
            and lines[i + 2] == sep
            and lines[i + 1]
            and not lines[i + 1].startswith(("Number of", "Omitted"))
            and re.fullmatch(r"[ACGT]+", lines[i + 1])
        ):
            repeat = lines[i + 1]
            j = i + 3
            spacers = []
            while j < len(lines) and lines[j] != sep:
                if lines[j]:
                    spacers.append(lines[j])
                j += 1
            systems.add((repeat, frozenset(spacers)))
            # skip past the trailing "Number of Spacers" + sep
            while j < len(lines) and lines[j] != "":
                j += 1
            i = j
        else:
            i += 1
    footer = {}
    for key in ("Number of Systems", "Omitted Repeats"):
        m = re.search(rf"^{key}: (\d+)$", text, re.M)
        if m:
            footer[key] = int(m.group(1))
    # the LAST "Number of Spacers" line is the footer total
    totals = re.findall(r"^Number of Spacers: (\d+)$", text, re.M)
    if totals:
        footer["Number of Spacers"] = int(totals[-1])
    return systems, footer


def run_both(tmp_path, meta, name: str):
    fq = tmp_path / f"{name}.fq"
    write_fastq(str(fq), meta["reads"])
    settings = Settings(
        input_files=str(fq),
        output_file=str(tmp_path / f"{name}_tpu.txt"),
    )

    # TPU pipeline (fresh, same input)
    result = run_pipeline(settings, verbose=False)

    # reference pipeline over the SAME graph
    graph = build_graph_from_settings(settings)
    from mcaat_tpu.io.export import write_graph_dump

    dump = tmp_path / f"{name}.dump"
    write_graph_dump(str(dump), graph)
    ref_out = tmp_path / f"{name}_ref.txt"
    return result, dump, ref_out, fq


def _run_ref(ref_driver, dump, ref_out, fq):
    proc = subprocess.run(
        [ref_driver, str(dump), str(ref_out), str(fq)],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"ref_driver failed:\n{proc.stderr[-2000:]}"
    with open(ref_out) as fh:
        return fh.read(), proc.stdout


def assert_counters_match(ref_stdout: str, result) -> None:
    """Intermediate-stage parity from the driver's progress prints:
    result-map size (start nodes) and kept-read count."""
    m = re.search(r"Number of nodes in results: (\d+)", ref_stdout)
    assert m and int(m.group(1)) == len(result.cycles_map)
    m = re.search(r"Found (\d+) reads", ref_stdout)
    assert m and int(m.group(1)) == len(result.reads)


@pytest.mark.slow
def test_report_parity_single_array(tmp_path, ref_driver):
    meta = make_metagenome(seed=3, n_arrays=1, n_spacers=6, coverage=40.0)
    result, dump, ref_out, fq = run_both(tmp_path, meta, "one")
    ref_text, ref_stdout = _run_ref(ref_driver, dump, ref_out, fq)
    ref_systems, ref_footer = parse_report(ref_text)
    tpu_systems, tpu_footer = parse_report(result.report_text)
    assert tpu_systems == ref_systems
    assert tpu_footer == ref_footer
    assert ref_footer.get("Number of Systems", 0) >= 1
    assert_counters_match(ref_stdout, result)


@pytest.mark.slow
def test_report_parity_multi_array(tmp_path, ref_driver):
    meta = make_metagenome(seed=17, n_arrays=3, n_spacers=5, coverage=35.0)
    result, dump, ref_out, fq = run_both(tmp_path, meta, "multi")
    ref_text, ref_stdout = _run_ref(ref_driver, dump, ref_out, fq)
    ref_systems, ref_footer = parse_report(ref_text)
    tpu_systems, tpu_footer = parse_report(result.report_text)
    assert tpu_systems == ref_systems
    assert tpu_footer == ref_footer
    assert_counters_match(ref_stdout, result)
