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


def run_both_files(tmp_path, name: str, fq_paths: list):
    """TPU pipeline + graph dump for a prepared input file list."""
    settings = Settings(
        input_files=" ".join(str(p) for p in fq_paths),
        output_file=str(tmp_path / f"{name}_tpu.txt"),
    )
    result = run_pipeline(settings, verbose=False)
    graph = build_graph_from_settings(settings)
    from mcaat_tpu.io.export import write_graph_dump

    dump = tmp_path / f"{name}.dump"
    write_graph_dump(str(dump), graph)
    ref_out = tmp_path / f"{name}_ref.txt"
    return result, dump, ref_out


def _run_ref_args(ref_driver, dump, ref_out, args):
    proc = subprocess.run(
        [ref_driver, str(dump), str(ref_out)] + [str(a) for a in args],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"ref_driver failed:\n{proc.stderr[-2000:]}"
    text = ""
    if os.path.exists(ref_out):
        with open(ref_out) as fh:
            text = fh.read()
    return text, proc.stdout


@pytest.mark.slow
def test_report_parity_paired_end(tmp_path, ref_driver):
    """Paired-end scenario: mate-2 file stored reverse-complemented, both
    pipelines flip it back (reference src/reads.cpp:20-31)."""
    from mcaat_tpu.io.fastq import reverse_complement

    meta = make_metagenome(seed=23, n_arrays=2, n_spacers=5, coverage=45.0)
    reads = meta["reads"]
    half = len(reads) // 2
    fq1 = tmp_path / "pe_1.fq"
    fq2 = tmp_path / "pe_2.fq"
    write_fastq(str(fq1), reads[:half])
    write_fastq(str(fq2), [reverse_complement(r) for r in reads[half:]])
    result, dump, ref_out = run_both_files(tmp_path, "pe", [fq1, fq2])
    ref_text, ref_stdout = _run_ref_args(ref_driver, dump, ref_out, [fq1, fq2])
    assert parse_report(ref_text) == parse_report(result.report_text)
    assert parse_report(ref_text)[1].get("Number of Systems", 0) >= 1
    assert_counters_match(ref_stdout, result)


@pytest.mark.slow
def test_report_parity_rc_only_array(tmp_path, ref_driver):
    """Every read sampled from the REVERSE strand of the planted arrays —
    detection must ride the RC k-mer set both pipelines build."""
    from mcaat_tpu.io.fastq import reverse_complement

    meta = make_metagenome(seed=41, n_arrays=1, n_spacers=6, coverage=45.0)
    meta["reads"] = [reverse_complement(r) for r in meta["reads"]]
    fq = tmp_path / "rc.fq"
    write_fastq(str(fq), meta["reads"])
    result, dump, ref_out = run_both_files(tmp_path, "rc", [fq])
    ref_text, ref_stdout = _run_ref_args(ref_driver, dump, ref_out, [fq])
    assert parse_report(ref_text) == parse_report(result.report_text)
    assert parse_report(ref_text)[1].get("Number of Systems", 0) >= 1
    assert_counters_match(ref_stdout, result)


@pytest.mark.slow
def test_report_parity_mutated_repeats(tmp_path, ref_driver):
    """Repeat copies carrying point mutations: stresses the
    mutation-tolerant repeat extension (src/tmp_utils.cpp:212-264) and
    the analyzer's prefix/suffix reassignment on both sides."""
    import numpy as np

    from tests.synthetic import make_mutated_repeat_array, random_seq, sample_reads

    rng = np.random.default_rng(53)
    reads = []
    for _ in range(2):
        arr_seq, _repeat, _spacers = make_mutated_repeat_array(rng, n_spacers=6)
        template = random_seq(rng, 300) + arr_seq + random_seq(rng, 300)
        reads.extend(sample_reads(rng, template, coverage=45.0))
    fq = tmp_path / "mut.fq"
    write_fastq(str(fq), reads)
    result, dump, ref_out = run_both_files(tmp_path, "mut", [fq])
    ref_text, ref_stdout = _run_ref_args(ref_driver, dump, ref_out, [fq])
    assert parse_report(ref_text) == parse_report(result.report_text)
    assert_counters_match(ref_stdout, result)


@pytest.mark.slow
def test_benchmark_mode_parity(tmp_path, ref_driver):
    """--benchmark mode (src/main_run_and_debug.cpp:142-212): the
    per-system similarity lines and the average line must match the
    reference's, field for field."""
    import contextlib
    import io

    from mcaat_tpu.pipeline import benchmark_results

    meta = make_metagenome(seed=3, n_arrays=1, n_spacers=6, coverage=40.0)
    truth = tmp_path / "truth.txt"
    truth.write_text(
        "".join(a["sequence"] + "\n" for a in meta["arrays"])
    )
    fq = tmp_path / "bm.fq"
    write_fastq(str(fq), meta["reads"])
    result, dump, ref_out = run_both_files(tmp_path, "bm", [fq])
    _, ref_stdout = _run_ref_args(
        ref_driver, dump, ref_out, [fq, "--benchmark", truth]
    )

    settings = Settings(input_files=str(fq), benchmark_file=str(truth))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        benchmark_results(settings, result.found_systems)
    tpu_stdout = buf.getvalue()

    pat = re.compile(
        r"≥([\d.]+)% sequence similarity, with (\d+) spacers, (\d+) duplicate "
        r"spacers, confidence of cycle resolution: ([\d.]+)%, confidence of "
        r"topological sort: ([\d.]+)%, and the repeat: ([ACGT]+), and sequence: "
        r"([ACGT]+)"
    )
    ref_lines = sorted(m.groups() for m in pat.finditer(ref_stdout))
    tpu_lines = sorted(m.groups() for m in pat.finditer(tpu_stdout))
    assert ref_lines and ref_lines == tpu_lines
    avg = re.compile(r"average sequence similarity is ([\d.]+)% with (\d+)/(\d+)")
    assert avg.search(ref_stdout).groups() == avg.search(tpu_stdout).groups()


@pytest.mark.slow
def test_filters_debug_path_parity(tmp_path, ref_driver):
    """DEBUG-main Filters path (src/filters.cpp, compiled into the driver
    with --filters): Filters::ListArrays -> CRISPRAnalyzer vs
    systems/filters.py over the identical cycles map."""
    from mcaat_tpu.cycles.finder import find_cycles
    from mcaat_tpu.report.analyzer import CRISPRAnalyzer
    from mcaat_tpu.systems.filters import Filters

    meta = make_metagenome(seed=13, n_arrays=2, n_spacers=5, coverage=40.0)
    fq = tmp_path / "flt.fq"
    write_fastq(str(fq), meta["reads"])
    settings = Settings(input_files=str(fq))
    graph = build_graph_from_settings(settings)
    from mcaat_tpu.io.export import write_graph_dump

    dump = tmp_path / "flt.dump"
    write_graph_dump(str(dump), graph)
    ref_out = tmp_path / "flt_ref.txt"
    ref_text, ref_stdout = _run_ref_args(ref_driver, dump, ref_out, [fq, "--filters"])

    graph, cycles_map = find_cycles(graph, verbose=False, full_prune=True)
    filters = Filters(graph.to_host(), cycles_map)
    systems, n_spacers = filters.list_arrays()
    analyzer = CRISPRAnalyzer(systems, str(tmp_path / "flt_tpu.txt"))
    tpu_text = analyzer.run_analysis()

    m = re.search(r"Number of spacers: (\d+) before cleaning", ref_stdout)
    assert m and int(m.group(1)) == n_spacers
    assert parse_report(ref_text) == parse_report(tpu_text)


@pytest.mark.slow
def test_tangle_abort_divergence(tmp_path, ref_driver):
    """The ONE documented semantic divergence (cycles/finder.py module
    docstring vs src/cycle_finder.cpp:157-166), pinned: on a >500-cycle
    tangle the reference clears its list and returns whatever accumulated
    after the last clear (junk tail cycles), while mcaat_tpu aborts the
    start node with NO cycles. A clean planted array alongside the tangle
    must be reported identically by both; the reference may additionally
    emit tangle-derived junk systems; we must emit none.
    """
    import numpy as np

    from tests.synthetic import make_bubble_tandem, random_seq, sample_reads

    rng = np.random.default_rng(61)
    meta = make_metagenome(seed=67, n_arrays=1, n_spacers=6, coverage=40.0)
    tangle = make_bubble_tandem(rng)  # 8^3 = 512 cycles of length 72
    reads = list(meta["reads"])
    tangle_template = random_seq(rng, 200) + tangle + random_seq(rng, 200)
    reads.extend(sample_reads(rng, tangle_template, coverage=20.0))
    fq = tmp_path / "tangle.fq"
    write_fastq(str(fq), reads)
    settings = Settings(
        input_files=str(fq), output_file=str(tmp_path / "tangle_tpu.txt")
    )
    result = run_pipeline(settings, verbose=False)

    # our side of the divergence materialized: >= 1 start node aborted with
    # zero cycles (the tangle), and no tangle sequence reaches the report
    assert any(len(v) == 0 for v in result.cycles_map.values()), (
        "expected an aborted (>500-cycle) start node"
    )
    tpu_systems, _ = parse_report(result.report_text)
    planted_repeat = meta["arrays"][0]["repeat"]
    assert any(planted_repeat.startswith(rep) for rep, _sp in tpu_systems), (
        "clean planted array lost next to the tangle"
    )
    for rep, _sp in tpu_systems:
        assert rep not in tangle, "tangle junk leaked into the TPU report"

    graph = build_graph_from_settings(settings)
    from mcaat_tpu.io.export import write_graph_dump

    dump = tmp_path / "tangle.dump"
    write_graph_dump(str(dump), graph)
    ref_out = tmp_path / "tangle_ref.txt"
    ref_text, _ = _run_ref_args(ref_driver, dump, ref_out, [fq])
    ref_systems, _ = parse_report(ref_text)

    # the clean array matches exactly; the reference may carry junk extras
    clean_ref = {(r, s) for r, s in ref_systems if r not in tangle}
    assert clean_ref == tpu_systems
    extras = ref_systems - tpu_systems
    for rep, _sp in extras:
        assert rep in tangle or rep in tangle_template, (
            f"reference extra system not tangle-derived: {rep[:40]}"
        )
