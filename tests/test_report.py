"""CRISPRAnalyzer filter-cascade tests (reference include/post_processing.h)."""

from mcaat_tpu.report.analyzer import CRISPRAnalyzer


def make_analyzer(systems, tmp_path, **kw):
    return CRISPRAnalyzer(systems, str(tmp_path / "report.txt"), **kw)


def diverse_spacers(n=4, length=30):
    import numpy as np

    rng = np.random.default_rng(42)
    return ["".join("ACGT"[i] for i in rng.integers(0, 4, size=length)) for _ in range(n)]


def test_report_basic_system(tmp_path):
    repeat = "G" * 12 + "A" * 12 + "C" * 6  # 30 bp
    spacers = diverse_spacers(4, 30)
    an = make_analyzer({repeat: spacers}, tmp_path)
    text = an.run_analysis()
    assert "Number of Systems: 1" in text
    assert f"Number of Spacers: {len(spacers)}" in text
    for sp in spacers:
        assert sp in text
    assert repeat in text


def test_report_single_spacer_omitted(tmp_path):
    an = make_analyzer({"G" * 30: ["A" * 30]}, tmp_path)
    text = an.run_analysis()
    assert "Number of Systems: 0" in text
    assert "Omitted Repeats: 1" in text


def test_report_similar_spacers_omitted(tmp_path):
    # nearly identical spacers fail the diversity gate (mean ratio > 90)
    base = diverse_spacers(1, 30)[0]
    spacers = [base, base[:-1] + "A", base[:-1] + "C"]
    an = make_analyzer({"G" * 12 + "A" * 12 + "C" * 6: spacers}, tmp_path)
    text = an.run_analysis()
    assert "Number of Systems: 0" in text


def test_report_repeat_out_of_bounds_omitted(tmp_path):
    # repeat longer than max_rl -> omitted
    an = make_analyzer({"G" * 60: diverse_spacers(3, 30)}, tmp_path)
    text = an.run_analysis()
    assert "Number of Systems: 0" in text


def test_report_common_prefix_extends_repeat(tmp_path):
    # all spacers share a 4bp prefix: it belongs to the repeat
    repeat = "G" * 12 + "A" * 12 + "C" * 2  # 26 bp
    core = diverse_spacers(4, 30)
    spacers = ["TTCA" + s for s in core]
    an = make_analyzer({repeat: spacers}, tmp_path)
    text = an.run_analysis()
    assert "Number of Systems: 1" in text
    # Reference behavior (post_processing.h:158-165,230-246), replayed
    # candidate order included (native.umap_order): for this input the
    # unordered_map iterates the nested candidates longest-first, so pass
    # 1 trims the whole "TTCA" from every spacer; pass 2 then finds no
    # common prefix on the diverse cores and reconstructs from the
    # ORIGINAL repeat (the reference rebuilds from `pair.first`, not the
    # pass-1 result) — the reported repeat is unchanged and the spacers
    # are the bare cores.
    assert repeat in text
    for s in core:
        assert s in text
        assert "TTCA" + s not in text


def test_parse_input_roundtrip(tmp_path):
    an = make_analyzer({}, tmp_path)
    an.parse_input(
        "Repeat: AAAA\nNumber of Spacers: 2\nSpacers:\nCCCC\nGGGG\n"
        "----------------------------------\n"
    )
    assert an.systems == {"AAAA": ["CCCC", "GGGG"]}
