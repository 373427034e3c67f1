"""CLI argument parsing parity tests (reference src/main.cpp:89-301) and
stage-resume behavior."""

import os

import pytest

from mcaat_tpu.cli import parse_arguments
from mcaat_tpu.settings import parse_ram_to_gb


def make_input(tmp_path, name="r.fq"):
    p = tmp_path / name
    p.write_text("@r\nACGT\n+\nIIII\n")
    return str(p)


def test_parse_basic(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    f = make_input(tmp_path)
    s = parse_arguments(["--input-files", f, "--output-folder", str(tmp_path / "out")])
    assert s.input_files == f
    assert s.output_folder == str(tmp_path / "out")
    assert s.graph_folder == str(tmp_path / "out") + "/graph"
    assert s.output_file.endswith("CRISPR_Arrays.txt")
    assert os.path.isdir(s.graph_folder)
    assert s.threads > 0 and s.ram > 0


def test_parse_two_files(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    f1 = make_input(tmp_path, "a.fq")
    f2 = make_input(tmp_path, "b.fq")
    s = parse_arguments(
        ["--input-files", f1, f2, "--output-folder", str(tmp_path / "o")]
    )
    assert s.input_files == f"{f1} {f2}"
    assert s.fastq_files() == (f1, f2)


def test_missing_input_raises(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    with pytest.raises(RuntimeError, match="No input files"):
        parse_arguments(["--output-folder", str(tmp_path / "o")])
    with pytest.raises(RuntimeError, match="does not exist"):
        parse_arguments(
            ["--input-files", str(tmp_path / "nope.fq"), "--output-folder",
             str(tmp_path / "o")]
        )


def test_cycle_flags(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    f = make_input(tmp_path)
    s = parse_arguments(
        [
            "--input-files", f,
            "--output-folder", str(tmp_path / "o"),
            "--cycle-max-length", "88",
            "--cycle-min-length", "30",
            "--threshold-multiplicity", "15",
            "--low-abundance", "false",
        ]
    )
    cfs = s.cycle_finder_settings
    assert cfs.cycle_max_length == 88
    assert cfs.cycle_min_length == 30
    assert cfs.threshold_multiplicity == 15
    assert cfs.low_abundance is False


def test_settings_file_defaults_cli_overrides(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    f = make_input(tmp_path)
    cfg = tmp_path / "settings.txt"
    cfg.write_text(
        f"input_files={f}\n"
        "threshold_multiplicity=7\n"
        "cycle_max_length=60  # comment\n"
        "// full-line comment\n"
        "threads=3\n"
    )
    s = parse_arguments(
        ["--settings", str(cfg), "--output-folder", str(tmp_path / "o"),
         "--threshold-multiplicity", "9"]
    )
    assert s.input_files == f  # from file
    assert s.cycle_finder_settings.threshold_multiplicity == 9  # CLI wins
    assert s.cycle_finder_settings.cycle_max_length == 60  # file value
    assert s.threads == 3


def test_ram_parsing():
    assert parse_ram_to_gb("4G") == 4.0
    assert parse_ram_to_gb("512M") == 0.5
    assert parse_ram_to_gb("2048K") == pytest.approx(2048 / 1024**2)
    assert parse_ram_to_gb("3.5") == 3.5
    with pytest.raises(ValueError):
        parse_ram_to_gb("4X")


@pytest.mark.slow
def test_pipeline_resume(tmp_path):
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from synthetic import make_metagenome, write_fastq

    from mcaat_tpu.pipeline import run_pipeline
    from mcaat_tpu.settings import Settings

    meta = make_metagenome(seed=5, n_arrays=1, n_spacers=4, coverage=35.0)
    f = tmp_path / "r.fq"
    write_fastq(str(f), meta["reads"])
    ck = str(tmp_path / "ck")
    s = Settings(input_files=str(f), output_file=str(tmp_path / "a.txt"))
    r1 = run_pipeline(s, verbose=False, checkpoint_dir=ck)
    # sharded mode (multi-device) persists per-shard artifacts; the
    # single-device path writes graph.npz
    assert os.path.exists(
        os.path.join(ck, "graph_sharded", "meta.json")
    ) or os.path.exists(os.path.join(ck, "graph.npz"))
    assert os.path.exists(os.path.join(ck, "cycles.json"))
    assert os.path.exists(os.path.join(ck, "reads.json"))
    # resume run must produce the identical report from the checkpoints
    s2 = Settings(input_files=str(f), output_file=str(tmp_path / "b.txt"))
    r2 = run_pipeline(s2, verbose=False, checkpoint_dir=ck)
    assert r1.report_text == r2.report_text


def test_checkpoint_partial_resume_after_crash(tmp_path):
    """Failure-recovery: a run that dies after the cycle stage (simulated
    by deleting the later-stage artifacts) resumes from graph+cycles and
    reproduces the identical report (SURVEY §5 failure-recovery row)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__)))
    from synthetic import make_metagenome, write_fastq

    from mcaat_tpu.pipeline import run_pipeline
    from mcaat_tpu.settings import Settings

    meta = make_metagenome(seed=6, n_arrays=1, n_spacers=4, coverage=35.0)
    f = tmp_path / "r.fq"
    write_fastq(str(f), meta["reads"])
    ck = str(tmp_path / "ck")
    s = Settings(input_files=str(f), output_file=str(tmp_path / "a.txt"))
    r1 = run_pipeline(s, verbose=False, checkpoint_dir=ck)
    # simulate a crash between STEP 6 and the end: read artifacts gone
    os.remove(os.path.join(ck, "reads.json"))
    s2 = Settings(input_files=str(f), output_file=str(tmp_path / "b.txt"))
    r2 = run_pipeline(s2, verbose=False, checkpoint_dir=ck)
    assert r1.report_text == r2.report_text
    assert len(r1.reads) == len(r2.reads)
