"""One dedicated test per documented reference quirk (VERDICT r1 item 7).

Each test pins ONE divergence-prone semantic to its reference citation,
so a failure implicates a single cited line:

* filters.cpp:62-64 + :134 — pop-last node, then trim 21 chars per cycle
  string before spacer splitting.
* spacer_ordering.cpp:400  — every_possible_combination is fed the
  *unmerged* in-order index list (the merged list is computed and
  discarded).
* tmp_utils.cpp:266 + :176-181 — repeat_length = ext_left + ext_right − k
  and the "one letter missing" repeat reconstruction.
* post_processing.h:158-165 — reconstruct_repeat appends prefixes.back()
  and prepends suffixes.front() (not .front()/.back()).
"""

import numpy as np

from mcaat_tpu.graph.dbg import HostDBG
from mcaat_tpu.io.fastq import encode_kmer

K = 23


def _graph_from_strings(strings: list[str]):
    """HostDBG whose node ids are the sorted ranks of all window k-mers
    of the given strings; returns (graph, id_of: kmer-string -> id)."""
    kmers = set()
    for s in strings:
        for i in range(len(s) - K + 1):
            kmers.add(s[i : i + K])
    packed = np.array(sorted(encode_kmer(s) for s in kmers), dtype=np.int64)
    n = len(packed)
    graph = HostDBG(
        k=K,
        kmers=packed,
        mult=np.full(n, 50, dtype=np.int32),
        out=np.full((n, 4), -1, dtype=np.int32),
        in_=np.full((n, 4), -1, dtype=np.int32),
        valid=np.ones(n, dtype=bool),
    )
    id_of = {s: int(np.searchsorted(packed, encode_kmer(s))) for s in kmers}
    return graph, id_of


def _windows(s: str) -> list[str]:
    return [s[i : i + K] for i in range(len(s) - K + 1)]


def _rng_seq(rng, n):
    return "".join("ACGT"[i] for i in rng.integers(0, 4, size=n))


def test_filters_pop_and_21_char_trim():
    """filters.cpp:62-64 (pop last node) + :134 (21-char trim).

    Cycles R+S_i+R yield Filters spacers of exactly S_i + R[:8]: the
    popped node removes 1 char, the trim removes 21 more, leaving 8 of
    the trailing 30-char repeat glued to each spacer.
    """
    from mcaat_tpu.systems.filters import Filters

    rng = np.random.default_rng(42)
    R = _rng_seq(rng, 30)
    S = [_rng_seq(rng, 34) for _ in range(3)]
    cycle_strings = [R + s + R for s in S]
    graph, id_of = _graph_from_strings(cycle_strings)
    cycles = {0: [[id_of[w] for w in _windows(cs)] for cs in cycle_strings]}

    arrays, n_spacers = Filters(graph, cycles).list_arrays()
    assert R in arrays, arrays.keys()
    expected = [s + R[:8] for s in S]
    assert arrays[R] == expected
    assert n_spacers == 3
    # the trim amount is the load-bearing constant: with trim != 21 the
    # glued tail would not be exactly 30 - 21 - 1 = 8 chars
    assert all(len(sp) == 34 + 8 for sp in arrays[R])


def test_unmerged_combination_quirk():
    """spacer_ordering.cpp:400: the UNMERGED in-order index list feeds
    every_possible_combination, so a read touching cycle 0 twice before
    cycle 1 contributes the (0, 1) constraint TWICE (a merged list would
    emit it once)."""
    from mcaat_tpu.ordering.ordering import generate_constraints_from_read

    node_to_cycle = {10: 0, 11: 0, 20: 1}
    read = [10, 11, 20]
    got = generate_constraints_from_read(read, node_to_cycle)
    assert got == [(0, 1), (0, 1)]  # duplicated — unmerged quirk
    # sanity: identical adjacent values never pair with themselves
    assert all(a != b for a, b in got)


def test_repeat_arithmetic_and_one_letter_missing():
    """tmp_utils.cpp:266 (repeat_length = ext_l + ext_r − k) + :176-181
    ("Idk why, one letter is missing"): for clean circular repeat+spacer
    cycles the reconstructed consensus repeat is the planted repeat minus
    its final base."""
    from mcaat_tpu.systems.extract import get_systems

    rng = np.random.default_rng(7)
    R = _rng_seq(rng, 30)
    S = [_rng_seq(rng, 34) for _ in range(3)]
    circ = [R + s for s in S]
    graph, id_of = _graph_from_strings([c + c[: K - 1] for c in circ])

    def circular_cycle(c: str, start_offset: int) -> list[int]:
        ext = c + c[: K - 1]
        ws = [ext[i : i + K] for i in range(len(c))]
        return [id_of[ws[(start_offset + j) % len(c)]] for j in range(len(c))]

    # start inside the repeat (offset 3) — as enumeration from a
    # high-multiplicity repeat node would; get_systems must rotate
    ordered_cycles = [circular_cycle(c, 3) for c in circ]
    repeat, spacers, full_sequence = get_systems(graph, ordered_cycles)
    assert repeat == R[:-1], (repeat, R)
    assert len(spacers) == len(S)
    # each planted spacer core must appear in its reconstructed spacer
    for got, planted in zip(spacers, S):
        assert planted[2:-2] in got
    assert full_sequence.startswith(repeat)


def test_reconstruct_repeat_prefix_back_suffix_front():
    """post_processing.h:158-165: repeat += prefixes.back();
    repeat = suffixes.front() + repeat — the LAST prefix k-mer and the
    FIRST suffix k-mer, not any other combination."""
    from mcaat_tpu.report.analyzer import CRISPRAnalyzer

    an = CRISPRAnalyzer({}, output_path="/dev/null")
    got = an.reconstruct_repeat("CORE", ["p1", "p2"], ["s1", "s2"])
    assert got == "s1" + "CORE" + "p2"
    assert an.reconstruct_repeat("CORE", [], []) == "CORE"
    assert an.reconstruct_repeat("CORE", ["px"], []) == "COREpx"
    assert an.reconstruct_repeat("CORE", [], ["sx"]) == "sxCORE"
