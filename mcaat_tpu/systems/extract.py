"""Repeat/spacer extraction from ordered cycles.

Faithful reimplementation of ``get_systems`` (reference
``src/tmp_utils.cpp:201-323``): the repeat/spacer boundary is found by
scanning cycle positions for base branch points (with point-mutation
tolerance), the repeat length is ``ext_left + ext_right - k`` (the
reference's arithmetic, tmp_utils.cpp:266 — preserved verbatim including
its quirks, SURVEY §7.3 risk 3), each cycle is rotated so the repeat
leads, and the consensus repeat is the most frequent per-cycle repeat.

Labels come from the graph's packed k-mer table; each node's contributed
base is the *last* character of its label, matching the reference's
node-chain → string reconstruction.
"""

from __future__ import annotations

from mcaat_tpu.graph.dbg import HostDBG


def get_systems(
    graph: HostDBG, ordered_cycles: list[list[int]]
) -> tuple[str, list[str], str]:
    """Returns (consensus_repeat, spacers, full_sequence)."""
    k = graph.k
    smallest = min(len(c) for c in ordered_cycles)

    labels_cache: dict[int, str] = {}

    def label(node: int) -> str:
        if node not in labels_cache:
            labels_cache[node] = graph.label(node)
        return labels_cache[node]

    # Repeat extension to the right (ref tmp_utils.cpp:212-237):
    # scan forward; a position where the *first* base of the labels branches
    # ends the repeat unless the very next position re-converges
    # (point mutation).
    extension_to_right = 0
    for i in range(smallest - 1):
        next_bp = {label(c[i])[0] for c in ordered_cycles}
        if len(next_bp) > 1:
            next_next_bp = {label(c[i + 1])[0] for c in ordered_cycles}
            if len(next_next_bp) != 1:
                extension_to_right = i
                break

    # Repeat extension to the left (ref tmp_utils.cpp:239-264): scan
    # backward from each cycle's end comparing the *last* base.
    extension_to_left = 0
    for i in range(smallest - 1):
        prev_bp = {label(c[len(c) - i - 1])[-1] for c in ordered_cycles}
        if len(prev_bp) > 1:
            prev_prev_bp = {label(c[len(c) - i - 2])[-1] for c in ordered_cycles}
            if len(prev_prev_bp) != 1:
                extension_to_left = i
                break

    repeat_length = extension_to_left + extension_to_right - k  # ref :266

    # Rotate each cycle so the repeat leads; first repeat_length nodes
    # contribute to the repeat, the rest to the spacer (ref :268-290).
    spacers: list[str] = []
    repeats: list[str] = []
    for cycle in ordered_cycles:
        spacer = []
        repeat = []
        offset_repeat = len(cycle) - extension_to_left
        for i in range(len(cycle)):
            node = cycle[(offset_repeat + i) % len(cycle)]
            ch = label(node)[-1]
            if i < repeat_length:
                repeat.append(ch)
            else:
                spacer.append(ch)
        spacers.append("".join(spacer))
        repeats.append("".join(repeat))

    # Consensus = most frequent repeat (ref :292-305). Tie-break is the
    # reference's first-seen-in-map order; we use first-seen order.
    repeat_count: dict[str, int] = {}
    for r in repeats:
        repeat_count[r] = repeat_count.get(r, 0) + 1
    consensus_repeat = ""
    max_count = 0
    for r, c in repeat_count.items():
        if c > max_count:
            max_count = c
            consensus_repeat = r

    # full_sequence: (consensus repeat, spacer) pairs for cycles whose
    # repeat equals the consensus, plus a trailing consensus repeat
    # (ref :307-321).
    parts: list[str] = []
    for r, s in zip(repeats, spacers):
        if r == consensus_repeat:
            parts.append(r)
            parts.append(s)
    parts.append(consensus_repeat)
    full_sequence = "".join(parts)

    return consensus_repeat, spacers, full_sequence
