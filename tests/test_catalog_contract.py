"""Catalog contract guards (planning-only, no execution): every
registered query must satisfy the driver-compare preconditions —
an oracle exists, column names are unique (the driver sorts columns BY
NAME before hashing; a duplicate name silently corrupts the compare),
names are stable across two plan constructions, and no query leaks
internal ``__``-prefixed working columns.

The window-rotation tests are written to be TRUE IN BOTH STATES of the
current round — before and after the driver writes
``CORRECTNESS_r12.json`` mid-round — by asserting on set differences
that are invariant to the in-window queries' rows landing.  Round 10's
red tests came from an overlay whose truth value flipped when a file
landed; nothing here depends on *when* a file appears, only on which
gaps exist (and gaps fail loudly via :func:`evidence_gaps`)."""

from __future__ import annotations

from storm_dynamic_spout_spark.catalog import (
    KNOWN_GAPS,
    effective_rounds,
    evidence_gaps,
)
from storm_dynamic_spout_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"


#: Every registered query is oracle-backed — round 4 closed the last
#: gap (stream_incremental_dedup's dup-log is SQL-expressible as two
#: staged half-corpus CTEs).
ROWS_ONLY: set[str] = set()

#: Round 15 window composition (r14 verdict items 1 and 2).  The three
#: round-15 registrations of the r14-staged operators — none has a
#: driver row entering round 15, so all three lead the window:
NEVER_CHECKED_AT_R15 = {
    "corpus_decontamination_report", "stream_state_report",
    "text_bpe_encode_vocab",
}

#: The 6 round-7-evidence queries deferred out of round 14's window,
#: entering round 15 at EXACTLY the ≤7-round staleness bound — they
#: occupy slots 4-9 of round 15's window and MUST drain now.  After
#: CORRECTNESS_r15.json lands, NO query anywhere carries round-7
#: evidence.
R7_REMAINDER = {
    "multimodal_image_resize", "multimodal_audio_resample",
    "table_bucketed_join", "table_fk_integrity",
    "table_partition_prune", "table_zorder_roundtrip",
}

#: The r16 plan, encoded NOW (the one-round-ahead discipline): these 9
#: round-8-evidence queries did not fit round 15's 50 slots (3 + 6 +
#: 37 + 4 canaries = 50).  They sit at the overhang's checked head and
#: lead round 16's window, after any never-checked round-15 staging
#: additions (round 0 in the rotation) and before the 46-query r10
#: cohort, which fills the window's remaining slots (e.g. 2 staged +
#: 9 r8 + 35 r10 + 4 = 50, leaving 11 r10 queries to lead round 17 —
#: well inside the ≤7-round bound for the r10 cohort, due r17).
R8_REMAINDER = {
    "multimodal_video_stats", "multimodal_image_phash_pairs",
    "multimodal_audio_fingerprint_pairs", "multimodal_video_containment",
    "multimodal_audio_silence_trim", "multimodal_image_sobel",
    "multimodal_image_patches", "scalar_array", "orderby_limit",
}

CANARIES = {"embedding_quantize", "agg_stats", "scalar_map", "events_sessionize"}


def test_every_query_has_an_oracle():
    assert set(QUERIES) - set(ORACLES) == ROWS_ONLY
    assert set(ORACLES) <= set(QUERIES)
    assert len(QUERIES) >= 93


def test_no_duplicate_or_internal_columns(spark):
    for name, fn in QUERIES.items():
        cols = fn(spark, SF).columns
        assert len(cols) == len(set(cols)), f"{name}: duplicate column names {cols}"
        leaked = [c for c in cols if c.startswith("__")]
        assert not leaked, f"{name}: internal columns leaked {leaked}"


def test_schemas_stable_across_constructions(spark):
    for name, fn in QUERIES.items():
        s1 = fn(spark, SF).schema
        s2 = fn(spark, SF).schema
        assert s1 == s2, f"{name}: non-deterministic schema"


def test_no_unadjudicated_evidence_gaps():
    """The loud replacement for round 9's silent-overlay failure: a
    round with no CORRECTNESS file, while a later round's file exists,
    means some window's queries quietly reverted to much older
    evidence.  This must be adjudicated by recomposing ``_PRIORITY``
    to re-drain that window and adding the round to ``KNOWN_GAPS`` —
    never left implicit.  (Round 9 is the one adjudicated gap: its 37
    queries re-drained through rounds 11-12's windows.)"""
    assert evidence_gaps() == set(), (
        "unadjudicated CORRECTNESS gap(s) — recompose the catalog "
        "window to re-drain the missing round's queries, then add the "
        "round to catalog.KNOWN_GAPS"
    )
    assert KNOWN_GAPS == {9}


def test_evidence_gap_simulation():
    """Gap-simulation guard (r10 verdict item 7): feed synthetic
    rounds-on-disk and confirm a skipped round is DETECTED rather than
    silently reordering the catalog."""
    # the exact round-9 scenario, as adjudicated: known gap -> quiet
    assert evidence_gaps({1, 2, 3, 4, 5, 6, 7, 8, 10}) == set()
    # the future failure mode: r12 never lands, r13 does -> loud
    assert evidence_gaps({1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 13}) == {12}
    # multiple holes all surface
    assert evidence_gaps({1, 2, 5, 10}) == {3, 4, 6, 7, 8}
    # no files at all (fresh checkout) is not a gap
    assert evidence_gaps(set()) == set()


def test_first_fifty_registrations_cover_the_stale():
    """The driver's correctness sweep samples the FIRST ~50 registered
    queries (exactly 50 in every recorded round).  Round 15's window,
    per the r14 verdict: (a) every query with NO driver row entering
    round 15 is in-window (the three round-15 registrations — verdict
    item 2 requires driver rows for them this round), (b) the six
    deferred round-7 queries drain now, at exactly the staleness bound
    — after the r15 file lands, zero r7-latest queries remain,
    (c) canaries stay in every window."""
    order = list(QUERIES)
    first50 = set(order[:50])
    last_round = effective_rounds()

    # (a) the 3 never-checked-entering-r15 queries are all in-window
    assert NEVER_CHECKED_AT_R15 <= first50

    # (b) anything still showing round<=7 evidence is one of the six
    # deferred queries, and all six are in-window draining now.
    # True before CORRECTNESS_r15.json lands (r7_stale == R7_REMAINDER)
    # and after (r7_stale == set()) — no mid-round flip.
    r7_stale = {q for q, r in last_round.items() if r <= 7}
    assert r7_stale <= R7_REMAINDER, (
        f"unplanned round-7-stale queries: {sorted(r7_stale - R7_REMAINDER)}"
    )
    assert R7_REMAINDER <= first50, "deferred r7 six must be in-window"
    # nothing anywhere has evidence older than round 7
    assert not {q for q, r in last_round.items() if r <= 6}

    # (c) canaries
    assert CANARIES <= first50, "canary set must stay inside the window"

    # queries ADDED during round 15 (never checked, not in-window —
    # i.e. the round-16 staging additions) must sit contiguously at
    # the overhang head, where the oldest-first rotation makes them
    # the first slots of round 16.
    never_checked = set(QUERIES) - set(last_round)
    staged = never_checked - first50
    head = order[50 : 50 + len(staged)]
    assert staged == set(head), (
        f"never-checked overhang queries are not contiguous at the "
        f"overhang head: staged={sorted(staged)} head={head}"
    )


def test_window_rotation_discipline():
    """r8 verdict item 8 + the one-round-ahead discipline: the overhang
    AFTER the 50-slot window must rotate strictly oldest-cohort-first,
    so no cohort can be silently orphaned by a future window
    recomposition — and the round-16 plan is pinned structurally: the
    overhang's checked head is exactly the 9-query r8 remainder,
    followed only by the r10 cohort for at least the ~35 slots round
    16's window will drain (e.g. 2 staged + 9 + 35 + 4 canaries =
    50)."""
    order = list(QUERIES)
    last_round = effective_rounds()
    tail_rounds = [last_round.get(q, 0) for q in order[50:]]
    assert tail_rounds == sorted(tail_rounds), (
        "overhang is not oldest-cohort-first; first inversion at "
        + str(next(
            (i, order[50:][i])
            for i in range(1, len(tail_rounds))
            if tail_rounds[i] < tail_rounds[i - 1]
        ))
    )
    checked_tail = [q for q in order[50:] if last_round.get(q, 0) > 0]
    assert checked_tail and last_round[checked_tail[0]] == 8, (
        "overhang's first checked cohort must be the r8 remainder "
        "(round 16's window head)"
    )
    # r16 plan, part 1: the first 9 checked overhang queries are
    # exactly the r8 remainder (never-checked round-15 staging
    # additions may precede them — they count as round 0 and also
    # lead round 16).
    assert set(checked_tail[:9]) == R8_REMAINDER
    assert all(last_round[q] == 8 for q in checked_tail[:9])
    # r16 plan, part 2: after the remainder comes ONLY the r10 cohort
    # for at least the 35 slots the r16 window drains — so even if
    # round 16 recomposes nothing, the natural rotation keeps the
    # <=7-round staleness bound for the whole r10 cohort through
    # rounds 16-17 (r10 evidence is due by round 17).
    after_remainder = checked_tail[9:]
    r10_cohort = {q for q, r in last_round.items() if r == 10}
    assert len(r10_cohort) >= 35
    assert all(
        last_round[q] == 10
        for q in after_remainder[: min(35, len(after_remainder))]
    )
    assert r10_cohort <= set(after_remainder[: len(r10_cohort)])
