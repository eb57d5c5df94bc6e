"""Catalog contract guards (planning-only, no execution): every
registered query must satisfy the driver-compare preconditions —
an oracle exists, column names are unique (the driver sorts columns BY
NAME before hashing; a duplicate name silently corrupts the compare),
names are stable across two plan constructions, and no query leaks
internal ``__``-prefixed working columns.

The window-rotation tests are written to be TRUE IN BOTH STATES of the
current round — before and after the driver writes
``CORRECTNESS_r11.json`` mid-round — by asserting on set differences
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

#: Round 11 window composition (r10 verdict item 1).  The 15 queries
#: that had NO driver row entering round 11:
NEVER_CHECKED_AT_R11 = {
    "ann_ivf_train_assign", "ann_topk_ivfpq_trained",
    "ann_topk_ivfpq_tuned", "corpus_curriculum_order",
    "embedding_matryoshka_recall", "embedding_whitened_topk",
    "events_ab_cuped", "events_ab_srm", "events_regression_trend",
    "graph_adamic_adar", "graph_connected_components",
    "join_asof_nearest", "multimodal_video_frame_sample",
    "table_compaction_plan", "text_hashing_trick",
}

#: The 6 round-3-stale queries the 50-slot window could NOT fit
#: (15 never-checked + 31 + 4 canaries = 50).  They lead round 12's
#: window together with the r5 cohort (6 + 36 + 4 canaries = 46).
DEFERRED_R3 = {
    "window_lag_lead", "window_first_last", "window_range_frame",
    "window_distribution", "window_running", "sort_multi_key",
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
    queries re-drain through the round-11 window.)"""
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
    # the future failure mode: r11 never lands, r12 does -> loud
    assert evidence_gaps({1, 2, 3, 4, 5, 6, 7, 8, 10, 12}) == {11}
    # multiple holes all surface
    assert evidence_gaps({1, 2, 5, 10}) == {3, 4, 6, 7, 8}
    # no files at all (fresh checkout) is not a gap
    assert evidence_gaps(set()) == set()


def test_first_fifty_registrations_cover_the_stale():
    """The driver's correctness sweep samples the FIRST ~50 registered
    queries (exactly 50 in every recorded round).  Round 11's window,
    per the r10 verdict: (a) every query with NO driver row enters the
    window, (b) the round-3-stale cohort (the lost round-9 window)
    re-drains — all 37 except the six DEFERRED_R3, which the 50 slots
    cannot fit, (c) canaries stay in every window."""
    order = list(QUERIES)
    first50 = set(order[:50])
    last_round = effective_rounds()

    # (a) the 15 never-checked-entering-r11 queries are all in-window
    assert NEVER_CHECKED_AT_R11 <= first50

    # (b) everything that still shows round<=3 evidence is either
    # in-window (re-draining now) or one of the six deferred queries.
    # True before CORRECTNESS_r11.json lands (37 stale: 31 in window)
    # and after (6 stale: the deferred set) — no mid-round flip.
    r3_stale = {q for q, r in last_round.items() if r <= 3}
    assert r3_stale - first50 <= DEFERRED_R3, (
        f"round-3-stale queries neither in-window nor deferred: "
        f"{sorted(r3_stale - first50 - DEFERRED_R3)}"
    )
    assert DEFERRED_R3 <= r3_stale, (
        "deferred queries got evidence early?  recompute the r12 plan"
    )
    # nothing anywhere has evidence older than round 3
    assert not {q for q, r in last_round.items() if r <= 2}

    # (c) canaries
    assert CANARIES <= first50, "canary set must stay inside the window"

    # queries ADDED during round 11 (never checked, not part of the
    # staged 15) must sit contiguously at the overhang head, where the
    # oldest-first rotation makes them the first slots of round 12.
    never_checked = set(QUERIES) - set(last_round)
    staged = never_checked - first50
    head = order[50 : 50 + len(staged)]
    assert staged == set(head), (
        f"never-checked overhang queries are not contiguous at the "
        f"overhang head: staged={sorted(staged)} head={head}"
    )


def test_window_rotation_discipline():
    """r8 verdict item 8: the overhang AFTER the 50-slot window must
    rotate strictly oldest-cohort-first, so no cohort can be silently
    orphaned by a future window recomposition.

    Structural form: walking the registration order PAST slot 50, the
    latest-driver-round must be non-decreasing, with never-checked
    queries counting as round 0 (they lead the next window).  The
    checked part of the overhang starts with the six DEFERRED_R3
    queries (round 3), then the r5 cohort — together with the canaries
    they compose round 12's window (6 + 36 + 4 = 46, four slots free
    for round-12 additions)."""
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
    checked_tail = [r for r in tail_rounds if r > 0]
    assert checked_tail and checked_tail[0] == 3, (
        "overhang's first checked cohort must be the deferred round-3 "
        "six (round 12's window head)"
    )
    # and those six are exactly the first checked queries in the tail
    first_checked = [q for q in order[50:] if last_round.get(q, 0) > 0][:6]
    assert set(first_checked) == DEFERRED_R3
