"""Catalog contract guards (planning-only, no execution): every
registered query must satisfy the driver-compare preconditions —
an oracle exists, column names are unique (the driver sorts columns BY
NAME before hashing; a duplicate name silently corrupts the compare),
names are stable across two plan constructions, and no query leaks
internal ``__``-prefixed working columns."""

from __future__ import annotations

from storm_dynamic_spout_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"


#: Every registered query is oracle-backed — round 4 closed the last
#: gap (stream_incremental_dedup's dup-log is SQL-expressible as two
#: staged half-corpus CTEs).
ROWS_ONLY: set[str] = set()


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


def _driver_rounds() -> dict[str, int]:
    """Latest driver-correctness round per query, from CORRECTNESS_r*.json."""
    import glob
    import json
    import os
    import re

    last: dict[str, int] = {}
    pat = os.path.join(os.path.dirname(__file__), "..", "CORRECTNESS_r*.json")
    for path in sorted(glob.glob(pat)):
        rnd = int(re.search(r"r0*(\d+)", os.path.basename(path)).group(1))
        with open(path) as fh:
            for q in json.load(fh):
                last[q] = rnd
    return last


def test_first_fifty_registrations_cover_the_stale():
    """The driver's correctness sweep samples the FIRST ~50 registered
    queries (exactly 50 in rounds 1-8).  Round 9's window, per the r8
    verdict: (a) the full round-3-stale cohort (37 queries — TPC-H
    core, scalars, setops, sort, stream windows, window functions)
    drains FIRST, (b) the canary set stays in every window, (c) every
    query whose implementation changed in round 9 after its latest
    driver row re-checks (heavy-hitters distributed fold, LPA converge
    mode), and (d) queries added in round 9 are never staged into a
    backlog — they enter the current window."""
    order = list(QUERIES)
    first50 = set(order[:50])
    last_round = _driver_rounds()

    # (a) the ENTIRE r3 cohort is inside the window — round 9's goal is
    # to retire round-3 evidence completely
    r3_stale = {q for q, r in last_round.items() if r == 3}
    assert r3_stale <= first50, (
        f"round-3-stale queries outside the window: {sorted(r3_stale - first50)}"
    )
    assert order[0] == "tpch_q2", "the r3 cohort leads round 9"
    # nothing with r1/r2-only evidence exists anymore (r7 drained them)
    assert not {q for q, r in last_round.items() if r <= 2}

    # (b) canaries
    canaries = {
        "embedding_quantize", "agg_stats", "scalar_map",
        "events_sessionize",
    }
    assert canaries <= first50, "canary set must stay inside the window"

    # (c) round-9 edits: the stream_heavy_hitters driver-side merge was
    # replaced by a distributed relational fold (r8 verdict item 2) and
    # lpa_labels gained a convergence mode (item 7)
    r9_edited = {"stream_heavy_hitters", "graph_lpa_communities"}
    assert r9_edited <= first50, (
        f"round-9-edited queries outside the window: {sorted(r9_edited - first50)}"
    )

    # (d) every never-driver-checked query (the r9 additions) is inside
    # the window
    never_checked = set(QUERIES) - set(last_round)
    assert never_checked <= first50, (
        f"never-driver-checked queries outside the window: "
        f"{sorted(never_checked - first50)}"
    )


def test_window_rotation_discipline():
    """r8 verdict item 8: the overhang AFTER the 50-slot window must
    rotate strictly oldest-cohort-first — the r4 cohort (44 queries)
    precedes r5 (36) precedes r6..., so no cohort can be silently
    orphaned by a future window recomposition.  Once round 10
    completes, max driver-evidence staleness is <= 5 rounds.

    Structural form: walking the registration order PAST slot 50, the
    latest-driver-round must be non-decreasing, where never-checked
    queries count as round 0 (maximally stale — they lead the next
    window; there are none beyond slot 50 this round)."""
    order = list(QUERIES)
    last_round = _driver_rounds()
    tail_rounds = [last_round.get(q, 0) for q in order[50:]]
    assert tail_rounds == sorted(tail_rounds), (
        "overhang is not oldest-cohort-first; first inversion at "
        + str(next(
            (i, order[50:][i])
            for i in range(1, len(tail_rounds))
            if tail_rounds[i] < tail_rounds[i - 1]
        ))
    )
    # the overhang's head is the r4 cohort — it leads round 10
    assert tail_rounds and tail_rounds[0] == 4
