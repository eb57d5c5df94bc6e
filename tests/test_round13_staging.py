"""Unit contracts for the round-13 staged operators (library-level now,
catalog registration next round per the window-math workflow):
Bradley-Terry preference strengths — micro-unit MM iterations pinned
bit-for-bit against a plain-Python fold, plus analytic sanity on a
closed-form matchup."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.operators.ranking import (
    BT_ITERATIONS,
    bradley_terry_strengths,
    pairwise_win_counts,
)

_MICRO = 1_000_000


def _half_up(x: float) -> int:
    """Spark F.round semantics for positive arguments (HALF_UP),
    where Python's round() is banker's."""
    return math.floor(x + 0.5)


def _python_bt(pair_rows, iterations=BT_ITERATIONS):
    """The identical micro-unit MM fold in plain Python — every
    expression mirrors the Spark column tree shape exactly."""
    items = sorted({r[0] for r in pair_rows} | {r[1] for r in pair_rows})
    wins = {i: 0 for i in items}
    ncomp = {i: 0 for i in items}
    for a, b, wa, wb in pair_rows:
        wins[a] += wa
        wins[b] += wb
        ncomp[a] += wa + wb
        ncomp[b] += wa + wb
    p = {i: _MICRO for i in items}
    for _ in range(iterations):
        denom = {i: 0 for i in items}
        for a, b, wa, wb in pair_rows:
            n = wa + wb
            c = _half_up(n * _MICRO / ((p[a] + p[b]) / float(_MICRO)))
            denom[a] += c
            denom[b] += c
        # mirror the engine's overflow-safe split exactly: whole
        # micro-units via integer division, fractional part via ONE
        # correctly-rounded IEEE division (int/int -> float in CPython
        # is correctly rounded, same as Spark's long/long)
        p = {}
        for i in items:
            whole, rem = divmod(wins[i] * _MICRO, denom[i])
            p[i] = max(whole * _MICRO + _half_up(rem / denom[i] * _MICRO), 1)
    mean = sum(float(v) for v in p.values()) / len(items)
    return {
        i: (
            _half_up(p[i] / mean * _MICRO) / _MICRO,
            wins[i],
            ncomp[i],
        )
        for i in items
    }


_FIXTURE = [
    # (item_a, item_b, wins_a, wins_b) — canonical a < b
    (1, 2, 7, 3),
    (1, 3, 2, 5),
    (2, 3, 4, 4),
    (2, 4, 1, 6),
    (3, 4, 5, 2),
    (1, 4, 3, 3),
]


def test_bradley_terry_matches_python_fold(spark):
    """Bit-exact vs the Python fold — exactness holds at ANY iteration
    count, so use a small one to keep the job cascade short."""
    pairs = spark.createDataFrame(
        _FIXTURE, "item_a long, item_b long, wins_a long, wins_b long"
    )
    got = {
        r["item"]: (r["strength"], r["n_wins"], r["n_comparisons"])
        for r in bradley_terry_strengths(pairs, iterations=6).collect()
    }
    assert got == _python_bt(_FIXTURE, iterations=6)


def test_bradley_terry_analytic_two_items(spark):
    """A beats B 3:1 — the closed-form MLE has p_A/p_B = 3; the default
    MM iteration budget must land within 3e-3 relative."""
    pairs = spark.createDataFrame(
        [(1, 2, 3, 1)], "item_a long, item_b long, wins_a long, wins_b long"
    )
    got = {r["item"]: r["strength"] for r in bradley_terry_strengths(pairs).collect()}
    assert abs(got[1] / got[2] - 3.0) < 3e-3
    # normalization: mean strength is 1 (to rounding)
    assert abs((got[1] + got[2]) / 2 - 1.0) < 1e-5


def test_bradley_terry_strength_order_tracks_dominance(spark):
    got = {
        r["item"]: r["strength"]
        for r in bradley_terry_strengths(
            spark.createDataFrame(
                _FIXTURE, "item_a long, item_b long, wins_a long, wins_b long"
            ),
            iterations=6,
        ).collect()
    }
    # item 3 has the best record (9 wins of 16), item 4 nearly balanced
    # (11 of 21), item 2 under .5, item 1 even (12 of 23) — the fit
    # must at least put the best-record item on top
    assert max(got, key=got.get) == 3


def test_pairwise_win_counts_canonicalizes(spark):
    log = spark.createDataFrame(
        [(5, 2), (2, 5), (5, 2), (9, 5)], "winner long, loser long"
    )
    rows = {
        (r["item_a"], r["item_b"]): (r["wins_a"], r["wins_b"])
        for r in pairwise_win_counts(log, "winner", "loser").collect()
    }
    assert rows == {(2, 5): (1, 2), (5, 9): (0, 1)}


def _python_greedy_bpe(word, merges):
    syms = list(word)
    for a, b in merges:
        out = [syms[0]] if syms else []
        for x in syms[1:]:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        syms = out
    return syms


def test_apply_bpe_merges_matches_python_greedy(spark):
    """Tokenizer application shares the trainer's greedy left-to-right
    fold exactly — pinned against a plain-Python reference over words
    with overlapping runs ('aaa'-style, where simultaneous-replacement
    variants diverge)."""
    from storm_dynamic_spout_spark.operators.text import apply_bpe_merges, chars

    words = ["banana", "bandana", "aaa", "aaaa", "abab", "x", "aa"]
    merges = [("a", "a"), ("a", "n"), ("an", "a"), ("b", "an")]
    df = spark.createDataFrame([(w,) for w in words], "word string")
    got = {
        r["word"]: list(r["toks"])
        for r in df.select(
            "word", apply_bpe_merges(chars(F.col("word")), merges).alias("toks")
        ).collect()
    }
    assert got == {w: _python_greedy_bpe(w, merges) for w in words}


def test_cohen_kappa_closed_forms(spark):
    """Hand-checked kappa: 8 items, two raters, binary labels — one
    disagreement (item 6), marginals A:{y:4,n:4} B:{y:5,n:3} ->
    po=7/8=.875, pe=(4*5+4*3)/64=.5, kappa=(.875-.5)/.5=.75.  Perfect
    agreement -> 1.0; constant single-label raters -> NULL (pe=1
    guard).  Items labeled by only one rater are excluded from
    n_items."""
    from storm_dynamic_spout_spark.operators.ranking import cohen_kappa

    a_labels = ["y", "y", "y", "y", "n", "n", "n", "n"]
    b_labels = ["y", "y", "y", "y", "n", "n", "y", "n"]
    rows = [(i, "r1", la) for i, la in enumerate(a_labels)] + [
        (i, "r2", lb) for i, lb in enumerate(b_labels)
    ] + [(99, "r1", "y")]  # unmatched item: r2 never saw it
    df = spark.createDataFrame(rows, "item long, rater string, label string")
    got = cohen_kappa(df, "item", "rater", "label", "r1", "r2").first()
    assert got["n_items"] == 8
    assert got["po"] == 0.875 and got["pe"] == 0.5 and got["kappa"] == 0.75

    perfect = cohen_kappa(
        spark.createDataFrame(
            [(i, r, l) for i, l in enumerate("ynyn") for r in ("r1", "r2")],
            "item long, rater string, label string",
        ),
        "item", "rater", "label", "r1", "r2",
    ).first()
    assert perfect["kappa"] == 1.0

    constant = cohen_kappa(
        spark.createDataFrame(
            [(i, r, "y") for i in range(4) for r in ("r1", "r2")],
            "item long, rater string, label string",
        ),
        "item", "rater", "label", "r1", "r2",
    ).first()
    assert constant["po"] == 1.0 and constant["pe"] == 1.0
    assert constant["kappa"] is None


def test_bradley_terry_plan_has_no_pair_shuffle_beyond_item_keys(spark):
    """Scale guard: the executed plan must not contain a cartesian or
    nested-loop join — every iteration is broadcast-joined strengths
    onto the pair table."""
    pairs = spark.createDataFrame(
        _FIXTURE, "item_a long, item_b long, wins_a long, wins_b long"
    )
    plan = (
        bradley_terry_strengths(pairs, iterations=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    # exactly ONE nested-loop join is expected: the 1-row normalization
    # broadcast (crossJoin(broadcast(mean)) — the repo's stats pattern);
    # anything more means a pair-table product sneaked in
    assert plan.count("BroadcastNestedLoopJoin") <= 1
