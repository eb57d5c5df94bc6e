"""Unit contracts for the round-14 staged operators (library-level now,
catalog registration next round per the window-math workflow):
eval-side contamination fractions, and the streaming-incremental
Bradley-Terry fit — warm-started MM pinned bit-for-bit against a
plain-Python replay of the batch schedule, plus the crash-window
idempotency story."""

from __future__ import annotations

import math
import tempfile

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.operators.corpus import eval_contamination
from storm_dynamic_spout_spark.streaming.bt_stream import (
    BT_STREAM_ITERATIONS,
    StreamingBradleyTerry,
)

_MICRO = 1_000_000


# ---------------------------------------------------------------------------
# eval_contamination
# ---------------------------------------------------------------------------


def test_eval_contamination_closed_forms(spark):
    """Hand fixture with 2-grams: eval doc 10 shares half its grams
    with train ('a b' yes, 'b z' no), doc 11 shares none, doc 12 is a
    verbatim copy (frac 1.0), doc 13 is shorter than the gram width
    (no grams -> NULL frac, never flagged)."""
    train = spark.createDataFrame(
        [(0, "a b c d"), (1, "x y")], "doc_id long, text string"
    )
    ev = spark.createDataFrame(
        [
            (10, "a b z"),       # grams: 'a b' (hit), 'b z' (miss)
            (11, "p q r"),       # no overlap
            (12, "a b c d"),     # verbatim train doc
            (13, "solo"),        # 1 token < ngram -> zero grams
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in eval_contamination(train, ev, ngram=2, threshold=0.5).collect()
    }
    assert rows[10]["n_grams"] == 2 and rows[10]["n_overlapping"] == 1
    assert rows[10]["overlap_frac"] == 0.5 and rows[10]["flagged"] is True
    assert rows[11]["n_overlapping"] == 0 and rows[11]["flagged"] is False
    assert rows[12]["overlap_frac"] == 1.0 and rows[12]["flagged"] is True
    assert rows[13]["n_grams"] == 0
    assert rows[13]["overlap_frac"] is None and rows[13]["flagged"] is False


def test_eval_contamination_plan_never_crosses_documents(spark):
    train = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    ev = spark.createDataFrame([(1, "a b d")], "doc_id long, text string")
    plan = (
        eval_contamination(train, ev, ngram=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# ---------------------------------------------------------------------------
# StreamingBradleyTerry
# ---------------------------------------------------------------------------


def _half_up(x: float) -> int:
    return math.floor(x + 0.5)


def _py_mm(pair_counts, init, iterations):
    """The micro-unit MM fold (operators/ranking.py) in plain Python —
    pair_counts: {(a, b): (wins_a, wins_b)} with a < b; init: {item:
    p_micro}."""
    items = sorted({i for ab in pair_counts for i in ab})
    wins = {i: 0 for i in items}
    for (a, b), (wa, wb) in pair_counts.items():
        wins[a] += wa
        wins[b] += wb
    p = dict(init)
    for _ in range(iterations):
        den = {i: 0 for i in items}
        for (a, b), (wa, wb) in pair_counts.items():
            n = wa + wb
            c = _half_up(n * _MICRO / ((p[a] + p[b]) / float(_MICRO)))
            den[a] += c
            den[b] += c
        nxt = {}
        for i in items:
            whole, rem = divmod(wins[i] * _MICRO, den[i])
            nxt[i] = max(whole * _MICRO + _half_up(rem / den[i] * _MICRO), 1)
        p = nxt
    return p


def _py_stream(batches, iterations):
    """Replay the streaming schedule: cumulative pair counts, warm-
    started MM per batch (new items enter at the uniform p=1)."""
    cum: dict = {}
    p: dict = {}
    for rows in batches:
        for w, loser in rows:
            a, b = min(w, loser), max(w, loser)
            wa, wb = cum.get((a, b), (0, 0))
            if w == a:
                wa += 1
            else:
                wb += 1
            cum[(a, b)] = (wa, wb)
        items = sorted({i for ab in cum for i in ab})
        init = {i: p.get(i, _MICRO) for i in items}
        p = _py_mm(cum, init, iterations)
    return p


_B1 = [(1, 2), (1, 2), (2, 3), (3, 1), (1, 3)]
_B2 = [(2, 1), (3, 2), (3, 2), (4, 1), (1, 4), (4, 2)]  # item 4 is NEW


def _bt_fixture_batches(spark):
    return [
        spark.createDataFrame(rows, "winner long, loser long")
        for rows in (_B1, _B2)
    ]


def test_streaming_bt_matches_python_schedule_replay(spark):
    idx = StreamingBradleyTerry(tempfile.mkdtemp(prefix="bt-s1-"))
    b1, b2 = _bt_fixture_batches(spark)
    assert idx.process_batch(b1, 0) is True
    assert idx.process_batch(b2, 1) is True
    got = {
        r["item"]: r["__p_micro"] for r in idx.strengths(spark).collect()
    }
    want = _py_stream([_B1, _B2], BT_STREAM_ITERATIONS)
    assert got == want
    # the report view normalizes to mean 1 over the raw state
    rep = {
        r["item"]: r["strength"]
        for r in idx.strengths_report(spark).collect()
    }
    mean = sum(want.values()) / len(want)
    for i, pv in want.items():
        assert rep[i] == _half_up(pv / mean * _MICRO) / _MICRO


def test_streaming_bt_replayed_batch_is_noop(spark):
    idx = StreamingBradleyTerry(tempfile.mkdtemp(prefix="bt-s2-"))
    b1, b2 = _bt_fixture_batches(spark)
    idx.process_batch(b1, 0)
    idx.process_batch(b2, 1)
    state = sorted(
        (r["item"], r["__p_micro"]) for r in idx.strengths(spark).collect()
    )
    n_pair_rows = idx.cumulative_pairs(spark).count()
    assert idx.process_batch(b2, 1) is False  # at-least-once replay
    assert (
        sorted(
            (r["item"], r["__p_micro"])
            for r in idx.strengths(spark).collect()
        )
        == state
    )
    assert idx.cumulative_pairs(spark).count() == n_pair_rows


def test_streaming_bt_crash_windows_converge(spark):
    """(a) duplicated pair append (crash between append and publish,
    then replay): the cumulative read's dropDuplicates restores the
    once-only sums; (b) strengths published but marker not written:
    the replay short-circuits to the marker instead of warm-starting
    the fit off its own output."""
    import glob
    import os
    import shutil

    work = tempfile.mkdtemp(prefix="bt-s3-")
    idx = StreamingBradleyTerry(work)
    b1, b2 = _bt_fixture_batches(spark)
    idx.process_batch(b1, 0)

    # (a) simulate the replayed append: write batch 1's delta twice
    from storm_dynamic_spout_spark.operators.ranking import pairwise_win_counts

    delta = pairwise_win_counts(b2, "winner", "loser").withColumn(
        "__batch_id", F.lit(1).cast("long")
    )
    delta.write.mode("append").parquet(idx.pairs_dir)
    idx.process_batch(b2, 1)  # appends the same delta again
    got = {
        r["item"]: r["__p_micro"] for r in idx.strengths(spark).collect()
    }
    assert got == _py_stream([_B1, _B2], BT_STREAM_ITERATIONS)

    # (b) roll the marker back one batch; state says as_of_batch=1
    with open(idx.meta_path, "w") as fh:
        fh.write('{"last_batch_id": 0}')
    pair_files = set(glob.glob(os.path.join(idx.pairs_dir, "*.parquet")))
    assert idx.process_batch(b2, 1) is True  # marker-only fast path
    assert set(glob.glob(os.path.join(idx.pairs_dir, "*.parquet"))) == pair_files
    assert {
        r["item"]: r["__p_micro"] for r in idx.strengths(spark).collect()
    } == got
    assert idx._last_batch_id() == 1
    shutil.rmtree(work)


def test_streaming_bt_tracks_batch_refit_direction(spark):
    """Sanity: after enough warm-started batches the streaming fit
    ranks a dominant item above a dominated one, same as the one-shot
    batch fit on the full log."""
    rows = [(1, 2)] * 9 + [(2, 1)] * 1 + [(2, 3)] * 8 + [(3, 2)] * 2
    idx = StreamingBradleyTerry(tempfile.mkdtemp(prefix="bt-s4-"))
    for k in range(4):
        batch = spark.createDataFrame(
            rows[k::4], "winner long, loser long"
        )
        idx.process_batch(batch, k)
    rep = {
        r["item"]: r["strength"]
        for r in idx.strengths_report(spark).collect()
    }
    assert rep[1] > rep[2] > rep[3]


def test_streaming_bt_pair_collapse_keeps_schedule_replay_exact(spark):
    """With a tiny collapse threshold the pair deltas fold mid-stream;
    the fit must stay bit-identical to the uncollapsed schedule replay
    and the delta-file count bounded."""
    import glob
    import os

    idx = StreamingBradleyTerry(
        tempfile.mkdtemp(prefix="bt-s5-"), pairs_compact_files=1
    )
    batches = [_B1, _B2, [(1, 3), (3, 1), (2, 4)], [(4, 3), (3, 4), (1, 2)]]
    for k, rows in enumerate(batches):
        idx.process_batch(
            spark.createDataFrame(rows, "winner long, loser long"), k
        )
    got = {r["item"]: r["__p_micro"] for r in idx.strengths(spark).collect()}
    assert got == _py_stream(batches, BT_STREAM_ITERATIONS)
    n_files = len(glob.glob(os.path.join(idx.pairs_dir, "*.parquet")))
    assert n_files <= 2, f"pair deltas never collapsed: {n_files} files"
    # replay of the last batch is still a no-op after the collapse
    state = sorted(got.items())
    assert idx.process_batch(
        spark.createDataFrame(batches[-1], "winner long, loser long"), 3
    ) is False
    assert sorted(
        (r["item"], r["__p_micro"]) for r in idx.strengths(spark).collect()
    ) == state
