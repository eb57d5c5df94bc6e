"""Spark-level contracts of operators/sketch.py that the catalog
queries don't exercise: integral-keyed heavy hitters (text uses string
keys; streaming uses the summaries variant) and the loud NULL-key
rejection added in the round-7 review pass.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F


def test_heavy_hitters_exact_integral_key(spark):
    """End-to-end two-pass heavy hitters over a BIGINT key column —
    the output schema derives from the input type, the candidate set
    survives Arrow round-trips, and the result equals brute force."""
    from storm_dynamic_spout_spark.operators.sketch import heavy_hitters_exact

    vals = [1] * 40 + [2] * 25 + [3] * 5 + list(range(100, 130))
    df = spark.createDataFrame([(v,) for v in vals], "k long").repartition(4)
    k = 3
    got = {
        (r["k"], r["n_occurrences"], r["n_total"])
        for r in heavy_hitters_exact(df, "k", k).collect()
    }
    n = len(vals)
    exact = Counter(vals)
    want = {(v, c, n) for v, c in exact.items() if c * (k + 1) > n}
    assert got == want
    # type preserved: join key stayed bigint end to end
    out = heavy_hitters_exact(df, "k", k)
    assert dict(out.dtypes)["k"] == "bigint"


def test_partition_summaries_integral_key(spark):
    """partition_mg_summaries on a BIGINT column: counter rows carry
    long keys, the single NULL row carries the partition count, and
    totals add up."""
    from storm_dynamic_spout_spark.operators.sketch import partition_mg_summaries

    df = spark.createDataFrame(
        [(v,) for v in [7] * 20 + [8] * 10 + [9]], "k long"
    ).coalesce(1)
    rows = partition_mg_summaries(df, "k", 2).collect()
    counts = {r["k"]: r["est"] for r in rows if r["k"] is not None}
    total = sum(r["part_rows"] for r in rows if r["k"] is None)
    assert total == 31
    assert set(counts) <= {7, 8, 9} and 7 in counts  # 7 must survive k=2
    assert all(isinstance(key, int) for key in counts)


def test_null_key_rejected_loudly(spark):
    """A NULL in the key column must abort the sketch pass with the
    documented ValueError (silently dropping it would diverge from a
    GROUP BY oracle that counts the NULL group)."""
    from storm_dynamic_spout_spark.operators.sketch import (
        heavy_hitters_exact,
        partition_mg_summaries,
    )

    df = spark.createDataFrame([("a",), (None,), ("a",)], "k string")
    with pytest.raises(Exception, match="NULL key in heavy-hitter column"):
        heavy_hitters_exact(df, "k", 4).collect()
    with pytest.raises(Exception, match="NULL key in heavy-hitter column"):
        partition_mg_summaries(df, "k", 4).collect()


# -- mergeability under restart/redelivery (SEMANTICS.md row 18) -----------


def test_mg_merge_across_batches_with_redelivery(spark):
    """The streaming heavy-hitter fold (stream_heavy_hitters'
    micro-batch pattern) under a simulated restart: four micro-batches
    arrive, the offset commit for batch 1 is lost, and the batch is
    REDELIVERED before the stream resumes — at-least-once delivery.
    The mergeable-MG claim (SEMANTICS.md row 18): the driver-held
    k-counter summary stays a candidate SUPERSET of every key above
    the n/(k+1) share of the DELIVERED stream — duplicates only add
    counts, so redelivery can never evict a true heavy hitter below
    what a loss-free fold would keep — and the exact verify pass (which
    recounts the true table, the redelivery-safe total) then matches
    the one-pass batch sketch on the concatenated input exactly."""
    from storm_dynamic_spout_spark.operators.sketch import (
        heavy_hitters_exact,
        merge_summaries,
        partition_mg_summaries,
    )

    k = 31
    # skewed fixture: 3 true heavy hitters well above n/(k+1), a flat
    # tail far below it; every key class appears in every batch (row
    # index mod 4) so the split is adversarial to nothing
    rows = []
    rid = 0
    for uid, cnt in ((1, 2000), (2, 1500), (3, 1000)):
        for _ in range(cnt):
            rows.append((rid, uid))
            rid += 1
    for i in range(5500):
        rows.append((rid, 100 + i % 550))  # 10 occurrences each
        rid += 1
    df = spark.createDataFrame(rows, "row_id long, user_id long").repartition(8)
    n_true = len(rows)

    def fold(state, batch_df):
        combined: dict = {}
        n = 0
        for r in partition_mg_summaries(batch_df.select("user_id"), "user_id", k).collect():
            if r["user_id"] is None:
                n += r["part_rows"]
            else:
                combined[r["user_id"]] = combined.get(r["user_id"], 0) + r["est"]
        return merge_summaries(state, combined, k), n

    batches = [df.filter(F.col("row_id") % 4 == p) for p in range(4)]
    state: dict = {}
    delivered = 0
    # batches 0, 1, 2 -> crash before committing batch 1 -> batch 1
    # redelivered on restart -> batch 3
    for b in (batches[0], batches[1], batches[2], batches[1], batches[3]):
        state, n = fold(state, b)
        delivered += n
        assert len(state) <= k, "driver state must stay O(k)"
    assert delivered == n_true + batches[1].count()  # duplicates counted

    # candidate superset of the delivered-stream heavy hitters implies
    # superset of the true ones (true count <= delivered count)
    expect = {
        r["user_id"]: r["n_occurrences"]
        for r in heavy_hitters_exact(df, "user_id", k).collect()
    }
    assert expect, "fixture must produce heavy hitters"
    assert set(expect) <= set(state), (
        f"redelivery evicted true heavy hitters: {sorted(set(expect) - set(state))}"
    )

    # exact verify pass over the true table (the redelivery-safe total)
    # reproduces the one-pass batch result bit-for-bit
    cands = spark.createDataFrame([(int(c),) for c in sorted(state)], "user_id long")
    verified = {
        r["user_id"]: r["n_occurrences"]
        for r in (
            df.join(F.broadcast(cands), "user_id")
            .groupBy("user_id")
            .agg(F.count(F.lit(1)).alias("n_occurrences"))
            .filter(F.col("n_occurrences") * (k + 1) > F.lit(n_true))
            .collect()
        )
    }
    assert verified == expect


def test_mg_truncate_matches_dict_merge(spark):
    """mg_truncate (the relational fold the r8 verdict asked for) must
    reproduce merge_summaries' cut semantics exactly: subtract the
    (k+1)-st largest estimate, keep positives, never exceed k rows."""
    from storm_dynamic_spout_spark.operators.sketch import (
        merge_summaries,
        mg_truncate,
    )

    cases = [
        {1: 10, 2: 8, 3: 8, 4: 5, 5: 1},       # ties at the cut
        {1: 3, 2: 2},                            # under k: no-op
        {i: i for i in range(1, 12)},            # well over k
        {1: 7, 2: 7, 3: 7, 4: 7},                # all tied -> all cut
        {},                                       # empty
    ]
    for k in (1, 3, 5):
        for counters in cases:
            want = merge_summaries({}, counters, k)
            df = spark.createDataFrame(
                [(key, c) for key, c in counters.items()] or [],
                "user_id long, est long",
            )
            got = {
                r["user_id"]: r["est"]
                for r in mg_truncate(df, "user_id", k).collect()
            }
            assert got == want, (k, counters)
            assert len(got) <= k


def test_mg_truncate_plan_is_distributed(spark):
    """The cut lookup must plan as TakeOrderedAndProject (k+1-bounded
    per-partition heaps) broadcast back — no global Sort, no
    single-partition Window, so the fold scales with partition count."""
    from storm_dynamic_spout_spark.operators.sketch import mg_truncate

    df = spark.range(1000).select(
        F.col("id").alias("user_id"), (F.col("id") % 7).alias("est")
    )
    plan = mg_truncate(df, "user_id", 5)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
