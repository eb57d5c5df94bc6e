"""ContinuousRollup scenario tests (streaming/rollup.py): incremental
maintenance must equal one-pass recomputation regardless of how history
is split into batches, survive restarts, and ignore redelivered
batches."""

from __future__ import annotations

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.streaming.rollup import ContinuousRollup

SF = "/root/testdata/sf0.001"


def _events(spark):
    e = spark.read.parquet(f"{SF}/events.parquet")
    return e.select(
        "event_id",
        "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )


def _one_pass(e):
    return (
        e.withColumn("bucket_start", F.date_trunc("hour", "ts"))
        .groupBy("bucket_start", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("cents").alias("sum_m"),
            F.min("cents").alias("min_m"),
            F.max("cents").alias("max_m"),
        )
    )


def _as_dict(df):
    return {
        (r["bucket_start"], r["event_type"]): (r["n"], r["sum_m"], r["min_m"], r["max_m"])
        for r in df.collect()
    }


def test_incremental_equals_recompute_any_split(spark, tmp_path):
    e = _events(spark)
    expected = _as_dict(_one_pass(e))
    # a 3-way uneven split by modulus — batch boundaries must not matter
    r = ContinuousRollup(str(tmp_path), ["event_type"], "cents")
    for i in range(3):
        assert r.process_batch(e.filter(F.col("event_id") % 3 == i), batch_id=i)
    assert _as_dict(r.table(spark)) == expected


def test_redelivered_batch_is_noop(spark, tmp_path):
    e = _events(spark)
    r = ContinuousRollup(str(tmp_path), ["event_type"], "cents")
    b0 = e.filter(F.col("event_id") % 2 == 0)
    assert r.process_batch(b0, batch_id=0)
    before = _as_dict(r.table(spark))
    # at-least-once redelivery: same batch id arrives again
    assert r.process_batch(b0, batch_id=0) is False
    assert _as_dict(r.table(spark)) == before


def test_restart_resumes_from_persisted_state(spark, tmp_path):
    e = _events(spark)
    r1 = ContinuousRollup(str(tmp_path), ["event_type"], "cents")
    r1.process_batch(e.filter(F.col("event_id") % 2 == 0), batch_id=0)
    # a NEW object over the same workdir (process restart) continues:
    # already-applied batches skip, the next batch merges
    r2 = ContinuousRollup(str(tmp_path), ["event_type"], "cents")
    assert r2.process_batch(e.filter(F.col("event_id") % 2 == 0), batch_id=0) is False
    assert r2.process_batch(e.filter(F.col("event_id") % 2 == 1), batch_id=1)
    assert _as_dict(r2.table(spark)) == _as_dict(_one_pass(e))


def test_derived_mean_at_read(spark, tmp_path):
    e = _events(spark)
    r = ContinuousRollup(str(tmp_path), ["event_type"], "cents")
    r.process_batch(e, batch_id=0)
    row = r.read(spark).collect()[0]
    assert abs(row["avg_m"] - row["sum_m"] / row["n"]) < 1e-12


def test_table_stays_compact(spark, tmp_path):
    """The merge rewrites the rollup table each batch — file count must
    not grow with batch count (the table is the aggregate, not a log)."""
    import glob

    e = _events(spark)
    r = ContinuousRollup(str(tmp_path), ["event_type"], "cents")
    counts = []
    for i in range(4):
        r.process_batch(e.filter(F.col("event_id") % 4 == i), batch_id=i)
        counts.append(len(glob.glob(f"{r.table_dir}/*.parquet")))
    assert max(counts) <= max(counts[0], counts[-1]) + 1  # bounded, not monotone-growing


def test_hll_distinct_sketch_merges_exactly(spark, tmp_path):
    """Mergeable distinct-count: the HLL sketch union is register-wise
    max (commutative/associative), so the incrementally-merged estimate
    equals the one-pass sketch estimate EXACTLY — and both sit within
    HLL error of the true distinct count."""
    e = spark.read.parquet(f"{SF}/events.parquet").select(
        "event_id",
        "event_type",
        "user_id",
        F.col("ts").cast("timestamp").alias("ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    r = ContinuousRollup(
        str(tmp_path / "inc"), ["event_type"], "cents", distinct_col="user_id"
    )
    for i in range(3):
        r.process_batch(e.filter(F.col("event_id") % 3 == i), batch_id=i)
    incremental = {
        r_["event_type"]: r_["n_distinct"]
        for r_ in r.read(spark)
        .groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("hll")).alias("n_distinct"))
        .collect()
    }
    one_pass = {
        r_["event_type"]: r_["n_distinct"]
        for r_ in e.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("n_distinct"))
        .collect()
    }
    assert incremental == one_pass  # exact estimate equality, not approx
    exact = {
        r_["event_type"]: r_["n"]
        for r_ in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    for k, est in incremental.items():
        assert abs(est - exact[k]) / exact[k] < 0.05  # within HLL error


def test_rollup_maintained_live_over_firehose(spark, tmp_path):
    """Continuous aggregates over the live stream: a ContinuousRollup
    attached to DynamicStreamApp merges every kept micro-batch — after
    two produce/drain rounds the rollup equals a one-pass GROUP BY over
    the delivered output (bytes per key per hour)."""
    from storm_dynamic_spout_spark.streaming.app import DynamicStreamApp

    roll = ContinuousRollup(
        str(tmp_path / "roll"), ["key"], "bytes", time_col="timestamp"
    )
    app = DynamicStreamApp(
        spark,
        str(tmp_path / "t"),
        str(tmp_path / "w"),
        rollup=roll,
        rollup_prepare=lambda df: df.withColumn("bytes", F.length("value").cast("long")),
    )
    app.produce([("a", "x1"), ("b", "longer-value")])
    app.open()
    app.process_all_available()
    app.produce([("a", "x2-even-longer"), ("a", "y")])
    app.process_all_available()

    expected = {
        (r["bucket_start"], r["key"]): (r["n"], r["sum_m"])
        for r in (
            app.output()
            .withColumn("bucket_start", F.date_trunc("hour", "timestamp"))
            .withColumn("bytes", F.length("value").cast("long"))
            .groupBy("bucket_start", "key")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("bytes").alias("sum_m"))
            .collect()
        )
    }
    got = {
        (r["bucket_start"], r["key"]): (r["n"], r["sum_m"])
        for r in roll.table(spark).collect()
    }
    assert got == expected
    assert app.recorder.counters.get("rollup.batches", 0) >= 1
    app.close()


def test_crash_before_publish_reapplies_batch(spark, tmp_path, monkeypatch):
    """Atomic commit protocol: a crash AFTER the version dir is written
    but BEFORE the CURRENT pointer swap must leave the old version live
    with the old watermark — the batch re-applies on replay (no double
    count, no lost rollup), and the orphaned version dir is GC'd by the
    next successful commit."""
    import os as _os

    import pytest

    e = _events(spark)
    r = ContinuousRollup(str(tmp_path), ["event_type"], "cents")
    assert r.process_batch(e.filter(F.col("event_id") % 2 == 0), batch_id=0)
    before = _as_dict(r.table(spark))

    real_replace = _os.replace

    def crash_on_publish(src, dst):
        if str(dst).endswith("rollup-CURRENT"):
            raise OSError("simulated crash at the commit point")
        return real_replace(src, dst)

    monkeypatch.setattr(_os, "replace", crash_on_publish)
    with pytest.raises(OSError, match="simulated crash"):
        r.process_batch(e.filter(F.col("event_id") % 2 == 1), batch_id=1)
    monkeypatch.undo()

    # restart over the same workdir: old version fully live, watermark
    # unmoved, replayed batch merges — result equals one-pass recompute
    r2 = ContinuousRollup(str(tmp_path), ["event_type"], "cents")
    assert r2._last_batch_id() == 0
    assert _as_dict(r2.table(spark)) == before
    assert r2.process_batch(e.filter(F.col("event_id") % 2 == 1), batch_id=1)
    assert _as_dict(r2.table(spark)) == _as_dict(_one_pass(e))
    vdirs = [n for n in _os.listdir(tmp_path) if n.startswith("rollup-v")]
    assert len(vdirs) == 1  # the orphan from the crashed commit is gone


def test_missing_current_version_is_corruption(spark, tmp_path):
    """A CURRENT pointer naming a missing version dir is corruption —
    never silently read as an empty rollup (the failure the old
    two-rename swap could produce)."""
    import shutil

    import pytest

    e = _events(spark)
    r = ContinuousRollup(str(tmp_path), ["event_type"], "cents")
    r.process_batch(e, batch_id=0)
    shutil.rmtree(r.table_dir)
    with pytest.raises(RuntimeError, match="corruption"):
        r.table(spark)
    with pytest.raises(RuntimeError, match="corruption"):
        ContinuousRollup(str(tmp_path), ["event_type"], "cents")._last_batch_id()


def test_rollup_excludes_dlq_rows(spark, tmp_path):
    """With a retry policy configured, the rollup merges the DELIVERED
    rows (post-retry-split), so rows that exhaust retries into the DLQ
    never count — the rollup equals a one-pass GROUP BY over the output
    table exactly, DLQ traffic excluded."""
    from storm_dynamic_spout_spark.streaming.app import DynamicStreamApp
    from storm_dynamic_spout_spark.streaming.retry import NeverRetryPolicy

    roll = ContinuousRollup(
        str(tmp_path / "roll"), ["key"], "bytes", time_col="timestamp"
    )
    app = DynamicStreamApp(
        spark,
        str(tmp_path / "t"),
        str(tmp_path / "w"),
        rollup=roll,
        rollup_prepare=lambda df: df.withColumn(
            "bytes", F.length("value").cast("long")
        ),
        failure_condition_sql="key = 'poison'",
        retry_policy=NeverRetryPolicy(),
    )
    app.produce([("ok", "o1"), ("poison", "p1"), ("ok", "o2-longer")])
    app.open()
    app.process_all_available()

    expected = {
        (r["bucket_start"], r["key"]): (r["n"], r["sum_m"])
        for r in (
            app.output()
            .withColumn("bucket_start", F.date_trunc("hour", "timestamp"))
            .withColumn("bytes", F.length("value").cast("long"))
            .groupBy("bucket_start", "key")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("bytes").alias("sum_m"))
            .collect()
        )
    }
    got = {
        (r["bucket_start"], r["key"]): (r["n"], r["sum_m"])
        for r in roll.table(spark).collect()
    }
    assert got == expected  # poison row is in the DLQ, not the rollup
    assert all(k[1] != "poison" for k in got)
    app.close()
