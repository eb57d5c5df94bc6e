"""Salted join / salted aggregation: correctness vs the unsalted plan
(the skew mitigation must be a pure re-partitioning, invisible in the
results) and determinism of the salt under recomputation."""

from __future__ import annotations

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.operators.skew import salted_agg, salted_join, with_salt


def _skewed_events(spark, sf_dir):
    from storm_dynamic_spout_spark.engine import load_table

    # simulate a hot tenant: all user_id < 100 collapsed onto key 1
    e = load_table(spark, sf_dir, "events")
    return e.withColumn(
        "tenant", F.when(F.col("user_id") < 100, F.lit(1)).otherwise(F.col("user_id"))
    )


def test_salted_join_matches_plain_join(spark, sf_dir):
    fact = _skewed_events(spark, sf_dir).select("event_id", "tenant", "value")
    dim = fact.select("tenant").distinct().withColumn(
        "tenant_name", F.concat(F.lit("t-"), F.col("tenant"))
    )
    plain = fact.join(dim, "tenant").select("event_id", "tenant", "tenant_name")
    salted = salted_join(fact, dim, "tenant", salt_from=["event_id"], n_salts=8).select(
        "event_id", "tenant", "tenant_name"
    )
    assert plain.count() == salted.count() == fact.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_agg_matches_plain_agg(spark, sf_dir):
    df = _skewed_events(spark, sf_dir)
    plain = (
        df.groupBy("tenant")
        .agg(
            F.sum("value").alias("sum_value"),
            F.count("event_id").alias("count_event_id"),
            F.max("value").alias("max_value"),
        )
    )
    salted = salted_agg(
        df,
        group_cols=["tenant"],
        salt_from=["event_id"],
        aggs={"value": "sum", "event_id": "count"},
    ).join(
        salted_agg(df, ["tenant"], ["event_id"], {"value": "max"}), "tenant"
    )
    got = {r["tenant"]: (round(r["sum_value"], 6), r["count_event_id"], r["max_value"])
           for r in salted.collect()}
    want = {r["tenant"]: (round(r["sum_value"], 6), r["count_event_id"], r["max_value"])
            for r in plain.collect()}
    assert got == want


def test_salt_is_deterministic(spark, sf_dir):
    df = _skewed_events(spark, sf_dir)
    s1 = {r["event_id"]: r["__salt"] for r in with_salt(df, ["event_id"]).select("event_id", "__salt").collect()}
    s2 = {r["event_id"]: r["__salt"] for r in with_salt(df, ["event_id"]).select("event_id", "__salt").collect()}
    assert s1 == s2  # recomputation-stable (no rand())
    assert set(s1.values()) == set(range(8))  # spreads across all salts


def test_salted_agg_spreads_hot_key(spark, sf_dir):
    """The hot key's partial rows land on multiple salts — the shuffle
    spread that fixes the straggler."""
    df = _skewed_events(spark, sf_dir)
    partial = with_salt(df, ["event_id"]).groupBy("tenant", "__salt").count()
    hot = partial.filter(F.col("tenant") == 1)
    assert hot.count() > 1  # hot tenant split across salt partitions
