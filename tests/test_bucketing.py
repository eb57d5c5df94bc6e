"""Bucketed co-located join: the 100 TB shuffle-elimination strategy
(SURVEY §2.3 "repartition/bucketing for co-located joins").

Writing both sides bucketed on the join key lets Spark join them with
ZERO Exchange — each bucket pair joins locally. On a 100 TB fact table
this removes the dominant cost of every repeated fact-fact join."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def warehouse(spark, sf_dir, tmp_path_factory):
    """Write lineitem + orders bucketed by orderkey into the session
    catalog (saveAsTable is required for bucket metadata)."""
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    (
        li.write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .saveAsTable("li_bucketed")
    )
    (
        o.write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .saveAsTable("o_bucketed")
    )
    yield
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


@pytest.fixture()
def no_broadcast(spark):
    """At test SF everything fits under the broadcast threshold; disable
    it so the plan shows what a 100 TB fact-fact join would do."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    if old_aqe is not None:
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, warehouse, no_broadcast):
    li = spark.table("li_bucketed")
    o = spark.table("o_bucketed")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    # co-located: SortMergeJoin directly over the bucketed scans,
    # no Exchange on either side
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join still shuffles:\n{plan}"

    # counterfactual: the same join on plain parquet MUST shuffle —
    # proving the bucketing (not the data size) removed the Exchange
    li_p = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o_p = spark.read.parquet(f"{sf_dir}/orders.parquet")
    plain = li_p.join(o_p, li_p.l_orderkey == o_p.o_orderkey).select(
        "l_orderkey", "l_quantity", "o_totalprice"
    )
    plain_plan = plain._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plain_plan


def test_bucketed_join_matches_unbucketed(spark, sf_dir, warehouse):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    expected = li.join(o, li.l_orderkey == o.o_orderkey).count()
    got = (
        spark.table("li_bucketed")
        .join(
            spark.table("o_bucketed"),
            spark.table("li_bucketed").l_orderkey == spark.table("o_bucketed").o_orderkey,
        )
        .count()
    )
    assert got == expected


def test_bucketed_agg_avoids_exchange(spark, warehouse, no_broadcast):
    """groupBy on the bucket key reuses the bucketing — no shuffle
    before the aggregate either."""
    agg = spark.table("li_bucketed").groupBy("l_orderkey").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, f"bucketed agg still shuffles:\n{plan}"
