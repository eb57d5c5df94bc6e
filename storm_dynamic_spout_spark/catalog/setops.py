"""Set operations / stream merge (SURVEY §2.7).

M1–M5 (the reference's buffer merge: RoundRobinBuffer.java:55-206,
FifoBuffer.java:41-124, ThrottledMessageBuffer, RatioMessageBuffer) map
to union of routed streams; the batch-expressible surface is
union/intersect/except, declared as M6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storm_dynamic_spout_spark.catalog.registry import query, t


@query(
    "setop_union_all",
    oracle="""
    SELECT 'live' AS route, event_id, user_id, event_type, value
    FROM events WHERE user_id <> 7
    UNION ALL
    SELECT 'sideline' AS route, event_id, user_id, event_type, value
    FROM events WHERE user_id = 7
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two routed streams with a route marker — the batch
    shape of the reference's buffer merge (MessageBuffer.java:40-79:
    every virtual spout put()s into one merged stream; the marker column
    is srcVirtualSpoutId, MessageId.java:33-61)."""
    e = t(spark, sf_dir, "events")
    live = e.filter(F.col("user_id") != 7).select(
        F.lit("live").alias("route"), "event_id", "user_id", "event_type", "value"
    )
    side = e.filter(F.col("user_id") == 7).select(
        F.lit("sideline").alias("route"), "event_id", "user_id", "event_type", "value"
    )
    return live.unionByName(side)


@query(
    "setop_intersect",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): customers with both open and finished orders."""
    o = t(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin_c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.intersect(fin_c)


@query(
    "setop_except",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): open-order customers with no finished order."""
    o = t(spark, sf_dir, "orders")
    open_c = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    fin_c = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    return open_c.subtract(fin_c)


@query(
    "setop_union_distinct",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) — union + hash-dedup."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@query(
    "setop_union_evolved",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority, NULL AS o_orderstatus
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, o_totalprice, NULL AS o_orderpriority, o_orderstatus
    FROM orders WHERE o_orderkey % 2 = 1
    """,
)
def setop_union_evolved(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: two relations with different column sets
    merged by NAME with nulls for the missing side
    (``unionByName(allowMissingColumns=True)``) — the shape of unioning
    an old and a new table version mid-migration at scale."""
    o = t(spark, sf_dir, "orders")
    old = o.filter(F.col("o_orderkey") % 2 == 0).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    new = o.filter(F.col("o_orderkey") % 2 == 1).select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    return old.unionByName(new, allowMissingColumns=True)
