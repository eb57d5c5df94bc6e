"""Filter-chain / routing / offset-window operators (SURVEY §2.2, §2.9).

This is the batch-expressible core of what the reference actually does:
pluggable drop-predicates on a multi-tenant stream
(filter/FilterChainStep.java:36-45, filter/FilterChain.java:37-129), the
canonical key filter (sideline/recipes/trigger/KeyFilter.java:36-50),
negated replay filters (filter/NegatingFilterChainStep.java:33-43),
ending-offset bounds (VirtualSpout.java:293-303), and the sideline
window contract (SidelineSpoutTest.java:114-204: the replay delivers
exactly the rows the firehose dropped between START and RESOLVE).

`events.event_id` stands in for the Kafka offset and `user_id` for the
tenant key (FIXTURES.md). The streaming control plane that *applies*
these predicates dynamically lives in storm_dynamic_spout_spark.streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from storm_dynamic_spout_spark.catalog.registry import query, t
from storm_dynamic_spout_spark.streaming.filter_chain import FilterChain

#: The canonical sideline scenario parameters used by the oracle-checked
#: queries below (tenant keys + offset window — arbitrary but fixed).
SIDELINE_KEYS = (3, 7, 11)
SIDELINE_START = 200  # exclusive: filter applied after offset 200 committed
SIDELINE_END = 800  # inclusive: firehose offset when RESOLVE stamped


@query(
    "filter_key",
    oracle=f"""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
    FROM events
    WHERE user_id NOT IN {SIDELINE_KEYS}
    """,
)
def filter_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KeyFilter (P6): drop rows whose tenant key is in the configured
    list — the firehose side. Reference: KeyFilter.java:36-50 drops when
    filteredKeys.contains(key); keep = NOT IN."""
    return (
        t(spark, sf_dir, "events")
        .filter(~F.col("user_id").isin(*SIDELINE_KEYS))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@query(
    "filter_negated",
    oracle=f"""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
    FROM events
    WHERE user_id IN {SIDELINE_KEYS}
    """,
)
def filter_negated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NegatingFilterChainStep (P4): the exact complement — what the
    sideline replay consumes (NegatingFilterChainStep.java:33-43)."""
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("user_id").isin(*SIDELINE_KEYS))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@query(
    "filter_chain",
    oracle=f"""
    SELECT event_id, user_id, event_type, value
    FROM events
    WHERE NOT (user_id IN {SIDELINE_KEYS})
      AND NOT (event_type = 'error')
      AND NOT (value < 10.0)
    """,
)
def filter_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FilterChain (P3): ordered drop-steps; message dropped if ANY step
    fires ⇒ keep = AND of negations (FilterChain.java:37-129, inverted
    sense vs SQL WHERE). Built through the engine's FilterChain registry
    — the same object the streaming control plane mutates at runtime."""
    chain = FilterChain()
    chain.add_step("sideline_keys", f"user_id IN {SIDELINE_KEYS}")
    chain.add_step("drop_errors", "event_type = 'error'")
    chain.add_step("drop_small", "value < 10.0")
    return (
        chain.keep(t(spark, sf_dir, "events"))
        .select("event_id", "user_id", "event_type", "value")
    )


@query(
    "filter_offset_bound",
    oracle=f"""
    SELECT event_id, user_id, event_type
    FROM events
    WHERE event_id <= {SIDELINE_END}
    """,
)
def filter_offset_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ending-offset bound (P7): drop any record past the recorded end
    offset (VirtualSpout.doesMessageExceedEndingOffset,
    VirtualSpout.java:293-303) — the bounded-replay terminator."""
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_id") <= SIDELINE_END)
        .select("event_id", "user_id", "event_type")
    )


@query(
    "sideline_window",
    oracle=f"""
    SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, value
    FROM events
    WHERE event_id > {SIDELINE_START}
      AND event_id <= {SIDELINE_END}
      AND user_id IN {SIDELINE_KEYS}
    """,
)
def sideline_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sideline replay contract (T8→T10): exactly the rows the
    firehose dropped between the START snapshot (exclusive) and the
    RESOLVE snapshot (inclusive) for the filtered tenants — negated
    filter over the recorded offset window (SidelineSpoutHandler.java:
    359-383 start, :488-537 resolve; E2E narrative
    SidelineSpoutTest.java:114-204)."""
    return (
        t(spark, sf_dir, "events")
        .filter(
            (F.col("event_id") > SIDELINE_START)
            & (F.col("event_id") <= SIDELINE_END)
            & F.col("user_id").isin(*SIDELINE_KEYS)
        )
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@query(
    "deserialize_project",
    oracle="""
    SELECT event_id,
           CAST(user_id AS VARCHAR)                         AS key,
           event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
           value
    FROM events
    """,
)
def deserialize_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deserialize-projection (P1): raw record → typed tuple. Mirrors
    Utf8StringDeserializer (Utf8StringDeserializer.java:38-49: bytes →
    (key, value) strings) + typed parse of the payload; here the payload
    is events.props JSON and the key is the tenant id as string."""
    e = t(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.col("user_id").cast("string").alias("key"),
        "event_type",
        F.from_json("props", "k BIGINT").getField("k").alias("k"),
        "value",
    )


@query(
    "project_expressions",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           l_quantity * 0.453592              AS qty_kg
    FROM lineitem
    WHERE l_returnflag = 'R'
    """,
)
def project_expressions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column projection + expression eval (P9 — absent in reference,
    declared): select/withColumn through Catalyst; projection and the
    returnflag predicate both reach the parquet scan."""
    li = t(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_returnflag") == "R").select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("net_price"),
        (F.col("l_quantity") * 0.453592).alias("qty_kg"),
    )
