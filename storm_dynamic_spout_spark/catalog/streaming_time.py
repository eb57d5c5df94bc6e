"""Event-time operators (SURVEY §2.9 T13 — absent in the offset-based
reference, declared by the engine): tumbling/hopping/session windows and
watermark-style dedup, plus the retry-backoff arithmetic (T5) as column
math.

Each is registered in its *batch-expressible* form so the DuckDB oracle
can hash-check the semantics; in production the identical expressions
run inside Structured Streaming with ``withWatermark`` bounding state
(the streaming execution path is exercised by the firehose scenario
tests). ``F.window``/``F.session_window`` work unchanged in both modes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storm_dynamic_spout_spark.catalog.registry import query, t

_TS = "CAST(ts AS TIMESTAMP)"  # DuckDB: TIMESTAMP_NS → µs precision


@query(
    "stream_tumbling_window",
    oracle=f"""
    SELECT date_trunc('hour', {_TS}) AS ws,
           date_trunc('hour', {_TS}) + INTERVAL '1 hour' AS we,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(value) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def stream_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window aggregation — the shape of
    ``groupBy(window(ts, "10 minutes"), key)`` with a watermark in
    streaming mode (SURVEY §2.4). Epoch-aligned hourly buckets."""
    e = t(spark, sf_dir, "events")
    w = F.window("ts", "1 hour")
    return (
        e.groupBy(w.alias("w"), "event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_hopping_window",
    oracle=f"""
    WITH hops AS (
      SELECT time_bucket(INTERVAL '30 minutes', {_TS}) AS ws, value FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '30 minutes', {_TS}) - INTERVAL '30 minutes' AS ws, value
      FROM events
    )
    SELECT ws, ws + INTERVAL '1 hour' AS we,
           CAST(count(*) AS BIGINT) AS n_events,
           sum(value) AS sum_value
    FROM hops
    GROUP BY 1, 2
    """,
)
def stream_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) window: 1-hour windows every 30 minutes — each
    event lands in exactly window/slide = 2 windows. The oracle
    materializes the same 2-way fan-out explicitly."""
    e = t(spark, sf_dir, "events")
    w = F.window("ts", "1 hour", "30 minutes")
    return (
        e.groupBy(w.alias("w"))
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("w.start").alias("ws"),
            F.col("w.end").alias("we"),
            "n_events",
            "sum_value",
        )
    )


@query(
    "stream_session_window",
    oracle=f"""
    WITH marked AS (
      SELECT user_id, {_TS} AS ts,
             CASE WHEN lag({_TS}) OVER (PARTITION BY user_id ORDER BY {_TS}) IS NULL
                    OR {_TS} - lag({_TS}) OVER (PARTITION BY user_id ORDER BY {_TS})
                       >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    numbered AS (
      SELECT user_id, ts,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM marked
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL '30 minutes' AS session_end,
           CAST(count(*) AS BIGINT) AS n_events
    FROM numbered
    GROUP BY user_id, session_id
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 30-minute gap (``F.session_window`` —
    ``session_window(ts, gap)`` in streaming). The oracle derives the
    same sessions via gaps-and-islands: a new session starts when the
    gap to the previous event is >= the timeout (Spark's session
    interval is ``[ts, ts+gap)`` — end-exclusive merge)."""
    e = t(spark, sf_dir, "events")
    w = F.session_window("ts", "30 minutes")
    return (
        e.groupBy(w.alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "stream_dedup_within_window",
    oracle=f"""
    SELECT event_id, user_id, event_type FROM (
      SELECT event_id, user_id, event_type,
             row_number() OVER (
               PARTITION BY user_id, event_type, date_trunc('hour', {_TS})
               ORDER BY {_TS}, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
)
def stream_dedup_within_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded dedup, batch-expressed: keep the first
    (user_id, event_type) occurrence per event-hour — the state-bounded
    contract of ``dropDuplicatesWithinWatermark`` (T13), where the time
    bucket stands in for the watermark horizon."""
    e = t(spark, sf_dir, "events")
    rn = F.row_number().over(
        Window.partitionBy(
            "user_id", "event_type", F.date_trunc("hour", "ts")
        ).orderBy("ts", "event_id")
    )
    return (
        e.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("event_id", "user_id", "event_type")
    )


@query(
    "retry_backoff_schedule",
    oracle="""
    SELECT event_id,
           CAST((event_id % 30) + 1 AS BIGINT) AS attempts,
           CAST(least(1000 * power(2.0, CAST(event_id % 30 AS DOUBLE)),
                      900000.0) AS BIGINT) AS delay_ms,
           ((event_id % 30) + 1) < 25 AS retry_further
    FROM events
    """,
)
def retry_backoff_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The retry table's scheduling arithmetic (T5) as pure column math,
    oracle-checked: delay = initial * multiplier^(attempts-1) capped at
    max; retry_further = attempts < limit
    (``retry/ExponentialBackoffRetryManager.java:96-128, 212-232``).
    Synthetic attempts derived from event_id so the check is
    deterministic."""
    from storm_dynamic_spout_spark.streaming.retry import ExponentialBackoffRetryPolicy

    policy = ExponentialBackoffRetryPolicy(
        retry_limit=25, initial_delay_ms=1000, delay_multiplier=2.0, max_delay_ms=900_000
    )
    e = t(spark, sf_dir, "events")
    attempts = (F.col("event_id") % 30 + 1).cast("long")
    return e.select(
        "event_id",
        attempts.alias("attempts"),
        policy.delay_col(attempts).alias("delay_ms"),
        policy.retry_further_col(attempts).alias("retry_further"),
    )
