"""Event-analytics operators: funnel, retention, histogram, paths.

The reference feeds exactly this class of consumer (its Storm topologies
sit in front of event-analytics backends; the engine owns the whole
query). All are classic warehouse shapes expressed so Catalyst keeps
each to the minimum shuffle count (plan-guarded in
``tests/test_plan_guards.py``):

- **funnel**: chained conditional window-mins over ONE
  ``partitionBy(user_id)`` exchange — each stage's "first event at or
  after the previous stage" is a window expression over the same
  partitioning, so the four stages add zero extra shuffles, and the
  closing per-user aggregate reuses the partitioning again.
- **retention**: one events scan — per-user ``min(week)`` +
  ``collect_set(week)`` in a single user_id aggregate, exploded to
  (cohort, offset) cells for a tiny closing aggregate.
- **histogram**: fixed-width buckets from *integer cents* arithmetic so
  Spark and the oracle bucket identically (DOUBLE cents would truncate
  vs round differently at boundaries); pure map-side + one tiny agg.
- **transitions**: per-user lag over one shuffle+sort, then a
  |event types|² aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from storm_dynamic_spout_spark.catalog.registry import query, t

_TS = "CAST(ts AS TIMESTAMP)"  # DuckDB: TIMESTAMP_NS → µs precision

_FUNNEL_STAGES = ["signup", "view", "click", "purchase"]


@query(
    "events_funnel",
    oracle=f"""
    WITH w1 AS (
      SELECT user_id, {_TS} AS ts, event_type,
             min(CASE WHEN event_type = 'signup' THEN {_TS} END)
               OVER (PARTITION BY user_id) AS t1
      FROM events
    ), w2 AS (
      SELECT *, min(CASE WHEN event_type = 'view' AND ts >= t1 THEN ts END)
                  OVER (PARTITION BY user_id) AS t2 FROM w1
    ), w3 AS (
      SELECT *, min(CASE WHEN event_type = 'click' AND ts >= t2 THEN ts END)
                  OVER (PARTITION BY user_id) AS t3 FROM w2
    ), w4 AS (
      SELECT *, min(CASE WHEN event_type = 'purchase' AND ts >= t3 THEN ts END)
                  OVER (PARTITION BY user_id) AS t4 FROM w3
    )
    SELECT user_id,
           min(t1) AS signup_ts,
           min(t2) AS view_ts,
           min(t3) AS click_ts,
           min(t4) AS purchase_ts,
           CAST(CASE WHEN min(t4) IS NOT NULL THEN 4
                     WHEN min(t3) IS NOT NULL THEN 3
                     WHEN min(t2) IS NOT NULL THEN 2
                     WHEN min(t1) IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS stages_completed
    FROM w4
    GROUP BY user_id
    """,
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → view → click → purchase: per user, the
    first event of each stage *at or after* the previous stage's first
    event (a later-stage event before the earlier stage does not count —
    the strict-sequence funnel, not min-per-type). One user_id shuffle
    total: every stage is a conditional min over the same unordered
    ``Window.partitionBy(user_id)``, and the final per-user rollup reuses
    that partitioning."""
    w = Window.partitionBy("user_id")
    e = t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    ts, typ = F.col("ts"), F.col("event_type")
    out = e.withColumn(
        "t1", F.min(F.when(typ == _FUNNEL_STAGES[0], ts)).over(w)
    )
    for i, stage in enumerate(_FUNNEL_STAGES[1:], start=2):
        prev = F.col(f"t{i - 1}")
        out = out.withColumn(
            f"t{i}", F.min(F.when((typ == stage) & (ts >= prev), ts)).over(w)
        )
    stages = (
        F.when(F.min("t4").isNotNull(), 4)
        .when(F.min("t3").isNotNull(), 3)
        .when(F.min("t2").isNotNull(), 2)
        .when(F.min("t1").isNotNull(), 1)
        .otherwise(0)
        .cast("long")
    )
    return out.groupBy("user_id").agg(
        F.min("t1").alias("signup_ts"),
        F.min("t2").alias("view_ts"),
        F.min("t3").alias("click_ts"),
        F.min("t4").alias("purchase_ts"),
        stages.alias("stages_completed"),
    )


@query(
    "events_retention",
    oracle=f"""
    WITH first_seen AS (
      SELECT user_id, date_trunc('week', min({_TS})) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', {_TS}) AS active_week
      FROM events
    )
    SELECT CAST(cohort_week AS DATE) AS cohort_week,
           CAST(datediff('day', cohort_week, active_week) // 7 AS BIGINT)
             AS week_offset,
           CAST(count(*) AS BIGINT) AS n_users
    FROM activity JOIN first_seen USING (user_id)
    GROUP BY 1, 2
    """,
)
def events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by first-seen ISO week,
    counted in each later week they were active. ONE pass over events:
    per-user ``min(week)`` + ``collect_set(week)`` in a single user_id
    aggregate (the set is bounded by timeline weeks, not event count,
    and partial-aggregates map-side), exploded to (cohort, offset)
    cells for a tiny closing aggregate — two exchanges and one scan
    vs the naive first-seen ⋈ activity plan's four and two."""
    e = t(spark, sf_dir, "events")
    wk = F.date_trunc("week", "ts")
    per_user = e.groupBy("user_id").agg(
        F.min(wk).alias("cohort_week"),
        F.collect_set(wk).alias("weeks"),
    )
    return (
        per_user.select("cohort_week", F.explode("weeks").alias("active_week"))
        .groupBy(
            F.to_date("cohort_week").alias("cohort_week"),
            F.expr("CAST(datediff(active_week, cohort_week) div 7 AS BIGINT)").alias(
                "week_offset"
            ),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
    )


@query(
    "agg_histogram",
    oracle="""
    SELECT CAST(CAST(round(l_extendedprice * 100) AS BIGINT) // 500000
                AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_items,
           min(l_extendedprice) AS lo_price,
           max(l_extendedprice) AS hi_price
    FROM lineitem
    GROUP BY 1
    """,
)
def agg_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width price histogram ($5,000 buckets). Bucketing runs in
    integer cents — ``round(price*100)`` then integer-divide — because
    DOUBLE division at bucket boundaries truncates in Spark's cast but
    rounds in DuckDB's; cents arithmetic is exact in both. Map-side
    partial agg collapses 100 TB to ~20 rows before the shuffle."""
    li = t(spark, sf_dir, "lineitem")
    return li.groupBy(
        F.expr("CAST(CAST(round(l_extendedprice * 100) AS BIGINT) div 500000 AS BIGINT)")
        .alias("bucket")
    ).agg(
        F.count("*").alias("n_items"),
        F.min("l_extendedprice").alias("lo_price"),
        F.max("l_extendedprice").alias("hi_price"),
    )


@query(
    "events_transitions",
    oracle=f"""
    WITH seq AS (
      SELECT event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY {_TS}, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(count(*) AS BIGINT) AS n_transitions
    FROM seq
    WHERE prev_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path analysis: the event-type transition matrix — for every
    consecutive pair in each user's timeline (event_id tiebreak for
    equal timestamps, so the sequence is deterministic across engines),
    count (prev → next) globally. One user_id shuffle + local sort for
    the lag, then a tiny |types|² aggregate."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n_transitions"))
    )
