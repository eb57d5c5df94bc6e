"""Interleaved A/B for the events_survival_km single-scan rewrite.

A = old shape (separate min(ts) corpus scan for the cutoff scalar),
B = new catalog code (cutoff derived from the checkpointed per-user
aggregate).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from storm_dynamic_spout_spark.engine import EngineConfig, build_session
from storm_dynamic_spout_spark.queries import QUERIES

SF = "/root/testdata/sf0.1"


def old_query(spark):
    from storm_dynamic_spout_spark.catalog.analytics import (
        _KM_US_PER_HOUR,
        _KM_WINDOW_HOURS,
        t,
    )

    e = t(spark, SF, "events")
    b = e.agg(F.min("ts").alias("t_min")).select(
        "t_min",
        (F.col("t_min") + F.expr(f"INTERVAL {_KM_WINDOW_HOURS} HOURS")).alias(
            "cutoff"
        ),
    )
    f = e.groupBy("user_id").agg(
        F.min("ts").alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("tp"),
    )
    observed = F.col("tp").isNotNull() & (F.col("tp") <= F.col("cutoff"))

    def hours(a, b_):
        us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
        return (us(a) - us(b_)) / F.lit(_KM_US_PER_HOUR)

    u = (
        f.crossJoin(F.broadcast(b))
        .filter(F.col("t0") <= F.col("cutoff"))
        .select(
            F.when(observed, F.floor(hours(F.col("tp"), F.col("t0"))))
            .otherwise(F.floor(hours(F.col("cutoff"), F.col("t0"))))
            .cast("long")
            .alias("dur"),
            F.when(observed, F.lit(1)).otherwise(F.lit(0)).alias("ev"),
        )
    )
    hist = u.groupBy("dur").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("ev").cast("long").alias("d"),
    )
    w_from = Window.orderBy("dur").rowsBetween(0, Window.unboundedFollowing)
    risk = hist.select(
        "dur",
        "d",
        F.sum("n").over(w_from).cast("long").alias("n_at_risk"),
    ).filter(F.col("d") > 0)
    lnf = F.when(
        F.col("d") < F.col("n_at_risk"),
        F.round(
            F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_at_risk"))
            * 1000000
        ).cast("long"),
    )
    w_run = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    return (
        risk.withColumn("__lnf", lnf)
        .select(
            F.col("dur").alias("t_hours"),
            "n_at_risk",
            F.col("d").alias("d_events"),
            F.sum("__lnf").over(w_run).cast("long").alias("km_log_1e6"),
        )
        .orderBy("t_hours")
    )


def main() -> None:
    spark = build_session(
        EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run_a():
        return old_query(spark)

    def run_b():
        return QUERIES["events_survival_km"](spark, SF)

    run_b().write.format("noop").mode("overwrite").save()
    times = {"A": [], "B": []}
    for _ in range(5):
        for label, fn in (("A", run_a), ("B", run_b)):
            spark.sparkContext.setJobDescription(f"{label}:survival")
            t0 = time.perf_counter()
            fn().write.format("noop").mode("overwrite").save()
            times[label].append(time.perf_counter() - t0)
    for label in ("A", "B"):
        ts = sorted(times[label])
        print(f"{label}: best={ts[0]:.3f} median={ts[len(ts) // 2]:.3f}", flush=True)
    ra = sorted(map(tuple, run_a().collect()))
    rb = sorted(map(tuple, run_b().collect()))
    print(f"IDENTICAL: {ra == rb} ({len(rb)} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
