"""Interleaved A/B for the agg_countmin_freq single-scan rewrite.

A = old shape (countmin_table scans lineitem + separate exact scan),
B = new catalog code (per-key exact aggregate feeds sketch + probes).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.engine import EngineConfig, build_session
from storm_dynamic_spout_spark.queries import QUERIES

SF = "/root/testdata/sf0.1"


def old_query(spark):
    from storm_dynamic_spout_spark.catalog.aggregates import (
        CMS_DEPTH,
        CMS_PROBES,
        CMS_WIDTH,
    )
    from storm_dynamic_spout_spark.catalog.registry import t
    from storm_dynamic_spout_spark.operators.sketch import (
        countmin_bucket,
        countmin_table,
    )

    li = t(spark, SF, "lineitem")
    sketch = countmin_table(li, "l_partkey", CMS_DEPTH, CMS_WIDTH)
    exact = li.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("exact_n"))
    probes = exact.orderBy(F.desc("exact_n"), "l_partkey").limit(CMS_PROBES)
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("__d"),
                countmin_bucket(F.col("l_partkey"), i, CMS_WIDTH).alias("__bucket"),
            )
            for i in range(CMS_DEPTH)
        ]
    )
    probe_cells = probes.select(
        "l_partkey", "exact_n", F.explode(cells).alias("__c")
    ).select("l_partkey", "exact_n", "__c.__d", "__c.__bucket")
    return (
        sketch.join(F.broadcast(probe_cells), ["__d", "__bucket"])
        .groupBy("l_partkey", "exact_n")
        .agg(F.min("c").alias("cms_est"))
        .select(
            "l_partkey",
            "exact_n",
            "cms_est",
            (F.col("cms_est") - F.col("exact_n")).alias("overshoot"),
        )
        .orderBy(F.desc("exact_n"), "l_partkey")
    )


def main() -> None:
    spark = build_session(
        EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run_a():
        return old_query(spark)

    def run_b():
        return QUERIES["agg_countmin_freq"](spark, SF)

    run_b().write.format("noop").mode("overwrite").save()
    times = {"A": [], "B": []}
    for _ in range(5):
        for label, fn in (("A", run_a), ("B", run_b)):
            spark.sparkContext.setJobDescription(f"{label}:countmin")
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
