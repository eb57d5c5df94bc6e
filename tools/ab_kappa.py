"""Interleaved A/B for the cohen_kappa contingency-cell rewrite.

A = old shape (corpus join re-evaluated by counts/ma/mb), B = new
module code (one (la, lb, count) cell aggregate, checkpointed).
Alternates A,B,... in one session; verifies identical output.
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


def old_kappa(df, item_col, rater_col, label_col, rater_a, rater_b):
    a = df.filter(F.col(rater_col) == rater_a).select(
        F.col(item_col).alias("__item"), F.col(label_col).alias("__la")
    )
    b = df.filter(F.col(rater_col) == rater_b).select(
        F.col(item_col).alias("__item"), F.col(label_col).alias("__lb")
    )
    j = a.join(b, "__item")
    counts = j.agg(
        F.count(F.lit(1)).cast("long").alias("__n"),
        F.sum(F.when(F.col("__la") == F.col("__lb"), 1).otherwise(0))
        .cast("long")
        .alias("__n_agree"),
    )
    ma = j.groupBy(F.col("__la").alias("__label")).agg(
        F.count(F.lit(1)).cast("long").alias("__ca")
    )
    mb = j.groupBy(F.col("__lb").alias("__label")).agg(
        F.count(F.lit(1)).cast("long").alias("__cb")
    )
    pe_num = (
        ma.join(mb, "__label", "full_outer")
        .select(
            (
                F.coalesce(F.col("__ca"), F.lit(0))
                * F.coalesce(F.col("__cb"), F.lit(0))
            ).alias("__prod")
        )
        .agg(F.sum("__prod").cast("long").alias("__pe_num"))
    )
    po = F.col("__n_agree") / F.col("__n").cast("double")
    pe = F.col("__pe_num") / (F.col("__n").cast("double") * F.col("__n"))
    return counts.crossJoin(F.broadcast(pe_num)).select(
        F.col("__n").alias("n_items"),
        F.round(po, 6).alias("po"),
        F.round(pe, 6).alias("pe"),
        F.when(pe < 1.0, F.round((po - pe) / (1.0 - pe), 6)).alias("kappa"),
    )


def _log(spark):
    from storm_dynamic_spout_spark.catalog.registry import t
    from storm_dynamic_spout_spark.operators import text as X

    d = t(spark, SF, "documents")
    return d.select(
        F.col("doc_id").alias("item"),
        F.lit("gold").alias("rater"),
        F.col("lang").alias("label"),
    ).unionByName(
        d.select(
            F.col("doc_id").alias("item"),
            F.lit("langid").alias("rater"),
            X.lang_id(F.col("text")).alias("label"),
        )
    )


def main() -> None:
    spark = build_session(
        EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run_a():
        return old_kappa(_log(spark), "item", "rater", "label", "gold", "langid")

    def run_b():
        return QUERIES["rank_cohen_kappa"](spark, SF)

    run_b().write.format("noop").mode("overwrite").save()
    times = {"A": [], "B": []}
    for _ in range(5):
        for label, fn in (("A", run_a), ("B", run_b)):
            spark.sparkContext.setJobDescription(f"{label}:kappa")
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
