"""Interleaved A/B for the _bpe_train per-level localCheckpoint.

A = old lazy one-plan chain, B = new checkpointed module code.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from storm_dynamic_spout_spark.engine import EngineConfig, build_session
from storm_dynamic_spout_spark.operators import text as X
from storm_dynamic_spout_spark.catalog.llm import _BPE_MERGE_ITERS, _BPE_APPLY_TOP

SF = "/root/testdata/sf0.1"


def old_bpe_train(spark, iters):
    wc = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select(F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    w = wc.select("n", X.chars(F.col("word")).alias("syms"))
    tops = []
    for i in range(1, iters + 1):
        pairs = (
            w.filter(F.size("syms") >= 2)
            .select(
                "n",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(syms)-1), j ->"
                        " struct(element_at(syms, j) as a,"
                        " element_at(syms, j+1) as b))"
                    )
                ).alias("p"),
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("n").cast("bigint").alias("cnt"))
        )
        top1 = (
            pairs.orderBy(F.desc("cnt"), "a", "b")
            .limit(1)
            .select(
                F.col("a").alias("__pa"),
                F.col("b").alias("__pb"),
                F.col("cnt").alias("__cnt"),
            )
        )
        tops.append(
            top1.select(
                F.lit(i).cast("bigint").alias("merge_rank"),
                F.col("__pa").alias("pair_a"),
                F.col("__pb").alias("pair_b"),
                F.col("__cnt").alias("cnt"),
            )
        )
        w = w.crossJoin(F.broadcast(top1)).select(
            "n",
            X.apply_bpe_merge(F.col("syms"), F.col("__pa"), F.col("__pb")).alias("syms"),
        )
    return w, tops


def apply_head(w):
    tok = (
        w.select("n", F.explode("syms").alias("token"))
        .groupBy("token")
        .agg(F.sum("n").cast("bigint").alias("n_occurrences"))
    )
    return (
        tok.orderBy(F.desc("n_occurrences"), "token")
        .limit(_BPE_APPLY_TOP)
        .select(
            F.row_number()
            .over(W.orderBy(F.desc("n_occurrences"), "token"))
            .cast("bigint")
            .alias("rank"),
            "token",
            "n_occurrences",
        )
    )


def main() -> None:
    spark = build_session(
        EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
    )
    spark.sparkContext.setLogLevel("ERROR")
    from storm_dynamic_spout_spark.catalog.llm import _bpe_train

    def build_a():
        w, _ = old_bpe_train(spark, _BPE_MERGE_ITERS)
        return apply_head(w)

    def build_b():
        w, _ = _bpe_train(spark, SF, _BPE_MERGE_ITERS)
        return apply_head(w)

    build_b().write.format("noop").mode("overwrite").save()

    ta, tb = [], []
    for _ in range(5):
        for name, build, acc in (("A", build_a, ta), ("B", build_b, tb)):
            spark.sparkContext.setJobDescription(f"ab:{name}")
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            acc.append(time.perf_counter() - t0)
    ta.sort(); tb.sort()
    print(f"A old: best={ta[0]:.3f} median={ta[len(ta)//2]:.3f} all={[round(x,2) for x in ta]}")
    print(f"B new: best={tb[0]:.3f} median={tb[len(tb)//2]:.3f} all={[round(x,2) for x in tb]}")
    ra = sorted(map(tuple, build_a().collect()))
    rb = sorted(map(tuple, build_b().collect()))
    print("IDENTICAL:", ra == rb, f"({len(ra)} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
