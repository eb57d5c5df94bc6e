"""Interleaved A/B for eval_contamination explode_outer rewrite.

A = old (explode + reattach join), B = new module code,
C = B + hash-before-global-distinct vocab (evaluation variant).
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.engine import EngineConfig, build_session
from storm_dynamic_spout_spark.operators import corpus as C
from storm_dynamic_spout_spark.operators.corpus import (
    _FRAC_MICRO,
    md5_int,
    token_ngram_hashes,
    token_ngrams,
)

SF = "/root/testdata/sf0.1"
N = 3
T = 0.5


def old_eval_contam(train, eval_set, ngram, threshold):
    id_col, text_col = "doc_id", "text"
    eval_grams = eval_set.select(
        F.col(id_col), F.explode(token_ngram_hashes(F.col(text_col), ngram)).alias("__g")
    )
    train_vocab = (
        train.select(F.explode(token_ngrams(F.col(text_col), ngram)).alias("__gs"))
        .distinct()
        .select(md5_int(F.col("__gs")).alias("__g"))
        .withColumn("__hit", F.lit(1))
    )
    per_doc = (
        eval_grams.join(train_vocab, "__g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_overlapping"),
        )
    )
    all_eval = eval_set.select(F.col(id_col))
    frac = F.round(F.col("n_overlapping") / F.col("n_grams") * F.lit(_FRAC_MICRO)) / F.lit(_FRAC_MICRO)
    return all_eval.join(per_doc, id_col, "left").select(
        id_col,
        F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
        F.coalesce(F.col("n_overlapping"), F.lit(0)).cast("long").alias("n_overlapping"),
        F.when(F.col("n_grams") > 0, frac).alias("overlap_frac"),
        F.when(F.col("n_grams") > 0, frac >= F.lit(threshold)).otherwise(F.lit(False)).alias("flagged"),
    )


def hashed_vocab_contam(train, eval_set, ngram, threshold):
    """B + vocab distinct on int64 hashes instead of strings."""
    id_col, text_col = "doc_id", "text"
    eval_grams = eval_set.select(
        F.col(id_col),
        F.explode_outer(token_ngram_hashes(F.col(text_col), ngram)).alias("__g"),
    )
    train_vocab = (
        train.select(F.explode(token_ngram_hashes(F.col(text_col), ngram)).alias("__g"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    per_doc = (
        eval_grams.join(train_vocab, "__g", "left")
        .groupBy(id_col)
        .agg(
            F.count(F.col("__g")).cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0))).cast("long").alias("n_overlapping"),
        )
    )
    frac = F.round(F.col("n_overlapping") / F.col("n_grams") * F.lit(_FRAC_MICRO)) / F.lit(_FRAC_MICRO)
    return per_doc.select(
        id_col, "n_grams", "n_overlapping",
        F.when(F.col("n_grams") > 0, frac).alias("overlap_frac"),
        F.when(F.col("n_grams") > 0, frac >= F.lit(threshold)).otherwise(F.lit(False)).alias("flagged"),
    )


def main() -> None:
    spark = build_session(
        EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(f"{SF}/documents.parquet")
    is_eval = F.col("doc_id") % 2 == 1
    tr, ev = d.filter(~is_eval), d.filter(is_eval)

    variants = {
        "A": lambda: old_eval_contam(tr, ev, N, T).orderBy("doc_id"),
        "B": lambda: C.eval_contamination(tr, ev, ngram=N, threshold=T).orderBy("doc_id"),
        "C": lambda: hashed_vocab_contam(tr, ev, N, T).orderBy("doc_id"),
    }
    variants["B"]().write.format("noop").mode("overwrite").save()
    times = {k: [] for k in variants}
    for _ in range(5):
        for k, build in variants.items():
            spark.sparkContext.setJobDescription(f"ab:{k}")
            t0 = time.perf_counter()
            build().write.format("noop").mode("overwrite").save()
            times[k].append(time.perf_counter() - t0)
    for k, ts in times.items():
        ts.sort()
        print(f"{k}: best={ts[0]:.3f} median={ts[len(ts)//2]:.3f} all={[round(x,2) for x in ts]}")
    ra = sorted(map(tuple, variants["A"]().collect()))
    rb = sorted(map(tuple, variants["B"]().collect()))
    rc = sorted(map(tuple, variants["C"]().collect()))
    print("A==B:", ra == rb, " B==C:", rb == rc, f"({len(rb)} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
