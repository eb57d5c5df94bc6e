"""Interleaved A/B for the minhash_near_dups mapping-checkpoint rewrite.

A = old shape (mapping rebuilt per consumer), B = new module code.
Alternates A,B,A,B,... in one session; prints per-variant timings and
verifies identical outputs.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.engine import EngineConfig, build_session
import storm_dynamic_spout_spark.operators.dedup as D

SF = "/root/testdata/sf0.1"


def old_near_dups(df, id_col, text_col, threshold):
    tok = df.select(
        F.col(id_col), D.distinct_tokens(F.col(text_col)).alias("__toks")
    ).localCheckpoint(eager=False)
    keyed = tok.select(
        F.col(id_col),
        F.md5(F.to_json(F.array_sort(F.col("__toks")))).alias("__tk"),
    )
    groups = keyed.groupBy("__tk").agg(
        F.min(id_col).alias("__rep"), F.count(F.lit(1)).alias("__gn")
    )
    mapping = keyed.join(groups, "__tk").select(F.col(id_col), "__rep", "__gn")
    reps_tok = tok.join(groups.select(F.col("__rep").alias(id_col)), id_col)
    sig = D.minhash_signature_tokens(reps_tok, id_col, "__toks")
    sizes = reps_tok.select(F.col(id_col), F.size("__toks").alias("__n"))
    cands = D.lsh_candidate_pairs(
        sig, id_col, sizes=sizes, size_ratio=threshold, materialize=True
    )
    rep_pairs = D.jaccard_verify(
        cands, reps_tok, id_col, text_col, threshold,
        tok_df=reps_tok, materialize=True,
    )
    ma = mapping.select(F.col("__rep").alias("id_a"), F.col(id_col).alias("__da"))
    mb = mapping.select(F.col("__rep").alias("id_b"), F.col(id_col).alias("__db"))
    cross = (
        rep_pairs.join(ma, "id_a")
        .join(mb, "id_b")
        .select(
            F.least("__da", "__db").alias("id_a"),
            F.greatest("__da", "__db").alias("id_b"),
            "jaccard",
        )
    )
    intra = (
        mapping.filter(F.col("__gn") >= 2)
        .select(F.col("__rep"), F.col(id_col).alias("__da"))
        .join(
            mapping.select(F.col("__rep"), F.col(id_col).alias("__db")), "__rep"
        )
        .filter(F.col("__da") < F.col("__db"))
        .select(
            F.col("__da").alias("id_a"),
            F.col("__db").alias("id_b"),
            F.lit(1.0).alias("jaccard"),
        )
    )
    return cross.unionByName(intra)


def main() -> None:
    spark = build_session(
        EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF}/documents.parquet")

    def build_a():
        return old_near_dups(docs, "doc_id", "text", 0.8)

    def build_b():
        return D.minhash_near_dups(docs, "doc_id", "text", 0.8)

    # warmup
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
    print("IDENTICAL:", ra == rb, f"({len(ra)} vs {len(rb)} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
