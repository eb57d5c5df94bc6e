"""VALIDATED prototype for round 15's text_bpe_encode_vocab oracle: the
vocab-scale Arrow-batched encode path (operators/text.py
bpe_encode_words) driven through the SAME 3-merge learned schedule as
text_bpe_apply, hash-checked against text_bpe_apply's existing DuckDB
oracle — pass semantics are identical (pinned in
tests/test_round14_ops.py), so the oracle is a straight reuse with the
Arrow path under test instead of the expression fold.

    python tools/proto_bpe_vocab_oracle.py   # prints MATCH: True

The one design decision for the r15 registration: the learned merges
cross the driver as a 3-row model collect (the bloom-gauge class — one
model-sized read, never data) because the pandas UDF needs the merge
table as a plain dict.  At vocab scale (50k merges) that collect is
still model-sized; ship it via a broadcast variable if it ever outgrows
the closure.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")


def spark_rows(spark):
    from pyspark.sql.window import Window as W

    from storm_dynamic_spout_spark.catalog.llm import (
        _BPE_APPLY_TOP,
        _BPE_MERGE_ITERS,
        _bpe_train,
    )
    from storm_dynamic_spout_spark.operators.text import bpe_encode_words

    _, tops = _bpe_train(spark, SF, _BPE_MERGE_ITERS)
    # the 3-row model collect: training order is the merge rank
    merges = [
        (r["pair_a"], r["pair_b"])
        for t in tops
        for r in t.collect()
    ]
    assert len(merges) == _BPE_MERGE_ITERS
    wc = (
        spark.read.parquet(os.path.join(SF, "documents.parquet"))
        .select(F.explode(F.split("text", r"\s+")).alias("word"))
        .filter(F.length("word") >= 1)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    tok = (
        bpe_encode_words(wc, "word", merges)
        .select("n", F.explode("bpe_tokens").alias("token"))
        .groupBy("token")
        .agg(F.sum("n").cast("bigint").alias("n_occurrences"))
    )
    return [
        (r["rank"], r["token"], r["n_occurrences"])
        for r in tok.orderBy(F.desc("n_occurrences"), "token")
        .limit(_BPE_APPLY_TOP)
        .select(
            F.row_number()
            .over(W.orderBy(F.desc("n_occurrences"), "token"))
            .cast("bigint")
            .alias("rank"),
            "token",
            "n_occurrences",
        )
        .collect()
    ]


def main() -> int:
    from pyspark.sql import SparkSession

    from storm_dynamic_spout_spark.catalog.llm import _bpe_apply_oracle

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    got = spark_rows(spark)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = [tuple(r) for r in con.execute(_bpe_apply_oracle()).fetchall()]
    print("spark :", got)
    print("oracle:", want)
    print("MATCH:", got == want)
    return 0 if got == want else 1


if __name__ == "__main__":
    raise SystemExit(main())
