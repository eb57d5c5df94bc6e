"""Runnable walkthrough of the streaming retrieval stack: the
incremental ANN index (dense leg), the incremental BM25 postings index
(lexical leg), and the per-query hybrid RRF fusion of their match logs.

    python examples/retrieval_stream_demo.py

Drives four micro-batches into each index (embeddings / documents from
the sf0.001 fixtures, id-striped so every batch both QUERIES the index
built so far and then JOINS it), printing the observable state after
each batch: index growth, match-log growth, and a fused top-3 for a
sample query.  Ends with the crash-safe compaction step and an
idempotence check (re-delivering the last batch changes nothing).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.engine import EngineConfig, build_session, load_table

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
BATCHES = 4


def main() -> int:
    from storm_dynamic_spout_spark.streaming.ann_stream import StreamingAnnIndex
    from storm_dynamic_spout_spark.streaming.bm25_stream import StreamingBm25Index

    spark = build_session(
        EngineConfig({"spark.master": "local[8]", "spark.shuffle_partitions": 8})
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    ann = StreamingAnnIndex(tempfile.mkdtemp(prefix="demo-ann-"))
    lex = StreamingBm25Index(tempfile.mkdtemp(prefix="demo-lex-"))

    for b in range(BATCHES):
        ann.process_batch(emb.filter(F.col("vec_id") % BATCHES == b))
        lex.process_batch(docs.filter(F.col("doc_id") % BATCHES == b))
        n_idx = ann.index_df(spark).count()
        n_pos = lex.postings_df(spark).select("__id").distinct().count()
        am = ann.matches(spark)
        lm = lex.matches(spark)
        print(
            f"== batch {b}: ann index {n_idx} vectors "
            f"({am.count() if am is not None else 0} dense matches so far); "
            f"bm25 postings {n_pos} docs "
            f"({lm.count() if lm is not None else 0} lexical matches so far)"
        )

    # hybrid fusion of the two logs for one sample query id
    am, lm = ann.matches(spark), lex.matches(spark)
    dense = am.select(
        "query_id", F.col("neighbor_id").alias("id"), F.col("rank").alias("rank_dense")
    )
    lexm = lm.select(
        "query_id", F.col("doc_id").alias("id"), F.col("rank").alias("rank_lex")
    )
    fused = (
        lexm.join(dense, ["query_id", "id"], "full_outer")
        .withColumn(
            "rrf",
            F.coalesce(1.0 / (60 + F.col("rank_lex")), F.lit(0.0))
            + F.coalesce(1.0 / (60 + F.col("rank_dense")), F.lit(0.0)),
        )
    )
    sample = fused.groupBy("query_id").count().orderBy(F.desc("count"), "query_id")
    qid = sample.first()["query_id"]
    print(f"\n== hybrid fusion, busiest query {qid}, top 3:")
    for r in (
        fused.filter(F.col("query_id") == qid)
        .orderBy(F.desc("rrf"), "id")
        .limit(3)
        .collect()
    ):
        print(
            f"   id={r['id']:<6} rank_lex={r['rank_lex']} "
            f"rank_dense={r['rank_dense']} rrf={r['rrf']:.6f}"
        )

    # maintenance + idempotence
    n = ann.compact_index(spark, target_files=1)
    m = lex.compact_index(spark, target_files=1)
    print(f"\n== compacted: ann index {n} rows, bm25 postings {m} rows (1 file each)")
    before = (ann.matches(spark).count(), lex.matches(spark).count())
    ann.process_batch(emb.filter(F.col("vec_id") % BATCHES == BATCHES - 1))
    lex.process_batch(docs.filter(F.col("doc_id") % BATCHES == BATCHES - 1))
    after = (ann.matches(spark).count(), lex.matches(spark).count())
    assert before == after, (before, after)
    print(f"== re-delivered last batch: match logs unchanged {before} -> {after}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
