"""End-to-end training-data pipeline, composed from library operators
as ONE program: exact dedup → near-dup removal (MinHash-LSH + connected
components) → quality filter → per-stream token-budget packing →
deterministic manifest.

    python examples/training_pipeline_demo.py            # sf0.01
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python examples/training_pipeline_demo.py

This is the composability proof for the round-8 lazy-checkpoint work:
every stage below is the same operator the catalog queries use, and the
non-iterative stages stay LAZY — nothing materializes until the final
actions — so Catalyst sees one plan per output and pushes
filters/pruning across stage boundaries.  (MinHash and connected
components materialize internally by design: the CC loop needs
driver-side convergence checks; everything else defers.)

Stage shapes at 100 TB (each documented on its operator):
  1. exact_dedup         — md5-fingerprint groupBy, map-side max_by
  2. minhash_near_dups   — rep-collapse + banded LSH equi-join
  3. connected_components— alternating star contraction, O(log n) rounds
  4. quality_score       — pure codegen expressions, map-only
  5. pack_sequences      — per-stream cumulative sums, shard-parallel
  6. manifest            — deterministic md5 order, one output sort
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.engine import EngineConfig, build_session, load_table
from storm_dynamic_spout_spark.operators.corpus import md5_int, pack_sequences
from storm_dynamic_spout_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    minhash_near_dups,
)
from storm_dynamic_spout_spark.operators.text import quality_score

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
QUALITY_MIN = 0.67  # ~25th percentile of the fixture's score distribution
SEQ_BUDGET = 512


def build_pipeline(spark, sf_dir: str):
    """Returns the four pipeline outputs as LAZY DataFrames (the
    near-dup stage runs its internal convergence loop when built —
    the only eager stage by design)."""
    docs = load_table(spark, sf_dir, "documents")

    # 1. exact dedup: keep one representative per identical text
    # (exact_dedup emits the (fingerprint, keep_id, n_copies) report;
    # the surviving corpus is the semi-join on keep_id)
    keep = exact_dedup(docs, "doc_id", "text").select(
        F.col("keep_id").alias("doc_id")
    )
    uniq = docs.join(keep, "doc_id")

    # 2-3. near-dup pairs -> clusters -> keep the min-id representative
    pairs = minhash_near_dups(uniq, "doc_id", "text", 0.9)
    clusters = connected_components(
        pairs, uniq.select("doc_id"), "doc_id", src="id_a", dst="id_b"
    )
    reps = clusters.groupBy("cluster_id").agg(F.min("doc_id").alias("doc_id"))
    deduped = uniq.join(reps.select("doc_id"), "doc_id")

    # 4. cheap quality gate (pure codegen expressions)
    kept = deduped.withColumn("quality", quality_score(F.col("text"))).filter(
        F.col("quality") >= QUALITY_MIN
    )

    # 5. per-language sequence packing (metadata only; no text moves)
    packed = pack_sequences(kept, SEQ_BUDGET, stream_col="lang")

    # 6. deterministic manifest: md5 order for a reproducible epoch
    manifest = (
        kept.select("doc_id", "lang", "quality")
        .withColumn("shuffle_key", md5_int(F.col("doc_id").cast("string")))
        .orderBy("shuffle_key")
    )
    return deduped, kept, packed, manifest


def main() -> None:
    spark = build_session(EngineConfig({"spark.shuffle_partitions": 16}))
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    deduped, kept, packed, manifest = build_pipeline(spark, SF_DIR)
    n_in = load_table(spark, SF_DIR, "documents").count()
    n_dedup = deduped.count()
    n_kept = kept.count()
    seqs = packed.agg(
        F.sum("n_tokens").alias("tokens"),
        (F.max(F.col("start_offset") + F.col("n_tokens")) / SEQ_BUDGET)
        .cast("long")
        .alias("max_seqs_per_stream"),
    ).collect()[0]
    head = manifest.limit(3).collect()
    print(
        f"docs in: {n_in}  after dedup: {n_dedup}  after quality: {n_kept}  "
        f"tokens packed: {seqs['tokens']}  "
        f"elapsed: {time.perf_counter() - t0:.1f}s"
    )
    print("manifest head:", [(r["doc_id"], r["lang"]) for r in head])
    spark.stop()


if __name__ == "__main__":
    main()
