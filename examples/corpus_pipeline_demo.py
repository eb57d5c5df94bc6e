"""End-to-end training-data pipeline over the documents corpus:

    dedup (MinHash LSH) → contamination screen → quality gate →
    sequence packing → deterministic shuffle → clustered export

    python examples/corpus_pipeline_demo.py

Every stage is the scale-correct form: candidate generation is band-key
equi-joins, the eval gram set broadcasts, packing windows per language
stream, the shuffle is hash-derived (reproducible, no global sort), and
the export lands hive-partitioned by shard with clustered row groups.
At 100 TB the same code runs with bigger numbers — no stage collapses
to the driver or to a single task.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.engine import EngineConfig, build_session, load_table
from storm_dynamic_spout_spark.operators import corpus as C
from storm_dynamic_spout_spark.operators import text as X
from storm_dynamic_spout_spark.operators.dedup import minhash_near_dups
from storm_dynamic_spout_spark.operators.layout import write_clustered

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
EVAL_MOD = 7
PACK_BUDGET = 512
SHARDS = 8


def main() -> None:
    spark = build_session(
        EngineConfig({"spark.master": "local[8]", "spark.shuffle_partitions": 8})
    )
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, SF_DIR, "documents")
    n0 = docs.count()
    print(f"corpus: {n0} docs from {SF_DIR}")

    # 1. near-dup removal: LSH band equi-join candidates, Jaccard verify,
    #    drop every doc that matched an earlier one (keep-first)
    dups = minhash_near_dups(docs, "doc_id", "text", threshold=0.9)
    drop = dups.select(F.col("id_b").alias("doc_id")).distinct()
    docs = docs.join(drop, "doc_id", "left_anti")
    n1 = docs.count()
    print(f"1. dedup: dropped {n0 - n1} near-dups -> {n1}")

    # 2. contamination screen vs the deterministic holdout split
    is_eval = F.col("doc_id") % EVAL_MOD == 0
    contaminated = C.contamination(
        docs.filter(~is_eval), docs.filter(is_eval), ngram=8
    ).select("doc_id")
    n_contam = contaminated.count()
    docs = docs.filter(~is_eval).join(contaminated, "doc_id", "left_anti")
    n2 = docs.count()
    print(
        f"2. contamination: held out the eval split, removed {n_contam} "
        f"contaminated docs -> {n2}"
    )

    # 3. quality gate: token-count floor + stopword-ratio ceiling
    toks = X.token_count(F.col("text"))
    docs = docs.filter((toks >= 5) & (X.stopword_ratio(F.col("text")) <= 0.8))
    n3 = docs.count()
    print(f"3. quality gate: dropped {n2 - n3} -> {n3}")

    # 4. packing metadata per language stream
    packed = C.pack_sequences(docs, PACK_BUDGET)
    seqs = packed.agg(F.max("seq_index")).collect()[0][0]
    print(f"4. packing: {n3} docs -> ~{seqs} sequences of {PACK_BUDGET} tokens per stream")

    # 5. deterministic export shuffle + 6. clustered write
    export = (
        docs.join(C.export_shuffle(docs, SHARDS), "doc_id")
        .join(packed.select("doc_id", "start_offset", "seq_index"), "doc_id")
    )
    out = tempfile.mkdtemp(prefix="corpus_export_")
    try:
        write_clustered(
            export,
            out,
            partition_by=["shard"],
            cluster_by=["shuffle_rank"],
            target_files=1,
        )
        dirs = sorted(d for d in os.listdir(out) if d.startswith("shard="))
        print(f"5-6. export: {len(dirs)} shard directories, clustered by shuffle_rank")
        back = spark.read.parquet(out)
        assert back.count() == n3
        print(f"     re-read OK: {back.count()} rows, columns {back.columns[:6]}...")
    finally:
        shutil.rmtree(out, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
