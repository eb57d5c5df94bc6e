"""Three-point scale record + index-size sweep for the streaming BM25
shapes (r12 verdict items 2 and 5) — append output to SCALE_SMOKE_r{N}.txt.

    python tools/bm25_scale3.py

**Leg A — probe three-point (1x/2x/5x)**: the bm25_stream_probe smoke
shape (even-half sampled postings, odd-half sampled query terms, per-copy
token salting so copies are disjoint blocks), recording the probe-join
OUTPUT rows (Σ_t q_t·df_t — the data the probe genuinely must touch)
next to wall time, mirroring tools/clustering_scale3.py: a wall ratio at
or below the output-rows ratio means the engine scales with the work the
tokens actually present, and any excess is engine overhead.  (The r12
smoke's 4.7x at 5x could not make that distinction — output rows were
not recorded.)

**Leg B — per-batch cost vs index size**: a real StreamingBm25Index
ingests equal-sized micro-batches whose token vocabularies are DISJOINT
across batches (per-batch salt), so every batch's probe matches zero
posting lists and per-batch wall isolates the fixed overhead: statistics
derivation + append bookkeeping.  Before the round-13 sidecar fix the
statistics were recomputed by scanning the FULL postings parquet every
batch — wall grew linearly with index size even at zero probe output;
with the sidecar the per-batch wall must stay ~flat as the index grows.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from storm_dynamic_spout_spark.engine import (  # noqa: E402
    EngineConfig,
    build_session,
    load_table,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
POINTS = [int(x) for x in os.environ.get("SCALE3_POINTS", "1,2,5").split(",")]
N_BATCHES = int(os.environ.get("BM25_SWEEP_BATCHES", "8"))


def _docs_nx(spark, copies: int):
    base = load_table(spark, SF_DIR, "documents")
    out = None
    for i in range(copies):
        c = base.withColumn(
            "doc_id", F.col("doc_id") + F.lit(i * 1_000_000_000)
        ).withColumn(
            "text", F.regexp_replace(F.col("text"), r"(\S+)", f"$1_c{i}")
        )
        out = c if out is None else out.unionByName(c)
    return out


def _probe_frames(docs):
    """The bm25_stream_probe smoke shape's (postings, query-terms)."""
    d = docs.select("doc_id", F.split("text", r"\s+").alias("__t"))
    dd = d.select(
        "doc_id",
        F.size("__t").cast("long").alias("__dl"),
        F.explode("__t").alias("__tok"),
    )
    pos = (
        dd.filter(F.col("doc_id") % 20 == 0)
        .select(F.col("doc_id").alias("__id"), "__dl", "__tok")
        .groupBy("__id", "__dl", "__tok")
        .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
    )
    q = (
        dd.filter(F.col("doc_id") % 20 == 11)
        .select(F.col("doc_id").alias("query_id"), "__tok")
        .distinct()
    )
    return pos, q


def leg_a(spark) -> None:
    from storm_dynamic_spout_spark.streaming.bm25_stream import (
        score_against_postings,
    )

    base = None
    for copies in POINTS:
        pos, q = _probe_frames(_docs_nx(spark, copies))
        pos = pos.localCheckpoint(eager=True)
        q = q.localCheckpoint(eager=True)
        # the probe join's true output: Σ_t q_t·df_t (cheap exact count
        # off the two checkpointed sides — not part of the timed run)
        dfx = pos.groupBy("__tok").agg(F.count(F.lit(1)).alias("__df"))
        out_rows = (
            q.join(dfx, "__tok")
            .agg(F.sum("__df").alias("s"))
            .first()["s"]
        )
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            score_against_postings(pos, q).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.perf_counter() - t0)
        if base is None:
            base = (copies, best, out_rows)
        c0, t0_, r0 = base
        line = (
            f"  bm25_probe3 {copies}x={best:.2f}s wall_ratio={best / t0_:.1f}"
            f" probe_rows={out_rows} (x{out_rows / r0:.1f})"
        )
        if copies > 1:
            ok = best / t0_ <= max(out_rows / r0, copies) * 1.1
            line += (
                "  OK (wall <= probe-output growth)"
                if ok
                else "  SUPER-LINEAR (FAIL)"
            )
        print(line)


def leg_b(spark) -> None:
    from storm_dynamic_spout_spark.streaming.bm25_stream import (
        StreamingBm25Index,
    )

    docs = load_table(spark, SF_DIR, "documents")
    workdir = tempfile.mkdtemp(prefix="bm25-sweep-")
    idx = StreamingBm25Index(workdir)
    walls = []
    for k in range(N_BATCHES):
        batch = docs.filter(F.col("doc_id") % N_BATCHES == k).withColumn(
            "text", F.regexp_replace(F.col("text"), r"(\S+)", f"$1_b{k}")
        )
        t0 = time.perf_counter()
        idx.process_batch(batch)
        walls.append(time.perf_counter() - t0)
        n_pos = idx.postings_df(spark).count()
        print(
            f"  bm25_batch_sweep batch={k + 1}/{N_BATCHES}"
            f" wall={walls[-1]:.2f}s index_rows={n_pos}"
        )
    # batch 1 pays JVM/classloader warmup and has no probe step; judge
    # flatness on batches 2..N (each probes a strictly larger index)
    steady = walls[1:]
    ratio = steady[-1] / steady[0] if steady[0] > 0 else float("inf")
    verdict = "FLAT (per-batch cost independent of index size)" if (
        ratio <= 1.5
    ) else f"GROWING (last/first steady ratio {ratio:.1f})"
    print(
        f"  bm25_batch_sweep steady batches 2..{N_BATCHES}:"
        f" first={steady[0]:.2f}s last={steady[-1]:.2f}s"
        f" ratio={ratio:.2f}  {verdict}"
    )
    shutil.rmtree(workdir)


def main() -> int:
    spark = build_session(
        EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
    )
    spark.sparkContext.setLogLevel("ERROR")
    # shed the first-noop classloading cost before any timed run
    spark.range(1).write.format("noop").mode("overwrite").save()
    leg_a(spark)
    leg_b(spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
