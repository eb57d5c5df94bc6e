"""sf1-equivalent rehearsal for the ANN + embedding family (round 10,
extending the r8-verdict-item-4 dedup rehearsal in tools/
sf1_rehearsal.py): run the FULL trained FAISS shape
(ann_topk_ivfpq_trained: train -> assign -> ADC scan) and the diagonal
whitening pass against a 50x sf0.1 embeddings table (100k vectors) and
record timings + recall + the whitening moments into SCALE_SF1.md
(appended section).

    python tools/sf1_ann_rehearsal.py

The 50x table is the examples/scale_smoke.py recipe: fifty copies of
the sf0.1 embeddings with shifted vec_ids and a per-copy circular
dimension shift, so copies are decorrelated while the fixed 8-query
panel (vec_id < 8, all in copy 0) stays constant — the index grows
50x, the queries don't, which is exactly how a production vector
index scales.  Checks:

- ivfpq_trained completes at 50x with the same per-query output
  contract (8 queries x k rows) and a wall-clock blow-up well under
  the 50x data blow-up (the ADC scan is bucket-bounded);
- recall@k vs EXACT L2 ground truth (metric-matched: the ADC scan
  minimizes squared L2 — scoring it against cosine ground truth
  reads as 0.03 "recall" that is really metric disagreement) for the
  production knob ladder: the nprobe=1 ADC-only baseline, then
  nprobe=4 + exact rerank of a 1000-row-per-query shortlist
  (pq_topk_ivf_adc_tuned).  The tuned point must beat the baseline
  (the knobs only add candidates / replace approximate scores) and
  clear an absolute floor of 0.15;
- whiten_ppm at 50x still standardizes every dimension (|mean| < 1
  ppm-unit, pop-std within 0.1% of 1e6) — the moments contract is
  scale-invariant, so any partial-aggregation bug shows up here.
"""

from __future__ import annotations

import os
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

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 50
RECALL_FLOOR = 0.15
DIM = 64


def build_embeddings(spark, n_copies: int):
    base = load_table(spark, SF01, "embeddings")
    copies = []
    for i in range(n_copies):
        c = base.withColumn("vec_id", F.col("vec_id") + F.lit(i * 1_000_000_000))
        if i > 0:
            shift = i % (DIM - 1) + 1  # 1..63, never the identity
            c = c.withColumn(
                "embedding",
                F.concat(
                    F.slice(F.col("embedding"), shift + 1, DIM - shift),
                    F.slice(F.col("embedding"), 1, shift),
                ),
            )
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    return out


def _topk_ids(df, qcol: str, idcol: str) -> dict[int, set[int]]:
    out: dict[int, set[int]] = {}
    for r in df.collect():
        out.setdefault(r[qcol], set()).add(r[idcol])
    return out


def main() -> int:
    from storm_dynamic_spout_spark.queries import QUERIES as CATALOG

    spark = build_session(
        EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
    )
    spark.sparkContext.setLogLevel("ERROR")

    # 1x baseline timing
    t0 = time.perf_counter()
    CATALOG["ann_topk_ivfpq_trained"](spark, SF01).count()
    wall_1x = time.perf_counter() - t0

    report = [
        "",
        "## sf1-equivalent rehearsal — ANN + embedding family (round 10)",
        "",
        f"Corpus: {COPIES}x sf0.1 embeddings (100k vectors; shifted ids + "
        "per-copy circular dimension shift so copies decorrelate; the "
        "8-query panel lives in copy 0 and stays fixed while the index "
        "grows).  Built by tools/sf1_ann_rehearsal.py.",
        "",
    ]

    with tempfile.TemporaryDirectory(prefix="sf1ann-") as workdir:
        build_embeddings(spark, COPIES).coalesce(8).write.mode(
            "overwrite"
        ).parquet(os.path.join(workdir, "embeddings.parquet"))

        t0 = time.perf_counter()
        ivf = CATALOG["ann_topk_ivfpq_trained"](spark, workdir)
        ivf_ids = _topk_ids(ivf, "query_id", "neighbor_id")
        wall_nx = time.perf_counter() - t0
        n_queries = len(ivf_ids)
        k = max(len(v) for v in ivf_ids.values())
        ratio = wall_nx / wall_1x
        ok_ratio = ratio <= COPIES  # far below in practice; never super-linear
        report.append(
            f"- ann_topk_ivfpq_trained @ {COPIES}x: {wall_nx:.1f}s vs "
            f"{wall_1x:.1f}s at 1x = {ratio:.1f}x wall for {COPIES}x data "
            f"-> {'SUB-LINEAR (pass)' if ok_ratio else 'SUPER-LINEAR (FAIL)'}; "
            f"{n_queries} queries x {k} results"
        )
        print(report[-1], flush=True)

        # exact L2 ground truth on the SAME corpus (metric-matched to
        # the ADC scan), then the production knob ladder
        from pyspark.sql.window import Window as W

        from storm_dynamic_spout_spark.operators.similarity import (
            ivf_assign_labels,
            pq_topk_ivf_adc_tuned,
        )

        e50 = load_table(spark, workdir, "embeddings")
        t0 = time.perf_counter()
        qv = e50.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
        )
        cv = e50.select(
            F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
        )
        d2 = F.aggregate(
            F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        wgt = W.partitionBy("query_id").orderBy("d2", "neighbor_id")
        gt = _topk_ids(
            qv.crossJoin(cv)
            .filter(F.col("query_id") != F.col("neighbor_id"))
            .withColumn("d2", d2)
            .withColumn("rank", F.row_number().over(wgt))
            .filter(F.col("rank") <= 5)
            .select("query_id", "neighbor_id"),
            "query_id",
            "neighbor_id",
        )
        wall_gt = time.perf_counter() - t0

        assigned = ivf_assign_labels(e50, "vec_id", "embedding", "label")
        dfb = e50.select("vec_id", "embedding").join(assigned, "vec_id")

        def _recall(nprobe: int, rm: int) -> tuple[float, float]:
            t0 = time.perf_counter()
            got = _topk_ids(
                pq_topk_ivf_adc_tuned(
                    dfb,
                    "vec_id",
                    "embedding",
                    "assigned",
                    dim=DIM,
                    query_pred=F.col("vec_id") < 8,
                    k=5,
                    nprobe=nprobe,
                    rerank_mult=rm,
                ),
                "query_id",
                "neighbor_id",
            )
            rec = sum(len(gt[q] & got.get(q, set())) / len(gt[q]) for q in gt) / len(
                gt
            )
            return rec, time.perf_counter() - t0

        rec_base, wall_base = _recall(1, 0)
        rec_tuned, wall_tuned = _recall(4, 200)
        ok_recall = rec_tuned >= max(rec_base, RECALL_FLOOR)
        report.append(
            f"- recall@5 vs exact L2 ground truth ({wall_gt:.1f}s brute "
            f"force over {COPIES * 2000} vectors): ADC-only nprobe=1 "
            f"baseline **{rec_base:.2f}** ({wall_base:.1f}s) -> nprobe=4 + "
            f"1k-shortlist exact rerank **{rec_tuned:.2f}** "
            f"({wall_tuned:.1f}s; floor {RECALL_FLOOR}, must beat baseline) "
            f"-> {'pass' if ok_recall else 'FAIL'}"
        )
        print(report[-1], flush=True)

        # PQ codebook training at 50x: distortion must not increase
        # (k-means SSE is non-increasing from the fixture-codebook init)
        from storm_dynamic_spout_spark.operators.similarity import (
            pq_assign,
            pq_train_codebook,
        )

        t0 = time.perf_counter()
        fix_err = (
            pq_assign(e50, "vec_id", "embedding", DIM)
            .agg(F.sum("err_micro"))
            .first()[0]
        )
        cb = pq_train_codebook(e50, "vec_id", "embedding", DIM, iters=3)
        tr_err = (
            pq_assign(e50, "vec_id", "embedding", DIM, codebook=cb)
            .agg(F.sum("err_micro"))
            .first()[0]
        )
        wall_train = time.perf_counter() - t0
        ok_train = tr_err <= fix_err
        report.append(
            f"- pq_train_codebook @ {COPIES}x ({wall_train:.1f}s incl. both "
            f"assigns): total quantization error {fix_err} (fixture) -> "
            f"{tr_err} (3 Lloyd iters) = {tr_err / fix_err:.2f}x -> "
            f"{'NON-INCREASING (pass)' if ok_train else 'INCREASED (FAIL)'}"
        )
        print(report[-1], flush=True)

        # whitening moments at 50x: scale-invariant contract
        from storm_dynamic_spout_spark.operators.similarity import whiten_ppm

        t0 = time.perf_counter()
        emb = load_table(spark, workdir, "embeddings")
        stats = (
            whiten_ppm(emb, "vec_id", "embedding")
            .select(F.posexplode("white_ppm").alias("pos", "x"))
            .groupBy("pos")
            .agg(F.avg("x").alias("mu"), F.stddev_pop("x").alias("sd"))
            .collect()
        )
        wall_w = time.perf_counter() - t0
        worst_mu = max(abs(r["mu"]) for r in stats)
        worst_sd = max(abs(r["sd"] - 1_000_000) for r in stats)
        ok_white = worst_mu < 1.0 and worst_sd < 1_000
        report.append(
            f"- whiten_ppm @ {COPIES}x ({wall_w:.1f}s): worst per-dimension "
            f"|mean| = {worst_mu:.3f} ppm-units, worst |sd - 1e6| = "
            f"{worst_sd:.1f} over {len(stats)} dimensions -> "
            f"{'STANDARDIZED (pass)' if ok_white else 'MOMENTS DRIFTED (FAIL)'}"
        )
        print(report[-1], flush=True)

    with open(
        Path(__file__).resolve().parent.parent / "SCALE_SF1.md", "a"
    ) as fh:
        fh.write("\n".join(report) + "\n")
    print("appended SCALE_SF1.md")
    spark.stop()
    return 0 if ok_ratio and ok_recall and ok_train and ok_white else 1


if __name__ == "__main__":
    raise SystemExit(main())
