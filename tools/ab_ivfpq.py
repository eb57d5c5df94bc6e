"""Interleaved A/B for the ann_topk_ivfpq_trained assigned-checkpoint."""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.engine import EngineConfig, build_session
from storm_dynamic_spout_spark.operators.similarity import (
    PQ_K,
    ivf_assign_labels,
    pq_topk_ivf_adc,
)
from storm_dynamic_spout_spark.catalog.llm import ANN_K

SF = "/root/testdata/sf0.1"


def build(spark, ckpt: bool):
    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    assigned = ivf_assign_labels(e, "vec_id", "embedding", "label")
    if ckpt:
        assigned = assigned.localCheckpoint(eager=False)
    df = e.select("vec_id", "embedding").join(assigned, "vec_id")
    return pq_topk_ivf_adc(
        df, "vec_id", "embedding", "assigned", dim=64,
        query_pred=F.col("vec_id") < PQ_K, k=ANN_K,
    ).orderBy("query_id", "rank")


def main() -> None:
    spark = build_session(
        EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
    )
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, True).write.format("noop").mode("overwrite").save()
    ta, tb = [], []
    for _ in range(5):
        for name, ck, acc in (("A", False, ta), ("B", True, tb)):
            spark.sparkContext.setJobDescription(f"ab:{name}")
            t0 = time.perf_counter()
            build(spark, ck).write.format("noop").mode("overwrite").save()
            acc.append(time.perf_counter() - t0)
    ta.sort(); tb.sort()
    print(f"A old: best={ta[0]:.3f} median={ta[len(ta)//2]:.3f} all={[round(x,2) for x in ta]}")
    print(f"B new: best={tb[0]:.3f} median={tb[len(tb)//2]:.3f} all={[round(x,2) for x in tb]}")
    ra = sorted(map(tuple, build(spark, False).collect()))
    rb = sorted(map(tuple, build(spark, True).collect()))
    print("IDENTICAL:", ra == rb, f"({len(ra)} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
