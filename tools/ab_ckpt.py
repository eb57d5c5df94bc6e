"""Generic interleaved A/B for localCheckpoint-style optimizations.

A = catalog query with DataFrame.localCheckpoint monkeypatched to
identity (i.e. the un-checkpointed plan), B = real module code.
Only valid for queries whose ONLY recent change is added checkpoints.

    python tools/ab_ckpt.py <query> [reps]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import DataFrame

from storm_dynamic_spout_spark.engine import EngineConfig, build_session
from storm_dynamic_spout_spark.queries import QUERIES

SF = "/root/testdata/sf0.1"


def main() -> None:
    name = sys.argv[1]
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = build_session(
        EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
    )
    spark.sparkContext.setLogLevel("ERROR")
    real_ckpt = DataFrame.localCheckpoint

    def build(ckpt: bool):
        if not ckpt:
            DataFrame.localCheckpoint = lambda self, eager=True: self
        try:
            return QUERIES[name](spark, SF)
        finally:
            DataFrame.localCheckpoint = real_ckpt

    build(True).write.format("noop").mode("overwrite").save()
    ta, tb = [], []
    for _ in range(reps):
        for label, ck, acc in (("A", False, ta), ("B", True, tb)):
            spark.sparkContext.setJobDescription(f"ab:{label}:{name}")
            t0 = time.perf_counter()
            build(ck).write.format("noop").mode("overwrite").save()
            acc.append(time.perf_counter() - t0)
    ta.sort(); tb.sort()
    print(f"A nockpt: best={ta[0]:.3f} median={ta[len(ta)//2]:.3f} all={[round(x,2) for x in ta]}")
    print(f"B ckpt  : best={tb[0]:.3f} median={tb[len(tb)//2]:.3f} all={[round(x,2) for x in tb]}")
    ra = sorted(map(tuple, build(False).collect()))
    rb = sorted(map(tuple, build(True).collect()))
    print("IDENTICAL:", ra == rb, f"({len(rb)} rows)")
    spark.stop()


if __name__ == "__main__":
    main()
