"""Interleaved A/B of a runtime SQL conf across catalog queries.

    python tools/ab_conf.py <conf> <valA> <valB> <query> [query ...]
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from storm_dynamic_spout_spark.engine import EngineConfig, build_session
from storm_dynamic_spout_spark.queries import QUERIES

SF = "/root/testdata/sf0.1"


def main() -> None:
    conf, va, vb = sys.argv[1], sys.argv[2], sys.argv[3]
    names = sys.argv[4:]
    spark = build_session(
        EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
    )
    spark.sparkContext.setLogLevel("ERROR")
    QUERIES[names[0]](spark, SF).write.format("noop").mode("overwrite").save()
    for name in names:
        times = {"A": [], "B": []}
        for _ in range(4):
            for label, val in (("A", va), ("B", vb)):
                spark.conf.set(conf, val)
                spark.sparkContext.setJobDescription(f"{label}:{name}")
                t0 = time.perf_counter()
                QUERIES[name](spark, SF).write.format("noop").mode("overwrite").save()
                times[label].append(time.perf_counter() - t0)
        for label, val in (("A", va), ("B", vb)):
            ts = sorted(times[label])
            print(
                f"{name} {label}({val}): best={ts[0]:.3f} median={ts[len(ts)//2]:.3f}",
                flush=True,
            )
        spark.conf.set(conf, va)
        ra = sorted(map(tuple, QUERIES[name](spark, SF).collect()))
        spark.conf.set(conf, vb)
        rb = sorted(map(tuple, QUERIES[name](spark, SF).collect()))
        print(f"{name} IDENTICAL: {ra == rb} ({len(rb)} rows)", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
