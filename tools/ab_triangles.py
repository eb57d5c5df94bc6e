"""Interleaved A/B for the degree_oriented_triangles wedge rewrite.

A = old shape (wedge self-join on src), B = new module code (one
src-keyed aggregate + sorted-adjacency ordered-pair explode).
Alternates A,B,A,B,... in one session; prints per-variant timings and
verifies identical triangle sets through the clustering-coefficient
catalog query path.
"""
from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.engine import EngineConfig, build_session
from storm_dynamic_spout_spark.operators.graph import (
    degree_oriented_triangles,
    orient_by_degree,
)

SF = "/root/testdata/sf0.1"


def old_triangles(edges):
    d = orient_by_degree(edges).localCheckpoint(eager=False)
    d1 = d.alias("d1")
    d2 = d.alias("d2")
    wedges = (
        d1.join(d2, F.col("d1.src") == F.col("d2.src"))
        .filter(
            (F.col("d1.dst_deg") < F.col("d2.dst_deg"))
            | (
                (F.col("d1.dst_deg") == F.col("d2.dst_deg"))
                & (F.col("d1.dst") < F.col("d2.dst"))
            )
        )
        .select(
            F.col("d1.src").alias("apex"),
            F.col("d1.dst").alias("v"),
            F.col("d2.dst").alias("w"),
        )
    )
    closing = d.select(F.col("src").alias("v"), F.col("dst").alias("w"))
    return wedges.join(closing, ["v", "w"]).select("apex", "v", "w")


def _edges(spark):
    from storm_dynamic_spout_spark.catalog.analytics import _TRI_RADIUS, t
    from storm_dynamic_spout_spark.catalog.joins import _spatial_coord
    from storm_dynamic_spout_spark.operators.spatial import grid_neighbor_pairs

    pts = t(spark, SF, "customer").select(
        F.col("c_custkey").alias("id"),
        _spatial_coord("x").alias("ux"),
        _spatial_coord("y").alias("uy"),
    )
    return grid_neighbor_pairs(pts, "id", "ux", "uy", _TRI_RADIUS).select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    ).localCheckpoint(eager=False)


def main() -> None:
    spark = build_session(
        EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
    )
    spark.sparkContext.setLogLevel("ERROR")
    edges = _edges(spark)
    variants = {"A": old_triangles, "B": degree_oriented_triangles}
    # warm-up
    variants["B"](edges).write.format("noop").mode("overwrite").save()
    times = {"A": [], "B": []}
    for _ in range(5):
        for label, fn in variants.items():
            spark.sparkContext.setJobDescription(f"{label}:triangles")
            t0 = time.perf_counter()
            fn(edges).write.format("noop").mode("overwrite").save()
            times[label].append(time.perf_counter() - t0)
    for label in ("A", "B"):
        ts = sorted(times[label])
        print(f"{label}: best={ts[0]:.3f} median={ts[len(ts) // 2]:.3f}", flush=True)
    ra = sorted(map(tuple, old_triangles(edges).collect()))
    rb = sorted(map(tuple, degree_oriented_triangles(edges).collect()))
    print(f"IDENTICAL: {ra == rb} ({len(rb)} triangles)")
    spark.stop()


if __name__ == "__main__":
    main()
