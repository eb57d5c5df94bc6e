"""Three-point scale check for the clustering-coefficient shape (r11
verdict item 4): the r11 smoke measured 5.2x wall at 5x data — at the
linear bound but with data growth and engine overhead entangled.  This
runs 1x / 5x / 25x and records the DATA-side counters (edges, wedges,
triangles) next to wall time so the two are separable: wall ratio at
or below the wedge-count ratio means the engine scales with the work
the graph actually presents.

    python tools/clustering_scale3.py   # append output to SCALE_SMOKE_r{N}.txt

Wedges = sum over oriented apexes of C(out_degree, 2) — the candidate
pairs the degree-oriented close examines; the join cost driver."""

from __future__ import annotations

import os
import sys
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
POINTS = [int(x) for x in os.environ.get("SCALE3_POINTS", "1,5,25").split(",")]


def _edges(spark, copies: int):
    from storm_dynamic_spout_spark.catalog.joins import _spatial_coord
    from storm_dynamic_spout_spark.operators.spatial import grid_neighbor_pairs

    base = load_table(spark, SF_DIR, "customer")
    out = None
    for i in range(copies):
        c = base.withColumn("c_custkey", F.col("c_custkey") + F.lit(i * 1_000_000_000))
        out = c if out is None else out.unionByName(c)
    pts = out.select(
        F.col("c_custkey").alias("id"),
        _spatial_coord("x").alias("ux"),
        _spatial_coord("y").alias("uy"),
    )
    return grid_neighbor_pairs(pts, "id", "ux", "uy", 1_500).select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    )


def main() -> int:
    from storm_dynamic_spout_spark.operators.graph import (
        degree_oriented_triangles,
        orient_by_degree,
    )

    spark = build_session(
        EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
    )
    spark.sparkContext.setLogLevel("ERROR")
    # shed the first-noop classloading cost before any timed run
    spark.range(1).write.format("noop").mode("overwrite").save()

    rows = []
    base = None
    for copies in POINTS:
        edges = _edges(spark, copies).localCheckpoint(eager=True)
        n_edges = edges.count()
        oriented = orient_by_degree(edges)
        n_wedges = (
            oriented.groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"))
            .first()["w"]
        )
        best = float("inf")
        tri = 0
        for _ in range(3):
            t0 = time.perf_counter()
            tri = degree_oriented_triangles(edges).count()
            best = min(best, time.perf_counter() - t0)
        rows.append((copies, best, n_edges, int(n_wedges), tri))
        if base is None:
            base = rows[0]
        c0, t0_, e0, w0, _ = base
        line = (
            f"  clustering_coeff {copies}x={best:.2f}s "
            f"wall_ratio={best / t0_:.1f} edges={n_edges} "
            f"(x{n_edges / e0:.1f}) wedges={int(n_wedges)} "
            f"(x{n_wedges / w0:.1f}) triangles={tri}"
        )
        if copies > 1:
            ok = best / t0_ <= max(n_wedges / w0, copies) * 1.1
            line += "  OK (wall <= wedge growth)" if ok else "  SUPER-LINEAR (FAIL)"
        print(line)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
