"""Grid-cell spatial neighbor join (operators/spatial.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from storm_dynamic_spout_spark.engine import load_table
from storm_dynamic_spout_spark.operators.spatial import grid_neighbor_pairs


def _points(spark, sf_dir):
    from storm_dynamic_spout_spark.catalog.joins import _spatial_coord

    return load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("id"),
        _spatial_coord("x").alias("ux"),
        _spatial_coord("y").alias("uy"),
    )


def test_grid_matches_brute_force(spark, sf_dir):
    pts = _points(spark, sf_dir)
    got = grid_neighbor_pairs(pts, "id", "ux", "uy", 1000)
    a = pts.select(F.col("id").alias("id_a"), F.col("ux").alias("xa"), F.col("uy").alias("ya"))
    b = pts.select(F.col("id").alias("id_b"), F.col("ux").alias("xb"), F.col("uy").alias("yb"))
    d2 = (F.col("xa") - F.col("xb")) ** 2 + (F.col("ya") - F.col("yb")) ** 2
    exp = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist2", d2.cast("long"))
        .filter(F.col("dist2") <= 1000 * 1000)
        .select("id_a", "id_b", "dist2")
    )
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_each_pair_found_exactly_once(spark, sf_dir):
    """The 3×3 blocking meets every qualifying pair on exactly one
    cell key — no post-join dedup exists in the operator, so a double
    count here would mean duplicate output rows."""
    pts = _points(spark, sf_dir)
    out = grid_neighbor_pairs(pts, "id", "ux", "uy", 1000)
    n = out.count()
    assert out.select("id_a", "id_b").distinct().count() == n


def test_no_cartesian_in_plan(spark, sf_dir):
    pts = _points(spark, sf_dir)
    plan = (
        grid_neighbor_pairs(pts, "id", "ux", "uy", 1000)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_negative_coordinates(spark):
    """Cell indexing must stay correct for negative coordinates
    (floor division, collision-free key packing): points straddling
    the origin pair up exactly as brute force says."""
    import itertools

    pts = spark.createDataFrame(
        [
            (i, x, y)
            for i, (x, y) in enumerate(
                [(-1500, -1500), (-900, -900), (-100, 50), (40, -40), (800, 900), (2500, 2500)]
            )
        ],
        "id long, ux long, uy long",
    )
    got = {
        (r.id_a, r.id_b, r.dist2)
        for r in grid_neighbor_pairs(pts, "id", "ux", "uy", 1000).collect()
    }
    rows = [(0, -1500, -1500), (1, -900, -900), (2, -100, 50), (3, 40, -40), (4, 800, 900), (5, 2500, 2500)]
    exp = set()
    for (i, xa, ya), (j, xb, yb) in itertools.combinations(rows, 2):
        d2 = (xa - xb) ** 2 + (ya - yb) ** 2
        if d2 <= 1000 * 1000:
            exp.add((i, j, d2))
    assert got == exp and len(exp) >= 2
