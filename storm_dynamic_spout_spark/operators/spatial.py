"""Spatial neighbor-pair join via grid-cell blocking.

Finds all point pairs within a radius WITHOUT the all-pairs cross
join: space is tiled into cells of side = radius, each point joins
only points in its own or the 8 adjacent cells (any pair within
``radius`` must live in adjacent cells, so the blocking is
no-false-negative), and the exact distance predicate drops the
corner cases.  The same bucket-blocking shape as the LSH/banding
dedup family, applied to coordinates instead of token hashes.

Everything stays in the integer domain: coordinates are integer
micro-units and the predicate compares squared distance to radius²
as BIGINT — no sqrt, no float near-ties across engines.

Plan at 100 TB: one explode (9 cells per point on one side), one
equi-join on cell id, the exact filter map-side after the join.
Cell side = radius keeps the neighbor count per cell bounded by
density; skewed cells (urban cores) are ordinary AQE skew-join work
because the join key is a plain bigint.

Reference parity: the reference has no spatial surface (SURVEY §2);
training-pipeline extension (e.g. geo dedup of crawl metadata).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def grid_neighbor_pairs(
    points: DataFrame,
    id_col: str,
    x_col: str,
    y_col: str,
    radius: int,
) -> DataFrame:
    """All pairs (id_a < id_b) with squared Euclidean distance ≤
    ``radius``² over integer coordinates.  Output: ``id_a, id_b,
    dist2`` (BIGINT).

    One side sits in its home cell; the other explodes to its 3×3
    cell neighborhood, so every qualifying pair meets on exactly one
    cell key — no post-join dedup needed."""
    cell_x = F.floor(F.col(x_col) / radius)
    cell_y = F.floor(F.col(y_col) / radius)

    def cell_key(cx, cy):
        # collision-free (cx, cy) → bigint for |cell index| < 2^30
        # (coordinates to ±2^30·radius, incl. negatives): a colliding
        # encoding would let one pair meet on two cell keys and emit a
        # duplicate row — uniqueness is a correctness property here,
        # not a hygiene nicety
        return (cx + F.lit(1 << 30)) * F.lit(1 << 31) + (cy + F.lit(1 << 30))

    home = points.select(
        F.col(id_col).alias("id_a"),
        F.col(x_col).alias("__xa"),
        F.col(y_col).alias("__ya"),
        cell_key(cell_x, cell_y).alias("__cell"),
    )
    neighbor_cells = F.flatten(
        F.array(
            *[
                F.array(cell_key(cell_x + dx, cell_y + dy))
                for dx in (-1, 0, 1)
                for dy in (-1, 0, 1)
            ]
        )
    )
    probe = points.select(
        F.col(id_col).alias("id_b"),
        F.col(x_col).alias("__xb"),
        F.col(y_col).alias("__yb"),
        F.explode(neighbor_cells).alias("__cell"),
    )
    dx = F.col("__xa") - F.col("__xb")
    dy = F.col("__ya") - F.col("__yb")
    return (
        home.join(probe, "__cell")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist2", (dx * dx + dy * dy).cast("long"))
        .filter(F.col("dist2") <= F.lit(radius) * F.lit(radius))
        .select("id_a", "id_b", "dist2")
    )
