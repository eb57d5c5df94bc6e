"""Binned interval join: big-big range joins without a nested loop.

A range predicate with NO equi key (point ∈ [start, end)) defaults to
BroadcastNestedLoopJoin in Spark — O(|points| x |intervals|) compares
and a broadcast of one whole side.  Fine for a tiny dimension (see
catalog join_range); fatal when both sides are large (IP→geo lookup,
price-band matching, time-interval enrichment at 100 TB).

The standard fix (Databricks' range-join "bin" optimization, re-built
here from public technique): quantize the domain into width-``w`` bins,

- each point lands in exactly ONE bin: ``floor(p / w)``;
- each interval explodes to the bins it covers:
  ``sequence(floor(start/w), floor(end/w))`` — ≤ ``len/w + 2`` rows;

then the join is an EQUI-join on the bin id (shuffle or broadcast hash,
AQE-skew-splittable) with the exact range predicate as a residual
filter.  A (point, interval) pair can only meet in the point's single
bin, so no dedup is needed.  Pick ``bin_width`` near the typical
interval length: explosion factor stays ~2x while each bin pairs a
point only with intervals that plausibly contain it.

IEEE safety: division is monotone, so ``s <= p < e`` implies
``floor(s/w) <= floor(p/w) <= floor(e/w)`` — a matching pair always
shares the point's bin; boundary noise is settled by the residual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bin_width: float,
) -> DataFrame:
    """Inner join of ``points`` to every interval with
    ``start <= point < end``, as a bin equi-join + residual — never a
    nested loop.  Output columns: all of both inputs (names must not
    collide), helper bin dropped."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    w = F.lit(float(bin_width))
    pb = points.withColumn("__bin", F.floor(F.col(point_col) / w))
    ib = intervals.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w), F.floor(F.col(end_col) / w)
            )
        ),
    )
    return (
        pb.join(ib, "__bin")
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) < F.col(end_col))
        )
        .drop("__bin")
    )


def interval_overlap_binned(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bin_width: float,
) -> DataFrame:
    """Inner join of interval table ``left`` to every ``right`` interval
    it OVERLAPS (closed intervals: ``l_lo <= r_hi AND r_lo <= l_hi``) —
    the interval×interval counterpart of :func:`interval_join_binned`,
    still never a nested loop.

    Both sides explode to the bins they cover, the join is an equi-join
    on the bin id, and duplicates are eliminated WITHOUT a distinct:
    an overlapping pair shares every bin between
    ``max(floor(l_lo/w), floor(r_lo/w))`` and the overlap's end, so the
    pair is emitted only in that FIRST shared bin
    (``__bin == greatest(floor(l_lo/w), floor(r_lo/w))``) — one row per
    overlapping pair, no post-join dedup shuffle.  Output: all columns
    of both inputs (names must not collide)."""
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    w = F.lit(float(bin_width))
    lb = left.withColumn(
        "__bin",
        F.explode(
            F.sequence(F.floor(F.col(left_lo) / w), F.floor(F.col(left_hi) / w))
        ),
    )
    rb = right.withColumn(
        "__bin",
        F.explode(
            F.sequence(F.floor(F.col(right_lo) / w), F.floor(F.col(right_hi) / w))
        ),
    )
    first_shared = F.greatest(
        F.floor(F.col(left_lo) / w), F.floor(F.col(right_lo) / w)
    )
    return (
        lb.join(rb, "__bin")
        .filter(
            (F.col(left_lo) <= F.col(right_hi))
            & (F.col(right_lo) <= F.col(left_hi))
            & (F.col("__bin") == first_shared)
        )
        .drop("__bin")
    )
