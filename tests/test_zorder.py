"""Z-order layout (operators/layout.py): evidence that Morton-key
clustering actually buys multi-dimensional data skipping — measured
from the parquet footers (row-group min/max stats), the same stats a
100 TB scan uses to prune."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.operators.layout import (
    quantize_for_zorder,
    write_clustered,
    write_zordered,
    zorder_key,
)


def _files_touched(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
    """(files whose [min,max] on col intersects [lo,hi], total files)."""
    touched, total = 0, 0
    for f in sorted(glob.glob(f"{path}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        fmin, fmax = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmin = s.min if fmin is None else min(fmin, s.min)
                    fmax = s.max if fmax is None else max(fmax, s.max)
        total += 1
        if fmin is not None and not (fmax < lo or fmin > hi):
            touched += 1
    return touched, total


def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], "a long, b long")
    rows = {
        (r["a"], r["b"]): r["z"]
        for r in df.withColumn("z", zorder_key(["a", "b"], bits=4)).collect()
    }
    assert rows[(0, 0)] == 0
    assert rows[(1, 0)] == 1  # bit 0 of col 0 → position 0
    assert rows[(0, 1)] == 2  # bit 0 of col 1 → position 1
    # a=3 (011), b=5 (101): interleave a0,b0,a1,b1,a2,b2 = 1,1,1,0,0,1
    assert rows[(3, 5)] == 0b100111


def test_zorder_key_rejects_long_overflow():
    with pytest.raises(ValueError):
        zorder_key(["a", "b", "c", "d"], bits=16)  # 64 bits > LONG


def test_quantize_clamps_out_of_range(spark):
    df = spark.createDataFrame([(-5.0,), (50.0,), (300.0,)], "v double")
    q = [
        r["q"]
        for r in df.select(
            quantize_for_zorder(F.col("v"), 0.0, 255.0, bits=8).alias("q")
        ).collect()
    ]
    assert q[0] == 0 and q[2] == 255  # clamped, not wrapped
    assert 0 <= q[1] <= 255


def test_zorder_skips_files_on_second_dimension(spark, tmp_path):
    """The payoff: a filter on the SECOND dimension prunes z-ordered
    files but must read every linearly-sorted file (linear sort
    clusters only its first key). Counted from real parquet footer
    stats — exactly what the scan's row-group pruning consults."""
    n, side = 1 << 16, 256
    grid = (
        spark.range(n)
        .select(
            (F.col("id") % side).alias("x"),
            (F.col("id") / side).cast("long").alias("y"),
        )
    )
    linear = str(tmp_path / "linear")
    write_clustered(
        grid.repartitionByRange(16, "x", "y"),
        linear,
        cluster_by=["x", "y"],
    )
    zordered = str(tmp_path / "zorder")
    write_zordered(
        grid,
        zordered,
        zorder_by=["x", "y"],
        bounds={"x": (0, side - 1), "y": (0, side - 1)},
        target_files=16,
        bits=8,
    )
    lo, hi = 100, 107  # narrow range on y (the second sort key)
    lin_touched, lin_total = _files_touched(linear, "y", lo, hi)
    z_touched, z_total = _files_touched(zordered, "y", lo, hi)
    assert lin_total == z_total == 16
    # linear layout: x leads the sort, every file spans all y values
    assert lin_touched == lin_total
    # z-order: files are tight boxes in BOTH dims — most skip
    assert z_touched <= z_total // 2, (z_touched, z_total)
    # and the data survives the layout intact
    assert spark.read.parquet(zordered).count() == n
    back = spark.read.parquet(zordered).filter(
        (F.col("y") >= lo) & (F.col("y") <= hi)
    )
    assert back.count() == (hi - lo + 1) * side


# -- binned interval join (operators/rangejoin.py) --------------------------


def test_interval_join_binned_boundaries(spark):
    """[start, end) semantics at exact bin boundaries: start inclusive,
    end exclusive, intervals spanning multiple bins still match once."""
    from storm_dynamic_spout_spark.operators.rangejoin import interval_join_binned

    points = spark.createDataFrame(
        [(1, 0.0), (2, 9.999), (3, 10.0), (4, 25.0)], "pid long, p double"
    )
    intervals = spark.createDataFrame(
        [(100, 0.0, 10.0), (200, 5.0, 30.0)], "iid long, lo double, hi double"
    )
    got = {
        (r["pid"], r["iid"])
        for r in interval_join_binned(
            points, intervals, "p", "lo", "hi", bin_width=4.0
        ).collect()
    }
    assert got == {
        (1, 100),          # start inclusive
        (2, 100), (2, 200),
        (3, 200),          # end exclusive: 10.0 not in [0, 10)
        (4, 200),          # interval spanning 7 bins matches exactly once
    }


def test_interval_join_binned_rejects_bad_width(spark):
    import pytest

    from storm_dynamic_spout_spark.operators.rangejoin import interval_join_binned

    df = spark.range(1).withColumn("p", F.col("id").cast("double"))
    with pytest.raises(ValueError):
        interval_join_binned(df, df, "p", "p", "p", bin_width=0)
