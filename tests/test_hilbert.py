"""Hilbert-curve clustering (operators/layout.py hilbert_key /
write_hilbert_clustered): exact parity with the public xy2d algorithm,
the no-long-jumps adjacency property, and footer-stats file skipping at
least as good as Z-order on a second-dimension filter."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.operators.layout import (
    attach_hilbert_key,
    hilbert_key,
    write_clustered,
    write_hilbert_clustered,
    write_zordered,
)


def _xy2d(n: int, x: int, y: int) -> int:
    """Reference pure-Python Hilbert index (the published iterative
    rotation algorithm)."""
    d = 0
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def _files_touched(path: str, col: str, lo: int, hi: int) -> tuple[int, int]:
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


def test_hilbert_key_matches_reference_and_is_adjacent(spark):
    import itertools

    bits = 4
    n = 1 << bits
    pts = list(itertools.product(range(n), range(n)))
    df = spark.createDataFrame(pts, "x long, y long").withColumn(
        "h", hilbert_key("x", "y", bits=bits)
    )
    got = {(r.x, r.y): r.h for r in df.collect()}
    assert all(got[(x, y)] == _xy2d(n, x, y) for x, y in pts)
    # the curve property Morton lacks: consecutive indices are ALWAYS
    # grid neighbors (no quadrant-seam jumps)
    inv = {v: k for k, v in got.items()}
    assert all(
        abs(inv[d][0] - inv[d + 1][0]) + abs(inv[d][1] - inv[d + 1][1]) == 1
        for d in range(n * n - 1)
    )


def test_hilbert_key_guards():
    with pytest.raises(ValueError, match="exceeds a LONG"):
        hilbert_key("x", "y", bits=32)
    with pytest.raises(ValueError, match="exceeds a LONG"):
        attach_hilbert_key(None, "x", "y", bits=32)


def test_attach_hilbert_df_form_matches_reference(spark):
    """The per-step-projection form (linear plan size, the one real
    writes use — the nested Column form grows ~6^bits expression nodes)
    computes the same index at production width."""
    import itertools
    import random

    bits = 8
    n = 1 << bits
    pts = random.Random(1).sample(
        list(itertools.product(range(n), range(n))), 300
    )
    df = spark.createDataFrame(pts, "x long, y long")
    got = {(r["x"], r["y"]): r["__h"] for r in attach_hilbert_key(df, "x", "y", bits=bits).collect()}
    assert all(got[(x, y)] == _xy2d(n, x, y) for x, y in pts)


def test_hilbert_clustering_skips_files_second_dimension(spark, tmp_path):
    """Same footer-stats experiment as the Z-order test: a narrow filter
    on the second dimension must skip most Hilbert-clustered files (and
    all linearly-sorted files are touched); Hilbert must be at least as
    good as Z-order here."""
    n, side = 1 << 16, 256
    grid = spark.range(n).select(
        (F.col("id") % side).alias("x"),
        (F.col("id") / side).cast("long").alias("y"),
    )
    linear = str(tmp_path / "linear")
    write_clustered(
        grid.repartitionByRange(16, "x", "y"), linear, cluster_by=["x", "y"]
    )
    hilb = str(tmp_path / "hilbert")
    write_hilbert_clustered(
        grid,
        hilb,
        cluster_cols=["x", "y"],
        bounds={"x": (0, side - 1), "y": (0, side - 1)},
        target_files=16,
        bits=8,
    )
    zord = str(tmp_path / "zorder")
    write_zordered(
        grid,
        zord,
        zorder_by=["x", "y"],
        bounds={"x": (0, side - 1), "y": (0, side - 1)},
        target_files=16,
        bits=8,
    )
    lo, hi = 100, 107
    lin_touched, lin_total = _files_touched(linear, "y", lo, hi)
    h_touched, h_total = _files_touched(hilb, "y", lo, hi)
    assert lin_total == h_total == 16
    assert lin_touched == lin_total  # linear reads everything
    assert h_touched <= h_total // 2  # hilbert skips most
    # aggregate locality: summed over ranges on BOTH dims, hilbert's
    # no-seam curve touches no more files than Morton (per-range
    # results vary either way; the average is the curve's claim)
    ranges = [(100, 107), (0, 7), (200, 231)]
    h_sum = sum(
        _files_touched(hilb, c, a, b)[0] for c in ("x", "y") for a, b in ranges
    )
    z_sum = sum(
        _files_touched(zord, c, a, b)[0] for c in ("x", "y") for a, b in ranges
    )
    assert h_sum <= z_sum, (h_sum, z_sum)
    # data intact through the layout
    assert spark.read.parquet(hilb).count() == n
    back = spark.read.parquet(hilb).filter((F.col("y") >= lo) & (F.col("y") <= hi))
    assert back.count() == (hi - lo + 1) * side


def test_hilbert_rejects_non_2d():
    with pytest.raises(ValueError, match="exactly two columns"):
        write_hilbert_clustered(None, "p", ["a"], {})
