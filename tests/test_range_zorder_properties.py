"""Property-style invariants for the z-order key and the binned
interval join, checked over fixture-derived data (same style as
test_corpus_properties.py):

- zorder_key round-trips: driver-side bit DE-interleaving recovers the
  original coordinates from every Spark-computed key (injectivity on
  the quantized grid follows);
- interval_join_binned is EXACTLY the naive non-equi join, and the
  result is invariant to bin_width (binning is an execution strategy,
  never a semantics change).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.engine import load_table
from storm_dynamic_spout_spark.operators.layout import zorder_key
from storm_dynamic_spout_spark.operators.rangejoin import interval_join_binned

SF = "/root/testdata/sf0.001"


def _deinterleave(z: int, n_cols: int, bits: int) -> tuple[int, ...]:
    vals = [0] * n_cols
    for b in range(bits):
        for i in range(n_cols):
            vals[i] |= ((z >> (b * n_cols + i)) & 1) << b
    return tuple(vals)


def test_zorder_key_roundtrips_on_grid(spark):
    bits = 8
    df = (
        spark.range(4096)
        .select(
            (F.col("id") % 64).alias("a"),
            ((F.col("id") / 64).cast("long") * 4).alias("b"),  # sparse dim
        )
        .withColumn("z", zorder_key(["a", "b"], bits=bits))
    )
    rows = df.collect()
    assert len({r["z"] for r in rows}) == len(rows)  # injective on the grid
    for r in rows:
        assert _deinterleave(r["z"], 2, bits) == (r["a"], r["b"])


def test_zorder_key_three_columns(spark):
    bits = 5
    df = (
        spark.range(1000)
        .select(
            (F.col("id") % 10).alias("a"),
            ((F.col("id") / 10).cast("long") % 10).alias("b"),
            ((F.col("id") / 100).cast("long")).alias("c"),
        )
        .withColumn("z", zorder_key(["a", "b", "c"], bits=bits))
    )
    rows = df.collect()
    assert len({r["z"] for r in rows}) == 1000
    for r in rows[::97]:
        assert _deinterleave(r["z"], 3, bits) == (r["a"], r["b"], r["c"])


def _naive_range_join(points, intervals, point_col, lo, hi):
    return points.crossJoin(intervals).filter(
        (F.col(point_col) >= F.col(lo)) & (F.col(point_col) < F.col(hi))
    )


def test_binned_join_equals_naive_and_is_width_invariant(spark):
    li = (
        load_table(spark, SF, "lineitem")
        # unit price = extendedprice/quantity lands in the retail-price
        # range, so the naive join is non-empty on the fixture
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        )
        .limit(500)
    )
    bands = (
        load_table(spark, SF, "part")
        .select(
            F.col("p_partkey").alias("band_id"),
            (F.col("p_retailprice") - 50.0).alias("lo"),
            (F.col("p_retailprice") + 50.0).alias("hi"),
        )
        .limit(300)
    )

    def key_set(df):
        return {
            (r["l_orderkey"], r["l_linenumber"], r["band_id"]) for r in df.collect()
        }

    naive = key_set(_naive_range_join(li, bands, "unit_price", "lo", "hi"))
    assert naive  # fixture prices do land in some bands
    for width in (10.0, 100.0, 1000.0):
        binned = key_set(
            interval_join_binned(li, bands, "unit_price", "lo", "hi", width)
        )
        assert binned == naive, f"width={width}"
