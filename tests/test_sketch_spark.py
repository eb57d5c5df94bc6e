"""Spark-level contracts of operators/sketch.py that the catalog
queries don't exercise: integral-keyed heavy hitters (text uses string
keys; streaming uses the summaries variant) and the loud NULL-key
rejection added in the round-7 review pass.
"""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F


def test_heavy_hitters_exact_integral_key(spark):
    """End-to-end two-pass heavy hitters over a BIGINT key column —
    the output schema derives from the input type, the candidate set
    survives Arrow round-trips, and the result equals brute force."""
    from storm_dynamic_spout_spark.operators.sketch import heavy_hitters_exact

    vals = [1] * 40 + [2] * 25 + [3] * 5 + list(range(100, 130))
    df = spark.createDataFrame([(v,) for v in vals], "k long").repartition(4)
    k = 3
    got = {
        (r["k"], r["n_occurrences"], r["n_total"])
        for r in heavy_hitters_exact(df, "k", k).collect()
    }
    n = len(vals)
    exact = Counter(vals)
    want = {(v, c, n) for v, c in exact.items() if c * (k + 1) > n}
    assert got == want
    # type preserved: join key stayed bigint end to end
    out = heavy_hitters_exact(df, "k", k)
    assert dict(out.dtypes)["k"] == "bigint"


def test_partition_summaries_integral_key(spark):
    """partition_mg_summaries on a BIGINT column: counter rows carry
    long keys, the single NULL row carries the partition count, and
    totals add up."""
    from storm_dynamic_spout_spark.operators.sketch import partition_mg_summaries

    df = spark.createDataFrame(
        [(v,) for v in [7] * 20 + [8] * 10 + [9]], "k long"
    ).coalesce(1)
    rows = partition_mg_summaries(df, "k", 2).collect()
    counts = {r["k"]: r["est"] for r in rows if r["k"] is not None}
    total = sum(r["part_rows"] for r in rows if r["k"] is None)
    assert total == 31
    assert set(counts) <= {7, 8, 9} and 7 in counts  # 7 must survive k=2
    assert all(isinstance(key, int) for key in counts)


def test_null_key_rejected_loudly(spark):
    """A NULL in the key column must abort the sketch pass with the
    documented ValueError (silently dropping it would diverge from a
    GROUP BY oracle that counts the NULL group)."""
    from storm_dynamic_spout_spark.operators.sketch import (
        heavy_hitters_exact,
        partition_mg_summaries,
    )

    df = spark.createDataFrame([("a",), (None,), ("a",)], "k string")
    with pytest.raises(Exception, match="NULL key in heavy-hitter column"):
        heavy_hitters_exact(df, "k", 4).collect()
    with pytest.raises(Exception, match="NULL key in heavy-hitter column"):
        partition_mg_summaries(df, "k", 4).collect()
