"""merge_upsert (SCD-1 MERGE) semantics: whole-row replace on match —
including source NULLs overwriting target values (the coalesce-per-
column trap) — insert of unmatched source rows, pass-through of
unmatched target rows, and schema guarding."""

from __future__ import annotations

import pytest

from storm_dynamic_spout_spark.operators.merge import merge_upsert


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_matched_rows_take_source_values_including_nulls(spark):
    target = spark.createDataFrame(
        [(1, "old", 10), (2, "keep", 20)], "id long, name string, v int"
    )
    source = spark.createDataFrame([(1, None, 99)], "id long, name string, v int")
    out = merge_upsert(target, source, keys=["id"])
    # row 1: whole-row replace — name becomes NULL (NOT resurrected "old")
    assert _rows(out) == [(1, None, 99), (2, "keep", 20)]


def test_unmatched_source_rows_insert(spark):
    target = spark.createDataFrame([(1, "a")], "id long, name string")
    source = spark.createDataFrame([(2, "b"), (3, "c")], "id long, name string")
    out = merge_upsert(target, source, keys=["id"])
    assert _rows(out) == [(1, "a"), (2, "b"), (3, "c")]


def test_composite_key_match(spark):
    target = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0)], "k1 long, k2 string, v double"
    )
    source = spark.createDataFrame([(1, "y", 9.0)], "k1 long, k2 string, v double")
    out = merge_upsert(target, source, keys=["k1", "k2"])
    assert _rows(out) == [(1, "x", 1.0), (1, "y", 9.0)]


def test_schema_mismatch_rejected(spark):
    target = spark.createDataFrame([(1, "a")], "id long, name string")
    source = spark.createDataFrame([(1,)], "id long")
    with pytest.raises(ValueError, match="identical schemas"):
        merge_upsert(target, source, keys=["id"])


def test_output_column_order_follows_target(spark):
    target = spark.createDataFrame([(1, "a", 2)], "id long, name string, v int")
    source = spark.createDataFrame([(2, "b", 3)], "id long, name string, v int")
    out = merge_upsert(target, source, keys=["id"])
    assert out.columns == ["id", "name", "v"]
