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


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_ids = st.integers(min_value=0, max_value=6)
_vals = st.one_of(st.none(), st.integers(min_value=-5, max_value=5))
_row_lists = st.lists(
    st.tuples(_ids, _vals, _vals), max_size=7, unique_by=lambda r: r[0]
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(target_rows=_row_lists, source_rows=_row_lists)
def test_merge_matches_pure_python_reference(spark, target_rows, source_rows):
    """For ANY (target, source) pair with unique keys: merge_upsert ==
    the dict-semantics reference {**target_by_key, **source_by_key},
    including NULL keys-of-columns and empty frames."""
    schema = "id long, a long, b long"
    target = spark.createDataFrame(target_rows, schema)
    source = spark.createDataFrame(source_rows, schema)
    got = sorted(tuple(r) for r in merge_upsert(target, source, keys=["id"]).collect())
    ref = {r[0]: r for r in target_rows}
    ref.update({r[0]: r for r in source_rows})
    assert got == sorted(ref.values())


# --- SCD-2 ------------------------------------------------------------------

from storm_dynamic_spout_spark.operators.merge import merge_scd2


def _scd2_target(spark, rows):
    return spark.createDataFrame(
        rows, "id long, v string, valid_from long, valid_to long, is_current boolean"
    )


def test_scd2_changed_row_closes_and_reopens(spark):
    target = _scd2_target(spark, [(1, "old", 1, None, True)])
    source = spark.createDataFrame([(1, "new")], "id long, v string")
    out = sorted(tuple(r) for r in merge_scd2(target, source, ["id"], 2).collect())
    assert out == [(1, "new", 2, None, True), (1, "old", 1, 2, False)]


def test_scd2_identical_snapshot_is_noop(spark):
    """Re-delivering the same snapshot creates NO new versions — the
    idempotency that makes SCD-2 safe under at-least-once upstreams."""
    target = _scd2_target(spark, [(1, "same", 1, None, True)])
    source = spark.createDataFrame([(1, "same")], "id long, v string")
    out = [tuple(r) for r in merge_scd2(target, source, ["id"], 2).collect()]
    assert out == [(1, "same", 1, None, True)]


def test_scd2_history_rows_pass_through_untouched(spark):
    target = _scd2_target(
        spark,
        [(1, "v1", 1, 2, False), (1, "v2", 2, None, True)],
    )
    source = spark.createDataFrame([(1, "v3")], "id long, v string")
    out = sorted(tuple(r) for r in merge_scd2(target, source, ["id"], 3).collect())
    assert out == [
        (1, "v1", 1, 2, False),   # history untouched
        (1, "v2", 2, 3, False),   # current closed
        (1, "v3", 3, None, True), # new version opened
    ]


def test_scd2_insert_and_target_only(spark):
    target = _scd2_target(spark, [(1, "keep", 1, None, True)])
    source = spark.createDataFrame([(2, "brand-new")], "id long, v string")
    out = sorted(tuple(r) for r in merge_scd2(target, source, ["id"], 2).collect())
    assert out == [(1, "keep", 1, None, True), (2, "brand-new", 2, None, True)]


def test_scd2_null_safe_change_detection(spark):
    """NULL -> value and value -> NULL both count as changes; NULL ->
    NULL does not (eqNullSafe, not =)."""
    target = _scd2_target(
        spark, [(1, None, 1, None, True), (2, "x", 1, None, True), (3, None, 1, None, True)]
    )
    source = spark.createDataFrame(
        [(1, "now-set"), (2, None), (3, None)], "id long, v string"
    )
    out = [tuple(r) for r in merge_scd2(target, source, ["id"], 2).collect()]
    assert (1, "now-set", 2, None, True) in out and (1, None, 1, 2, False) in out
    assert (2, None, 2, None, True) in out and (2, "x", 1, 2, False) in out
    assert (3, None, 1, None, True) in out  # NULL == NULL: no-op
    assert len(out) == 5


def test_scd2_schema_contract(spark):
    target = _scd2_target(spark, [])
    bad = spark.createDataFrame([], "id long, other string")
    with pytest.raises(ValueError, match="merge_scd2 requires target columns"):
        merge_scd2(target, bad, ["id"], 2)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(target_rows=_row_lists, source_rows=_row_lists)
def test_scd2_reapplying_same_snapshot_is_idempotent(spark, target_rows, source_rows):
    """PROPERTY: for any initial data and any snapshot, applying the
    snapshot a second time (at a later batch) changes nothing — the
    at-least-once safety of SCD-2 ingestion."""
    tgt = spark.createDataFrame(
        [(r[0], r[1], r[2], 1, None, True) for r in target_rows],
        "id long, a long, b long, valid_from long, valid_to long, is_current boolean",
    )
    src = spark.createDataFrame(source_rows, "id long, a long, b long")
    once = merge_scd2(tgt, src, ["id"], 2)
    twice = merge_scd2(once, src, ["id"], 3)

    def canon(df):
        return sorted(
            (tuple((x is None, x) for x in r) for r in df.collect()),
        )

    assert canon(once) == canon(twice)
