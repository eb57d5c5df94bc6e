"""Catalog contract guards (planning-only, no execution): every
registered query must satisfy the driver-compare preconditions —
an oracle exists, column names are unique (the driver sorts columns BY
NAME before hashing; a duplicate name silently corrupts the compare),
names are stable across two plan constructions, and no query leaks
internal ``__``-prefixed working columns."""

from __future__ import annotations

from storm_dynamic_spout_spark.queries import ORACLES, QUERIES

SF = "/root/testdata/sf0.001"


def test_every_query_has_an_oracle():
    assert set(QUERIES) == set(ORACLES)
    assert len(QUERIES) >= 93


def test_no_duplicate_or_internal_columns(spark):
    for name, fn in QUERIES.items():
        cols = fn(spark, SF).columns
        assert len(cols) == len(set(cols)), f"{name}: duplicate column names {cols}"
        leaked = [c for c in cols if c.startswith("__")]
        assert not leaked, f"{name}: internal columns leaked {leaked}"


def test_schemas_stable_across_constructions(spark):
    for name, fn in QUERIES.items():
        s1 = fn(spark, SF).schema
        s2 = fn(spark, SF).schema
        assert s1 == s2, f"{name}: non-deterministic schema"
