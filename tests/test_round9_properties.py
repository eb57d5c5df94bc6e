"""Hypothesis properties for the round-9 sketch work: the KMV
per-partition pre-trim must be output-identical to the pure-relational
path, and the relational Misra-Gries truncation must agree with the
dict fold on arbitrary counter multisets."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EXAMPLES = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@_EXAMPLES
@given(
    vals=st.lists(st.integers(min_value=-50, max_value=50), min_size=0, max_size=120),
    k=st.integers(min_value=1, max_value=12),
)
def test_kmv_pre_trim_is_output_identical(spark, vals, k):
    """pre_trim keeps each partition's k smallest DISTINCT hashes, so
    the global k minima all survive: both plans must return the same
    sketch rows on any input multiset, at any k, across partitions."""
    from storm_dynamic_spout_spark.operators.sketch import kmv_sketch

    df = spark.createDataFrame(
        [(v,) for v in vals] or [(None,)], "x long"
    ).repartition(4)
    if not vals:
        df = df.filter("x is not null")
    plain = [r["h"] for r in kmv_sketch(df, "x", k).collect()]
    trimmed = [r["h"] for r in kmv_sketch(df, "x", k, pre_trim=True).collect()]
    assert plain == trimmed
    assert len(trimmed) <= k
    assert trimmed == sorted(trimmed)


@_EXAMPLES
@given(
    counters=st.dictionaries(
        st.integers(min_value=0, max_value=30),
        st.integers(min_value=1, max_value=1000),
        max_size=20,
    ),
    k=st.integers(min_value=1, max_value=8),
)
def test_mg_truncate_property(spark, counters, k):
    """mg_truncate == merge_summaries({}, counters, k) on arbitrary
    counter maps — the relational fold never drops a survivor, never
    keeps more than k, and subtracts exactly the (k+1)-st largest."""
    from storm_dynamic_spout_spark.operators.sketch import (
        merge_summaries,
        mg_truncate,
    )

    want = merge_summaries({}, counters, k)
    df = spark.createDataFrame(
        [(key, c) for key, c in counters.items()] or [],
        "user_id long, est long",
    )
    got = {r["user_id"]: r["est"] for r in mg_truncate(df, "user_id", k).collect()}
    assert got == want
