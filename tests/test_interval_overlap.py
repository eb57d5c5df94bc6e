"""interval_overlap_binned: brute-force equivalence, pair uniqueness,
and the plan guard (equi-join on bins, never a nested loop)."""

from __future__ import annotations

import itertools

from hypothesis import given, settings
from hypothesis import strategies as st

from storm_dynamic_spout_spark.operators.rangejoin import interval_overlap_binned

_iv = st.tuples(
    st.integers(min_value=-50, max_value=200),
    st.integers(min_value=0, max_value=40),
)


@settings(max_examples=12, deadline=None)
@given(
    st.lists(_iv, min_size=1, max_size=12),
    st.lists(_iv, min_size=1, max_size=12),
    st.sampled_from([3.0, 10.0, 37.0]),
)
def test_matches_bruteforce_and_emits_each_pair_once(spark, a_ivs, b_ivs, w):
    a = spark.createDataFrame(
        [(i, lo, lo + ln) for i, (lo, ln) in enumerate(a_ivs)],
        "a_id long, a_lo long, a_hi long",
    )
    b = spark.createDataFrame(
        [(i, lo, lo + ln) for i, (lo, ln) in enumerate(b_ivs)],
        "b_id long, b_lo long, b_hi long",
    )
    got = sorted(
        (r.a_id, r.b_id)
        for r in interval_overlap_binned(
            a, b, "a_lo", "a_hi", "b_lo", "b_hi", bin_width=w
        ).collect()
    )
    expect = sorted(
        (i, j)
        for (i, (alo, aln)), (j, (blo, bln)) in itertools.product(
            enumerate(a_ivs), enumerate(b_ivs)
        )
        if alo <= blo + bln and blo <= alo + aln
    )
    assert got == expect  # equality also proves no duplicate emissions


def test_plan_is_equi_join_not_nested_loop(spark, sf_dir):
    from storm_dynamic_spout_spark.queries import QUERIES

    plan = (
        QUERIES["join_interval_overlap"](spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
