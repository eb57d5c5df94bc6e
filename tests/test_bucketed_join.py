"""Plan guard for the bucketed co-located join: the POINT of
table_bucketed_join is exchange elimination — the sort-merge join must
consume the two bucketed scans directly, with no shuffle on either
side.  The value correctness is the driver oracle's job; this test
pins the physical plan property that makes bucketing worth its write
cost at 100 TB."""

from __future__ import annotations


def test_bucketed_join_eliminates_join_exchanges(spark):
    from storm_dynamic_spout_spark.catalog.sources_io import table_bucketed_join

    df = table_bucketed_join(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan, plan[:500]
    # scans must actually be bucketed reads
    assert "Bucketed: true" in plan, plan[:500]
    # only the post-join aggregate + final sort may exchange: the join
    # itself runs bucket-to-bucket (4 exchanges = unbucketed baseline)
    n_ex = plan.count("Exchange") - plan.count("ReusedExchange")
    assert n_ex <= 2, f"join-side shuffles survived bucketing: {n_ex}\n{plan[:800]}"
    # both sides sorted within buckets: no extra Sort below the join
    # beyond the bucket sort-order recovery
    assert df.count() > 0
