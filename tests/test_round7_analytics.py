"""Known-answer invariants for the round-7 analytics operators
(changepoint, ABC classes, cohort LTV, weighted median, triangles) —
tiny synthetic inputs with hand-computable answers, complementing the
fixture-scale oracle rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from storm_dynamic_spout_spark.engine import load_table


def test_changepoint_finds_known_mean_shift(spark, tmp_path):
    """A flat-then-jump series must put the changepoint at the jump —
    driven through the REAL catalog query against a synthetic events
    parquet, so a regression in events_changepoint itself fails here."""
    import datetime

    from storm_dynamic_spout_spark.catalog.analytics import events_changepoint

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (i, base + datetime.timedelta(seconds=i), 1, "syn", 10.0 if i < 40 else 50.0)
        for i in range(60)
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp_ntz, user_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.event_type: r for r in events_changepoint(spark, str(tmp_path)).collect()}
    assert out["syn"].n_events == 60
    # the last pre-jump index maximizes |S_k·n − k·S_n|
    assert out["syn"].change_k == 40


def test_abc_classes_partition_and_order(spark, sf_dir):
    from storm_dynamic_spout_spark.catalog.analytics import parts_abc_pareto

    out = {r.abc_class: r for r in parts_abc_pareto(spark, sf_dir).collect()}
    assert set(out) <= {"A", "B", "C"} and "A" in out
    li = load_table(spark, sf_dir, "lineitem")
    n_parts = li.select("l_partkey").distinct().count()
    assert sum(r.n_parts for r in out.values()) == n_parts
    total = sum(r.revenue_cents for r in out.values())
    # A covers at most 80% of revenue (the cut is cum<=80%); A parts
    # are fewer than their revenue share implies (Pareto concentration)
    assert out["A"].revenue_cents <= 0.8 * total + 1
    assert out["A"].n_parts / n_parts < out["A"].revenue_cents / total


def test_cohort_ltv_cumulative_consistency(spark, sf_dir):
    from storm_dynamic_spout_spark.catalog.analytics import orders_cohort_ltv

    rows = orders_cohort_ltv(spark, sf_dir).collect()
    by_cohort: dict[int, list] = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_ym, []).append(r)
    assert by_cohort
    for cohort, rs in by_cohort.items():
        rs.sort(key=lambda r: r.month_offset)
        # offset 0 always exists (the acquisition month itself)
        assert rs[0].month_offset == 0
        run = 0
        for r in rs:
            run += r.revenue_cents
            assert r.cum_revenue_cents == run
            assert r.active_customers <= r.cohort_size


def test_weighted_median_tiny_known_answer(spark, tmp_path):
    """values 1..4 with weights 1,1,1,7: total 10, half 5 → the
    cumulative reaches 5 only at value 4 (1+1+1=3 < 5); p90 also 4 —
    through the REAL catalog query against a synthetic lineitem."""
    from storm_dynamic_spout_spark.catalog.aggregates import agg_weighted_median

    spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 1.0), ("g", 4.0, 7.0)],
        "l_returnflag string, l_extendedprice double, l_quantity double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    row = agg_weighted_median(spark, str(tmp_path)).first()
    assert row.total_weight == 10
    assert row.wmedian_cents == 400 and row.wp90_cents == 400


def test_triangle_count_known_graph(spark):
    """K4 minus one edge has exactly 2 triangles."""
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4)], "a long, b long"
    )
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    n = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
        .count()
    )
    assert n == 2
