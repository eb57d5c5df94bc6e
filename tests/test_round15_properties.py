"""Round-15 Hypothesis property: the state-table maintenance report
(streaming/state_report.py) under a RANDOMIZED writer schedule (r14
verdict item 7 — the report reads dirs other writers mutate, so it gets
the same property discipline as the BM25 sidecars and the
Bradley-Terry state before registering).  After EVERY step of an
arbitrary append/collapse/compact/wipe interleaving over a live
StreamingBm25Index, the report must agree with an independent
derivation of the same facts: file counts from a fresh os.walk, row
counts from the index's own readers, and the breach flag from the
threshold arithmetic — so a future edit to any writer (or to the
report) can't silently drift the maintenance signal."""

from __future__ import annotations

import os
import shutil
import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from storm_dynamic_spout_spark.engine import load_table
from storm_dynamic_spout_spark.streaming.bm25_stream import StreamingBm25Index
from storm_dynamic_spout_spark.streaming.state_report import state_table_report

SF = "/root/testdata/sf0.001"

#: One schedule step.  "batch k" appends the doc slice doc_id % 4 == k
#: (the auto-collapse writer fires organically — the index is built
#: with a 1-2 file sidecar threshold); "compact" is the maintenance
#: rebuild the report exists to schedule; "wipe_stats" simulates a
#: pre-sidecar-layout resume, the state the report must read as cold
#: rather than error on.
_STEP = st.one_of(
    st.tuples(st.just("batch"), st.integers(min_value=0, max_value=3)),
    st.tuples(st.just("compact"), st.just(0)),
    st.tuples(st.just("wipe_stats"), st.just(0)),
)


def _parquet_count(d: str) -> int:
    return sum(
        1
        for root, _, files in os.walk(d)
        for f in files
        if f.endswith(".parquet")
    )


def _assert_report_matches_ground_truth(spark, idx, threshold):
    tables = {
        "postings": idx.postings_dir,
        "stats": idx.stats_dir,
        "df": idx.df_dir,
    }
    rows = {
        r["table"]: r
        for r in state_table_report(
            spark, tables, compact_threshold=threshold
        ).collect()
    }
    assert set(rows) == set(tables)
    for name, d in tables.items():
        r = rows[name]
        n_files = _parquet_count(d)
        assert r["n_files"] == n_files, (name, r["n_files"], n_files)
        assert r["needs_compaction"] == (n_files > threshold)
    # row counts against two independent readers: the index's own
    # postings reader (knows the layout; postings carry no deltas so
    # raw == folded), and DuckDB over the same dirs for the RAW row
    # counts the report states (the df/stats dirs hold per-batch DELTA
    # rows until a collapse/compact folds them — the report counts the
    # raw bloat, which is exactly the maintenance signal)
    import duckdb

    pos = idx.postings_df(spark)
    assert rows["postings"]["n_rows"] == (0 if pos is None else pos.count())
    con = duckdb.connect()
    for name, d in tables.items():
        if rows[name]["n_files"] == 0:
            assert rows[name]["n_rows"] == 0
            continue
        raw = con.execute(
            f"SELECT count(*) FROM read_parquet('{d}/**/*.parquet')"
        ).fetchone()[0]
        assert rows[name]["n_rows"] == raw, (name, rows[name]["n_rows"], raw)
    # the folded view never exceeds the raw delta rows
    if rows["df"]["n_files"] > 0:
        assert idx.sidecar_df(spark).count() <= rows["df"]["n_rows"]
    return rows


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    steps=st.lists(_STEP, min_size=2, max_size=5),
    threshold=st.integers(min_value=1, max_value=3),
)
def test_state_report_matches_ground_truth_under_any_schedule(
    spark, steps, threshold
):
    docs = load_table(spark, SF, "documents").select("doc_id", "text").filter(
        F.col("doc_id") < 32
    )
    workdir = tempfile.mkdtemp(prefix="srep-prop-")
    idx = StreamingBm25Index(workdir, sidecar_compact_files=2)
    try:
        _assert_report_matches_ground_truth(spark, idx, threshold)  # cold
        for op, k in steps:
            if op == "batch":
                idx.process_batch(docs.filter(F.col("doc_id") % 4 == k))
            elif op == "compact":
                before = _assert_report_matches_ground_truth(
                    spark, idx, threshold
                )
                idx.compact_index(spark, target_files=1)
                after = _assert_report_matches_ground_truth(
                    spark, idx, threshold
                )
                # compaction preserves postings rows while folding the
                # delta files down — the exact trade the report's
                # breach flag exists to schedule
                assert (
                    after["postings"]["n_rows"]
                    == before["postings"]["n_rows"]
                )
                if before["postings"]["n_files"] > 0:
                    assert after["postings"]["n_files"] == 1
                # post-compaction the deltas are fully folded: raw
                # rows == the folded per-token view
                if after["df"]["n_files"] > 0:
                    assert (
                        after["df"]["n_rows"]
                        == idx.sidecar_df(spark).count()
                    )
            elif op == "wipe_stats":
                shutil.rmtree(idx.stats_dir)
                os.makedirs(idx.stats_dir)
            _assert_report_matches_ground_truth(spark, idx, threshold)
    finally:
        shutil.rmtree(workdir, ignore_errors=True)
