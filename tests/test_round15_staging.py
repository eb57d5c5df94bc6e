"""Unit contracts for the round-15 staged operators (library-level now,
catalog registration next round per the window-math workflow): the
per-train-source decontamination report, and the streaming-index state
maintenance readout."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.operators.corpus import decontamination_report
from storm_dynamic_spout_spark.streaming.state_report import state_table_report


# ---------------------------------------------------------------------------
# decontamination_report
# ---------------------------------------------------------------------------


def _fixture(spark):
    train = spark.createDataFrame(
        [
            (0, "a b c d", "web"),    # grams(2): ab bc cd
            (1, "c d e", "web"),      # grams: cd de
            (2, "a b x", "books"),    # grams: ab bx
            (3, "p q r", "books"),    # grams: pq qr
        ],
        "doc_id long, text string, source string",
    )
    ev = spark.createDataFrame(
        [
            (10, "a b c"),   # grams: ab bc  -> web: both; books: ab
            (11, "d e f"),   # grams: de ef  -> web: de
            (12, "z z z"),   # grams: zz     -> nothing
        ],
        "doc_id long, text string",
    )
    return train, ev


def test_decontamination_report_closed_forms(spark):
    """Hand-checkable 2-gram fixture: 'web' shares {ab, bc, de} hitting
    eval docs 10 and 11 over 3 (doc, gram) slots; 'books' shares {ab}
    hitting doc 10 over 1 slot; a source with no leak emits no row."""
    train, ev = _fixture(spark)
    rows = {
        r["source"]: r
        for r in decontamination_report(train, ev, ngram=2).collect()
    }
    assert set(rows) == {"web", "books"}
    web, books = rows["web"], rows["books"]
    assert web["n_shared_grams"] == 3
    assert web["n_eval_docs_touched"] == 2
    assert web["n_leaked_gram_slots"] == 3
    assert web["leaked_token_budget"] == 6
    assert books["n_shared_grams"] == 1
    assert books["n_eval_docs_touched"] == 1
    assert books["n_leaked_gram_slots"] == 1
    assert books["leaked_token_budget"] == 2


def test_decontamination_report_slots_count_doc_gram_pairs(spark):
    """The same gram leaking into TWO eval docs is two slots (it
    influences two drop decisions) but one shared gram."""
    train = spark.createDataFrame(
        [(0, "a b", "web")], "doc_id long, text string, source string"
    )
    ev = spark.createDataFrame(
        [(10, "a b c"), (11, "x a b")], "doc_id long, text string"
    )
    r = decontamination_report(train, ev, ngram=2).collect()[0]
    assert r["n_shared_grams"] == 1
    assert r["n_eval_docs_touched"] == 2
    assert r["n_leaked_gram_slots"] == 2


def test_decontamination_report_plan_never_crosses_documents(spark):
    train, ev = _fixture(spark)
    plan = (
        decontamination_report(train, ev, ngram=2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_decontamination_report_consistent_with_eval_contamination(spark):
    """Cross-operator consistency: summed over sources, the report's
    touched-doc relation covers exactly the eval docs that
    eval_contamination scores with n_overlapping > 0 (attribution adds
    the source axis, never invents or loses a leak)."""
    from storm_dynamic_spout_spark.operators.corpus import eval_contamination

    train, ev = _fixture(spark)
    flagged_docs = {
        r["doc_id"]
        for r in eval_contamination(train, ev, ngram=2, threshold=0.5).collect()
        if r["n_overlapping"] > 0
    }
    # union of per-source touched docs == docs with any overlap
    touched = (
        decontamination_report(train, ev, ngram=2)
        .agg(F.sum("n_eval_docs_touched"))
        .first()[0]
    )
    assert flagged_docs == {10, 11}
    # web touches {10, 11}, books touches {10}: 3 source-doc pairs
    assert touched == 3


# ---------------------------------------------------------------------------
# state_table_report
# ---------------------------------------------------------------------------


def test_state_table_report_tracks_index_lifecycle(spark):
    """Drive a real StreamingBm25Index and read the report at each
    stage: cold start (0 files), after two batches (delta files, no
    compaction due at a high threshold), threshold breach with a tiny
    threshold, and post-compaction (1 file per table)."""
    from storm_dynamic_spout_spark.engine import load_table
    from storm_dynamic_spout_spark.streaming.bm25_stream import (
        StreamingBm25Index,
    )

    idx = StreamingBm25Index(tempfile.mkdtemp(prefix="state-rep-"))
    tables = {
        "postings": idx.postings_dir,
        "stats": idx.stats_dir,
        "df": idx.df_dir,
    }
    cold = {
        r["table"]: r for r in state_table_report(spark, tables).collect()
    }
    assert set(cold) == {"postings", "stats", "df"}
    assert all(
        r["n_files"] == 0 and r["n_rows"] == 0 and not r["needs_compaction"]
        for r in cold.values()
    )

    d = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    idx.process_batch(d.filter(F.col("doc_id") < 10))
    idx.process_batch(d.filter((F.col("doc_id") >= 10) & (F.col("doc_id") < 20)))

    warm = {
        r["table"]: r for r in state_table_report(spark, tables).collect()
    }
    assert warm["postings"]["n_files"] >= 2
    assert warm["stats"]["n_rows"] == 2  # one delta row per batch
    assert warm["postings"]["n_rows"] == idx.postings_df(spark).count()
    assert not any(r["needs_compaction"] for r in warm.values())

    # the report's threshold mirrors the writers' guard
    tight = {
        r["table"]: r
        for r in state_table_report(spark, tables, compact_threshold=1).collect()
    }
    assert tight["postings"]["needs_compaction"]

    idx.compact_index(spark, target_files=1)
    after = {
        r["table"]: r
        for r in state_table_report(spark, tables, compact_threshold=1).collect()
    }
    assert after["postings"]["n_files"] == 1
    assert after["stats"]["n_rows"] == 1  # collapsed to the sentinel row
    assert not any(r["needs_compaction"] for r in after.values())
    assert after["postings"]["n_rows"] == warm["postings"]["n_rows"]
