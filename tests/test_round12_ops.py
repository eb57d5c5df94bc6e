"""Round-12 operator contracts not covered by the driver oracle rows:
a closed-form hand recomputation of the streaming BM25 scorer (micro-
unit sums, statistics-as-of-batch idf) on a 4-document corpus, and the
divide-guard behavior of the A/B closers on degenerate cells."""

from __future__ import annotations

import math
import tempfile

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.streaming.bm25_stream import (
    BM25_STREAM_B,
    BM25_STREAM_K1,
    StreamingBm25Index,
)


def _expected_micro(tf: int, dl: int, df: int, n_docs: int, sum_dl: int) -> int:
    """The per-(query, doc, term) contribution in integer micro-units —
    an independent Python fold of the same Okapi formula."""
    avgdl = sum_dl / n_docs
    idf = math.log(1 + (n_docs - df + 0.5) / (df + 0.5))
    part = (
        idf
        * tf
        * (BM25_STREAM_K1 + 1)
        / (tf + BM25_STREAM_K1 * (1 - BM25_STREAM_B + BM25_STREAM_B * dl / avgdl))
    )
    return round(part * 1_000_000)


def test_stream_bm25_closed_form(spark):
    """Index {d0, d2, d4}, then query with d1 = 'apple cherry':
    N=3, Σdl=9; df(apple)=1, df(cherry)=2.  Every match score must be
    the integer-micro sum of the hand-computed per-term parts."""
    index_batch = spark.createDataFrame(
        [
            (0, "apple banana apple"),
            (2, "banana cherry"),
            (4, "cherry date date cherry"),
        ],
        "doc_id long, text string",
    )
    query_batch = spark.createDataFrame(
        [(1, "apple cherry")], "doc_id long, text string"
    )
    idx = StreamingBm25Index(tempfile.mkdtemp(prefix="bm25-r12-"))
    idx.process_batch(index_batch)
    idx.process_batch(query_batch)
    got = {
        r["doc_id"]: (r["n_terms"], r["score"], r["rank"])
        for r in idx.matches(spark).collect()
    }
    n_docs, sum_dl = 3, 9
    exp_micro = {
        # d0 shares 'apple' (tf=2, dl=3, df=1)
        0: _expected_micro(2, 3, 1, n_docs, sum_dl),
        # d2 shares 'cherry' (tf=1, dl=2, df=2)
        2: _expected_micro(1, 2, 2, n_docs, sum_dl),
        # d4 shares 'cherry' (tf=2, dl=4, df=2)
        4: _expected_micro(2, 4, 2, n_docs, sum_dl),
    }
    assert set(got) == set(exp_micro)
    for doc_id, micro in exp_micro.items():
        n_terms, score, _ = got[doc_id]
        assert n_terms == 1
        assert score == micro / 1_000_000.0, (doc_id, score, micro)
    # rank order: by score desc — d0's rare 'apple' outranks both
    # cherry matches; d2 (shorter doc) outranks d4? the hand fold
    # decides, not this test's guess — assert consistency instead
    ranked = sorted(exp_micro.items(), key=lambda kv: (-kv[1], kv[0]))
    assert [d for d, _ in ranked] == [
        d for d, _ in sorted(got.items(), key=lambda kv: kv[1][2])
    ]


def test_stream_bm25_multi_term_micro_sum(spark):
    """A query sharing BOTH terms with one indexed doc: the pair score
    is the exact integer sum of the two micro parts (order-free)."""
    idx = StreamingBm25Index(tempfile.mkdtemp(prefix="bm25-r12b-"))
    idx.process_batch(
        spark.createDataFrame(
            [(0, "apple cherry apple"), (2, "banana banana")],
            "doc_id long, text string",
        )
    )
    idx.process_batch(
        spark.createDataFrame([(1, "apple cherry")], "doc_id long, text string")
    )
    got = {r["doc_id"]: r for r in idx.matches(spark).collect()}
    n_docs, sum_dl = 2, 5
    micro = _expected_micro(2, 3, 1, n_docs, sum_dl) + _expected_micro(
        1, 3, 1, n_docs, sum_dl
    )
    assert got[0]["n_terms"] == 2
    assert got[0]["score"] == micro / 1_000_000.0
    assert 2 not in got, "no shared token with d2 — must not match"


def test_df_ceiling_prunes_stopwords_only(spark):
    """max_df_frac elides tokens above the df ceiling from the probe:
    with 'the' in 3/3 indexed docs and a 0.5 ceiling, matches must come
    from the discriminative terms only — and a query sharing ONLY the
    stopword must produce no match at all."""
    from storm_dynamic_spout_spark.streaming.bm25_stream import (
        score_against_postings,
    )

    docs = spark.createDataFrame(
        [(0, "the apple"), (2, "the banana"), (4, "the cherry")],
        "doc_id long, text string",
    )
    toks = docs.select(
        F.col("doc_id").alias("__id"), F.split("text", r"\s+").alias("__t")
    ).select(
        "__id",
        F.size("__t").cast("long").alias("__dl"),
        F.explode("__t").alias("__tok"),
    )
    pos = toks.groupBy("__id", "__dl", "__tok").agg(
        F.count(F.lit(1)).cast("long").alias("__tf")
    )
    q = spark.createDataFrame(
        [(1, "the"), (1, "apple"), (3, "the")], "query_id long, __tok string"
    )
    capped = score_against_postings(pos, q, max_df_frac=0.5).collect()
    assert {(r["query_id"], r["doc_id"]) for r in capped} == {(1, 0)}
    # uncapped, the stopword matches everything
    exact = score_against_postings(pos, q).collect()
    assert {(r["query_id"], r["doc_id"]) for r in exact} == {
        (1, 0), (1, 2), (1, 4), (3, 0), (3, 2), (3, 4),
    }


def test_stream_hybrid_rrf_self_consistency(spark):
    """The fused log must satisfy the RRF identity row-by-row
    (rrf_score == sum of 1/(60+rank) over the non-null legs, rounded
    to 1e-6), carry dense 1..k ranks per query, and contain at least
    one single-leg row (full-outer semantics) on the fixture."""
    from storm_dynamic_spout_spark.queries import QUERIES

    rows = QUERIES["stream_hybrid_rrf"](spark, "/root/testdata/sf0.001").collect()
    assert rows
    by_q = {}
    single_leg = 0
    for r in rows:
        expected = 0.0
        if r["rank_lex"] is not None:
            expected += 1.0 / (60 + r["rank_lex"])
        if r["rank_dense"] is not None:
            expected += 1.0 / (60 + r["rank_dense"])
        assert r["rank_lex"] is not None or r["rank_dense"] is not None
        if r["rank_lex"] is None or r["rank_dense"] is None:
            single_leg += 1
        assert abs(r["rrf_score"] - round(expected * 1e6) / 1e6) < 1e-12, r
        by_q.setdefault(r["query_id"], []).append((r["hybrid_rank"], r["rrf_score"]))
    for v in by_q.values():
        v.sort()
        assert [h for h, _ in v] == list(range(1, len(v) + 1))
        scores = [s for _, s in v]
        assert scores == sorted(scores, reverse=True)
    assert single_leg > 0, "fixture should exercise full-outer fusion"


def test_ab_closer_divide_guards(spark):
    """ADVICE r11: on a degenerate corpus (single-row cells) the
    bootstrap/DiD/power readouts must return NULL, not Inf/NaN, in the
    variance-bearing columns — identically to their oracles."""
    import pandas as pd

    from storm_dynamic_spout_spark.queries import QUERIES

    events = spark.createDataFrame(
        pd.DataFrame(
            {
                "event_id": [0, 1],
                "user_id": [0, 1],  # one row per arm
                "event_type": ["a", "a"],
                "value": [1.0, 2.0],
                "ts": pd.to_datetime(["2024-01-01", "2024-01-02"]),
            }
        )
    )
    with tempfile.TemporaryDirectory(prefix="abguard-") as tmp:
        events.write.parquet(f"{tmp}/events.parquet")
        did = QUERIES["events_diff_in_diff"](spark, tmp).first()
        # one event per (arm, period) cell is impossible with 2 rows —
        # at least one cell is empty/singleton, so the CI must be NULL
        assert did["ci_lo"] is None and did["ci_hi"] is None
        power = QUERIES["events_power_mde"](spark, tmp).first()
        assert power["mde_abs"] is None and power["mde_rel"] is None
        # the guarded columns stay NULL, never NaN/Inf
        for v in (did["did"], power["mean_c"]):
            if v is not None:
                assert math.isfinite(v)
