"""Hypothesis properties for the round-12 operators: the streaming
BM25 scorer must agree bit-for-bit with a plain-Python Okapi fold on
arbitrary corpora (integer micro-units make the comparison exact), the
df-ceiling at 1.0 must be a no-op, id translation must commute with
scoring, and the setsim prefix join must stay equal to brute force on
random token sets after the round-12 reshape."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from storm_dynamic_spout_spark.streaming.bm25_stream import (
    BM25_STREAM_B,
    BM25_STREAM_K1,
    score_against_postings,
)

_EXAMPLES = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: Tiny-alphabet corpora: 1-6 docs of 1-8 tokens over 6 symbols —
#: small enough to brute-force in Python, adversarial enough to hit
#: shared/rare/stopword tokens and duplicate tf>1 runs.
_corpus = st.lists(
    st.lists(st.sampled_from("abcdef"), min_size=1, max_size=8).map(
        lambda ts: " ".join(ts)
    ),
    min_size=1,
    max_size=6,
)
_queries = st.lists(
    st.lists(st.sampled_from("abcdef"), min_size=1, max_size=6).map(
        lambda ts: " ".join(ts)
    ),
    min_size=1,
    max_size=3,
)


def _postings_df(spark, texts):
    docs = spark.createDataFrame(
        [(i * 2, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    toks = docs.select(
        F.col("doc_id").alias("__id"), F.split("text", r"\s+").alias("__t")
    ).select(
        "__id",
        F.size("__t").cast("long").alias("__dl"),
        F.explode("__t").alias("__tok"),
    )
    return toks.groupBy("__id", "__dl", "__tok").agg(
        F.count(F.lit(1)).cast("long").alias("__tf")
    )


def _qterms_df(spark, texts):
    rows = [
        (i * 2 + 1, tok)
        for i, t in enumerate(texts)
        for tok in sorted(set(t.split()))
    ]
    return spark.createDataFrame(rows, "query_id long, __tok string")


def _python_bm25(index_texts, query_texts, k=5):
    """Plain-Python Okapi fold with the SAME micro-unit convention."""
    docs = {i * 2: t.split() for i, t in enumerate(index_texts)}
    n_docs = len(docs)
    sum_dl = sum(len(ts) for ts in docs.values())
    avgdl = sum_dl / n_docs
    df = {}
    for ts in docs.values():
        for tok in set(ts):
            df[tok] = df.get(tok, 0) + 1
    out = {}
    for qi, qt in enumerate(query_texts):
        qid = qi * 2 + 1
        scores = {}
        for tok in sorted(set(qt.split())):
            if tok not in df:
                continue
            idf = math.log(1 + (n_docs - df[tok] + 0.5) / (df[tok] + 0.5))
            for did, ts in docs.items():
                tf = ts.count(tok)
                if not tf:
                    continue
                part = (
                    idf
                    * tf
                    * (BM25_STREAM_K1 + 1)
                    / (
                        tf
                        + BM25_STREAM_K1
                        * (1 - BM25_STREAM_B + BM25_STREAM_B * len(ts) / avgdl)
                    )
                )
                ms, nt = scores.get(did, (0, 0))
                scores[did] = (ms + round(part * 1_000_000), nt + 1)
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:k]
        out[qid] = {
            did: (ms, nt, rank + 1)
            for rank, (did, (ms, nt)) in enumerate(ranked)
        }
    return out


@_EXAMPLES
@given(index_texts=_corpus, query_texts=_queries)
def test_stream_bm25_matches_python_reference(spark, index_texts, query_texts):
    got = score_against_postings(
        _postings_df(spark, index_texts), _qterms_df(spark, query_texts)
    ).collect()
    exp = _python_bm25(index_texts, query_texts)
    got_map = {
        (r["query_id"], r["doc_id"]): (
            round(r["score"] * 1_000_000),
            r["n_terms"],
            r["rank"],
        )
        for r in got
    }
    exp_map = {
        (qid, did): (ms, nt, rank)
        for qid, docs in exp.items()
        for did, (ms, nt, rank) in docs.items()
    }
    assert got_map == exp_map


@_EXAMPLES
@given(index_texts=_corpus, query_texts=_queries)
def test_df_ceiling_one_is_identity(spark, index_texts, query_texts):
    pos = _postings_df(spark, index_texts)
    q = _qterms_df(spark, query_texts)
    exact = {
        tuple(r) for r in score_against_postings(pos, q).collect()
    }
    capped = {
        tuple(r)
        for r in score_against_postings(pos, q, max_df_frac=1.0).collect()
    }
    assert exact == capped


@_EXAMPLES
@given(index_texts=_corpus, query_texts=_queries, shift=st.integers(1, 1000))
def test_scoring_commutes_with_id_translation(
    spark, index_texts, query_texts, shift
):
    """Shifting every doc/query id by 2*shift (parity-preserving) must
    shift the match log's ids and change NOTHING else — scores and
    ranks are functions of content, never of id values (ids only break
    ties, and translation preserves their order)."""
    pos = _postings_df(spark, index_texts)
    q = _qterms_df(spark, query_texts)
    base = {
        (r["query_id"], r["doc_id"], round(r["score"] * 1e6), r["rank"])
        for r in score_against_postings(pos, q).collect()
    }
    pos2 = pos.withColumn("__id", F.col("__id") + 2 * shift)
    q2 = q.withColumn("query_id", F.col("query_id") + 2 * shift)
    shifted = {
        (
            r["query_id"] - 2 * shift,
            r["doc_id"] - 2 * shift,
            round(r["score"] * 1e6),
            r["rank"],
        )
        for r in score_against_postings(pos2, q2).collect()
    }
    assert base == shifted


_token_sets = st.lists(
    st.lists(st.sampled_from("abcdefgh"), min_size=1, max_size=6, unique=True),
    min_size=2,
    max_size=7,
)


@_EXAMPLES
@given(token_sets=_token_sets, threshold=st.sampled_from([0.5, 0.6, 0.8]))
def test_setsim_reshape_equals_brute_force(spark, token_sets, threshold):
    """Round-12 regression net for the checkpointed-sorted-array
    reshape: exact Jaccard pairs on random small token sets must equal
    the all-pairs ground truth at several thresholds."""
    from storm_dynamic_spout_spark.operators.dedup import setsim_prefix_pairs

    docs = spark.createDataFrame(
        [(i, " ".join(ts)) for i, ts in enumerate(token_sets)],
        "doc_id long, text string",
    )
    got = {
        (r["id_a"], r["id_b"], round(r["jaccard"], 9))
        for r in setsim_prefix_pairs(docs, "doc_id", "text", threshold).collect()
    }
    exp = set()
    for i, a in enumerate(token_sets):
        for j in range(i + 1, len(token_sets)):
            b = token_sets[j]
            inter = len(set(a) & set(b))
            jac = inter / (len(set(a)) + len(set(b)) - inter)
            if jac >= threshold:
                exp.add((i, j, round(jac, 9)))
    assert got == exp
