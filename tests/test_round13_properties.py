"""Hypothesis properties for the round-13 operators: the Bradley-Terry
MM fit must agree bit-for-bit with a plain-Python fold on arbitrary
comparison logs (integer micro-units make the comparison exact) and be
invariant to log row order; Cohen's kappa must match its closed form on
arbitrary two-rater label logs; BPE application must equal the greedy
Python reference for random words under random merge tables; and the
eval-contamination fractions must equal a brute-force Python set
computation."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_EXAMPLES = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_MICRO = 1_000_000


def _half_up(x: float) -> int:
    return math.floor(x + 0.5)


# ---------------------------------------------------------------------------
# Bradley-Terry
# ---------------------------------------------------------------------------

#: Comparison logs over a 2-5 item universe, 1-20 rows; winner/loser
#: distinct by construction.
_log = st.lists(
    st.tuples(st.integers(1, 5), st.integers(1, 5)).filter(
        lambda wl: wl[0] != wl[1]
    ),
    min_size=1,
    max_size=20,
)


def _py_bt(rows, iterations):
    cum: dict = {}
    for w, loser in rows:
        a, b = min(w, loser), max(w, loser)
        wa, wb = cum.get((a, b), (0, 0))
        if w == a:
            wa += 1
        else:
            wb += 1
        cum[(a, b)] = (wa, wb)
    items = sorted({i for ab in cum for i in ab})
    wins = {i: 0 for i in items}
    ncomp = {i: 0 for i in items}
    for (a, b), (wa, wb) in cum.items():
        wins[a] += wa
        wins[b] += wb
        ncomp[a] += wa + wb
        ncomp[b] += wa + wb
    p = {i: _MICRO for i in items}
    for _ in range(iterations):
        den = {i: 0 for i in items}
        for (a, b), (wa, wb) in cum.items():
            n = wa + wb
            c = _half_up(n * _MICRO / ((p[a] + p[b]) / float(_MICRO)))
            den[a] += c
            den[b] += c
        nxt = {}
        for i in items:
            whole, rem = divmod(wins[i] * _MICRO, den[i])
            nxt[i] = max(whole * _MICRO + _half_up(rem / den[i] * _MICRO), 1)
        p = nxt
    mean = sum(float(v) for v in p.values()) / len(items)
    return {
        i: (_half_up(p[i] / mean * _MICRO) / _MICRO, wins[i], ncomp[i])
        for i in items
    }


@_EXAMPLES
@given(rows=_log)
def test_bradley_terry_matches_python_on_arbitrary_logs(spark, rows):
    from storm_dynamic_spout_spark.operators.ranking import (
        bradley_terry_strengths,
        pairwise_win_counts,
    )

    df = spark.createDataFrame(rows, "winner long, loser long")
    got = {
        r["item"]: (r["strength"], r["n_wins"], r["n_comparisons"])
        for r in bradley_terry_strengths(
            pairwise_win_counts(df, "winner", "loser"), iterations=4
        ).collect()
    }
    assert got == _py_bt(rows, 4)


@_EXAMPLES
@given(rows=_log, seed=st.integers(0, 2**32 - 1))
def test_bradley_terry_invariant_to_log_row_order(spark, rows, seed):
    """The fit is a function of the pair-table sufficient statistic:
    permuting the comparison log must not change one output bit."""
    import random

    from storm_dynamic_spout_spark.operators.ranking import (
        bradley_terry_strengths,
        pairwise_win_counts,
    )

    shuffled = rows[:]
    random.Random(seed).shuffle(shuffled)

    def fit(rws):
        df = spark.createDataFrame(rws, "winner long, loser long")
        return sorted(
            tuple(r)
            for r in bradley_terry_strengths(
                pairwise_win_counts(df, "winner", "loser"), iterations=3
            ).collect()
        )

    assert fit(rows) == fit(shuffled)


# ---------------------------------------------------------------------------
# Cohen's kappa
# ---------------------------------------------------------------------------

#: Two label vectors over the same 1-12 items, 2-3 label alphabet.
_labels = st.integers(2, 3).flatmap(
    lambda k: st.tuples(
        st.lists(st.sampled_from("xyz"[:k]), min_size=1, max_size=12),
        st.lists(st.sampled_from("xyz"[:k]), min_size=1, max_size=12),
    )
)


@_EXAMPLES
@given(pair=_labels)
def test_cohen_kappa_matches_closed_form(spark, pair):
    from storm_dynamic_spout_spark.operators.ranking import cohen_kappa

    la, lb = pair
    n = min(len(la), len(lb))
    la, lb = la[:n], lb[:n]
    rows = [(i, "a", la[i]) for i in range(n)] + [
        (i, "b", lb[i]) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "item long, rater string, label string")
    got = cohen_kappa(df, "item", "rater", "label", "a", "b").first()

    po = sum(x == y for x, y in zip(la, lb)) / n
    labels = set(la) | set(lb)
    pe = sum(la.count(l) * lb.count(l) for l in labels) / (n * n)
    assert got["n_items"] == n
    assert got["po"] == round(po, 6)
    assert got["pe"] == round(pe, 6)
    if pe < 1.0:
        assert got["kappa"] == round((po - pe) / (1.0 - pe), 6)
    else:
        assert got["kappa"] is None


# ---------------------------------------------------------------------------
# BPE application
# ---------------------------------------------------------------------------

_words = st.lists(
    st.lists(st.sampled_from("ab"), min_size=1, max_size=7).map("".join),
    min_size=1,
    max_size=5,
)
_merges = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "aa", "ab", "ba", "bb"]),
        st.sampled_from(["a", "b", "aa", "ab", "ba", "bb"]),
    ),
    min_size=1,
    max_size=4,
)


def _py_greedy(word, merges):
    syms = list(word)
    for a, b in merges:
        out = [syms[0]] if syms else []
        for x in syms[1:]:
            if out and out[-1] == a and x == b:
                out[-1] = a + b
            else:
                out.append(x)
        syms = out
    return syms


@_EXAMPLES
@given(words=_words, merges=_merges)
def test_bpe_apply_matches_python_greedy_on_random_tables(spark, words, merges):
    """The 2-symbol alphabet maximizes overlapping runs ('aaaa'), where
    greedy-left-to-right and simultaneous-replacement variants diverge
    — the exact regime the convention pins."""
    from storm_dynamic_spout_spark.operators.text import apply_bpe_merges, chars

    df = spark.createDataFrame([(w,) for w in set(words)], "word string")
    got = {
        r["word"]: list(r["toks"])
        for r in df.select(
            "word", apply_bpe_merges(chars(F.col("word")), merges).alias("toks")
        ).collect()
    }
    assert got == {w: _py_greedy(w, merges) for w in set(words)}


# ---------------------------------------------------------------------------
# eval_contamination
# ---------------------------------------------------------------------------

_doc = st.lists(st.sampled_from("abcd"), min_size=1, max_size=6).map(" ".join)


@_EXAMPLES
@given(
    train=st.lists(_doc, min_size=1, max_size=4),
    ev=st.lists(_doc, min_size=1, max_size=4),
)
def test_eval_contamination_matches_python_sets(spark, train, ev):
    from storm_dynamic_spout_spark.operators.corpus import eval_contamination

    n = 2
    tdf = spark.createDataFrame(
        list(enumerate(train)), "doc_id long, text string"
    )
    edf = spark.createDataFrame(
        [(100 + i, t) for i, t in enumerate(ev)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["n_overlapping"], r["overlap_frac"])
        for r in eval_contamination(tdf, edf, ngram=n, threshold=0.5).collect()
    }

    def grams(text):
        ts = text.split()
        return {" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)}

    tv = set().union(*(grams(t) for t in train))
    for i, t in enumerate(ev):
        g = grams(t)
        want_frac = (
            None
            if not g
            else _half_up(len(g & tv) / len(g) * _MICRO) / _MICRO
        )
        assert got[100 + i] == (len(g), len(g & tv), want_frac)


# ---------------------------------------------------------------------------
# BM25 probe: injected sidecar statistics == derived statistics
# ---------------------------------------------------------------------------

_bm_corpus = st.lists(
    st.lists(st.sampled_from("abcdef"), min_size=1, max_size=8).map(" ".join),
    min_size=1,
    max_size=5,
)
_bm_queries = st.lists(
    st.lists(st.sampled_from("abcdef"), min_size=1, max_size=6).map(" ".join),
    min_size=1,
    max_size=3,
)


@_EXAMPLES
@given(texts=_bm_corpus, qtexts=_bm_queries)
def test_bm25_injected_stats_path_matches_derived(spark, texts, qtexts):
    """The round-13 scale fix changed the probe's join order and made
    statistics injectable; on ANY corpus the injected path (broadcast
    query first, sidecar-style stats) must reproduce the derived path
    row for row — micro-unit scores make the comparison exact."""
    from storm_dynamic_spout_spark.streaming.bm25_stream import (
        score_against_postings,
    )

    docs = spark.createDataFrame(
        [(i * 2, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    pos = (
        docs.select(
            F.col("doc_id").alias("__id"), F.split("text", r"\s+").alias("__t")
        )
        .select(
            "__id",
            F.size("__t").cast("long").alias("__dl"),
            F.explode("__t").alias("__tok"),
        )
        .groupBy("__id", "__dl", "__tok")
        .agg(F.count(F.lit(1)).cast("long").alias("__tf"))
    )
    q = (
        spark.createDataFrame(
            [(1000 + i, t) for i, t in enumerate(qtexts)],
            "query_id long, text string",
        )
        .select("query_id", F.explode(F.split("text", r"\s+")).alias("__tok"))
        .distinct()
    )
    stats = (
        pos.select("__id", "__dl")
        .distinct()
        .agg(
            F.count(F.lit(1)).cast("long").alias("__n_docs"),
            F.sum("__dl").cast("long").alias("__sum_dl"),
        )
    )
    dfx = pos.groupBy("__tok").agg(
        F.count(F.lit(1)).cast("long").alias("__df")
    )
    derived = sorted(
        tuple(r) for r in score_against_postings(pos, q).collect()
    )
    injected = sorted(
        tuple(r)
        for r in score_against_postings(
            pos, q, stats=stats, dfx=dfx, broadcast_query=True
        ).collect()
    )
    assert derived == injected
