"""Round-14 catalog registrations: unit pins for the two queries
registered from the r13 staging queue (stream_bradley_terry,
corpus_eval_contamination).  Engine-vs-oracle values are the driver's
job (both swept green at sf0.01 on registration); these pin the
structural contracts the values rest on."""

from __future__ import annotations

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_bt_stream_iteration_count_pin():
    """The oracle SQL builds from catalog/ranking._BT_STREAM_K without
    importing the streaming module; this is the drift pin promised in
    its docstring."""
    from storm_dynamic_spout_spark.catalog.ranking import _BT_STREAM_K
    from storm_dynamic_spout_spark.streaming.bt_stream import (
        BT_STREAM_ITERATIONS,
    )

    assert _BT_STREAM_K == BT_STREAM_ITERATIONS == 4


def test_stream_bradley_terry_bookkeeping(spark):
    """Every comparison awards exactly one win and touches exactly two
    items, so over the report: sum(n_wins) = C and sum(n_comparisons)
    = 2C; strengths are positive and mean-normalized to ~1."""
    rows = QUERIES["stream_bradley_terry"](spark, SF).collect()
    assert rows
    assert len({r["item"] for r in rows}) == len(rows)
    total_wins = sum(r["n_wins"] for r in rows)
    total_comp = sum(r["n_comparisons"] for r in rows)
    assert total_comp == 2 * total_wins
    assert all(r["strength"] > 0 for r in rows)
    mean = sum(r["strength"] for r in rows) / len(rows)
    # micro-rounding leaves the mean within 1e-6 per item of 1.0
    assert abs(mean - 1.0) < 1e-5


def test_stream_bradley_terry_differs_from_batch_fit(spark):
    """The streaming fit is warm-started with 4 iterations per batch —
    a DIFFERENT (path-dependent) estimate from the batch fit's 12
    cold-start iterations over the same log (SEMANTICS row 24).  Same
    items, same win/comparison counts, different strengths."""
    stream = {
        r["item"]: r
        for r in QUERIES["stream_bradley_terry"](spark, SF).collect()
    }
    batch = {
        r["item"]: r
        for r in QUERIES["rank_bradley_terry"](spark, SF).collect()
    }
    assert set(stream) == set(batch)
    for it in stream:
        assert stream[it]["n_wins"] == batch[it]["n_wins"]
        assert stream[it]["n_comparisons"] == batch[it]["n_comparisons"]
    assert any(
        stream[it]["strength"] != batch[it]["strength"] for it in stream
    )


def test_corpus_eval_contamination_contracts(spark):
    """One row per eval (odd) doc; counts are consistent; the flag is
    exactly the rounded-fraction >= 0.5 comparison; NULL fraction only
    for zero-gram docs and never flagged."""
    import duckdb

    df = QUERIES["corpus_eval_contamination"](spark, SF)
    rows = df.collect()
    n_eval = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet') "
        "WHERE doc_id % 2 = 1"
    ).fetchone()[0]
    assert len(rows) == n_eval
    for r in rows:
        assert r["doc_id"] % 2 == 1
        assert 0 <= r["n_overlapping"] <= r["n_grams"]
        if r["n_grams"] == 0:
            assert r["overlap_frac"] is None and r["flagged"] is False
        else:
            assert r["overlap_frac"] is not None
            assert r["flagged"] == (r["overlap_frac"] >= 0.5)


def test_corpus_eval_contamination_verbatim_leak_flags(spark):
    """A verbatim train copy flags at fraction 1.0 through the CATALOG
    wiring (the operator's closed forms are pinned in
    tests/test_round14_staging.py; this checks the even/odd split
    direction isn't inverted): doc pairs (2k, 2k+1) with identical
    text must flag the odd one."""
    from storm_dynamic_spout_spark.operators.corpus import (
        eval_contamination,
    )

    docs = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e"), (3, "p q r s t")],
        "doc_id long, text string",
    )
    is_eval = F.col("doc_id") % 2 == 1
    rows = {
        r["doc_id"]: r
        for r in eval_contamination(
            docs.filter(~is_eval), docs.filter(is_eval), ngram=3, threshold=0.5
        ).collect()
    }
    assert rows[1]["overlap_frac"] == 1.0 and rows[1]["flagged"] is True
    assert rows[3]["n_overlapping"] == 0 and rows[3]["flagged"] is False


def test_whiten_epsilon_never_bites_on_fixtures(spark):
    """whiten_ppm's denormal-sd floor (sd <= 1e-12*|mu| + 1e-30 -> the
    zero-variance case) must be invisible on every driver-compared
    input, or the DuckDB oracles' plain `sd > 0` guard would diverge:
    pin that the embeddings fixture's per-dimension sd sits far above
    the epsilon at its mu."""
    from storm_dynamic_spout_spark.engine import load_table

    e = load_table(spark, SF, "embeddings")
    cell = e.select(F.posexplode("embedding").alias("pos", "x"))
    rows = cell.groupBy("pos").agg(
        F.avg("x").alias("mu"), F.stddev_pop("x").alias("sd")
    ).collect()
    assert rows
    for r in rows:
        eps = abs(r["mu"]) * 1e-12 + 1e-30
        assert r["sd"] > 1e6 * eps, (r["pos"], r["sd"], eps)


# ---------------------------------------------------------------------------
# bpe_encode_words — the vocab-scale tokenizer-application path (r13
# verdict item 5), staged for an r15 catalog query
# ---------------------------------------------------------------------------

#: Words chosen to separate the THREE candidate semantics: overlapping
#: runs ("aaa" under (a,a): left-to-right non-overlapping gives
#: [aa, a]), and the rank-revisit word "xab" under [(x,ab), (a,b)]:
#: pass semantics yields [x, ab] (merge 0's turn passed before "ab"
#: existed) where the iterative lowest-rank-anywhere encode would give
#: [xab] — bpe_encode_words must match the trainer's fold, not the
#: iterative encode.
_BPE_PIN_WORDS = [
    "aaa", "aaaa", "aaaaa", "xab", "xxabab", "banana", "abcabc",
    "", "a", "ab", "mississippi", "aabbaabb",
]


def _fold_tokens(spark, words, merges):
    from storm_dynamic_spout_spark.operators.text import apply_bpe_merges, chars

    df = spark.createDataFrame([(w,) for w in words], "word string")
    return {
        r["word"]: list(r["t"])
        for r in df.select(
            "word", apply_bpe_merges(chars(F.col("word")), merges).alias("t")
        ).collect()
    }


def _vocab_tokens(spark, words, merges):
    from storm_dynamic_spout_spark.operators.text import bpe_encode_words

    df = spark.createDataFrame([(w,) for w in words], "word string")
    return {
        r["word"]: list(r["bpe_tokens"])
        for r in bpe_encode_words(df, "word", merges).collect()
    }


def test_bpe_encode_words_matches_fold_on_adversarial_words(spark):
    merge_tables = [
        [("a", "a")],
        [("x", "ab"), ("a", "b")],
        [("a", "b"), ("ab", "a"), ("b", "a")],
        [("a", "n"), ("an", "an"), ("b", "an")],
        [("s", "s"), ("i", "ss"), ("p", "p")],
    ]
    for merges in merge_tables:
        want = _fold_tokens(spark, _BPE_PIN_WORDS, merges)
        got = _vocab_tokens(spark, _BPE_PIN_WORDS, merges)
        assert got == want, (merges, got, want)


def test_bpe_encode_words_pass_semantics_not_iterative(spark):
    """The explicit rank-revisit separation: under [(x,ab), (a,b)] the
    word 'xab' must encode to [x, ab] — merge 0's single pass ran
    before 'ab' existed and never re-runs."""
    got = _vocab_tokens(spark, ["xab"], [("x", "ab"), ("a", "b")])
    assert got["xab"] == ["x", "ab"]


def test_bpe_encode_words_cost_independent_of_merge_table_size(spark):
    """The vocab-scale contract: a 50k-entry merge table (of which only
    a handful can ever apply to these words) encodes identically —
    and the heap path never scans the table."""
    big = [("a", "b"), ("c", "d")] + [
        (f"zz{i}", f"qq{i}") for i in range(50_000)
    ]
    words = ["abcd", "aabbccdd", "xab"]
    want = _fold_tokens(spark, words, big[:2])  # only the real merges
    got = _vocab_tokens(spark, words, big)
    assert got == want


def test_bpe_encode_words_plan_is_arrow_not_row_python(spark):
    from storm_dynamic_spout_spark.operators.text import bpe_encode_words

    df = spark.createDataFrame([("abc",)], "word string")
    plan = (
        bpe_encode_words(df, "word", [("a", "b")])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan, "row-at-a-time Python leaked in"
