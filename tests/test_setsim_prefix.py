"""Exact set-similarity join via prefix filtering (operators/dedup.py
setsim_prefix_pairs) — PPJoin-style: candidates share a rarest-token
prefix entry, verification is exact Jaccard.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from storm_dynamic_spout_spark.engine import load_table
from storm_dynamic_spout_spark.operators.dedup import setsim_prefix_pairs
from storm_dynamic_spout_spark.operators.text import distinct_tokens, token_hash

THRESHOLD = 0.8


def _brute_force(docs, threshold):
    """All-pairs exact Jaccard ≥ threshold — the ground truth the
    prefix filter must reproduce without false negatives."""
    toks = docs.select(
        F.col("doc_id").alias("__id"),
        F.transform(distinct_tokens(F.col("text")), token_hash).alias("__tk"),
    ).withColumn("__n", F.size("__tk"))
    a = toks.select(
        F.col("__id").alias("id_a"), F.col("__tk").alias("ta"), F.col("__n").alias("na")
    )
    b = toks.select(
        F.col("__id").alias("id_b"), F.col("__tk").alias("tb"), F.col("__n").alias("nb")
    )
    inter = F.size(F.array_intersect("ta", "tb")).cast("double")
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("i", inter)
        .withColumn("jaccard", F.col("i") / (F.col("na") + F.col("nb") - F.col("i")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def test_prefix_join_equals_brute_force(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    got = setsim_prefix_pairs(docs, "doc_id", "text", THRESHOLD)
    exp = _brute_force(docs, THRESHOLD)
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0


def test_no_cartesian_in_plan(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    plan = (
        setsim_prefix_pairs(docs, "doc_id", "text", THRESHOLD)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_candidate_set_is_economical(spark, sf_dir):
    """The filter's value: the candidate set the prefix join produces
    must be far below all-pairs (the quadratic blowup the operator
    exists to avoid).  The `documents` fixture can't show this — its
    vocabulary is 31 tokens with median document-frequency ~80%, so
    EVERY filter is powerless there (26% of all pairs are true
    near-dups; the join is output-bound and the correctness tests
    above cover it).  `part.p_name` (5 words drawn from a ~92-word
    vocabulary) is the selective regime the filter targets."""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("doc_id"), F.col("p_name").alias("text")
    )
    n_docs = docs.count()
    toks = docs.select(
        F.col("doc_id").alias("__id"),
        F.transform(distinct_tokens(F.col("text")), token_hash).alias("__toks"),
    ).withColumn("__n", F.size("__toks"))
    ex = toks.select("__id", "__n", F.explode("__toks").alias("__tok"))
    freq = ex.groupBy("__tok").agg(F.count(F.lit(1)).alias("__freq"))
    w = Window.partitionBy("__id").orderBy("__freq", "__tok")
    prefix = (
        ex.join(freq, "__tok")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("__n") - F.ceil(F.lit(THRESHOLD) * F.col("__n") - F.lit(1e-9)) + 1)
        .select("__id", "__tok")
    )
    cands = (
        prefix.alias("a")
        .join(prefix.alias("b"), "__tok")
        .filter(F.col("a.__id") < F.col("b.__id"))
        .select(F.col("a.__id"), F.col("b.__id"))
        .distinct()
        .count()
    )
    all_pairs = n_docs * (n_docs - 1) // 2
    true_pairs = (
        setsim_prefix_pairs(docs, "doc_id", "text", THRESHOLD).count()
    )
    assert true_pairs <= cands, "prefix filter must never lose a true pair"
    assert cands <= 0.15 * all_pairs, (cands, all_pairs)


def test_index_prefix_cuts_candidate_volume(spark, sf_dir):
    """The ppjoin asymmetric index prefix (r10 verdict item 3): the
    smaller set of a candidate pair exposes only its first
    n − ⌈2t/(1+t)·n⌉ + 1 tokens, so the index-vs-probe join must
    generate MATERIALLY fewer candidate rows than the old symmetric
    probe-vs-probe join — at t=0.8 the index prefix is 1/9 of the set
    vs the probe's 1/5, a ≥30%% cut — while the brute-force equality
    tests above pin that no true pair is lost.

    Measured on `documents` (the catalog input): median 25 distinct
    tokens → probe prefix 6 vs index prefix 2.  (`part.p_name` cannot
    show the cut: its docs have 2 distinct tokens, where both prefixes
    collapse to the same single rarest token.)"""
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        F.col("doc_id").alias("__id"),
        F.transform(distinct_tokens(F.col("text")), token_hash).alias("__toks"),
    ).withColumn("__n", F.size("__toks"))
    ex = toks.select("__id", "__n", F.explode("__toks").alias("__tok"))
    freq = ex.groupBy("__tok").agg(F.count(F.lit(1)).alias("__freq"))
    w = Window.partitionBy("__id").orderBy("__freq", "__tok")
    ranked = ex.join(freq, "__tok").withColumn("__rn", F.row_number().over(w))
    probe = ranked.filter(
        F.col("__rn")
        <= F.col("__n") - F.ceil(F.lit(THRESHOLD) * F.col("__n") - F.lit(1e-9)) + 1
    ).select("__id", "__tok", "__n")
    ratio = 2.0 * THRESHOLD / (1.0 + THRESHOLD)
    index = probe.join(
        ranked.filter(
            F.col("__rn")
            <= F.col("__n") - F.ceil(F.lit(ratio) * F.col("__n") - F.lit(1e-9)) + 1
        ).select("__id", "__tok"),
        ["__id", "__tok"],
        "semi",
    )
    size_ok = (F.col("a.__n") >= F.lit(THRESHOLD) * F.col("b.__n")) & (
        F.col("b.__n") >= F.lit(THRESHOLD) * F.col("a.__n")
    )
    symmetric = (
        probe.alias("a")
        .join(probe.alias("b"), "__tok")
        .filter((F.col("a.__id") < F.col("b.__id")) & size_ok)
        .count()
    )
    oriented = (
        index.alias("a")
        .join(probe.alias("b"), "__tok")
        .filter(
            (
                (F.col("a.__n") < F.col("b.__n"))
                | ((F.col("a.__n") == F.col("b.__n")) & (F.col("a.__id") < F.col("b.__id")))
            )
            & (F.col("a.__n") >= F.lit(THRESHOLD) * F.col("b.__n"))
        )
        .count()
    )
    reduction = 1.0 - oriented / symmetric
    print(
        f"setsim candidate volume: symmetric={symmetric} "
        f"index-oriented={oriented} reduction={reduction:.1%}"
    )
    assert reduction >= 0.30, (symmetric, oriented)


def test_non_default_threshold_matches_brute_force(spark, sf_dir):
    """t=0.55 belongs to the threshold family where float ceil(t·n)
    can overshoot the exact rational ceiling (e.g. 0.55·180 →
    99.000…01 → ceil 100, exact 99), which would shorten the prefix
    and drop qualifying pairs — the nudged ceiling must keep the
    operator equal to brute force at ANY threshold, not just 0.8."""
    docs = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("doc_id"), F.col("p_name").alias("text")
    )
    got = setsim_prefix_pairs(docs, "doc_id", "text", 0.55)
    exp = _brute_force(docs, 0.55)
    assert got.count() == exp.count() > 0
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
