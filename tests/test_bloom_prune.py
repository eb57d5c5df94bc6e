"""Explicit bloom-prune join operator (operators/bloom.py).

Complements tests/test_plan_guards.py::test_runtime_bloom_filter_
prunes_shuffle_join (Catalyst's OWN injected runtime filter): this
operator is the explicit, always-available form for where the
optimizer's heuristics decline to inject one.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from storm_dynamic_spout_spark.engine import load_table
from storm_dynamic_spout_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_prune_join,
)


def _semi(big, small, bk, sk):
    return big.join(small.select(sk).distinct(), big[bk] == F.col(sk), "left_semi")


def test_bloom_prune_join_matches_plain_semi_join(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    small = load_table(spark, sf_dir, "part").where("p_size = 1")
    got = bloom_prune_join(li, small, "l_partkey", "p_partkey")
    exp = _semi(li, small, "l_partkey", "p_partkey")
    assert got.count() == exp.count()
    assert got.columns == li.columns  # no helper columns leak
    # exact same key multiset, not just cardinality
    g = got.groupBy("l_partkey").count()
    e = exp.groupBy("l_partkey").count()
    assert g.exceptAll(e).count() == 0 and e.exceptAll(g).count() == 0


def test_bloom_prune_join_empty_build_side(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    none = load_table(spark, sf_dir, "part").where("p_size = -1")
    assert bloom_prune_join(li, none, "l_partkey", "p_partkey").count() == 0


def test_bloom_membership_no_false_negatives(spark):
    """Every inserted key must test positive — bloom guarantees no
    false negatives; the tiny m amplifies false positives instead
    (eliminated by the exact join, see the prune test)."""
    keys = spark.range(0, 500).select(F.col("id").alias("k"))
    bloom = bloom_build(keys, "k", m_bits=1 << 10, k_hashes=3).scalar()
    hits = keys.where(bloom_might_contain(bloom, F.col("k"), 1 << 10, 3))
    assert hits.count() == 500


def test_bloom_prune_sits_below_probe_exchange(spark, sf_dir):
    """The 100 TB contract: in the forced-SMJ regime the membership
    test is a Filter on the probe scan BELOW the hashpartitioning
    exchange — only bloom survivors pay the shuffle."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        li = load_table(spark, sf_dir, "lineitem")
        small = load_table(spark, sf_dir, "part").where("p_size = 1")
        out = bloom_prune_join(li, small, "l_partkey", "p_partkey")
        lines = out._jdf.queryExecution().executedPlan().toString().splitlines()
        smj = next(i for i, l in enumerate(lines) if "SortMergeJoin" in l)
        exch = next(
            i for i, l in enumerate(lines) if "hashpartitioning(l_partkey" in l
        )
        bloom_test = next(i for i, l in enumerate(lines) if "element_at" in l)
        assert smj < exch < bloom_test, "\n".join(lines[:12])
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bloom_prune_measured_shuffle_reduction(spark, sf_dir):
    """The prune actually drops rows pre-shuffle: count the bloom
    survivors vs the full fact — with a ~0.2%-selective build side the
    candidate set must be well under 10% of the fact (false-positive
    rate of the 8 KiB default bitmap at this key count is <1%)."""
    li = load_table(spark, sf_dir, "lineitem")
    small = load_table(spark, sf_dir, "part").where("p_size = 1")
    keys = small.select(F.col("p_partkey").alias("__k")).distinct()
    bloom = bloom_build(keys, "__k").scalar()
    survivors = li.where(
        bloom_might_contain(bloom, F.col("l_partkey"), 1 << 16, 3)
    ).count()
    total = li.count()
    exact = _semi(li, small, "l_partkey", "p_partkey").count()
    assert exact <= survivors < 0.1 * total
