"""Round-16 optimization regressions: skew-proof star-contraction CC.

The r15 verdict (item 3) flagged the window-min star rounds as a skew
hazard: ``Window.partitionBy(__s)`` forces a power-law hub's entire
adjacency into one task with no partial aggregation and no AQE skew
split.  Round 16 added a skew-safe shape — a partial-aggregating
``groupBy(__s).min`` joined back onto the probe rows (map-side
partials are skew-immune, the join-back is AQE-skew-splittable) — and
dispatches per round on the edge count the fixpoint loop already
tracks (STAR_SKEW_SAFE_MIN_EDGES): small graphs keep the cheaper
window shape, where any straggler is bounded by the whole edge count.
These tests pin:

- label correctness on a power-law graph against a driver-side
  union-find ground truth (independent of label_prop's max_iter bound);
- the two-level-min plan shape (partial_min HashAggregate, no Window);
- that AQE's OptimizeSkewedJoin actually splits the hub partition
  (requires the mins subtree materialized — with the final aggregate
  above the shuffle stage the skew pattern never matches, measured);
- the r15 ADVICE invariant: ``_small_star(_large_star(x))`` emits a
  distinct canonical edge set even though large-star output may carry
  duplicates (a future round reorder must not compare raw large-star
  output).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.operators import dedup as D


def _ground_truth(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in nodes}


def _power_law_edges():
    random.seed(7)
    edges = [(0, i) for i in range(1, 120)]  # hub owns ~30% of edges
    edges += [(i, i + 1) for i in range(200, 260)]  # diameter-60 chain
    edges += [
        (random.randint(300, 400), random.randint(300, 400)) for _ in range(150)
    ]
    edges += [(b, a) for a, b in edges[:40]]  # reversed duplicates
    edges += edges[:30]  # exact duplicates
    return edges


def test_star_cc_power_law_matches_ground_truth(spark):
    """Star CC labels on a hub + long-chain + random graph must equal a
    union-find ground truth (label_prop cannot be the oracle here — the
    chain's diameter exceeds its max_iter)."""
    edges = _power_law_edges()
    nodes = sorted({x for e in edges for x in e})
    truth = _ground_truth(nodes, edges)
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    ndf = spark.createDataFrame([(n,) for n in nodes], "doc_id long")
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in D.connected_components(pairs, ndf, "doc_id", method="star").collect()
    }
    assert got == truth


def test_star_round_plan_is_two_level_min(spark):
    """One star round must plan as min-aggregates joined back onto the
    probe rows — never a Window min (no partial aggregation, no skew
    split).  The mins subtrees are lazy-checkpointed (load-bearing for
    the AQE skew pattern), so the outer plan shows them as RDD scans
    feeding joins; the aggregate's partial_min shape is asserted on the
    subtree itself."""
    edges = _power_law_edges()
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    canon = D._canonical_edges(pairs, "id_a", "id_b")
    out = D._small_star(D._large_star(canon))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Join" in plan  # the two join-backs replace the windows
    # the mins aggregate itself must partial-aggregate map-side (the
    # skew-immunity property a window min lacks)
    mins = canon.groupBy("__s").agg(F.min("__d").alias("__m0"))
    agg_plan = mins._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in agg_plan


def test_small_star_output_distinct_after_large_star(spark):
    """r15 ADVICE: _large_star output is deliberately NOT deduplicated;
    the loop contract is that _small_star always consumes it and its
    final distinct restores the canonical set.  Pin that contract so a
    future reorder cannot compare raw large-star output."""
    edges = _power_law_edges()
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    canon = D._canonical_edges(pairs, "id_a", "id_b")
    out = D._small_star(D._large_star(canon))
    assert out.count() == out.dropDuplicates(["__s", "__d"]).count()
    # canonical orientation: greater -> lesser, no self-loops
    assert out.filter(F.col("__s") <= F.col("__d")).count() == 0


def test_star_round_skew_split_fires(spark):
    """A hub owning nearly all probe rows (hub id is the minimum, so
    every canonical edge keys the probe by the hub) must be split by
    AQE's OptimizeSkewedJoin at lowered thresholds — the property the
    r15 window shape could not provide.  Also re-checks labels on the
    skewed graph."""
    saved = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "1MB"
        )
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1MB")
        # keep the mins side out of broadcast range so the shuffle join
        # (the 100 TB shape, where mins is node-count-sized) is what's
        # exercised
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        n = 400_000
        hub = spark.range(1, n + 1).select(
            F.lit(0).alias("id_a"), F.col("id").alias("id_b")
        )
        bg = spark.range(3_000_000, 3_010_000).select(
            (F.col("id") * 7 + 1).alias("id_a"), (F.col("id") * 7).alias("id_b")
        )
        canon = D._canonical_edges(hub.unionByName(bg), "id_a", "id_b").localCheckpoint(
            eager=True
        )
        out = D._large_star(canon)
        rows = out.collect()
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
        # every hub edge must map its larger endpoint to the hub minimum
        assert len(rows) == n + 10_000
        assert all(r["__d"] == 0 for r in rows if r["__s"] <= n)
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_embedding_drift_drops_single_parity_labels(spark, tmp_path):
    """r15 advice: a label whose vec_ids are all one parity must be
    DROPPED (the pre-r15 a⋈b inner self-join semantics), not emitted
    with a NULL drift — pins the degenerate-split guard."""
    import pyspark.sql.types as T

    from storm_dynamic_spout_spark.catalog.llm import embedding_drift

    schema = T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    )
    rows = [
        (0, [1.0, 0.0], 1),  # label 1: both parities -> one drift row
        (1, [0.0, 1.0], 1),
        (2, [2.0, 2.0], 2),  # label 2: even ids only -> dropped
        (4, [3.0, 3.0], 2),
    ]
    d = str(tmp_path / "emb")
    spark.createDataFrame(rows, schema).write.parquet(f"{d}/embeddings.parquet")
    out = embedding_drift(spark, d).collect()
    assert [r["label"] for r in out] == [1]
    assert all(r["drift_l2"] is not None for r in out)
