"""Properties of the PageRank operator that the fixture oracle can't
state: conservation on dangling-free graphs, uniformity on symmetric
cycles, and the damping limit."""

from __future__ import annotations

import math

from storm_dynamic_spout_spark.operators.graph import pagerank


def _ranks(df):
    return {r.node: r.rank for r in df.collect()}


def test_cycle_is_uniform(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")], "src string, dst string"
    )
    r = _ranks(pagerank(edges, iterations=5))
    for v in r.values():
        assert math.isclose(v, 0.25, rel_tol=1e-12)


def test_mass_conserved_without_dangling_nodes(spark):
    edges = spark.createDataFrame(
        [("a", "b", 2.0), ("b", "a", 1.0), ("b", "c", 3.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    r = _ranks(pagerank(edges, weight="w", iterations=10))
    assert math.isclose(sum(r.values()), 1.0, rel_tol=1e-9)


def test_sink_attracts_mass(spark):
    # star into 'hub' (hub loops to itself so nothing dangles)
    edges = spark.createDataFrame(
        [("a", "hub"), ("b", "hub"), ("c", "hub"), ("hub", "hub")],
        "src string, dst string",
    )
    r = _ranks(pagerank(edges, iterations=8))
    assert r["hub"] > r["a"] == r["b"] == r["c"]


def test_zero_damping_is_uniform_teleport(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c"), ("c", "c")], "src string, dst string"
    )
    r = _ranks(pagerank(edges, iterations=4, damping=0.0))
    for v in r.values():
        assert math.isclose(v, 1.0 / 3.0, rel_tol=1e-12)


def test_checkpointing_does_not_change_values(spark):
    edges = spark.createDataFrame(
        [("a", "b", 2.0), ("b", "a", 1.0), ("b", "c", 3.0), ("c", "a", 1.0)],
        "src string, dst string, w double",
    )
    base = _ranks(pagerank(edges, weight="w", iterations=6, checkpoint_every=None))
    ckpt = _ranks(pagerank(edges, weight="w", iterations=6, checkpoint_every=2))
    assert set(base) == set(ckpt)
    for k in base:
        assert math.isclose(base[k], ckpt[k], rel_tol=1e-12), k
