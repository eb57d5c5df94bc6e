"""Degree-ordered edge orientation (operators/graph.py
orient_by_degree / degree_oriented_triangles) — the compact-forward
triangle algorithm: count must equal the naive id-oriented close, and
wedge volume must collapse on skewed graphs (the hub's edges all point
inward, so it contributes zero apex wedges)."""

from __future__ import annotations

import pyspark.sql.functions as F

from storm_dynamic_spout_spark.operators.graph import (
    degree_oriented_triangles,
    orient_by_degree,
)


def _edges(spark, pairs):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in pairs], "a long, b long"
    )


HUB = 40


def _skewed_graph():
    """Hub node 40 adjacent to every node 0..80, plus a ring over
    0..80 — lots of triangles (hub, i, i+1), with all the degree skew
    at the hub.  The hub id sits MID-RANGE on purpose: the a<b<c
    id-orientation then splits its edges ~half in / half out, so the
    id-ordered wedge join pays in×out ≈ (d/2)² ≈ 1600 wedges at the
    hub alone, while degree-orientation points every hub edge inward
    and the hub contributes zero apex wedges."""
    n = 81
    ring = {(min(i, (i + 1) % n), max(i, (i + 1) % n)) for i in range(n)}
    hub = {(min(HUB, i), max(HUB, i)) for i in range(n) if i != HUB}
    return sorted(ring | hub)


def _id_oriented_count(edges):
    e1, e2, e3 = edges.alias("e1"), edges.alias("e2"), edges.alias("e3")
    return (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(
            e3,
            (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")),
        )
        .count()
    )


def _id_oriented_wedges(edges):
    e1, e2 = edges.alias("e1"), edges.alias("e2")
    return e1.join(e2, F.col("e2.a") == F.col("e1.b")).count()


def test_orientation_preserves_every_edge_once(spark):
    pairs = _skewed_graph()
    d = orient_by_degree(_edges(spark, pairs))
    assert d.count() == len(pairs)
    # canonical undirected keys survive the reorientation
    got = {
        (min(r.src, r.dst), max(r.src, r.dst))
        for r in d.select("src", "dst").collect()
    }
    assert got == {(min(a, b), max(a, b)) for a, b in pairs}
    # orientation invariant: src strictly precedes dst in (deg, id)
    bad = d.filter(
        (F.col("src_deg") > F.col("dst_deg"))
        | ((F.col("src_deg") == F.col("dst_deg")) & (F.col("src") >= F.col("dst")))
    ).count()
    assert bad == 0


def test_triangle_count_matches_id_orientation(spark):
    pairs = _skewed_graph()
    edges = _edges(spark, pairs)
    expected = _id_oriented_count(edges)
    assert expected > 70  # ring edge + hub closes a triangle per edge
    assert degree_oriented_triangles(edges).count() == expected
    # each triangle appears once, as (apex, v, w) distinct rows
    tri = degree_oriented_triangles(edges)
    assert tri.distinct().count() == expected


def test_hub_contributes_no_apex_wedges(spark):
    """The point of the refinement: under degree order the hub's edges
    all point INWARD, so its quadratic wedge bucket vanishes — wedge
    volume drops from O(hub_deg^2) to O(m)."""
    pairs = _skewed_graph()
    edges = _edges(spark, pairs)
    d = orient_by_degree(edges)
    hub_out = d.filter(F.col("src") == HUB).count()
    assert hub_out == 0, "hub (max degree) must have zero out-edges"

    # compare the candidate volume FEEDING each close-join: the naive
    # a<b<c algorithm builds e2.a == e1.b wedges (in x out at every
    # middle — quadratic at the mid-id hub); the oriented one builds
    # apex wedges with the v-before-w filter (C(out, 2) per apex, and
    # the hub's out-degree is zero)
    d1, d2 = d.alias("d1"), d.alias("d2")
    oriented_wedges = (
        d1.join(d2, F.col("d1.src") == F.col("d2.src"))
        .filter(
            (F.col("d1.dst_deg") < F.col("d2.dst_deg"))
            | (
                (F.col("d1.dst_deg") == F.col("d2.dst_deg"))
                & (F.col("d1.dst") < F.col("d2.dst"))
            )
        )
        .count()
    )
    naive_wedges = _id_oriented_wedges(edges)
    print(f"wedges: id-oriented={naive_wedges} degree-oriented={oriented_wedges}")
    assert oriented_wedges * 3 <= naive_wedges, (oriented_wedges, naive_wedges)


def test_triangle_count_on_random_graph_matches(spark):
    """Erdos-Renyi-ish fixture (deterministic hash edges): the two
    orientations must agree on a structure-free graph too."""
    n = 60
    pairs = [
        (a, b)
        for a in range(n)
        for b in range(a + 1, n)
        if (a * 1_000_003 + b * 7919) % 7 == 0
    ]
    edges = _edges(spark, pairs)
    assert (
        degree_oriented_triangles(edges).count() == _id_oriented_count(edges)
    )
