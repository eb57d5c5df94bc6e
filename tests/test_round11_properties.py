"""Hypothesis properties for the round-11 operators: the smoothing
folds must agree with a plain-Python recursion on arbitrary series
(and stay inside the series envelope / track exact linear trends), the
degree-oriented triangle count must equal a brute-force close on
random graphs, and the per-node triangle credits must conserve 3x the
global count."""

from __future__ import annotations

import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

_EXAMPLES = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_series = st.lists(
    st.integers(min_value=-10_000, max_value=10_000), min_size=1, max_size=40
)


def _spark_ses(spark, ys):
    df = spark.createDataFrame(
        [([float(v) for v in ys],)], "ys array<double>"
    )
    fold = F.aggregate(
        F.slice(F.col("ys"), 2, F.greatest(F.size("ys") - 1, F.lit(0))),
        F.col("ys")[0],
        lambda acc, x: F.lit(0.3) * x + F.lit(0.7) * acc,
    )
    return df.select(fold.alias("s")).first()["s"]


@_EXAMPLES
@given(ys=_series)
def test_ses_fold_matches_python_and_stays_in_envelope(spark, ys):
    s = float(ys[0])
    for y in ys[1:]:
        s = 0.3 * y + 0.7 * s
    got = _spark_ses(spark, ys)
    assert got == s  # identical double recursion, bit-for-bit
    assert min(ys) - 1e-9 <= got <= max(ys) + 1e-9  # convex combination


@_EXAMPLES
@given(
    a=st.integers(min_value=-1000, max_value=1000),
    b=st.integers(min_value=-1000, max_value=1000),
    n=st.integers(min_value=2, max_value=30),
)
def test_holt_tracks_any_exact_linear_series(spark, a, b, n):
    """For y_i = a + b*i the Holt state must stay (level=y_last,
    trend=b) exactly: l2=y2, t2=b is a fixpoint of the recursion on a
    linear series (every forecast l+t equals the next observation)."""
    ys = [float(a + b * i) for i in range(n)]
    df = spark.createDataFrame([(ys,)], "ys array<double>")
    al, be = 0.5, 0.4

    def _step(acc, x):
        lvl = F.lit(al) * x + F.lit(1 - al) * (acc["l"] + acc["t"])
        tr = (
            F.lit(be) * (F.lit(al) * x + F.lit(1 - al) * (acc["l"] + acc["t"]) - acc["l"])
            + F.lit(1 - be) * acc["t"]
        )
        return F.struct(lvl.alias("l"), tr.alias("t"))

    init = F.struct(
        F.col("ys")[1].alias("l"), (F.col("ys")[1] - F.col("ys")[0]).alias("t")
    )
    fold = F.aggregate(
        F.slice(F.col("ys"), 3, F.greatest(F.size("ys") - 2, F.lit(0))), init, _step
    )
    row = df.select(fold["l"].alias("l"), fold["t"].alias("t")).first()
    assert row["l"] == ys[-1]
    assert row["t"] == float(b)


_edges = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=12), st.integers(min_value=0, max_value=12)
    ),
    min_size=0,
    max_size=40,
)


@_EXAMPLES
@given(raw=_edges)
def test_degree_oriented_triangles_match_bruteforce(spark, raw):
    from storm_dynamic_spout_spark.operators.graph import (
        degree_oriented_triangles,
    )

    edges = sorted({(min(a, b), max(a, b)) for a, b in raw if a != b})
    nodes = sorted({v for e in edges for v in e})
    adj = {v: set() for v in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expect_tris = {
        (a, b, c)
        for a, b, c in itertools.combinations(nodes, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    }
    if not edges:
        return
    df = spark.createDataFrame(edges, "a long, b long")
    got = degree_oriented_triangles(df).collect()
    assert len(got) == len(expect_tris)
    assert {tuple(sorted((r["apex"], r["v"], r["w"]))) for r in got} == expect_tris
    # per-node credit conservation: each triangle credits 3 corners
    credits = {}
    for r in got:
        for n in (r["apex"], r["v"], r["w"]):
            credits[n] = credits.get(n, 0) + 1
    assert sum(credits.values()) == 3 * len(expect_tris)
