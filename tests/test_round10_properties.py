"""Hypothesis properties for the round-10 operators: diagonal
whitening must be invariant to per-dimension affine rescaling of the
corpus (the exact property that makes it repair anisotropy), and a
numpy re-derivation must agree with the distributed plan on arbitrary
corpora."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_EXAMPLES = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_vec = st.lists(
    st.floats(
        min_value=-100,
        max_value=100,
        allow_nan=False,
        allow_infinity=False,
        width=32,
    ),
    min_size=3,
    max_size=3,
)


def _whiten(spark, rows):
    from storm_dynamic_spout_spark.operators.similarity import whiten_ppm

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rows)], "id long, v array<double>"
    ).repartition(4)
    return {
        r["id"]: list(r["white_ppm"])
        for r in whiten_ppm(df, "id", "v").collect()
    }


@_EXAMPLES
@given(rows=st.lists(_vec, min_size=2, max_size=12))
def test_whiten_matches_numpy_closed_form(spark, rows):
    """The distributed plan (posexplode -> d-group agg -> broadcast
    zip_with) must agree with a per-dimension numpy re-derivation on
    any corpus, including constant (sd = 0) dimensions — within 1
    ppm-unit for the accumulation-order ulp on the .5 rounding edge."""
    got = _whiten(spark, rows)
    n, d = len(rows), len(rows[0])
    for j in range(d):
        col = [rows[i][j] for i in range(n)]
        mu = math.fsum(col) / n
        sd = math.sqrt(math.fsum((x - mu) ** 2 for x in col) / n)
        for i in range(n):
            want = 0 if sd <= 0 else round((rows[i][j] - mu) / sd * 1_000_000)
            assert abs(got[i][j] - want) <= 1, (i, j, got[i][j], want)


@_EXAMPLES
@given(
    rows=st.lists(_vec, min_size=2, max_size=10),
    scale=st.floats(min_value=0.25, max_value=8, allow_nan=False),
    shift=st.floats(min_value=-50, max_value=50, allow_nan=False),
)
def test_whiten_is_affine_invariant(spark, rows, scale, shift):
    """Rescaling and shifting a dimension corpus-wide (x -> a*x + b,
    a > 0) must leave the whitened output unchanged (to the 1-ppm
    rounding edge): whitening is exactly the transform that removes
    per-dimension gain and offset."""
    base = _whiten(spark, rows)
    rescaled = _whiten(
        spark, [[scale * v[0] + shift, v[1], v[2]] for v in rows]
    )
    for i in base:
        for j in range(3):
            assert abs(base[i][j] - rescaled[i][j]) <= 1, (
                i,
                j,
                base[i][j],
                rescaled[i][j],
            )
