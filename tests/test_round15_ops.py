"""Round-15 operator pins.

1. The whiten-family engine/oracle agreement on a DENORMAL-sd
   dimension (r14 advice): the oracles now interpolate whiten_ppm's own
   epsilon constants, so a near-constant dimension must whiten to 0 in
   BOTH engines — previously the plain ``sd > 0`` oracle guard diverged
   on exactly this input and equivalence rested on the fixture pin.
2. The r15 registrations' Spark-side contracts at fixture scale
   (cross-query consistency; the driver hash-compare itself is covered
   by tools/sweep.py)."""

from __future__ import annotations

import duckdb
import pytest

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.operators.similarity import (
    WHITEN_SD_ABS_EPS,
    WHITEN_SD_REL_EPS,
    whiten_ppm,
)

#: dim 0: denormal spread around 1.0 (sd ~1e-39 — passes ``sd > 0``,
#: fails the relative floor); dim 1: honest signal; dim 2: exactly
#: constant (sd == 0 — both guards agree)
_DENORMAL = 5.9e-39
_ROWS = [
    (0, [1.0, 10.0, 7.0]),
    (1, [1.0 + _DENORMAL, 20.0, 7.0]),
    (2, [1.0 - _DENORMAL, 30.0, 7.0]),
    (3, [1.0, 40.0, 7.0]),
]


def _oracle_rows():
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE v AS SELECT * FROM (VALUES "
        + ", ".join(f"({i}, {vals!r}::DOUBLE[])" for i, vals in _ROWS)
        + ") t(vec_id, ve)"
    )
    guard = (
        f"sds[i] > abs(mus[i]) * {WHITEN_SD_REL_EPS!r} + {WHITEN_SD_ABS_EPS!r}"
    )
    return con.execute(
        f"""
        WITH comp AS (SELECT UNNEST(range(1, len(ve) + 1)) AS pos, ve FROM v),
        cell AS (SELECT pos, ve[pos] AS x FROM comp),
        stats AS (SELECT pos, avg(x) AS mu, stddev_pop(x) AS sd
                  FROM cell GROUP BY pos),
        sarr AS (SELECT list(mu ORDER BY pos) AS mus,
                        list(sd ORDER BY pos) AS sds FROM stats)
        SELECT vec_id,
               list_transform(range(1, len(ve) + 1), i ->
                   CAST(CASE WHEN {guard}
                             THEN round((ve[i] - mus[i]) / sds[i] * 1000000)
                             ELSE 0 END AS BIGINT)) AS w
        FROM v, sarr ORDER BY vec_id
        """
    ).fetchall()


def test_whiten_denormal_dimension_agrees_with_oracle_guard(spark):
    df = spark.createDataFrame(_ROWS, "vec_id long, embedding array<double>")
    got = {
        r["vec_id"]: list(r["white_ppm"])
        for r in whiten_ppm(df, "vec_id", "embedding").collect()
    }
    want = {vid: list(w) for vid, w in _oracle_rows()}
    assert got == want
    # and the denormal + constant dims really did zero out while the
    # honest dim whitened
    assert all(w[0] == 0 and w[2] == 0 for w in got.values())
    assert {w[1] for w in got.values()} != {0}


def test_whiten_fixture_sds_clear_the_floor(spark, sf_dir):
    """Both-branches-sane check carried forward from r14: the driver
    fixture's per-dimension sds sit far above the epsilon floor, so
    the agreement test above (not the fixture) is what exercises the
    zero branch."""
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cell = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x")
    )
    stats = cell.groupBy("pos").agg(
        F.avg("x").alias("mu"), F.stddev_pop("x").alias("sd")
    )
    bad = stats.filter(
        F.col("sd")
        <= F.abs(F.col("mu")) * (WHITEN_SD_REL_EPS * 1e3) + WHITEN_SD_ABS_EPS
    )
    assert bad.count() == 0


@pytest.fixture(scope="module")
def sf_dir():
    return "/root/testdata/sf0.001"
