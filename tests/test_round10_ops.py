"""Round-10 operator contracts not covered by the driver oracle rows:
whiten_ppm's closed-form values on a hand-computable corpus (including
the zero-variance dimension guard) and the A/B readout's statistical
invariants on the fixture."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def test_whiten_ppm_matches_closed_form(spark):
    """Three 2-d vectors with a constant second dimension: dim 0 has
    mu=3, sd_pop=sqrt(8/3); dim 1 has sd=0 and must whiten to 0 (the
    guard, not a division blow-up)."""
    from storm_dynamic_spout_spark.operators.similarity import whiten_ppm

    df = spark.createDataFrame(
        [(1, [1.0, 2.0]), (2, [3.0, 2.0]), (3, [5.0, 2.0])],
        "id long, v array<double>",
    )
    out = {
        r["id"]: (r["n_dims"], list(r["white_ppm"]))
        for r in whiten_ppm(df, "id", "v").collect()
    }
    sd = math.sqrt(8.0 / 3.0)
    expect = {
        1: round((1 - 3) / sd * 1_000_000),
        2: 0,
        3: round((5 - 3) / sd * 1_000_000),
    }
    for vid, (n_dims, ppm) in out.items():
        assert n_dims == 2
        assert ppm[0] == expect[vid], (vid, ppm)
        assert ppm[1] == 0, "zero-variance dimension must whiten to 0"


def test_whiten_ppm_standardizes_the_corpus(spark):
    """On the real fixture: every dimension's whitened values must have
    ~zero mean and ~unit variance (in ppm units: |mean| < 1, pop-std
    within 1e-3 of 1e6) — the property that makes whitening repair
    anisotropy."""
    from storm_dynamic_spout_spark.operators.similarity import whiten_ppm

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    w = whiten_ppm(emb, "vec_id", "embedding")
    stats = (
        w.select(F.posexplode("white_ppm").alias("pos", "x"))
        .groupBy("pos")
        .agg(F.avg("x").alias("mu"), F.stddev_pop("x").alias("sd"))
        .collect()
    )
    assert len(stats) == len(emb.first()["embedding"])
    for r in stats:
        assert abs(r["mu"]) < 1.0, f"dim {r['pos']}: mean {r['mu']} not ~0"
        assert abs(r["sd"] - 1_000_000) < 1_000, (
            f"dim {r['pos']}: std {r['sd']} not ~1e6"
        )


def test_ab_test_invariants(spark):
    """Exposure accounting must hold on the fixture: arm sizes are the
    same on every row (every user is exposed to every metric), rates
    stay in [0, 1] and equal conv/n, and the z statistic's sign agrees
    with the rate difference."""
    from storm_dynamic_spout_spark.queries import QUERIES

    rows = QUERIES["events_ab_test"](spark, SF).collect()
    assert rows, "fixture has event types"
    n_c = {r["n_c"] for r in rows}
    n_t = {r["n_t"] for r in rows}
    assert len(n_c) == 1 and len(n_t) == 1, "arm sizes vary across metrics"
    # user_id % 2 over users 0..14 -> 8 control, 7 treatment
    assert n_c == {8} and n_t == {7}
    for r in rows:
        assert 0 <= r["conv_c"] <= r["n_c"]
        assert 0 <= r["conv_t"] <= r["n_t"]
        assert abs(r["rate_c"] - round(r["conv_c"] / r["n_c"], 6)) < 1e-9
        assert abs(r["rate_t"] - round(r["conv_t"] / r["n_t"], 6)) < 1e-9
        diff = r["rate_t"] - r["rate_c"]
        if r["z_conv"] != 0:
            assert math.copysign(1, r["z_conv"]) == math.copysign(1, diff)
