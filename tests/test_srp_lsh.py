"""SRP-LSH (random-hyperplane) near-dup pairs: plane determinism,
exact precision (every emitted pair truly exceeds the cosine
threshold — the LSH only prunes candidates, the verify is exact), and
subset-of-brute-force containment."""

from __future__ import annotations

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.engine import load_table
from storm_dynamic_spout_spark.operators.similarity import (
    cosine,
    srp_band_pairs,
    srp_planes,
)

SF = "/root/testdata/sf0.001"
THRESHOLD = 0.25


def test_planes_deterministic_and_signed():
    a = srp_planes(64, 16)
    b = srp_planes(64, 16)
    assert a == b
    assert len(a) == 16 and all(len(row) == 64 for row in a)
    assert all(w in (1.0, -1.0) for row in a for w in row)
    # a different seed gives different planes
    assert srp_planes(64, 16, seed=7) != a


def test_pairs_are_exact_above_threshold_and_subset_of_bruteforce(spark):
    emb = load_table(spark, SF, "embeddings").limit(120)
    got = srp_band_pairs(
        emb, "vec_id", "embedding", THRESHOLD, dim=64, n_planes=16, band_bits=4
    )
    rows = got.collect()
    assert rows, "LSH found no pairs on the fixture — banding broken?"
    # precision: every emitted cos really is >= threshold
    assert all(r["cos"] >= THRESHOLD for r in rows)
    # no duplicate or self pairs, canonical orientation
    keys = [(r["id_a"], r["id_b"]) for r in rows]
    assert len(keys) == len(set(keys))
    assert all(a < b for a, b in keys)
    # containment: subset of the label-free brute-force pairs
    a = emb.select(F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"))
    brute = (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "cos",
            cosine(
                F.transform("va", lambda x: x.cast("double")),
                F.transform("vb", lambda x: x.cast("double")),
            ),
        )
        .filter(F.col("cos") >= THRESHOLD)
    )
    brute_keys = {(r["id_a"], r["id_b"]) for r in brute.collect()}
    assert set(keys) <= brute_keys
    # recall on the fixture is non-trivial (bands actually bucket)
    assert len(keys) >= len(brute_keys) * 0.1
