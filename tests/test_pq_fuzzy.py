"""Operator-level invariants for the round-7 additions that have
mathematical guarantees beyond the driver oracle's value equality:
product quantization (codebook self-assignment, code ranges) and the
blocked fuzzy join (self-match recall when the typo sits past the
block prefix)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_pq_codebook_vectors_quantize_to_themselves(spark, sf_dir):
    from storm_dynamic_spout_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        pq_assign,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    codes = pq_assign(emb, "vec_id", "embedding", dim=64).collect()
    by_id = {r.vec_id: r for r in codes}
    for vid in range(PQ_K):
        r = by_id[vid]
        # a codebook vector's nearest subcentroid is itself: zero error
        assert r.err_micro == 0, (vid, r)
        for m in range(PQ_M):
            assert getattr(r, f"code_{m}") == vid, (vid, m, r)
    for r in codes:
        for m in range(PQ_M):
            assert 0 <= getattr(r, f"code_{m}") < PQ_K


def test_pq_adc_self_query_ranks_true_duplicates_first(spark, sf_dir):
    """ADC distance of a vector to its own code's reconstruction is
    its quantization error — a query vector's OWN code row (excluded)
    aside, vectors sharing all 4 codes get the identical approximate
    distance; ranking is deterministic on (distance, id)."""
    from storm_dynamic_spout_spark.operators.similarity import pq_topk_adc

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    out = pq_topk_adc(
        emb, "vec_id", "embedding", dim=64, query_pred=F.col("vec_id") < 2, k=3
    ).collect()
    assert {r.query_id for r in out} == {0, 1}
    for r in out:
        assert r.neighbor_id != r.query_id
        assert r.approx_d2_micro >= 0
    ranks = sorted(r.rank for r in out if r.query_id == 0)
    assert ranks == [1, 2, 3]


def test_soft_dedup_cluster_weights_sum_to_one(spark, sf_dir):
    from storm_dynamic_spout_spark.operators.dedup import soft_dedup_weights

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    sums = (
        soft_dedup_weights(docs.select("doc_id", "text"), "doc_id", "text")
        .groupBy("fingerprint")
        .agg(F.round(F.sum("weight"), 6).alias("s"))
        .select(F.min("s").alias("lo"), F.max("s").alias("hi"))
        .collect()[0]
    )
    assert sums.lo == 1.0 and sums.hi == 1.0


def test_fuzzy_join_always_recovers_self_match(spark):
    """Any single-char deletion PAST the block prefix must match its
    original at distance 1 (blocking cannot lose it: prefix intact,
    length within 1)."""
    from storm_dynamic_spout_spark.operators.text import fuzzy_string_join

    clean = spark.createDataFrame(
        [(1, "lavender spring"), (2, "goldenrod lace"), (3, "hot tomato")],
        "cid long, name string",
    )
    dirty = clean.select(
        F.col("cid").alias("did"),
        F.concat(
            F.expr("substr(name, 1, 4 + cid % 3)"),
            F.expr("substr(name, 6 + cid % 3)"),
        ).alias("dname"),
    )
    got = {
        (r.did, r.cid): r.edit_distance
        for r in fuzzy_string_join(
            dirty, clean, "did", "dname", "cid", "name"
        ).collect()
    }
    for i in (1, 2, 3):
        assert got[(i, i)] == 1


def test_pq_assign_matches_numpy_brute_force(spark, sf_dir):
    """Hypothesis-free exhaustive cross-check: every vector's code in
    every subspace equals the numpy argmin over the same integer
    micro-unit distances with the same (distance, cid) tie-break."""
    import numpy as np

    from storm_dynamic_spout_spark.operators.similarity import (
        PQ_K,
        PQ_M,
        pq_assign,
    )

    rows = sorted(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet").collect(),
        key=lambda r: r.vec_id,
    )
    vecs = {r.vec_id: np.asarray(r.embedding, dtype=np.float64) for r in rows}
    cents = [vecs[i] for i in range(PQ_K)]
    sub = 64 // PQ_M
    got = {
        r.vec_id: r
        for r in pq_assign(
            spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
            "vec_id",
            "embedding",
            dim=64,
        ).collect()
    }
    for vid, v in vecs.items():
        err = 0
        for m in range(PQ_M):
            s = slice(m * sub, (m + 1) * sub)
            dm = []
            for cid in range(PQ_K):
                d2 = 0.0
                for a, b in zip(v[s], cents[cid][s]):
                    d2 += (a - b) * (a - b)
                dm.append((int(round(d2 * 1e6)), cid))
            best = min(dm)
            assert getattr(got[vid], f"code_{m}") == best[1], (vid, m)
            err += best[0]
        assert got[vid].err_micro == err, vid


def test_phash_bands_guarantee_hamming_le_3_recall():
    """Pigeonhole property of the 4x16-bit banding: ANY pair within
    hamming 3 shares at least one untouched band — flipping up to 3
    bits of random hashes must always leave a colliding band."""
    import random

    from storm_dynamic_spout_spark.operators.multimodal import (
        PHASH_BAND_BITS,
        PHASH_BANDS,
    )

    rng = random.Random(123)
    mask = (1 << PHASH_BAND_BITS) - 1
    for _ in range(500):
        h = rng.getrandbits(63)
        flipped = h
        for pos in rng.sample(range(63), rng.randint(0, 3)):
            flipped ^= 1 << pos
        bands_equal = any(
            (h >> (b * PHASH_BAND_BITS)) & mask
            == (flipped >> (b * PHASH_BAND_BITS)) & mask
            for b in range(PHASH_BANDS)
        )
        assert bands_equal
