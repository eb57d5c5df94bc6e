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


def _exact_l2_topk(e, k=5, maxid=8):
    from pyspark.sql.window import Window as W

    q = e.filter(F.col("vec_id") < maxid).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("cv")
    )
    d2 = F.aggregate(
        F.zip_with("qv", "cv", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    j = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("d2", d2)
    )
    w = W.partitionBy("query_id").orderBy("d2", "neighbor_id")
    return (
        j.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id")
    )


def _topk_sets(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    return out


def test_ivfpq_tuned_exhaustive_settings_recover_exact_topk(spark):
    """pq_topk_ivf_adc_tuned with nprobe = |buckets| and a rerank
    shortlist covering the whole corpus must return EXACTLY the
    brute-force L2 top-k — the knobs' limit case is exact search, which
    pins both the multi-probe fan-out and the rerank scoring."""
    from storm_dynamic_spout_spark.operators.similarity import (
        ivf_assign_labels,
        pq_topk_ivf_adc_tuned,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_buckets = e.select("label").distinct().count()
    n_vecs = e.count()
    assigned = ivf_assign_labels(e, "vec_id", "embedding", "label")
    dfb = e.select("vec_id", "embedding").join(assigned, "vec_id")
    got = _topk_sets(
        pq_topk_ivf_adc_tuned(
            dfb,
            "vec_id",
            "embedding",
            "assigned",
            dim=64,
            query_pred=F.col("vec_id") < 8,
            k=5,
            nprobe=n_buckets,
            rerank_mult=n_vecs // 5 + 1,
        )
    )
    want = _topk_sets(_exact_l2_topk(e))
    assert got == want


def test_ivfpq_tuned_knobs_are_monotone_in_recall(spark):
    """More probes + a rerank pass must not lower recall vs the
    nprobe=1 ADC-only baseline (each knob only ever ADDS candidates /
    replaces approximate scores with exact ones)."""
    from storm_dynamic_spout_spark.operators.similarity import (
        ivf_assign_labels,
        pq_topk_ivf_adc_tuned,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    assigned = ivf_assign_labels(e, "vec_id", "embedding", "label")
    dfb = e.select("vec_id", "embedding").join(assigned, "vec_id")
    gt = _topk_sets(_exact_l2_topk(e))

    def recall(nprobe, rm):
        got = _topk_sets(
            pq_topk_ivf_adc_tuned(
                dfb,
                "vec_id",
                "embedding",
                "assigned",
                dim=64,
                query_pred=F.col("vec_id") < 8,
                k=5,
                nprobe=nprobe,
                rerank_mult=rm,
            )
        )
        return sum(len(gt[q] & got.get(q, set())) / 5 for q in gt) / len(gt)

    base = recall(1, 0)
    tuned = recall(4, 8)
    assert tuned >= base


def test_pq_train_codebook_reduces_distortion(spark):
    """Lloyd iterations from the fixture-codebook init must not
    increase total quantization error on the fixture corpus (k-means
    SSE is non-increasing per step), and here strictly reduce it."""
    from storm_dynamic_spout_spark.operators.similarity import (
        pq_assign,
        pq_train_codebook,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    fixture = pq_assign(e, "vec_id", "embedding", 64).agg(
        F.sum("err_micro")
    ).first()[0]
    cb = pq_train_codebook(e, "vec_id", "embedding", 64, iters=3)
    trained = pq_assign(e, "vec_id", "embedding", 64, codebook=cb).agg(
        F.sum("err_micro")
    ).first()[0]
    assert trained <= fixture
    assert trained < fixture * 0.95, "training should strictly cut distortion"


def test_pq_train_codebook_recovers_separable_clusters(spark):
    """Two exact cluster centers per 2-dim subspace, with a WORST-CASE
    init (the first k vectors sit in the same cluster): training must
    drive quantization error to zero and emit the (__cid, __c) full-dim
    contract — k rows of dim-length arrays with dense 0..k-1 cids."""
    from storm_dynamic_spout_spark.operators.similarity import (
        pq_assign,
        pq_train_codebook,
    )

    # subspace 0 clusters at x=0 / x=10; subspace 1 at y=0 / y=10.
    # ids 0,1 (the init) both sit at the origin-side cluster.
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [0.1, 0.1, 0.1, 0.1]),
        (2, [10.0, 10.0, 10.0, 10.0]),
        (3, [10.1, 10.1, 10.1, 10.1]),
        (4, [0.0, 0.1, 10.0, 10.1]),
        (5, [10.1, 10.0, 0.1, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    fixture_err = pq_assign(df, "vec_id", "embedding", 4, m=2, k=2).agg(
        F.sum("err_micro")
    ).first()[0]
    cb = pq_train_codebook(df, "vec_id", "embedding", 4, m=2, k=2, iters=5)
    rows_cb = cb.orderBy("__cid").collect()
    assert [r["__cid"] for r in rows_cb] == [0, 1]
    assert all(len(r["__c"]) == 4 for r in rows_cb)
    trained_err = pq_assign(
        df, "vec_id", "embedding", 4, m=2, k=2, codebook=cb
    ).agg(F.sum("err_micro")).first()[0]
    assert fixture_err > 0, "worst-case init must start with distortion"
    # each subspace cluster has radius 0.05 around its mean -> tiny err
    assert trained_err < fixture_err * 0.01


def test_pq_train_codebook_survives_empty_clusters(spark):
    """More centroids than distinct subvectors: the losing centroids
    keep their previous value (no NULL rows, no crash), and assignment
    still works downstream."""
    from storm_dynamic_spout_spark.operators.similarity import (
        pq_assign,
        pq_train_codebook,
    )

    rows = [(i, [float(i % 2), 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = pq_train_codebook(df, "vec_id", "embedding", 2, m=1, k=4, iters=3)
    got = cb.orderBy("__cid").collect()
    assert len(got) == 4
    assert all(r["__c"] is not None and len(r["__c"]) == 2 for r in got)
    err = pq_assign(df, "vec_id", "embedding", 2, m=1, k=4, codebook=cb).agg(
        F.sum("err_micro")
    ).first()[0]
    assert err == 0  # 2 distinct vectors, >=2 surviving centroids


def test_ivf_train_assign_label_free_index_is_exact_in_the_limit(spark):
    """The fully UNSUPERVISED index (k-means coarse buckets from
    ivf_train_assign — no fixture label — composed with the tuned ADC
    search) must still return exactly the brute-force L2 top-k in the
    exhaustive limit, and its buckets must partition the corpus."""
    from storm_dynamic_spout_spark.operators.similarity import (
        ivf_train_assign,
        pq_topk_ivf_adc_tuned,
    )

    e = spark.read.parquet(f"{SF}/embeddings.parquet")
    n_vecs = e.count()
    assigned = ivf_train_assign(e, "vec_id", "embedding", 64, k=6, iters=3)
    assert assigned.count() == n_vecs
    buckets = {r["assigned"] for r in assigned.select("assigned").distinct().collect()}
    assert buckets <= set(range(6)) and len(buckets) >= 2
    dfb = e.select("vec_id", "embedding").join(assigned, "vec_id")
    got = _topk_sets(
        pq_topk_ivf_adc_tuned(
            dfb,
            "vec_id",
            "embedding",
            "assigned",
            dim=64,
            query_pred=F.col("vec_id") < 8,
            k=5,
            nprobe=len(buckets),
            rerank_mult=n_vecs // 5 + 1,
        )
    )
    assert got == _topk_sets(_exact_l2_topk(e))


def test_cuped_reduces_variance_and_preserves_means(spark):
    """CUPED on a synthetic corpus where the metric is 0.8-correlated
    with the pre-period covariate: per-arm means move by at most the
    adjustment noise, total variance shrinks by ~rho^2, and a
    zero-variance covariate is a no-op (theta guard)."""
    import random

    from storm_dynamic_spout_spark.operators.experiment import (
        cuped_adjust,
        hash_arm,
    )

    rng = random.Random(7)
    rows = []
    for uid in range(2000):
        x = rng.gauss(50, 10)  # pre-period
        y = 0.8 * x + rng.gauss(0, 7.5)  # experiment metric, rho ~ 0.73
        rows.append((uid, float(x), float(y)))
    df = spark.createDataFrame(rows, "uid long, x double, y double").withColumn(
        "arm", hash_arm(F.col("uid"))
    )
    adj = cuped_adjust(df, "y", "x")
    stats = adj.agg(
        F.var_pop("y").alias("vy"),
        F.var_pop("metric_cv").alias("vcv"),
        F.avg("y").alias("my"),
        F.avg("metric_cv").alias("mcv"),
        F.corr("y", "x").alias("rho"),
    ).first()
    # variance ratio ~ 1 - rho^2
    expect = 1 - stats["rho"] ** 2
    assert stats["vcv"] / stats["vy"] < expect + 0.05
    # corpus mean is preserved EXACTLY in expectation (theta * (x - mean))
    assert abs(stats["mcv"] - stats["my"]) < 1e-6 * max(1, abs(stats["my"]))
    # arm split is deterministic and roughly balanced
    arms = {r["arm"]: r["n"] for r in df.groupBy("arm").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert set(arms) == {0, 1} and min(arms.values()) > 800

    # zero-variance covariate -> no-op
    const = spark.createDataFrame(
        [(i, 1.0, float(i)) for i in range(10)], "uid long, x double, y double"
    )
    noop = cuped_adjust(const, "y", "x").select("y", "metric_cv").collect()
    assert all(r["y"] == r["metric_cv"] for r in noop)
