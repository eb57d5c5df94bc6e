"""Round-11 operator contracts not covered by the driver oracle rows:
closed-form pins for the clustering coefficient, an independent Python
recomputation of the SES fold and the BPE pair table, and the bootstrap
CI's determinism + ordering invariants."""

from __future__ import annotations

import collections
import math

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_clustering_coefficient_closed_form(spark):
    """K3 plus a pendant edge (1-2-3 triangle, 3-4 pendant): nodes 1,2
    have degree 2 and coefficient 1.0; node 3 has degree 3 and
    coefficient 1/3; node 4 has degree 1 and is excluded."""
    from storm_dynamic_spout_spark.operators.graph import (
        degree_oriented_triangles,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4)], "a long, b long"
    )
    deg = (
        edges.select(F.col("a").alias("id"))
        .unionByName(edges.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    tcnt = (
        degree_oriented_triangles(edges)
        .select(F.explode(F.array("apex", "v", "w")).alias("id"))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    rows = {
        r["id"]: (r["degree"], r["n_triangles"])
        for r in deg.join(tcnt, "id", "left").na.fill({"n_triangles": 0}).collect()
    }
    assert rows[1] == (2, 1) and rows[2] == (2, 1)
    assert rows[3] == (3, 1)
    assert rows[4] == (1, 0)


def test_clustering_coefficient_fixture_invariants(spark):
    """On the fixture graph: every coefficient is in [0, 1], and the
    per-node triangle credits sum to exactly 3x the global triangle
    count (each triangle has three corners).  sf0.01: the sf0.001
    customer table is too sparse for any degree>=2 node."""
    sf = "/root/testdata/sf0.01"
    cc = QUERIES["graph_clustering_coefficient"](spark, sf).collect()
    assert cc, "proximity graph has no degree>=2 nodes at sf0.01?"
    for r in cc:
        assert 0.0 <= r["clustering_coeff"] <= 1.0, r
        max_tri = r["degree"] * (r["degree"] - 1) // 2
        assert r["n_triangles"] <= max_tri, r
    total = QUERIES["graph_triangle_count"](spark, sf).first()["n_triangles"]
    assert sum(r["n_triangles"] for r in cc) == 3 * total


def test_forecast_ses_matches_python_fold(spark):
    """Independent recomputation: pull the daily cents series per type
    and fold SES in plain Python — the Spark F.aggregate fold must
    match to the 1e-6 rounding."""
    daily = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.round(F.sum("value") * 100).cast("long").alias("cents"))
        .collect()
    )
    series = collections.defaultdict(list)
    for r in daily:
        series[r["event_type"]].append((r["day"], float(r["cents"])))
    expect = {}
    for et, ys in series.items():
        ys.sort()
        s = ys[0][1]
        for _, y in ys[1:]:
            s = 0.3 * y + 0.7 * s
        expect[et] = round(s * 1_000_000) / 1_000_000
    got = {
        r["event_type"]: r["ses_forecast"]
        for r in QUERIES["events_forecast_ses"](spark, SF).collect()
    }
    assert got == expect


def test_forecast_ses_constant_series_is_identity(spark, tmp_path):
    """SES of a constant series is that constant — the fold must not
    drift (catches an off-by-one in the slice/init split)."""
    import datetime

    rows = [
        (i, datetime.datetime(2024, 1, 1 + d, 12), 7, "buy", 2.5, "{}")
        for i, d in enumerate(range(9))
    ]
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = QUERIES["events_forecast_ses"](spark, str(tmp_path)).collect()
    assert len(out) == 1
    assert out[0]["n_days"] == 9
    assert out[0]["ses_forecast"] == 250.0  # 2.5 -> 250 cents


def test_bootstrap_ci_invariants_and_determinism(spark):
    """lo <= med <= hi, the point estimate sits inside the 95% CI on
    the fixture, and a rerun is bit-identical (hash-derived weights,
    no RNG state)."""
    a = QUERIES["events_bootstrap_ci"](spark, SF).first()
    b = QUERIES["events_bootstrap_ci"](spark, SF).first()
    assert a == b
    assert a["n_boot"] == 81
    assert a["boot_lo"] <= a["boot_med"] <= a["boot_hi"]
    assert a["boot_lo"] <= a["delta_hat"] <= a["boot_hi"]
    width = a["boot_hi"] - a["boot_lo"]
    assert 0 < width < 4 * max(abs(a["delta_hat"]), 1.0) + 10


def test_bootstrap_weights_are_poisson_one_like(spark):
    """The md5-derived weights must average ~1 with P(0) ~ 1/e —
    otherwise the resamples are biased and the CI is meaningless."""
    ev = spark.read.parquet(f"{SF}/events.parquet").select("event_id").limit(2000)
    e = ev.withColumn("b", F.explode(F.sequence(F.lit(1), F.lit(9)))).withColumn(
        "h",
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("event_id"), F.col("b")).cast("binary")),
                1,
                4,
            ),
            16,
            10,
        ).cast("long"),
    )
    wt = (
        F.when(F.col("h") < 24110, 0)
        .when(F.col("h") < 48220, 1)
        .when(F.col("h") < 60276, 2)
        .otherwise(3)
    )
    s = e.select(wt.alias("w")).agg(
        F.avg("w").alias("mean"), F.avg((F.col("w") == 0).cast("int")).alias("p0")
    ).first()
    assert abs(s["mean"] - 1.0) < 0.05, s
    assert abs(s["p0"] - 1 / math.e) < 0.03, s


def test_bpe_pairs_match_python_recount(spark):
    """Recount the top-20 character pairs in plain Python over the
    fixture corpus and compare exactly (count + tie-break order)."""
    texts = [
        r["text"] for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]
    counts = collections.Counter()
    import re

    for text in texts:
        for tok in re.split(r"\s+", text):
            if len(tok) >= 2:
                for i in range(len(tok) - 1):
                    counts[tok[i : i + 2]] += 1
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["pair"], r["n_occurrences"])
        for r in QUERIES["text_bpe_merge_candidates"](spark, SF).collect()
    ]
    assert got == expect


def test_holt_reproduces_exact_linear_series(spark, tmp_path):
    """A perfectly linear daily series: Holt with the standard
    l2=y2, t2=y2-y1 init tracks it exactly — level = last value,
    trend = the daily increment, forecast = last + 7*increment."""
    import datetime

    rows = [
        (d, datetime.datetime(2024, 3, 1 + d, 9), 1, "buy", 10.0 * (d + 1), "{}")
        for d in range(12)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = QUERIES["events_forecast_holt"](spark, str(tmp_path)).first()
    assert out["level"] == 12000.0  # 120.0 -> cents
    assert out["trend"] == 1000.0
    assert out["forecast_7d"] == 12000.0 + 7 * 1000.0


def test_holt_matches_python_fold(spark):
    """Independent Python recomputation of the Holt fold on the
    fixture's daily series (same init, same coupling order)."""
    daily = (
        spark.read.parquet(f"{SF}/events.parquet")
        .groupBy(
            "event_type",
            F.date_trunc("day", F.col("ts")).cast("date").alias("day"),
        )
        .agg(F.round(F.sum("value") * 100).cast("long").alias("cents"))
        .collect()
    )
    series = collections.defaultdict(list)
    for r in daily:
        series[r["event_type"]].append((r["day"], float(r["cents"])))
    a, b = 0.5, 0.4
    expect = {}
    for et, ys in series.items():
        ys.sort()
        y = [v for _, v in ys]
        lvl, tr = y[1], y[1] - y[0]
        for x in y[2:]:
            nl = a * x + (1 - a) * (lvl + tr)
            tr = b * (a * x + (1 - a) * (lvl + tr) - lvl) + (1 - b) * tr
            lvl = nl
        expect[et] = (
            round(lvl * 1e6) / 1e6,
            round(tr * 1e6) / 1e6,
            round((lvl + 7 * tr) * 1e6) / 1e6,
        )
    got = {
        r["event_type"]: (r["level"], r["trend"], r["forecast_7d"])
        for r in QUERIES["events_forecast_holt"](spark, SF).collect()
    }
    assert got == expect


def test_diff_in_diff_recovers_constructed_effect(spark, tmp_path):
    """Control emits 1.0 in both periods; treatment emits 1.0 pre and
    2.0 post -> DiD must be exactly 1.0 with a zero-width CI (all
    cells constant)."""
    import datetime

    rows = []
    for i in range(400):
        arm = i % 2  # user_id parity = arm
        period = 1 if i * 2 >= 400 else 0  # dense event_id halves
        val = 2.0 if (arm == 1 and period == 1) else 1.0
        rows.append(
            (i, datetime.datetime(2024, 5, 1 + period, 8), i % 2 + 2 * (i % 7) * 0, "x", val, "{}")
        )
    # user_id = i % 2 keeps parity == arm
    rows = [(i, ts, i % 2, et, v, p) for (i, ts, _, et, v, p) in rows]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = QUERIES["events_diff_in_diff"](spark, str(tmp_path)).first()
    assert out["did"] == 1.0
    assert out["ci_lo"] == 1.0 and out["ci_hi"] == 1.0
    assert (
        out["n_c_pre"] + out["n_c_post"] + out["n_t_pre"] + out["n_t_post"] == 400
    )


def test_diff_in_diff_fixture_invariants(spark):
    out = QUERIES["events_diff_in_diff"](spark, SF).first()
    assert out["ci_lo"] <= out["did"] <= out["ci_hi"]
    total = spark.read.parquet(f"{SF}/events.parquet").count()
    assert (
        out["n_c_pre"] + out["n_c_post"] + out["n_t_pre"] + out["n_t_post"]
        == total
    )


def test_power_mde_zero_variance_and_scaling(spark, tmp_path):
    """Constant metric -> MDE exactly 0; and quadrupling the sample
    halves the MDE (1/sqrt(n) scaling) on an alternating two-value
    metric."""
    import datetime

    def write(n, name):
        rows = [
            (i, datetime.datetime(2024, 6, 1, 7), i, "m", 5.0 if i % 4 < 2 else 7.0, "{}")
            for i in range(n)
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
        ).write.parquet(str(tmp_path / name / "events.parquet"))

    write(200, "a")
    write(800, "b")
    small = QUERIES["events_power_mde"](spark, str(tmp_path / "a")).first()
    big = QUERIES["events_power_mde"](spark, str(tmp_path / "b")).first()
    assert small["mde_abs"] > 0
    ratio = small["mde_abs"] / big["mde_abs"]
    assert abs(ratio - 2.0) < 0.05, ratio

    rows = [
        (i, datetime.datetime(2024, 6, 2, 7), i, "const", 3.0, "{}")
        for i in range(100)
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(str(tmp_path / "c" / "events.parquet"))
    const = QUERIES["events_power_mde"](spark, str(tmp_path / "c")).first()
    assert const["mde_abs"] == 0.0


def test_image_dup_clusters_collapse_variants(spark):
    """Every brightness-shifted lossless-JPEG variant (id d+100) must
    land in the SAME cluster as its PNG base d (they pair at hamming
    <= 10 by construction), every pair's endpoints must share a
    cluster, and cluster sizes must count the labeled rows exactly."""
    sf = "/root/testdata/sf0.01"
    rows = QUERIES["multimodal_image_dup_clusters"](spark, sf).collect()
    label = {r["img_id"]: r["cluster_id"] for r in rows}
    sizes = collections.Counter(label.values())
    for r in rows:
        assert r["cluster_size"] == sizes[r["cluster_id"]], r
    variants = [i for i in label if i >= 100]
    assert variants, "no variant images labeled?"
    for v in variants:
        assert label[v] == label[v - 100], (v, label[v], label[v - 100])
    pairs = QUERIES["multimodal_image_phash_pairs"](spark, sf).collect()
    for p in pairs:
        assert label[p["id_a"]] == label[p["id_b"]], p


def test_hybrid_rrf_fusion_math_and_ranks(spark):
    """hybrid_rank is a contiguous 1..20 permutation, rrf_score equals
    the closed form from the reported leg ranks, and any id retrieved
    by BOTH legs outranks an id retrieved by one leg at equal-or-worse
    positions (the monotonicity RRF exists for)."""
    rows = QUERIES["search_hybrid_rrf"](spark, SF).collect()
    assert [r["hybrid_rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) > 0
    for r in rows:
        expect = 0.0
        if r["rank_lex"] is not None:
            expect += 1.0 / (60 + r["rank_lex"])
        if r["rank_dense"] is not None:
            expect += 1.0 / (60 + r["rank_dense"])
        assert abs(r["rrf_score"] - expect) < 2e-6, r
        assert r["rank_lex"] is not None or r["rank_dense"] is not None
    both = [r for r in rows if r["rank_lex"] and r["rank_dense"]]
    one = [r for r in rows if (r["rank_lex"] is None) != (r["rank_dense"] is None)]
    for b in both:
        for s in one:
            lone = s["rank_lex"] or s["rank_dense"]
            if lone >= max(b["rank_lex"], b["rank_dense"]):
                assert b["hybrid_rank"] < s["hybrid_rank"], (b, s)


def test_ndcg_invariants(spark):
    """0 < nDCG@10 <= 1, DCG <= IDCG by construction, and IDCG equals
    a Python recomputation from the ranked pool's grades."""
    out = QUERIES["search_ndcg_eval"](spark, SF).first()
    assert out["dcg_10"] <= out["idcg_10"]
    assert 0.0 < out["ndcg_10"] <= 1.0
    pool = QUERIES["text_bm25_rank"](spark, SF).collect()
    grades = sorted((r["n_query_terms"] for r in pool), reverse=True)[:10]
    idcg = sum((2**g - 1) / (math.log(i + 2) / math.log(2)) for i, g in enumerate(grades))
    assert abs(out["idcg_10"] - idcg) < 2e-6


def test_audio_dup_clusters_collapse_variants(spark):
    """Every gain-halved clip (id d+100) must land in the SAME cluster
    as its base d, pair endpoints share a cluster, sizes count labeled
    rows exactly — the audio twin of the image dup-cluster pin."""
    sf = "/root/testdata/sf0.01"
    rows = QUERIES["multimodal_audio_dup_clusters"](spark, sf).collect()
    label = {r["clip_id"]: r["cluster_id"] for r in rows}
    sizes = collections.Counter(label.values())
    for r in rows:
        assert r["cluster_size"] == sizes[r["cluster_id"]], r
    variants = [i for i in label if i >= 100]
    assert variants, "no variant clips labeled?"
    for v in variants:
        assert label[v] == label[v - 100], (v, label[v], label[v - 100])
    pairs = QUERIES["multimodal_audio_fingerprint_pairs"](spark, sf).collect()
    for p in pairs:
        assert label[p["id_a"]] == label[p["id_b"]], p


def test_bpe_learn_merges_match_python_reference(spark):
    """Independent greedy-BPE reference: 3 merge iterations over the
    word-count table in plain Python must produce the same (pair,
    weighted count) sequence as the distributed fold."""
    texts = [
        r["text"] for r in spark.read.parquet(f"{SF}/documents.parquet").collect()
    ]
    import re

    wc = collections.Counter()
    for text in texts:
        for w in re.split(r"\s+", text):
            if len(w) >= 1:
                wc[w] += 1
    words = {w: (list(w), n) for w, n in wc.items()}
    expect = []
    for it in range(3):
        pc = collections.Counter()
        for syms, n in words.values():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += n
        (pa, pb), cnt = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expect.append((it + 1, pa, pb, cnt))
        for w, (syms, n) in words.items():
            out = [syms[0]]
            for x in syms[1:]:
                if out[-1] == pa and x == pb:
                    out[-1] = pa + pb
                else:
                    out.append(x)
            words[w] = (out, n)
    got = [
        (r["merge_rank"], r["pair_a"], r["pair_b"], r["cnt"])
        for r in QUERIES["text_bpe_learn_merges"](spark, SF).collect()
    ]
    assert got == expect


def test_sequential_readout_invariants(spark, tmp_path):
    """On a constructed corpus with a constant +2.0 treatment effect:
    cumulative |z| grows with the look index (sqrt-n), the
    O'Brien-Fleming boundary strictly DECREASES toward the horizon,
    looks are cumulative (n monotonically increasing to the corpus
    total), and the mSPRT eventually rejects the large effect."""
    import datetime

    rows = []
    for i in range(4000):
        arm = i % 2
        val = 10.0 + 2.0 * arm + (1.0 if (i // 2) % 2 else -1.0)  # sd=1 noise
        rows.append(
            (i, datetime.datetime(2024, 7, 1, 6), i % 2 + 2 * (i % 50), "m", val, "{}")
        )
    rows = [(i, ts, i % 2 + 2 * (i % 50), et, v, p) for (i, ts, _, et, v, p) in rows]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = sorted(
        QUERIES["events_ab_sequential"](spark, str(tmp_path)).collect(),
        key=lambda r: r["look"],
    )
    assert out[-1]["n_c"] + out[-1]["n_t"] == 4000
    for a, b in zip(out, out[1:]):
        assert b["n_c"] >= a["n_c"] and b["n_t"] >= a["n_t"]
        assert b["obf_bound"] < a["obf_bound"]
        assert abs(b["delta"] - 2.0) < 0.2
    assert abs(out[-1]["z_stat"]) > abs(out[0]["z_stat"])
    assert out[-1]["msprt_reject"], out[-1]


def test_stratified_readout_recovers_per_stratum_effects(spark, tmp_path):
    """Two strata with constant effects +1 and +5: per-stratum deltas
    are exact, weights are the stratum shares, and the OVERALL ATE is
    the weight-blend of the two."""
    import datetime

    rows = []
    for i in range(400):
        arm = i % 2
        stratum = "a" if i < 300 else "b"
        effect = 1.0 if stratum == "a" else 5.0
        rows.append(
            (i, datetime.datetime(2024, 7, 2, 6), i % 2, stratum, 10.0 + effect * arm, "{}")
        )
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).write.parquet(str(tmp_path / "events.parquet"))
    out = {r["stratum"]: r for r in QUERIES["events_ab_stratified"](spark, str(tmp_path)).collect()}
    assert out["a"]["delta"] == 1.0 and out["b"]["delta"] == 5.0
    assert abs(out["a"]["weight"] - 0.75) < 0.01
    assert abs(out["b"]["weight"] - 0.25) < 0.01
    blend = out["a"]["weight"] * 1.0 + out["b"]["weight"] * 5.0
    assert abs(out["OVERALL"]["delta"] - blend) < 1e-6
    # zero within-cell variance -> degenerate CI collapses onto the point
    assert out["OVERALL"]["ci_lo"] == out["OVERALL"]["ci_hi"] == round(blend, 4)
