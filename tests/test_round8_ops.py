"""Operator-level contracts for the round-8 additions, beyond the
driver oracle rows: pure-function semantics (patch tiling), statistical
correctness against an independent reference (moments, Kaplan-Meier),
and the IVF-PQ consistency relation (bucket restriction of the
unrestricted ADC scan).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


# -- patch tiling (pure) ----------------------------------------------------


def test_patch_sums_layout_and_truncation():
    import numpy as np

    from storm_dynamic_spout_spark.operators.multimodal import patch_sums

    # 5x6 gray image, patch 2: grid truncates to 2x3 full tiles
    arr = np.arange(30, dtype=np.uint8).reshape(5, 6)
    s = patch_sums(arr, 2)
    assert s.shape == (2, 3)
    assert s[0, 0] == 0 + 1 + 6 + 7
    assert s[1, 2] == 16 + 17 + 22 + 23
    # channels sum: duplicating the image as 3 channels triples sums
    rgb = np.stack([arr, arr, arr], axis=2)
    assert (patch_sums(rgb, 2) == 3 * s).all()
    # patch == image -> single tile equal to the total
    assert patch_sums(arr[:4, :4], 4)[0, 0] == arr[:4, :4].sum()


# -- mergeable moments vs an independent float reference --------------------


def test_moments_sketch_matches_numpy_reference(spark):
    import numpy as np

    rows = QUERIES["agg_moments_sketch"](spark, SF).collect()
    assert rows
    orders = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select("o_orderpriority", F.round("o_totalprice").alias("x"))
        .collect()
    )
    by_group: dict[str, list[float]] = {}
    for r in orders:
        by_group.setdefault(r["o_orderpriority"], []).append(float(r["x"]))
    for r in rows:
        xs = np.array(by_group[r["o_orderpriority"]])
        assert r["n"] == len(xs)
        mean, var = xs.mean(), xs.var()
        skew = ((xs - mean) ** 3).mean() / var**1.5
        kurt = ((xs - mean) ** 4).mean() / var**2
        # the query derives from exact integer sums; numpy accumulates
        # in float64 with different ordering — agree to ~1e-6 relative
        assert abs(r["mean_1e6"] / 1e6 - mean) < 1e-4 * max(1.0, abs(mean))
        assert abs(r["var_1e6"] / 1e6 - var) < 1e-4 * max(1.0, var)
        assert abs(r["skew_1e6"] / 1e6 - skew) < 1e-3
        assert abs(r["kurt_1e6"] / 1e6 - kurt) < 1e-3


# -- BPE pre-token counts partition the match set ----------------------------


def test_bpe_token_classes_partition_matches(spark):
    from storm_dynamic_spout_spark.catalog.llm import _BPE_PRETOKEN

    rows = QUERIES["text_token_count_bpe"](spark, SF).collect()
    assert rows
    # the query derives n_tokens as the SUM of the three class counts
    # (skipping the combined-pattern pass); this pins the identity it
    # relies on — every combined-pattern match is exactly one class
    # match — against an independent combined-pattern count
    combined = {
        r["doc_id"]: r["n"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select(
            "doc_id",
            F.size(
                F.regexp_extract_all(F.col("text"), F.lit(_BPE_PRETOKEN), F.lit(0))
            ).alias("n"),
        )
        .collect()
    }
    for r in rows:
        assert r["n_tokens"] == combined[r["doc_id"]], r
        if r["n_tokens"]:
            assert r["chars_per_token_1e6"] >= 1_000_000  # >= 1 char/token


# -- IVF-PQ == bucket-restricted ADC ----------------------------------------


def test_ivfpq_is_bucket_restricted_adc(spark):
    from storm_dynamic_spout_spark.operators.similarity import PQ_K

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    labels = {r["vec_id"]: r["label"] for r in emb.select("vec_id", "label").collect()}
    ivfpq = QUERIES["ann_topk_ivfpq"](spark, SF).collect()
    assert ivfpq
    for r in ivfpq:
        assert labels[r["neighbor_id"]] == labels[r["query_id"]], (
            "IVF must only scan the query's coarse bucket"
        )
    # the unrestricted ADC scan, filtered to the query's bucket and
    # re-ranked, must reproduce the IVF-PQ rows exactly
    from storm_dynamic_spout_spark.operators.similarity import pq_topk_adc

    adc_all = pq_topk_adc(
        emb,
        "vec_id",
        "embedding",
        dim=64,
        query_pred=F.col("vec_id") < PQ_K,
        k=10_000,
    ).collect()
    per_q: dict[int, list] = {}
    for r in adc_all:
        if labels[r["neighbor_id"]] == labels[r["query_id"]]:
            per_q.setdefault(r["query_id"], []).append(r)
    expect = set()
    for q, rs in per_q.items():
        rs.sort(key=lambda r: (r["approx_d2_micro"], r["neighbor_id"]))
        for rank, r in enumerate(rs[:5], start=1):
            expect.add((q, r["neighbor_id"], r["approx_d2_micro"], rank))
    got = {
        (r["query_id"], r["neighbor_id"], r["approx_d2_micro"], r["rank"])
        for r in ivfpq
    }
    assert got == expect


# -- Kaplan-Meier vs a driver-side reference ---------------------------------


def test_survival_km_matches_pure_python_reference(spark):
    from storm_dynamic_spout_spark.catalog.analytics import (
        _KM_US_PER_HOUR,
        _KM_WINDOW_HOURS,
    )

    rows = QUERIES["events_survival_km"](spark, SF).collect()
    assert rows
    ev = spark.read.parquet(f"{SF}/events.parquet").select(
        "user_id", "ts", "event_type"
    ).collect()
    t_min = min(r["ts"] for r in ev)
    cutoff_us = int(t_min.timestamp() * 1e6) + _KM_WINDOW_HOURS * _KM_US_PER_HOUR
    per_user: dict[int, dict] = {}
    for r in ev:
        u = per_user.setdefault(r["user_id"], {"t0": None, "tp": None})
        ts_us = int(r["ts"].timestamp() * 1e6)
        if u["t0"] is None or ts_us < u["t0"]:
            u["t0"] = ts_us
        if r["event_type"] == "purchase" and (u["tp"] is None or ts_us < u["tp"]):
            u["tp"] = ts_us
    durs = []
    for u in per_user.values():
        if u["t0"] > cutoff_us:
            continue
        if u["tp"] is not None and u["tp"] <= cutoff_us:
            durs.append(((u["tp"] - u["t0"]) // _KM_US_PER_HOUR, 1))
        else:
            durs.append(((cutoff_us - u["t0"]) // _KM_US_PER_HOUR, 0))
    # reference KM
    from collections import Counter

    hist_n: Counter = Counter()
    hist_d: Counter = Counter()
    for d, e in durs:
        hist_n[d] += 1
        hist_d[d] += e
    total = len(durs)
    seen = 0
    cum = 0
    expect = []
    for t in sorted(hist_n):
        at_risk = total - seen
        seen += hist_n[t]
        d = hist_d[t]
        if d == 0:
            continue
        if d < at_risk:
            cum += round(math.log(1.0 - d / at_risk) * 1e6)
        expect.append((t, at_risk, d, cum))
    got = [
        (r["t_hours"], r["n_at_risk"], r["d_events"], r["km_log_1e6"]) for r in rows
    ]
    assert got == expect
    # curve shape invariants
    risks = [r["n_at_risk"] for r in rows]
    assert risks == sorted(risks, reverse=True)
    logs = [r["km_log_1e6"] for r in rows if r["km_log_1e6"] is not None]
    assert logs == sorted(logs, reverse=True)


# -- degenerate inputs: empty frames must flow through, never crash ---------


def test_round8_operators_on_empty_inputs(spark):
    import numpy as np

    from storm_dynamic_spout_spark.operators.multimodal import patch_sums
    from storm_dynamic_spout_spark.operators.similarity import (
        pq_assign,
        pq_topk_adc,
        pq_topk_ivf_adc,
    )

    # PQ on an empty corpus: empty codebook + empty codes, no NPE
    empty_vec = spark.createDataFrame(
        [], "vec_id long, embedding array<double>, label int"
    )
    assert pq_assign(empty_vec, "vec_id", "embedding", dim=8, m=4, k=8).count() == 0
    assert (
        pq_topk_adc(
            empty_vec, "vec_id", "embedding", dim=8,
            query_pred=F.col("vec_id") < 8, k=3, m=4, kc=8,
        ).count()
        == 0
    )
    assert (
        pq_topk_ivf_adc(
            empty_vec, "vec_id", "embedding", "label", dim=8,
            query_pred=F.col("vec_id") < 8, k=3, m=4, kc=8,
        ).count()
        == 0
    )
    # patch grid smaller than one tile -> zero rows, not an error
    assert patch_sums(np.zeros((3, 3), dtype=np.uint8), 4).size == 0


def test_lpa_trivial_graphs(spark):
    """LPA endpoints through the SHARED operator (the catalog query
    uses the same code): a clique converges to its min label; two
    disjoint edges keep two communities.  Also the regression pin for
    the ambiguous self-join the operator's internal checkpoint severs
    — an unchecked sym/labels lineage misresolves round-2 joins."""
    from storm_dynamic_spout_spark.operators.graph import lpa_labels

    def lpa(edge_rows):
        edges = spark.createDataFrame(edge_rows, "a long, b long")
        return {
            r["node"]: r["lbl"] for r in lpa_labels(edges, "a", "b", 3).collect()
        }

    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    assert set(lpa(clique).values()) == {1}
    two = lpa([(1, 2), (10, 11)])
    assert two[1] == two[2] and two[10] == two[11] and two[1] != two[10]


# -- composed pipeline (examples/training_pipeline_demo.py) ------------------


def test_training_pipeline_composes_and_filters_monotonically(spark):
    """The end-to-end demo pipeline (exact dedup -> near-dup CC ->
    quality gate -> packing -> manifest) must compose library operators
    into consistent outputs: counts shrink monotonically, every kept
    doc survives dedup, packing offsets are contiguous per stream, and
    the manifest order is a permutation of the kept set."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "training_pipeline_demo",
        os.path.join(
            os.path.dirname(__file__), "..", "examples", "training_pipeline_demo.py"
        ),
    )
    demo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(demo)

    deduped, kept, packed, manifest = demo.build_pipeline(spark, SF)
    n_in = spark.read.parquet(f"{SF}/documents.parquet").count()
    n_dedup, n_kept = deduped.count(), kept.count()
    assert n_in >= n_dedup >= n_kept > 0
    kept_ids = {r["doc_id"] for r in kept.select("doc_id").collect()}
    dedup_ids = {r["doc_id"] for r in deduped.select("doc_id").collect()}
    assert kept_ids <= dedup_ids
    # packing: per stream, offsets are the prefix sums of token counts
    rows = packed.orderBy("lang", "doc_id").collect()
    by_stream: dict[str, int] = {}
    for r in rows:
        assert r["start_offset"] == by_stream.get(r["lang"], 0)
        by_stream[r["lang"]] = r["start_offset"] + r["n_tokens"]
        assert r["n_seqs"] >= 1
    assert {r["doc_id"] for r in rows} == kept_ids
    man = manifest.collect()
    assert {r["doc_id"] for r in man} == kept_ids
    keys = [r["shuffle_key"] for r in man]
    assert keys == sorted(keys)
