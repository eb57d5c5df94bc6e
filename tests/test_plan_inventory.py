"""Plan-shape inventory diff: every catalog query's physical-plan
operator counts (shuffles, join strategies, cartesians, Python nodes,
scans) must match the checked-in PLAN_INVENTORY.json — a silent plan
regression (dim stops broadcasting, join degrades to a nested loop,
Python sneaks onto a relational path) fails here even though results
stay correct.  Regenerate with `python tools/plan_inventory.py` and
review the diff when a plan change is intentional."""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from storm_dynamic_spout_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"
INVENTORY_PATH = Path(__file__).resolve().parent.parent / "PLAN_INVENTORY.json"


def _load() -> dict[str, dict[str, int]]:
    with open(INVENTORY_PATH) as fh:
        return json.load(fh)


def test_inventory_covers_exactly_the_registered_queries():
    inv = _load()
    assert set(inv) == set(QUERIES), (
        "PLAN_INVENTORY.json out of sync with the registry — run "
        "`python tools/plan_inventory.py`.  "
        f"missing={sorted(set(QUERIES) - set(inv))} "
        f"stale={sorted(set(inv) - set(QUERIES))}"
    )


def test_every_query_plan_matches_inventory(spark):
    from tools.plan_inventory import plan_counts

    inv = _load()
    mismatches = []
    for name, fn in QUERIES.items():
        got = plan_counts(fn(spark, SF))
        if got != inv[name]:
            mismatches.append((name, inv[name], got))
    assert not mismatches, (
        "plan shapes drifted from PLAN_INVENTORY.json (stored vs live):\n"
        + "\n".join(f"  {n}: {a} -> {b}" for n, a, b in mismatches)
        + "\nif intentional: python tools/plan_inventory.py"
    )


def test_inventory_global_invariants():
    """Cross-cutting scale rules over the stored inventory: cartesian
    products appear ONLY where declared (the explicit cross-join
    operator and the broadcast one-row scalar-subquery pattern), and
    Python nodes only on the declared Arrow-UDF surface."""
    inv = _load()
    allowed_cartesian = {"join_cross"}
    cartesian = {n for n, c in inv.items() if c["cartesian_products"] > 0}
    assert cartesian <= allowed_cartesian, (
        f"unexpected cartesian products: {sorted(cartesian - allowed_cartesian)}"
    )
    allowed_python = {
        "udf_pandas_scalar",
        "udaf_apply_in_pandas",
        "udtf_split_tokens",
        # multimodal decode: pandas_udf payload gen + mapInPandas codec —
        # the declared Arrow surface (binary columns can't be decoded
        # JVM-side)
        "multimodal_image_stats",
        "multimodal_audio_stats",
        "multimodal_video_stats",
        "multimodal_image_phash_pairs",
        "multimodal_audio_fingerprint_pairs",
        "multimodal_video_containment",
        "multimodal_image_resize",
        "multimodal_audio_resample",
        "multimodal_audio_silence_trim",
        "multimodal_image_sobel",
        # two-pass heavy hitters: the per-partition Misra-Gries
        # candidate pass is the declared O(k)-state Arrow surface; the
        # exact verify pass is pure relational
        "text_heavy_hitters",
        # ViT patch tokenization: decode + tiling on the declared
        # multimodal Arrow surface (r8)
        "multimodal_image_patches",
        # fixed-rate frame sampler: container walk + JPEG decode on the
        # declared multimodal Arrow surface (r9)
        "multimodal_video_frame_sample",
        # pHash/fingerprint pairs -> star-contraction clusters: same
        # decode stages as the pair queries (r11)
        "multimodal_image_dup_clusters",
        "multimodal_audio_dup_clusters",
        # vocab-scale BPE encode: the heap-scheduled Arrow mapInPandas
        # encoder over the distinct-word table (r15 — the declared
        # tokenizer Arrow surface, per-word cost independent of the
        # merge-table size)
        "text_bpe_encode_vocab",
    }
    python = {n for n, c in inv.items() if c["python_nodes"] > 0}
    assert python <= allowed_python, (
        f"Python nodes on unexpected plans: {sorted(python - allowed_python)}"
    )
    # single-partition (unpartitioned) windows move the whole input to
    # one task — the r5 verdict's scale-killer class, extinct since r6
    # outside two audited tiny/bounded cases:
    #  - events_top_paths: WindowGroupLimit prunes to top-k per
    #    partition first and the rank is part of the output contract
    #  - corpus_token_budget: a <=20-row bucket-offset prefix sum over
    #    a post-aggregation table
    #  - events_cumulative_users: a ≤|calendar days|-row running sum
    #    over the post-aggregation daily new-user table
    #  - parts_abc_pareto: a ~40-row log-band offset prefix sum (the
    #    corpus_token_budget decomposition over revenue bands)
    allowed_global_window = {
        "events_top_paths",
        "corpus_token_budget",
        "events_cumulative_users",
        "parts_abc_pareto",
        # ≤~40-row log2-band count prefix sum (banded Zipf rank)
        "text_zipf_fit",
        # ≤PQ_K(=8)-row codebook dense re-index (row_number over the
        # broadcast-side centroid table — never over the corpus); the
        # r8 fix for positional ADC lookups on non-contiguous ids
        "embedding_pq_codes",
        "ann_topk_pq",
        "ann_topk_pq_rerank",
        "ann_topk_ivfpq",
        # Kaplan-Meier: two prefix sums over the duration HISTOGRAM,
        # bounded by the observation window in hours (≤ ~240 rows),
        # the events_cumulative_users post-aggregation class
        "events_survival_km",
        # rank assignment over the two ≤RRF_POOL(=50)-row post-
        # TakeOrderedAndProject candidate pools and their ≤100-row
        # fusion — the corpus never enters a window (r11)
        "search_hybrid_rrf",
        # rank + ideal-rank over the ≤BM25_TOP(=20)-row retrieved pool
        # (r11)
        "search_ndcg_eval",
        # rank over the ≤_BPE_APPLY_TOP(=15)-row post-
        # TakeOrderedAndProject token pool (r13; r15 adds the Arrow
        # encode twin with the identical output contract)
        "text_bpe_apply",
        "text_bpe_encode_vocab",
    }
    gw = {n for n, c in inv.items() if c.get("unpartitioned_windows", 0) > 0}
    assert gw <= allowed_global_window, (
        f"unpartitioned windows on unexpected plans: "
        f"{sorted(gw - allowed_global_window)}"
    )


@pytest.mark.parametrize("family_prefix,max_exchanges", [("scalar_", 2)])
def test_scalar_family_stays_near_shuffle_free(family_prefix, max_exchanges):
    """Scalar-function queries are map-side work; at most a closing
    agg + sort pair of exchanges (scalar_json_schema's shape) — more
    is a regression."""
    inv = _load()
    offenders = {
        n: c["exchanges"]
        for n, c in inv.items()
        if n.startswith(family_prefix) and c["exchanges"] > max_exchanges
    }
    assert not offenders, f"scalar queries with extra shuffles: {offenders}"
