"""Plan audits that go beyond PLAN_INVENTORY's operator counts:

1. **Unpartitioned windows**: a `windowspecdefinition(` whose first
   argument is an ordering spec (carries ASC/DESC) means the window has
   NO partition keys — the whole input moves to one partition.  The r5
   verdict found two of these (text_term_freq, orders_rfm, both since
   replanned); this audit keeps the class extinct.  Known-benign:
   `events_top_paths` (WindowGroupLimit prunes to top-k per partition
   first, and the rank is part of the output contract) and the tiny
   plan-guarded bucket-offset windows (≤ bucket-count rows).

2. **Driver-side collects**: catalog builders must stay lazy; any
   `.collect()`/`.toPandas()` in catalog code is flagged at the source
   level by tests/test_plan_guards.py
   `test_catalog_source_has_no_driver_collects` (r8 verdict item 2
   closed the last exception — stream_heavy_hitters now folds
   relationally via operators/sketch.py `mg_truncate`).

    python tools/plan_audit.py            # audit every catalog query
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

#: global windows that are deliberate and bounded (see module docstring)
KNOWN_BENIGN = {
    "events_top_paths",
    "corpus_token_budget",
    # ≤|calendar days|-row running sum over the post-aggregation daily
    # new-user table (see tests/test_plan_inventory.py whitelist)
    "events_cumulative_users",
    # ~40-row log-band offset prefix sum (the corpus_token_budget
    # decomposition applied to revenue bands)
    "parts_abc_pareto",
    # ≤~40-row log2-frequency band-count prefix sum (same banded-rank
    # decomposition, applied to the Zipf vocabulary rank)
    "text_zipf_fit",
    # ≤PQ_K(=8)-row codebook dense re-index (row_number over the
    # broadcast-side centroid table, never the corpus) — the r8 fix for
    # positional ADC lookups on non-contiguous ids
    "embedding_pq_codes",
    "ann_topk_pq",
    "ann_topk_pq_rerank",
    "ann_topk_ivfpq",
    # Kaplan-Meier prefix sums over the ≤~240-row duration histogram
    # (post-aggregation, bounded by the observation window)
    "events_survival_km",
    # rank assignment over the two ≤RRF_POOL(=50)-row post-
    # TakeOrderedAndProject candidate pools and their ≤100-row fusion —
    # the corpus never enters a window (r11)
    "search_hybrid_rrf",
    # rank + ideal-rank over the ≤BM25_TOP(=20)-row retrieved pool (r11)
    "search_ndcg_eval",
    # rank over the ≤_BPE_APPLY_TOP(=15)-row post-TakeOrderedAndProject
    # token pool (r13; r15 adds the Arrow encode twin with the
    # identical output contract)
    "text_bpe_apply",
    "text_bpe_encode_vocab",
}


def main() -> int:
    from storm_dynamic_spout_spark.engine import EngineConfig, build_session
    from storm_dynamic_spout_spark.queries import QUERIES

    spark = build_session(
        EngineConfig({"spark.master": "local[8]", "spark.shuffle_partitions": 8})
    )
    spark.sparkContext.setLogLevel("ERROR")
    offenders: list[tuple[str, str]] = []
    errors: list[str] = []
    for name, fn in QUERIES.items():
        try:
            s = fn(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001
            print(f"{name} ERROR: {e!r}"[:160])
            errors.append(name)
            continue
        if name in KNOWN_BENIGN:
            continue
        for line in s.splitlines():
            if "windowspecdefinition(" not in line:
                continue
            # check EVERY window in the plan — composite queries carry
            # several, and only auditing the first misses later ones
            for frag in line.split("windowspecdefinition(")[1:]:
                first_arg = frag.split(",", 1)[0]
                if " ASC" in first_arg or " DESC" in first_arg:
                    offenders.append((name, line.strip()[:140]))
                    break
            else:
                continue
            break
    for n, line in offenders:
        print(f"GLOBAL-WINDOW {n}: {line}")
    print(
        f"audited {len(QUERIES)} queries; offenders: {len(offenders)};"
        f" build errors: {len(errors)}"
    )
    spark.stop()
    # a query that cannot even be planned must fail the audit too
    return 1 if offenders or errors else 0


if __name__ == "__main__":
    raise SystemExit(main())
