"""Generate PLAN_INVENTORY.json: physical-plan shape counts for every
catalog query.

    python tools/plan_inventory.py            # regenerate the inventory

Each query's plan is reduced to the operator counts that matter at
100 TB — shuffles, join strategies, cartesian products, Python
evaluation nodes, file scans.  `tests/test_plan_inventory.py` diffs
live plans against this file, so ANY silent plan regression (a dim
that stops broadcasting, a filter that stops pushing down and turns a
hash join into a nested loop, a Python node sneaking onto a relational
path) fails CI even though results stay correct.  Regenerate + review
the diff when a plan change is intentional.
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")

#: Substring → inventory key.  Counted on the executedPlan string of
#: each catalog DataFrame (initial AQE plan — deterministic, no
#: execution needed).
MARKERS = {
    "exchanges": "Exchange",
    "broadcast_hash_joins": "BroadcastHashJoin",
    "sort_merge_joins": "SortMergeJoin",
    "shuffled_hash_joins": "ShuffledHashJoin",
    "nested_loop_joins": "BroadcastNestedLoopJoin",
    "cartesian_products": "CartesianProduct",
    # "Python" alone misses the Arrow-surface nodes whose names say
    # InPandas/InArrow instead (FlatMapGroupsInPandas, MapInPandas,
    # FlatMapGroupsInPandasWithState, MapInArrow) — the r5 verdict's
    # blind spot.  The three markers are disjoint: *EvalPython* and
    # PythonUDTF contain "Python", the pandas nodes contain "InPandas",
    # mapInArrow contains "InArrow"; no node name matches two.
    "python_nodes": ("Python", "InPandas", "InArrow"),
    "file_scans": "FileScan",
    # a WindowGroupLimit disappearing = top-k rows materializing past the
    # sort again; a ReusedExchange disappearing = a shared subplan being
    # recomputed — both silent de-optimizations worth diffing
    "window_group_limits": "WindowGroupLimit",
    "reused_exchanges": "ReusedExchange",
}


def _unpartitioned_windows(s: str) -> int:
    """Count windowspecdefinition(...) whose FIRST argument is an
    ordering spec (carries ASC/DESC) — i.e. no partition keys, so the
    whole input moves to one partition.  The r5 verdict's scale-killer
    class (text_term_freq, orders_rfm); keeping this in the inventory
    makes any regression a CI diff, not a manual-audit find."""
    n = 0
    for frag in s.split("windowspecdefinition(")[1:]:
        first_arg = frag.split(",", 1)[0]
        if " ASC" in first_arg or " DESC" in first_arg:
            n += 1
    return n


def plan_counts(df) -> dict[str, int]:
    s = df._jdf.queryExecution().executedPlan().toString()
    out = {
        key: (
            sum(s.count(m) for m in marker)
            if isinstance(marker, tuple)
            else s.count(marker)
        )
        for key, marker in MARKERS.items()
    }
    out["unpartitioned_windows"] = _unpartitioned_windows(s)
    return out


def main() -> None:
    from storm_dynamic_spout_spark.engine import EngineConfig, build_session
    from storm_dynamic_spout_spark.queries import QUERIES

    spark = build_session(
        EngineConfig({"spark.master": "local[8]", "spark.shuffle_partitions": 8})
    )
    spark.sparkContext.setLogLevel("ERROR")
    inventory: dict[str, dict[str, int]] = {}
    for name, fn in QUERIES.items():
        inventory[name] = plan_counts(fn(spark, SF_DIR))
        print(f"{name}: {inventory[name]}")
    out = Path(__file__).resolve().parent.parent / "PLAN_INVENTORY.json"
    with open(out, "w") as fh:
        json.dump(inventory, fh, indent=1, sort_keys=True)
        fh.write("\n")
    print(f"\nwrote {out} ({len(inventory)} queries)")
    spark.stop()


if __name__ == "__main__":
    main()
