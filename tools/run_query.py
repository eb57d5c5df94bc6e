"""Run any catalog query from the command line.

    python tools/run_query.py q1_pricing_summary
    python tools/run_query.py dedup_minhash_pairs --sf-dir /root/testdata/sf0.01 --limit 5
    python tools/run_query.py tpch_q5 --explain
    python tools/run_query.py --list

The engine-user's entry point for ad-hoc runs: builds the standard
engine session, executes the named query against the given fixture
directory, prints rows (bounded by --limit) and, with --explain, the
formatted physical plan — the same surface the driver contract and
bench exercise.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="catalog query name")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--limit", type=int, default=20, help="rows to show")
    ap.add_argument("--explain", action="store_true", help="print the physical plan")
    ap.add_argument("--list", action="store_true", help="list query names and exit")
    ap.add_argument("--cpus", default="8")
    args = ap.parse_args()

    from storm_dynamic_spout_spark.queries import QUERIES

    if args.list or not args.name:
        for n in QUERIES:
            print(n)
        return
    if args.name not in QUERIES:
        import difflib

        near = difflib.get_close_matches(args.name, QUERIES, n=5)
        raise SystemExit(f"unknown query {args.name!r}; did you mean: {near}")

    from storm_dynamic_spout_spark.engine import EngineConfig, build_session

    spark = build_session(
        EngineConfig(
            {
                "spark.master": f"local[{args.cpus}]",
                "spark.shuffle_partitions": int(args.cpus),
            }
        )
    )
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.perf_counter()
    df = QUERIES[args.name](spark, args.sf_dir)
    n = df.count()
    elapsed = time.perf_counter() - t0
    if args.explain:
        df.explain("formatted")
    # display-only second job: limit pushes down, never a full rerun cost
    df.limit(args.limit).show(truncate=False)
    print(f"{args.name}: {n} rows in {elapsed:.2f}s (showing {min(args.limit, n)})")
    spark.stop()


if __name__ == "__main__":
    main()
