"""Full-catalog correctness sweep: every registered query vs its DuckDB
oracle at a given scale factor — the local emulation of the driver's
CORRECTNESS gate, over ALL queries instead of the driver's ~50-slot
window.

    python tools/sweep.py                    # sf0.01, all queries
    python tools/sweep.py --sf-dir /root/testdata/sf0.001
    python tools/sweep.py --only multimodal_image_stats orders_rfm

Exit code 0 iff MISMATCHES is empty.  ~18 min for the full catalog at
sf0.01 on local[16]; composite/iterative queries (corpus_dedup_funnel,
dedup_cluster_assignment) are the slowest rows at ~10-15 s each.
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--only", nargs="*", help="subset of query names")
    args = ap.parse_args()

    import duckdb

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

    import __spark_entry__ as E

    con = duckdb.connect()
    tables = "region nation customer supplier part orders lineitem events documents embeddings"
    for t in tables.split():
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{args.sf_dir}/{t}.parquet')"
        )
    qs, osql = E.queries(), E.oracle_sql()
    # accept both space- and comma-separated --only lists
    only = [n for chunk in (args.only or []) for n in chunk.split(",") if n]
    names = only or list(qs)
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}")
        return 2
    bad: list[str] = []
    for name in names:
        t0 = time.time()
        try:
            sdf = qs[name](spark, args.sf_dir)
            if name not in osql:
                print(f"{name} rows-only: {sdf.count()}", flush=True)
                continue
            srows = sorted(
                tuple(round(v, 6) if isinstance(v, float) else str(v) for v in r)
                for r in sdf.collect()
            )
            drows = sorted(
                tuple(round(v, 6) if isinstance(v, float) else str(v) for v in r)
                for r in con.execute(osql[name]).fetchall()
            )
            ok = srows == drows
        except Exception as e:  # noqa: BLE001 — report and continue the sweep
            ok = False
            print(f"{name} ERROR: {e!r}"[:200], flush=True)
        print(f"{name} match: {ok} {time.time() - t0:.1f}s", flush=True)
        if not ok:
            bad.append(name)
    print("MISMATCHES:", bad, flush=True)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
