"""Runnable walkthrough of the engine's flagship capability: sidelining.

    python examples/sideline_demo.py

Reproduces the reference's canonical E2E narrative
(SidelineSpoutTest.java:114-204) on a file-backed topic: live flow →
START (tenant filtered out) → RESUME (parallel replay) → RESOLVE
(bounded drain) → live flow restored — printing the observable state
at each step.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from storm_dynamic_spout_spark.engine import EngineConfig, build_session
from storm_dynamic_spout_spark.streaming.app import DynamicStreamApp


def show(app: DynamicStreamApp, step: str) -> None:
    rows = sorted(
        (r["route_id"], r["key"], r["value"]) for r in app.output().collect()
    )
    print(f"\n== {step}")
    for route, key, value in rows:
        print(f"   {route:<14} {key:<10} {value}")


def main() -> None:
    spark = build_session(
        EngineConfig({"spark.master": "local[4]", "spark.shuffle_partitions": 4})
    )
    spark.sparkContext.setLogLevel("ERROR")
    workdir = tempfile.mkdtemp(prefix="sideline_demo_")
    app = DynamicStreamApp(spark, os.path.join(workdir, "topic"), workdir)

    print("1. produce 3 records, start the engine — all flow live")
    app.produce([("tenant-x", "x1"), ("tenant-a", "a1"), ("tenant-b", "b1")])
    app.open()
    app.process_all_available()
    show(app, "live flow")

    print("\n2. START sideline for tenant-x — its records stop flowing")
    app.sideline_start("demo", "key = 'tenant-x'")
    app.produce([("tenant-x", "x2"), ("tenant-x", "x3"), ("tenant-a", "a2")])
    app.process_all_available()
    show(app, "after START (x2, x3 withheld)")

    print("\n3. RESUME + RESOLVE — parallel replay drains exactly the skipped window")
    app.sideline_resume("demo")
    app.sideline_resolve("demo")
    replayed = app.run_replay("demo")
    print(f"   replayed {replayed} records")
    show(app, "after replay")

    print("\n4. live flow for tenant-x restored")
    app.produce([("tenant-x", "x4")])
    app.process_all_available()
    show(app, "after RESOLVE")

    print("\nper-partition firehose progress:")
    for p, prog in sorted(app.progress().items()):
        print(f"   partition {p}: processed={prog.total_processed} "
              f"lag={app.lag()[p]}")
    app.close()
    spark.stop()
    print("\nDemo complete. State dir:", workdir)


if __name__ == "__main__":
    main()
