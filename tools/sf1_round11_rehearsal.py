"""sf1-equivalent rehearsal for the round-10/11 catalog additions
(r10 verdict item 6): run the whitening / curriculum / compaction /
A/B-readout queries against 10x-sf0.1 tables and record wall ratios +
sanity invariants into SCALE_SF1.md (appended section).

    python tools/sf1_round11_rehearsal.py

Recipe (same as tools/sf1_rehearsal.py): each scaled table is N
id-shifted copies of its sf0.1 parquet written to a temp dir; the
untouched tables are symlinked so every catalog query finds its full
sf_dir.  Shifts are chosen so the semantics scale the intended way:

- documents: plain id shift — the quality distribution is identical
  per copy, so the curriculum quartile CUTS must be (near-)invariant
  while each bucket gets ~10x members.
- embeddings: vec_id shift of 10k per copy (sf0.1 base ids top out at
  2000, so each copy's band is collision-free with ~5x headroom; bump
  the stride if a larger base ever exceeds 10k ids) keeps every new
  id above ANN_QUERY_MAX_ID — the query panel stays the fixed copy-0
  set while
  the corpus scan grows 10x; a circular dimension shift decorrelates
  copies (whitening mu/sd then genuinely re-estimates, it does not
  just see 10 identical samples).
- orders: o_orderkey shift — per-month file manifests grow 10x, so
  the compaction prefix-sum window sees 10x rows per partition and
  group counts must grow ~10x at fixed fill factor.
- events: event_id/user_id shifts — both A/B assignment hashes see
  10x fresh units; z-statistics should GROW ~sqrt(10) under the
  fixture's real effect while the SRM chi-square stays under its
  critical value (balanced assignment is scale-invariant).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402

from storm_dynamic_spout_spark.engine import (  # noqa: E402
    EngineConfig,
    build_session,
    load_table,
)

SF01 = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = int(os.environ.get("SF1_COPIES", "10"))
ALL_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

TARGETS = [
    "embedding_whitening",
    "embedding_whitened_topk",
    "corpus_curriculum_order",
    "table_compaction_plan",
    "events_ab_sequential",
    "events_ab_stratified",
]

#: SF1_TARGETS=a,b,c runs an EXTENSION pass instead: only those
#: queries, a distinct section title, and no invariant legs (they are
#: specific to the base TARGETS).  Used for the late-round-11
#: additions without duplicating the committed base section.
_EXTRA = [s for s in os.environ.get("SF1_TARGETS", "").split(",") if s]
if _EXTRA:
    TARGETS = _EXTRA


def _scaled_documents(spark):
    base = load_table(spark, SF01, "documents")
    out = None
    for i in range(COPIES):
        c = base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000_000))
        out = c if out is None else out.unionByName(c)
    return out


def _scaled_embeddings(spark):
    base = load_table(spark, SF01, "embeddings")
    dim = len(base.select("embedding").first()[0])
    out = None
    for i in range(COPIES):
        shift = i % dim
        # 10k shift keeps every non-copy-0 id above ANN_QUERY_MAX_ID:
        # the query panel is pinned while the corpus grows
        c = base.withColumn("vec_id", F.col("vec_id") + F.lit(i * 10_000))
        if shift:
            # circular dimension shift: same global component pool, so
            # whitening stats stay finite, but copies decorrelate
            c = c.withColumn(
                "embedding",
                F.concat(
                    F.slice("embedding", shift + 1, dim - shift),
                    F.slice("embedding", 1, shift),
                ),
            )
        out = c if out is None else out.unionByName(c)
    return out


def _scaled_orders(spark):
    base = load_table(spark, SF01, "orders")
    out = None
    for i in range(COPIES):
        c = base.withColumn(
            "o_orderkey", F.col("o_orderkey") + F.lit(i * 1_000_000)
        )
        out = c if out is None else out.unionByName(c)
    return out


def _scaled_events(spark):
    base = load_table(spark, SF01, "events")
    out = None
    for i in range(COPIES):
        # event_id stays DENSE (0..N*100k): the sequential look
        # assignment floor(event_id*K/n) needs a dense arrival index.
        # user_id shift is EVEN so identity-mod arm parity is preserved
        # per copy (same per-copy effect; z should grow ~sqrt(copies)).
        c = base.withColumn(
            "event_id", F.col("event_id") + F.lit(i * 100_000)
        ).withColumn("user_id", F.col("user_id") + F.lit(i * 10_000))
        out = c if out is None else out.unionByName(c)
    return out


def main() -> int:
    from storm_dynamic_spout_spark.queries import QUERIES as CATALOG

    spark = build_session(
        EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="sf1r11-")
    scaled = {
        "documents": _scaled_documents,
        "embeddings": _scaled_embeddings,
        "orders": _scaled_orders,
        "events": _scaled_events,
    }
    for t in ALL_TABLES:
        dst = os.path.join(tmp, f"{t}.parquet")
        if t in scaled:
            scaled[t](spark).write.mode("overwrite").parquet(dst)
        else:
            os.symlink(os.path.join(SF01, f"{t}.parquet"), dst)
    print(f"built {COPIES}x tables in {tmp}")

    title = (
        "## sf1-equivalent rehearsal — round-11 late additions "
        "(extension run: " + ", ".join(TARGETS) + ")"
        if _EXTRA
        else "## sf1-equivalent rehearsal — round-10/11 additions "
        "(whitening / curriculum / compaction / A-B readouts)"
    )
    report = [
        "",
        title,
        "",
        f"Corpus: {COPIES}x sf0.1 (documents 50k, embeddings 20k, orders 1.5M,",
        "events 1M; id-shifted copies, embeddings circularly dim-shifted so",
        "copies decorrelate; query panel fixed in copy 0).  Built by",
        "tools/sf1_round11_rehearsal.py.",
        "",
    ]
    failures = []

    for name in TARGETS:
        fn = CATALOG[name]
        t0 = time.time()
        rows_1x = fn(spark, SF01).count()
        t_1x = time.time() - t0
        t0 = time.time()
        df_nx = fn(spark, tmp)
        rows_nx = df_nx.count()
        t_nx = time.time() - t0
        ratio = t_nx / max(t_1x, 1e-9)
        verdict = "SUB-LINEAR (pass)" if ratio <= COPIES else "SUPER-LINEAR (FAIL)"
        if ratio > COPIES:
            failures.append(name)
        report.append(
            f"- {name} @ {COPIES}x: {t_nx:.1f}s vs {t_1x:.1f}s at 1x = "
            f"{ratio:.1f}x wall for {COPIES}x data -> {verdict}; "
            f"rows {rows_1x} -> {rows_nx}"
        )
        print(report[-1])

    # invariant legs (base TARGETS only) ---------------------------------
    if _EXTRA:
        Path(__file__).resolve().parent.parent.joinpath("SCALE_SF1.md").open(
            "a"
        ).write("\n".join(report) + "\n")
        print("appended SCALE_SF1.md (extension run)")
        if failures:
            print("FAILURES:", failures)
            return 1
        return 0

    cur_fn = CATALOG["corpus_curriculum_order"]
    b1 = {
        r["bucket"]: r["n"]
        for r in cur_fn(spark, SF01).groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    bn = {
        r["bucket"]: r["n"]
        for r in cur_fn(spark, tmp).groupBy("bucket").agg(F.count("*").alias("n")).collect()
    }
    growth = {k: round(bn[k] / b1[k], 2) for k in sorted(b1)}
    ok = all(8.0 <= g <= 12.0 for g in growth.values())
    report.append(
        f"- curriculum bucket populations grow per-bucket {growth} "
        f"(identical per-copy quality distribution -> each quartile ~{COPIES}x) "
        f"-> {'pass' if ok else 'FAIL'}"
    )
    if not ok:
        failures.append("curriculum_bucket_growth")
    print(report[-1])

    comp_fn = CATALOG["table_compaction_plan"]
    g1 = comp_fn(spark, SF01).agg(
        F.sum("n_groups").alias("g"), F.avg("avg_fill").alias("f")
    ).first()
    gn = comp_fn(spark, tmp).agg(
        F.sum("n_groups").alias("g"), F.avg("avg_fill").alias("f")
    ).first()
    gr = gn["g"] / g1["g"]
    ok = 9.0 <= gr <= 11.0 and abs(gn["f"] - g1["f"]) < 0.2
    report.append(
        f"- compaction groups {g1['g']} -> {gn['g']} ({gr:.2f}x at fixed "
        f"target size; fill factor {g1['f']:.3f} -> {gn['f']:.3f}) -> "
        f"{'LINEAR-IN-FILES (pass)' if ok else 'FAIL'}"
    )
    if not ok:
        failures.append("compaction_group_growth")
    print(report[-1])

    # The comparable statistic across scales is the FINAL-look z: the
    # scaled corpus is k identical copies, so the horizon delta is the
    # 1x delta while its standard error shrinks sqrt(copies) — z(K)
    # must scale by ~sqrt(copies) exactly.  (Max-over-looks is NOT
    # comparable: at 1x it is a random-walk max over intra-copy
    # slices; at 10x the look boundaries align with copies.)
    seq_fn = CATALOG["events_ab_sequential"]

    def _final_z(d):
        df = seq_fn(spark, d)
        last = df.orderBy(F.desc("look")).limit(1).first()
        return abs(last["z_stat"])

    z1, znx = _final_z(SF01), _final_z(tmp)
    expect = z1 * COPIES ** 0.5
    ok = abs(znx - expect) <= 0.15 * max(expect, 0.1)
    report.append(
        f"- sequential A/B final-look |z| {z1:.3f} at 1x -> {znx:.3f} at "
        f"{COPIES}x (identical-copy replication: expected "
        f"sqrt({COPIES})*z1 = {expect:.3f}) -> "
        f"{'SQRT-N SCALING (pass)' if ok else 'FAIL'}"
    )
    if not ok:
        failures.append("sequential_z_scaling")
    print(report[-1])

    Path(__file__).resolve().parent.parent.joinpath("SCALE_SF1.md").open("a").write(
        "\n".join(report) + "\n"
    )
    print("appended SCALE_SF1.md")
    if failures:
        print("FAILURES:", failures)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
