"""sf1-equivalent rehearsal for the round-11 additions that had no
SCALE_SF1.md rows (r11 verdict item 5): graph_clustering_coefficient,
text_bpe_learn_merges, and the two multimodal dup-cluster closers.

    python tools/sf1_round12_rehearsal.py

Two kinds of legs, because the queries scale differently BY DESIGN:

- **Corpus-scaled** (clustering coefficient, BPE training): the input
  table the query reads (customer / documents) is rebuilt at 10x with
  shifted keys, so the graph is 10 disjoint replicas and the word table
  keeps identical words at 10x counts.  Expect wall <= 10x; for BPE the
  LEARNED MERGES must be IDENTICAL (scale-invariant statistics — the
  merge ranking depends on relative pair counts only).
- **Panel-pinned + pipeline-scaled** (image/audio dup clusters): the
  catalog queries fix their decode panel by doc_id predicate, so a 10x
  documents table is pruned at the scan — the catalog leg records that
  the result is IDENTICAL and the wall flat.  The scale question that
  matters at 100 TB is the post-decode pipeline (banded-hamming pairs
  -> star-contraction CC), so a second leg scales the HASHED panel 10x
  with per-copy XOR masks — XOR by a constant preserves within-copy
  pairwise hamming distances exactly while pushing cross-copy
  distances to ~31 bits (no cross-copy pairs) — and records
  pair/cluster growth next to wall time.
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
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

#: Golden-ratio 64-bit stride, masked to 63 bits — decorrelates copies
#: while preserving within-copy hamming structure exactly.
_XOR_STRIDE = 0x9E3779B97F4A7C15


def _scaled_copy_union(base, key_col: str, stride: int):
    out = None
    for i in range(COPIES):
        c = base.withColumn(key_col, F.col(key_col) + F.lit(i * stride))
        out = c if out is None else out.unionByName(c)
    return out


def _dup_cluster_pipeline(spark, hashed, hash_col: str, copies: int):
    """The post-decode dup-cluster pipeline over a panel scaled by
    id-shift + per-copy XOR mask: returns (n_pairs, n_clusters, wall)."""
    from storm_dynamic_spout_spark.operators.dedup import connected_components
    from storm_dynamic_spout_spark.operators.multimodal import phash_near_pairs

    scaled = None
    for i in range(copies):
        mask = (i * _XOR_STRIDE) & 0x7FFFFFFFFFFFFFFF
        c = hashed.select(
            (F.col("doc_id") + F.lit(i * 1_000_000)).alias("doc_id"),
            F.col(hash_col).bitwiseXOR(F.lit(mask)).alias(hash_col),
        )
        scaled = c if scaled is None else scaled.unionByName(c)
    scaled = scaled.localCheckpoint(eager=True)
    t0 = time.time()
    pairs = phash_near_pairs(scaled, hash_col=hash_col).localCheckpoint(eager=True)
    n_pairs = pairs.count()
    cc = connected_components(
        pairs, scaled.select("doc_id"), "doc_id", method="star"
    )
    n_clusters = cc.select("cluster_id").distinct().count()
    wall = time.time() - t0
    return n_pairs, n_clusters, wall


def main() -> int:
    from storm_dynamic_spout_spark.catalog.multimodal import (
        _audio_fps,
        _phash_hashed_images,
    )
    from storm_dynamic_spout_spark.queries import QUERIES as CATALOG

    spark = build_session(
        EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
    )
    spark.sparkContext.setLogLevel("ERROR")

    tmp = tempfile.mkdtemp(prefix="sf1r12-")
    for t in ALL_TABLES:
        dst = os.path.join(tmp, f"{t}.parquet")
        if t == "documents":
            _scaled_copy_union(
                load_table(spark, SF01, t), "doc_id", 1_000_000_000
            ).write.parquet(dst)
        elif t == "customer":
            _scaled_copy_union(
                load_table(spark, SF01, t), "c_custkey", 1_000_000_000
            ).write.parquet(dst)
        else:
            os.symlink(os.path.join(SF01, f"{t}.parquet"), dst)
    print(f"built {COPIES}x documents+customer in {tmp}")

    report = [
        "",
        "## sf1-equivalent rehearsal — round-12 closers "
        "(clustering coefficient / BPE training / dup-cluster pipelines)",
        "",
        f"Corpus: {COPIES}x sf0.1 documents (50k) and customer (150k),",
        "id-shifted copies; other tables symlinked.  Dup-cluster legs",
        "scale the HASHED panel with per-copy XOR masks (hamming-",
        "preserving within copies, decorrelating across).  Built by",
        "tools/sf1_round12_rehearsal.py.",
        "",
    ]
    failures = []

    # --- corpus-scaled legs ------------------------------------------------
    # clustering coefficient: shifted c_custkeys land on the SAME md5
    # coordinate plane, so 10x points DENSIFY the proximity graph —
    # wedge work grows ~quadratically+ in copies BY CONSTRUCTION.  The
    # honest pass bound is wall <= wedge growth (data vs engine
    # separation, r11 verdict item 4), not wall <= copies.
    def _wedges(sf_dir):
        from storm_dynamic_spout_spark.catalog.joins import _spatial_coord
        from storm_dynamic_spout_spark.operators.graph import orient_by_degree
        from storm_dynamic_spout_spark.operators.spatial import (
            grid_neighbor_pairs,
        )

        pts = load_table(spark, sf_dir, "customer").select(
            F.col("c_custkey").alias("id"),
            _spatial_coord("x").alias("ux"),
            _spatial_coord("y").alias("uy"),
        )
        edges = grid_neighbor_pairs(pts, "id", "ux", "uy", 1_500).select(
            F.col("id_a").alias("a"), F.col("id_b").alias("b")
        )
        return int(
            orient_by_degree(edges)
            .groupBy("src")
            .agg(F.count(F.lit(1)).alias("d"))
            .agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w"))
            .first()["w"]
        )

    for name in ("graph_clustering_coefficient", "text_bpe_learn_merges"):
        fn = CATALOG[name]
        t0 = time.time()
        rows_1x = fn(spark, SF01).count()
        t_1x = time.time() - t0
        t0 = time.time()
        rows_nx = fn(spark, tmp).count()
        t_nx = time.time() - t0
        ratio = t_nx / max(t_1x, 1e-9)
        if name == "graph_clustering_coefficient":
            w1, wn = _wedges(SF01), _wedges(tmp)
            bound = max(wn / w1, float(COPIES))
            ok = ratio <= bound
            verdict = (
                "WALL <= WEDGE GROWTH (pass)" if ok else "SUPER-LINEAR (FAIL)"
            )
            extra = f"; wedges {w1} -> {wn} (x{wn / w1:.0f}, same-plane densification)"
        else:
            ok = ratio <= COPIES
            verdict = "SUB-LINEAR (pass)" if ok else "SUPER-LINEAR (FAIL)"
            extra = ""
        if not ok:
            failures.append(name)
        report.append(
            f"- {name} @ {COPIES}x: {t_nx:.1f}s vs {t_1x:.1f}s at 1x = "
            f"{ratio:.1f}x wall for {COPIES}x data -> {verdict}; "
            f"rows {rows_1x} -> {rows_nx}{extra}"
        )
        print(report[-1])

    # BPE scale-invariance: identical copies change absolute pair counts
    # by exactly 10x, so the ranking — and the learned merges — must not
    # move
    m1 = [tuple(r) for r in CATALOG["text_bpe_learn_merges"](spark, SF01)
          .select("merge_rank", "pair_a", "pair_b").collect()]
    mn = [tuple(r) for r in CATALOG["text_bpe_learn_merges"](spark, tmp)
          .select("merge_rank", "pair_a", "pair_b").collect()]
    ok = sorted(m1) == sorted(mn)
    report.append(
        f"- BPE learned merges at {COPIES}x: "
        f"{'IDENTICAL to 1x (pass — merge ranking is scale-invariant)' if ok else 'DIVERGED (FAIL)'}"
    )
    if not ok:
        failures.append("bpe_merge_invariance")
    print(report[-1])

    # --- panel-pinned catalog legs + pipeline-scaled legs -------------------
    for name, builder, hash_col in (
        ("multimodal_image_dup_clusters", _phash_hashed_images, "phash"),
        ("multimodal_audio_dup_clusters", _audio_fps, "fingerprint"),
    ):
        fn = CATALOG[name]
        t0 = time.time()
        r1 = {tuple(r) for r in fn(spark, SF01).collect()}
        t_1x = time.time() - t0
        t0 = time.time()
        rn = {tuple(r) for r in fn(spark, tmp).collect()}
        t_nx = time.time() - t0
        ok = r1 == rn
        report.append(
            f"- {name} @ {COPIES}x documents: result "
            f"{'IDENTICAL' if ok else 'DIVERGED (FAIL)'} "
            f"(panel pinned by doc_id pushdown), wall {t_1x:.1f}s -> {t_nx:.1f}s"
        )
        if not ok:
            failures.append(name)
        print(report[-1])

        hashed = builder(spark, SF01).localCheckpoint(eager=True)
        p1, c1, w1 = _dup_cluster_pipeline(spark, hashed, hash_col, 1)
        pn, cn, wn = _dup_cluster_pipeline(spark, hashed, hash_col, COPIES)
        ratio = wn / max(w1, 1e-9)
        ok = (
            pn == COPIES * p1
            and cn == COPIES * c1
            and ratio <= COPIES
        )
        report.append(
            f"  pipeline-scaled (hashed panel x{COPIES}, XOR-decorrelated): "
            f"pairs {p1} -> {pn} (exact {COPIES}x: {pn == COPIES * p1}), "
            f"clusters {c1} -> {cn} (exact {COPIES}x: {cn == COPIES * c1}), "
            f"wall {w1:.1f}s -> {wn:.1f}s ({ratio:.1f}x) -> "
            f"{'LINEAR (pass)' if ok else 'FAIL'}"
        )
        if not ok:
            failures.append(name + "_pipeline")
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
