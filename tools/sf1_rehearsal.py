"""sf1 rehearsal for the dedup family (r8 verdict item 4): run
dedup_minhash_pairs, dedup_containment, dedup_cluster_assignment and
corpus_training_manifest against an sf1-equivalent documents table
(10x the sf0.1 corpus) and record timings + plan snapshots + the pair
blow-up check into SCALE_SF1.md.

    python tools/sf1_rehearsal.py

The sf1 table is built with the examples/scale_smoke.py recipe — ten
copies of sf0.1 documents with shifted doc_ids and a per-copy token
salt, so cross-copy Jaccard is 0 and the per-copy duplicate structure
is preserved exactly.  The TRUE (exact-Jaccard) pair count is then
exactly 10x the sf0.1 count; the REPORTED count differs only through
per-copy LSH band recall (each copy's salted tokens hash differently,
so borderline J~=0.9 pairs land in bands copy-by-copy), so the script
asserts the blow-up ratio sits in [8, 10.5]: linear-in-copies with
recall noise, never quadratic.  Precision is exact either way
(jaccard_verify filters candidates on true Jaccard).

corpus_training_manifest runs against a PLAIN (unsalted, id-shifted)
multi-copy corpus instead: the token salt would zero every stopword
ratio and empty the quality gate, while the plain corpus makes every
document a member of a cross-copy exact-duplicate group — the
dup-dense shape the manifest's rep-collapse + CC stage exists for.

A second variant stresses the viral-cluster rep-collapse claim
(COVERAGE §2.11): VIRAL_COPIES exact clones of one document are added
on top of sf1.  With collapse_exact, the clones contribute ONE
representative row to the quadratic LSH bucket join (not clones²
pairs), and the expected output grows by exactly the clone-cluster's
expanded pair count, which is asserted in closed form.
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
COPIES = 10
MANIFEST_COPIES = 3  # plain copies: every doc in a 3-clone dup group
VIRAL_COPIES = 250  # clones of doc 0 for the rep-collapse stress
QUERIES = [
    "dedup_minhash_pairs",
    "dedup_containment",
    "dedup_cluster_assignment",
]


def build_documents(spark, n_copies: int, salt: bool, viral: bool = False):
    base = load_table(spark, SF01, "documents")
    copies = []
    for i in range(n_copies):
        c = base.withColumn("doc_id", F.col("doc_id") + F.lit(i * 1_000_000_000))
        if salt:
            c = c.withColumn(
                "text", F.regexp_replace(F.col("text"), r"(\S+)", f"$1_c{i}")
            )
        copies.append(c)
    out = copies[0]
    for c in copies[1:]:
        out = out.unionByName(c)
    if viral:
        # clones carry copy-0's salt so they join doc 0's exact-token
        # group: the (1 + VIRAL_COPIES)-member group contributes ONE
        # representative to the LSH bucket join
        seed = base.filter(F.col("doc_id") == 0).withColumn(
            "text", F.regexp_replace(F.col("text"), r"(\S+)", "$1_c0")
        )
        clones = (
            spark.range(1, VIRAL_COPIES + 1)
            .select((F.col("id") + F.lit(50_000_000_000)).alias("__new_id"))
            .crossJoin(seed.drop("doc_id"))
            .withColumnRenamed("__new_id", "doc_id")
            .select(*base.columns)
        )
        out = out.unionByName(clones)
    return out


def _plan_snapshot(df, title: str) -> str:
    return (
        f"### {title}\n```\n"
        + df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )[:4000]
        + "\n```"
    )


def main() -> int:
    from storm_dynamic_spout_spark.queries import QUERIES as CATALOG

    spark = build_session(
        EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
    )
    spark.sparkContext.setLogLevel("ERROR")

    report = [
        "# sf1 rehearsal — dedup family (r8 verdict item 4)",
        "",
        f"Corpus: {COPIES}x sf0.1 documents (token-salted copies; cross-copy "
        f"Jaccard 0; per-copy LSH band recall varies with the salt hashes, "
        f"so the pair blow-up is linear-in-copies within a recall band, "
        f"never quadratic).  Manifest leg: {MANIFEST_COPIES}x PLAIN copies "
        f"(every doc in a cross-copy exact-dup group — the rep-collapse "
        f"stress).  Built by tools/sf1_rehearsal.py.",
        "",
    ]

    # baseline pair count at sf0.1 for the linearity assertion
    pairs_1x = CATALOG["dedup_minhash_pairs"](spark, SF01).count()
    report.append(f"- sf0.1 near-dup pairs: **{pairs_1x}**")

    plans = []
    with tempfile.TemporaryDirectory(prefix="sf1-") as workdir:
        build_documents(spark, COPIES, salt=True).coalesce(8).write.mode(
            "overwrite"
        ).parquet(os.path.join(workdir, "documents.parquet"))

        rows: dict[str, int] = {}
        report.append("")
        report.append("| query | corpus | wall (s) | rows |")
        report.append("|---|---|---|---|")
        for name in QUERIES:
            t0 = time.perf_counter()
            df = CATALOG[name](spark, workdir)
            rows[name] = df.count()
            dt = time.perf_counter() - t0
            report.append(f"| {name} | salted {COPIES}x | {dt:.1f} | {rows[name]} |")
            plans.append(_plan_snapshot(df, f"{name} @ sf1 (salted {COPIES}x)"))
            print(f"{name}: {dt:.1f}s rows={rows[name]}", flush=True)

        ratio = rows["dedup_minhash_pairs"] / pairs_1x
        ok_linear = 8.0 <= ratio <= 10.5
        report.append("")
        report.append(
            f"- pair blow-up: sf1 pairs = {rows['dedup_minhash_pairs']} = "
            f"{ratio:.2f}x the sf0.1 count (true-Jaccard pairs are exactly "
            f"{COPIES}x; the gap is per-copy LSH band recall) -> "
            f"{'LINEAR-IN-COPIES (pass)' if ok_linear else 'OUT OF BAND (FAIL)'}"
        )

        # viral-cluster stress: clones share copy-0's salt, so doc 0's
        # exact-token group grows to 1 + VIRAL_COPIES members and
        # contributes ONE representative to the LSH bucket join; the
        # output grows by the group's internal pairs C(V+1, 2) plus the
        # clones' inherited copies of doc 0's external near-dup pairs.
        with tempfile.TemporaryDirectory(prefix="sf1v-") as vdir:
            build_documents(spark, COPIES, salt=True, viral=True).coalesce(
                8
            ).write.mode("overwrite").parquet(
                os.path.join(vdir, "documents.parquet")
            )
            doc0_ext = (
                CATALOG["dedup_minhash_pairs"](spark, workdir)
                .filter((F.col("id_a") == 0) | (F.col("id_b") == 0))
                .count()
            )
            t0 = time.perf_counter()
            viral_pairs = CATALOG["dedup_minhash_pairs"](spark, vdir).count()
            dt = time.perf_counter() - t0
            expected = (
                rows["dedup_minhash_pairs"]
                + VIRAL_COPIES * (VIRAL_COPIES + 1) // 2
                + VIRAL_COPIES * doc0_ext
            )
            ok_viral = viral_pairs == expected
            report.append(
                f"- viral stress (+{VIRAL_COPIES} salted clones of doc 0, "
                f"{dt:.1f}s): pairs = {viral_pairs}, closed-form expected "
                f"= {expected} (base + C({VIRAL_COPIES + 1},2) + "
                f"{VIRAL_COPIES} x {doc0_ext} external) -> "
                f"{'MATCH (pass)' if ok_viral else 'MISMATCH (FAIL)'}"
            )
            print(
                f"viral: {dt:.1f}s pairs={viral_pairs} expected={expected}",
                flush=True,
            )

    # manifest leg: plain copies (quality gate needs real stopwords)
    with tempfile.TemporaryDirectory(prefix="sf1m-") as mdir:
        build_documents(spark, MANIFEST_COPIES, salt=False).coalesce(
            8
        ).write.mode("overwrite").parquet(os.path.join(mdir, "documents.parquet"))
        base_manifest = CATALOG["corpus_training_manifest"](spark, SF01).count()
        t0 = time.perf_counter()
        mdf = CATALOG["corpus_training_manifest"](spark, mdir)
        m_rows = mdf.count()
        dt = time.perf_counter() - t0
        ok_manifest = m_rows > 0
        report.append(
            f"- corpus_training_manifest on plain {MANIFEST_COPIES}x "
            f"({dt:.1f}s): {m_rows} language rows (sf0.1: {base_manifest}) — "
            f"every doc entered a {MANIFEST_COPIES}-clone exact-dup group "
            f"and the rep-collapse + CC + gate pipeline still completes -> "
            f"{'pass' if ok_manifest else 'FAIL (empty manifest)'}"
        )
        plans.append(
            _plan_snapshot(mdf, f"corpus_training_manifest @ plain {MANIFEST_COPIES}x")
        )
        print(f"manifest: {dt:.1f}s rows={m_rows}", flush=True)

    report.append("")
    report.extend(plans)
    Path(__file__).resolve().parent.parent.joinpath("SCALE_SF1.md").write_text(
        "\n".join(report) + "\n"
    )
    print("wrote SCALE_SF1.md")
    spark.stop()
    return 0 if ok_linear and ok_viral and ok_manifest else 1


if __name__ == "__main__":
    raise SystemExit(main())
