"""sf1-equivalent rehearsal for the round-13 catalog additions
(rank_bradley_terry, rank_cohen_kappa, text_bpe_apply) plus the staged
eval-contamination operator.

    python tools/sf1_round13_rehearsal.py   # appends to SCALE_SF1.md

All four rehearse as IDENTICAL-COPY invariance legs: the input table is
rebuilt at 10x as disjoint id-shifted replicas (events shifts user_id
AND event_id so per-user chains never concatenate across copies;
documents shifts doc_id), so each statistic has a closed-form 10x
image:

- Bradley-Terry: per-item n_wins / n_comparisons scale EXACTLY 10x and
  strengths are invariant to ~1e-6 (the per-pair micro-rounding happens
  before the sum, so round(10x) vs 10*round(x) can drift the 12-
  iteration fit by a few micro-units — the leg reports the max drift).
- Cohen's kappa: all counts scale exactly 10x; po/pe/kappa are ratios
  of 10x-scaled integers and must be BIT-IDENTICAL.
- BPE application: pair counts scale 10x uniformly, so the learned
  merges and the head-vocabulary ranking are identical with counts
  exactly 10x.
- eval_contamination (staged, salted copies): per-copy gram structure
  is preserved and cross-copy grams are disjoint, so flagged/total
  counts scale exactly 10x.

Wall time is recorded per leg; the pass bound is wall <= copies x 1.1
(every leg is one-or-two corpus scans + model-sized work).
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


def _copies(base, shift_cols, salt_text: bool = False):
    out = None
    for i in range(COPIES):
        c = base
        for col in shift_cols:
            c = c.withColumn(col, F.col(col) + F.lit(i * 1_000_000_000))
        if salt_text:
            c = c.withColumn(
                "text", F.regexp_replace(F.col("text"), r"(\S+)", f"$1_c{i}")
            )
        out = c if out is None else out.unionByName(c)
    return out


def main() -> int:
    from storm_dynamic_spout_spark.queries import QUERIES as CATALOG

    spark = build_session(
        EngineConfig({"spark.master": "local[32]", "spark.shuffle_partitions": 32})
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1).write.format("noop").mode("overwrite").save()

    tmp = tempfile.mkdtemp(prefix="sf1r13-")
    for t in ALL_TABLES:
        dst = os.path.join(tmp, f"{t}.parquet")
        if t == "events":
            _copies(
                load_table(spark, SF01, t), ["user_id", "event_id"]
            ).write.parquet(dst)
        elif t == "documents":
            _copies(load_table(spark, SF01, t), ["doc_id"]).write.parquet(dst)
        else:
            os.symlink(os.path.join(SF01, f"{t}.parquet"), dst)
    print(f"built {COPIES}x events+documents in {tmp}")

    report = [
        "",
        "## sf1-equivalent rehearsal — round-13 additions "
        "(Bradley-Terry / Cohen's kappa / BPE application / eval overlap)",
        "",
        f"Corpus: {COPIES}x sf0.1 events (100k) and documents (5k) as",
        "disjoint id-shifted replicas (events shifts user_id+event_id so",
        "chains never concatenate across copies); other tables symlinked.",
        "Built by tools/sf1_round13_rehearsal.py.",
        "",
    ]
    failures = []

    def timed(fn, sf_dir):
        t0 = time.time()
        rows = fn(spark, sf_dir).collect()
        return rows, time.time() - t0

    # --- Bradley-Terry ------------------------------------------------------
    base, w0 = timed(CATALOG["rank_bradley_terry"], SF01)
    big, w1 = timed(CATALOG["rank_bradley_terry"], tmp)
    b = {r["item"]: r for r in base}
    g = {r["item"]: r for r in big}
    counts_10x = set(b) == set(g) and all(
        g[i]["n_wins"] == 10 * b[i]["n_wins"]
        and g[i]["n_comparisons"] == 10 * b[i]["n_comparisons"]
        for i in b
    )
    drift = max(abs(g[i]["strength"] - b[i]["strength"]) for i in b)
    ok = counts_10x and drift <= 5e-6 and w1 <= max(w0 * COPIES * 1.1, w0 + 5)
    if not ok:
        failures.append("rank_bradley_terry")
    report.append(
        f"- rank_bradley_terry: wins/comparisons exactly 10x: {counts_10x};"
        f" max strength drift {drift:.1e} (micro-rounding before the sum"
        f" — round(10x) vs 10*round(x)); wall {w0:.1f}s -> {w1:.1f}s"
        f" ({w1 / w0:.1f}x for 10x comparisons)"
        + ("  OK" if ok else "  FAIL")
    )

    # --- Cohen's kappa --------------------------------------------------------
    base, w0 = timed(CATALOG["rank_cohen_kappa"], SF01)
    big, w1 = timed(CATALOG["rank_cohen_kappa"], tmp)
    b0, g0 = base[0], big[0]
    invariant = (
        g0["n_items"] == 10 * b0["n_items"]
        and g0["po"] == b0["po"]
        and g0["pe"] == b0["pe"]
        and g0["kappa"] == b0["kappa"]
    )
    ok = invariant and w1 <= max(w0 * COPIES * 1.1, w0 + 5)
    if not ok:
        failures.append("rank_cohen_kappa")
    report.append(
        f"- rank_cohen_kappa: n_items exactly 10x, po/pe/kappa"
        f" BIT-IDENTICAL: {invariant} (kappa={g0['kappa']});"
        f" wall {w0:.1f}s -> {w1:.1f}s ({w1 / w0:.1f}x)"
        + ("  OK" if ok else "  FAIL")
    )

    # --- BPE application -------------------------------------------------------
    base, w0 = timed(CATALOG["text_bpe_apply"], SF01)
    big, w1 = timed(CATALOG["text_bpe_apply"], tmp)
    inv = [r["rank"] for r in base] == [r["rank"] for r in big] and [
        r["token"] for r in base
    ] == [r["token"] for r in big] and all(
        gg["n_occurrences"] == 10 * bb["n_occurrences"]
        for bb, gg in zip(base, big)
    )
    ok = inv and w1 <= max(w0 * COPIES * 1.1, w0 + 5)
    if not ok:
        failures.append("text_bpe_apply")
    report.append(
        f"- text_bpe_apply: head-vocabulary ranking identical with counts"
        f" exactly 10x: {inv}; wall {w0:.1f}s -> {w1:.1f}s"
        f" ({w1 / w0:.1f}x)" + ("  OK" if ok else "  FAIL")
    )

    # --- eval_contamination (staged; salted copies) -----------------------------
    from storm_dynamic_spout_spark.operators.corpus import eval_contamination

    def _contam(docs):
        train = docs.filter(F.col("doc_id") % 20 == 0)
        ev = docs.filter(F.col("doc_id") % 20 == 11)
        return eval_contamination(train, ev, ngram=3, threshold=0.5).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("flagged").cast("long")).alias("n_flagged"),
        )

    d1 = load_table(spark, SF01, "documents")
    d10 = _copies(d1, ["doc_id"], salt_text=True)
    t0 = time.time()
    b0 = _contam(d1).first()
    w0 = time.time() - t0
    t0 = time.time()
    g0 = _contam(d10).first()
    w1 = time.time() - t0
    inv = g0["n"] == 10 * b0["n"] and g0["n_flagged"] == 10 * b0["n_flagged"]
    ok = inv and w1 <= max(w0 * COPIES * 1.1, w0 + 5)
    if not ok:
        failures.append("eval_contamination")
    report.append(
        f"- eval_contamination (staged): eval rows / flagged exactly 10x"
        f" under salted copies: {inv} ({b0['n_flagged']}/{b0['n']} ->"
        f" {g0['n_flagged']}/{g0['n']}); wall {w0:.1f}s -> {w1:.1f}s"
        f" ({w1 / w0:.1f}x)" + ("  OK" if ok else "  FAIL")
    )

    report.append("")
    out = "\n".join(report) + "\n"
    print(out)
    Path(__file__).resolve().parent.parent.joinpath("SCALE_SF1.md").open(
        "a"
    ).write(out)
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
