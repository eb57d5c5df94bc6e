"""sf1-equivalent rehearsal for the round-14 catalog additions
(stream_bradley_terry, corpus_eval_contamination) plus the two staged
operators (bpe_encode_words, decontamination_report).

    python tools/sf1_round14_rehearsal.py   # appends to SCALE_SF1.md

All legs rehearse as IDENTICAL-COPY invariance (the sharpest pin — see
SCALE_SF1.md conventions): the input table is rebuilt at 10x as
disjoint id-shifted replicas, each statistic having a closed-form 10x
image:

- stream_bradley_terry: the id shift (1e9, even) PRESERVES event_id
  parity, so each copy replays the exact two-batch schedule —
  n_wins/n_comparisons scale exactly 10x and the warm-started
  strengths drift only by micro-rounding (round(10x) vs 10*round(x)).
- corpus_eval_contamination: doc_id shift preserves the even/odd
  train/eval split and the per-copy token salt keeps cross-copy grams
  disjoint — eval rows and flagged counts scale exactly 10x.
- decontamination_report (staged): same salting story; the per-source
  leakage budgets scale exactly 10x (sources survive the salt).
- bpe_encode_words (staged): UNSALTED 10x copies leave the distinct
  word set UNCHANGED, so the encoded vocabulary is bit-identical while
  the corpus under it is 10x — wall must grow far slower than copies
  (the encode cost rides distinct words, the explode rides the
  corpus).

Wall-time pass bound per leg: wall <= copies x 1.1 (or +5s floor).
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

    tmp = tempfile.mkdtemp(prefix="sf1r14-")
    for t in ALL_TABLES:
        dst = os.path.join(tmp, f"{t}.parquet")
        if t == "events":
            _copies(
                load_table(spark, SF01, t), ["user_id", "event_id"]
            ).write.parquet(dst)
        elif t == "documents":
            _copies(
                load_table(spark, SF01, t), ["doc_id"], salt_text=True
            ).write.parquet(dst)
        else:
            os.symlink(os.path.join(SF01, f"{t}.parquet"), dst)
    print(f"built {COPIES}x events+documents(salted) in {tmp}")

    report = [
        "",
        "## sf1-equivalent rehearsal — round-14 additions "
        "(streaming Bradley-Terry / eval contamination / BPE vocab encode "
        "/ decontamination report)",
        "",
        f"Corpus: {COPIES}x sf0.1 events (100k; user_id+event_id shifted by",
        "an EVEN 1e9 so per-user chains stay per-copy and the even/odd batch",
        "schedule replays identically) and documents (5k; doc_id shifted,",
        "tokens salted so cross-copy grams are disjoint); other tables",
        "symlinked.  Built by tools/sf1_round14_rehearsal.py.",
        "",
    ]
    failures = []

    def timed(fn, sf_dir):
        t0 = time.time()
        rows = fn(spark, sf_dir).collect()
        return rows, time.time() - t0

    # --- stream_bradley_terry ----------------------------------------------
    base, w0 = timed(CATALOG["stream_bradley_terry"], SF01)
    big, w1 = timed(CATALOG["stream_bradley_terry"], tmp)
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
        failures.append("stream_bradley_terry")
    report.append(
        f"- stream_bradley_terry: wins/comparisons exactly 10x: {counts_10x};"
        f" max strength drift {drift:.1e} under the replayed two-batch"
        f" warm-started schedule; wall {w0:.1f}s -> {w1:.1f}s"
        f" ({w1 / w0:.1f}x for 10x comparisons)"
        + ("  OK" if ok else "  FAIL")
    )

    # --- corpus_eval_contamination -------------------------------------------
    base, w0 = timed(CATALOG["corpus_eval_contamination"], SF01)
    big, w1 = timed(CATALOG["corpus_eval_contamination"], tmp)
    n0 = len(base)
    f0 = sum(1 for r in base if r["flagged"])
    n1 = len(big)
    f1 = sum(1 for r in big if r["flagged"])
    # per-copy fractions identical: the base docs' rows reappear
    # verbatim in copy 0 is NOT true (copy 0 is salted too) — instead
    # every copy reproduces the same multiset of fractions
    from collections import Counter

    frac0 = Counter(r["overlap_frac"] for r in base)
    frac1 = Counter(r["overlap_frac"] for r in big)
    multiset_10x = frac1 == Counter(
        {k: v * COPIES for k, v in frac0.items()}
    )
    inv = n1 == 10 * n0 and f1 == 10 * f0 and multiset_10x
    ok = inv and w1 <= max(w0 * COPIES * 1.1, w0 + 5)
    if not ok:
        failures.append("corpus_eval_contamination")
    report.append(
        f"- corpus_eval_contamination: eval rows / flagged exactly 10x and"
        f" the overlap-fraction multiset scales exactly 10x: {inv}"
        f" ({f0}/{n0} -> {f1}/{n1}); wall {w0:.1f}s -> {w1:.1f}s"
        f" ({w1 / w0:.1f}x)" + ("  OK" if ok else "  FAIL")
    )

    # --- decontamination_report (staged) --------------------------------------
    from storm_dynamic_spout_spark.operators.corpus import (
        decontamination_report,
    )

    def _report(docs):
        train = docs.filter(F.col("doc_id") % 20 == 0)
        ev = docs.filter(F.col("doc_id") % 20 == 11)
        return decontamination_report(train, ev, ngram=3).orderBy("source")

    d1 = load_table(spark, SF01, "documents")
    d10 = spark.read.parquet(os.path.join(tmp, "documents.parquet"))
    t0 = time.time()
    b_rows = _report(d1).collect()
    w0 = time.time() - t0
    t0 = time.time()
    g_rows = _report(d10).collect()
    w1 = time.time() - t0
    bsrc = {r["source"]: r for r in b_rows}
    gsrc = {r["source"]: r for r in g_rows}
    inv = set(bsrc) == set(gsrc) and all(
        gsrc[s]["n_shared_grams"] == 10 * bsrc[s]["n_shared_grams"]
        and gsrc[s]["n_eval_docs_touched"] == 10 * bsrc[s]["n_eval_docs_touched"]
        and gsrc[s]["n_leaked_gram_slots"] == 10 * bsrc[s]["n_leaked_gram_slots"]
        and gsrc[s]["leaked_token_budget"] == 10 * bsrc[s]["leaked_token_budget"]
        for s in bsrc
    )
    ok = inv and w1 <= max(w0 * COPIES * 1.1, w0 + 5)
    if not ok:
        failures.append("decontamination_report")
    report.append(
        f"- decontamination_report (staged): per-source budgets exactly 10x"
        f" under salted copies: {inv} ({len(bsrc)} sources); wall"
        f" {w0:.1f}s -> {w1:.1f}s ({w1 / w0:.1f}x)"
        + ("  OK" if ok else "  FAIL")
    )

    # --- bpe_encode_words (staged; UNSALTED copies) ----------------------------
    import string

    from storm_dynamic_spout_spark.operators.text import bpe_encode_words

    merges = [(a, b) for a in string.ascii_lowercase for b in string.ascii_lowercase]
    merges += [(f"zz{i}", f"qq{i}") for i in range(50_000)]

    def _encode(docs):
        words = (
            docs.select(F.explode(F.split("text", r"\s+")).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
        )
        return (
            bpe_encode_words(words, "word", merges)
            .select("word", F.size("bpe_tokens").alias("n_tok"))
            .orderBy("word")
        )

    d10_plain = _copies(d1, ["doc_id"], salt_text=False)
    t0 = time.time()
    b_rows = _encode(d1).collect()
    w0 = time.time() - t0
    t0 = time.time()
    g_rows = _encode(d10_plain).collect()
    w1 = time.time() - t0
    inv = [tuple(r) for r in b_rows] == [tuple(r) for r in g_rows]
    ok = inv and w1 <= max(w0 * COPIES * 1.1, w0 + 5)
    if not ok:
        failures.append("bpe_encode_words")
    report.append(
        f"- bpe_encode_words (staged): encoded vocabulary BIT-IDENTICAL"
        f" under unsalted 10x copies ({len(b_rows)} distinct words,"
        f" 50.7k-entry merge table): {inv}; wall {w0:.1f}s -> {w1:.1f}s"
        f" ({w1 / w0:.1f}x — encode cost rides distinct words, only the"
        f" explode rides the corpus)" + ("  OK" if ok else "  FAIL")
    )

    report.append("")
    with open(Path(__file__).resolve().parent.parent / "SCALE_SF1.md", "a") as fh:
        fh.write("\n".join(report))
    print("\n".join(report))
    print("FAILURES:", failures)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
