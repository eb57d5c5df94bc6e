"""VALIDATED prototype for round 15's corpus_decontamination_report
oracle: the per-train-source leakage budget (operators/corpus.py
decontamination_report) over the even/odd doc split at 3-grams,
replayed in DuckDB with the shared md5-int gram convention.

    python tools/proto_decontam_oracle.py   # prints MATCH: True

Shape notes for the r15 registration: the oracle dedups (source, gram)
on the RAW gram strings before hashing (mirroring the operator's
hash-after-distinct order — values identical either way, but keeping
the two sides textually parallel makes the intent auditable), and the
slot count is COUNT(*) over the (eval doc, gram) x source join — the
same gram leaking into three eval docs is three slots.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")
NGRAM = 3

_TOKS = "regexp_split_to_array(text, '\\s+')"
_GRAMS = (
    f"list_distinct("
    f"list_transform(range(1, greatest(len({_TOKS}) - {NGRAM - 1}, 0) + 1), "
    f"i -> array_to_string({_TOKS}[i:i+{NGRAM - 1}], ' ')))"
)


def oracle_sql() -> str:
    return f"""
WITH train_vocab AS (
    SELECT DISTINCT source,
           CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) AS gh
    FROM (
        SELECT source, UNNEST({_GRAMS}) AS g
        FROM documents WHERE doc_id % 2 = 0
    ) t
),
eval_grams AS (
    SELECT doc_id,
           CAST(('0x' || substr(md5(g), 1, 15)) AS BIGINT) AS gh
    FROM (
        SELECT doc_id, UNNEST({_GRAMS}) AS g
        FROM documents WHERE doc_id % 2 = 1
    ) t
)
SELECT tv.source,
       CAST(count(DISTINCT tv.gh) AS BIGINT) AS n_shared_grams,
       CAST(count(DISTINCT eg.doc_id) AS BIGINT) AS n_eval_docs_touched,
       CAST(count(*) AS BIGINT) AS n_leaked_gram_slots,
       CAST(count(*) * {NGRAM} AS BIGINT) AS leaked_token_budget
FROM eval_grams eg JOIN train_vocab tv USING (gh)
GROUP BY tv.source
ORDER BY tv.source
"""


def main() -> int:
    from pyspark.sql import SparkSession

    from storm_dynamic_spout_spark.operators.corpus import (
        decontamination_report,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(os.path.join(SF, "documents.parquet"))
    is_eval = F.col("doc_id") % 2 == 1
    got = [
        tuple(r)
        for r in decontamination_report(
            d.filter(~is_eval), d.filter(is_eval), ngram=NGRAM
        )
        .orderBy("source")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = [tuple(r) for r in con.execute(oracle_sql()).fetchall()]
    print("spark  rows:", len(got), "| oracle rows:", len(want))
    for g, w in zip(got[:3], want[:3]):
        print("  spark:", g, "\n  duck :", w)
    print("MATCH:", got == want)
    return 0 if got == want else 1


if __name__ == "__main__":
    raise SystemExit(main())
