"""VALIDATED prototype for round 15's stream_state_report oracle: drive
the BM25 two-batch schedule, compact to 1 file per state table, and
report (table, n_files, n_rows, needs_compaction) — post-compaction
every column is corpus-derived or a literal, so the oracle is plain
SQL (no rows-only fallback needed; the config-dependent pre-compaction
file counts stay OUT of the compared output).

    python tools/proto_state_report_oracle.py   # prints MATCH: True

Cross-run determinism of the full pre+post report was probed in the
r14 session (two fresh drives, identical rows); the registration
compares the POST-compaction state only:
- postings n_rows = distinct (doc, token) pairs over the corpus
- df       n_rows = distinct tokens (the vocabulary)
- stats    n_rows = 1 (the collapsed sentinel row)
- n_files  = 1 per table (target_files=1), needs_compaction = FALSE
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

ORACLE = """
WITH toks AS (
    SELECT doc_id, UNNEST(regexp_split_to_array(text, '\\s+')) AS tok
    FROM documents
)
SELECT * FROM (
    SELECT 'df' AS state_table, CAST(1 AS BIGINT) AS n_files,
           CAST((SELECT count(DISTINCT tok) FROM toks) AS BIGINT) AS n_rows,
           FALSE AS needs_compaction
    UNION ALL
    SELECT 'postings', 1,
           CAST((SELECT count(*) FROM (SELECT DISTINCT doc_id, tok FROM toks) t)
                AS BIGINT), FALSE
    UNION ALL
    SELECT 'stats', 1, 1, FALSE
) ORDER BY state_table
"""


def main() -> int:
    from pyspark.sql import SparkSession

    from storm_dynamic_spout_spark.streaming.bm25_stream import (
        StreamingBm25Index,
    )
    from storm_dynamic_spout_spark.streaming.state_report import (
        state_table_report,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    d = spark.read.parquet(os.path.join(SF, "documents.parquet")).select(
        "doc_id", "text"
    )
    idx = StreamingBm25Index(tempfile.mkdtemp(prefix="srp-oracle-"))
    idx.process_batch(d.filter(F.col("doc_id") % 2 == 0))
    idx.process_batch(d.filter(F.col("doc_id") % 2 == 1))
    idx.compact_index(spark, target_files=1)
    got = [
        tuple(r)
        for r in state_table_report(
            spark,
            {
                "postings": idx.postings_dir,
                "stats": idx.stats_dir,
                "df": idx.df_dir,
            },
            compact_threshold=1,
        )
        .withColumnRenamed("table", "state_table")
        .orderBy("state_table")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF}/documents.parquet')"
    )
    want = [tuple(r) for r in con.execute(ORACLE).fetchall()]
    print("spark :", got)
    print("oracle:", want)
    print("MATCH:", got == want)
    return 0 if got == want else 1


if __name__ == "__main__":
    raise SystemExit(main())
