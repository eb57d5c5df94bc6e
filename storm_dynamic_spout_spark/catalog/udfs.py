"""UDF/UDAF surface demonstrations (SURVEY §2.11) — oracle-checked.

The reference's "UDF surface" is its plugin SPIs (FilterChainStep,
Deserializer, …, all reflectively loaded, ``FactoryManager.java``).
The engine's equivalents are Spark's three Python extension points,
each shown here with an exact DuckDB oracle so the slow-path machinery
itself is correctness-gated:

- scalar: Arrow-batched ``pandas_udf`` (never row-at-a-time ``udf`` in
  the hot path — 10-100× difference)
- grouped UDAF: ``groupBy().applyInPandas`` (full group in one pandas
  frame)
- UDTF-shape (1:N): ``mapInPandas`` — exercised by
  ``operators/multimodal.frame_sample``; the relational explode shape
  is covered by ``scalar_array_explode``.
- true table function: Spark 4 ``@udtf`` + LATERAL join
  (``udtf_split_tokens``, Arrow-enabled).

These exist to prove the plumbing; real operators prefer built-ins
(every other catalog query is pure JVM).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from storm_dynamic_spout_spark.catalog.registry import query, t


@query(
    "udf_pandas_scalar",
    oracle="""
    SELECT doc_id,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_ws_tokens
    FROM documents
    """,
)
def udf_pandas_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas_udf: whitespace token count computed
    in Python, hash-checked against the oracle — proving the Arrow
    transfer path preserves values exactly."""

    @F.pandas_udf(T.LongType())
    def ws_tokens(texts: pd.Series) -> pd.Series:
        return texts.str.strip().str.split().map(len).astype("int64")

    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", ws_tokens(F.col("text")).alias("n_ws_tokens"))


_SLOPE_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("slope", T.DoubleType(), True),
        T.StructField("n_events", T.LongType(), False),
    ]
)


@query(
    "udaf_apply_in_pandas",
    oracle="""
    SELECT user_id,
           round(regr_slope(value, CAST(event_id AS DOUBLE)) * 1000000) / 1000000 AS slope,
           CAST(count(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY user_id
    """,
)
def udaf_apply_in_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped UDAF via applyInPandas: per-user least-squares slope of
    value over event_id, matching SQL ``regr_slope`` (population
    covariance / population variance). Rounded to 1e-6 in-query on both
    sides so FP summation order can't flip the hash.

    Scale shape: one shuffle on the group key, then each group is a
    single pandas frame — the operator to reach for when the aggregate
    genuinely isn't expressible in built-ins (here it is; the built-in
    ``regr_slope`` exists and is preferred — this query gates the
    applyInPandas machinery itself)."""

    def slope(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf["event_id"].astype("float64")
        y = pdf["value"].astype("float64")
        var = (x * x).mean() - x.mean() ** 2
        s = ((x * y).mean() - x.mean() * y.mean()) / var if var > 0 else None
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "slope": [None if s is None else round(s * 1_000_000) / 1_000_000],
                "n_events": [len(pdf)],
            }
        )

    e = t(spark, sf_dir, "events").select("user_id", "event_id", "value")
    return e.groupBy("user_id").applyInPandas(slope, _SLOPE_SCHEMA)


@query(
    "udtf_split_tokens",
    oracle="""
    WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS tk
        FROM documents WHERE doc_id < 50
    ),
    pos AS (SELECT doc_id, UNNEST(range(1, len(tk) + 1)) AS p, tk FROM toks)
    SELECT doc_id, CAST(p - 1 AS INTEGER) AS pos, tk[p] AS tok
    FROM pos
    ORDER BY doc_id, pos
    """,
)
def udtf_split_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Python UDTF (Spark 4 ``@udtf``, Arrow-enabled): one doc →
    one row per token with its position, consumed via LATERAL join —
    the table-function extension point the reference exposes only as
    plugin SPIs. Arrow batching keeps it off the row-at-a-time path;
    the relational equivalent (posexplode/split) stays the preferred
    form for production plans."""
    from pyspark.sql.functions import udtf

    spark.conf.set("spark.sql.execution.pythonUDTF.arrow.enabled", "true")

    @udtf(returnType="pos int, tok string")
    class SplitTokens:
        def eval(self, text: str):
            for i, tok in enumerate((text or "").split()):
                yield i, tok

    spark.udtf.register("split_tokens", SplitTokens)
    t(spark, sf_dir, "documents").filter(F.col("doc_id") < 50).createOrReplaceTempView(
        "__udtf_docs"
    )
    return spark.sql(
        """
        SELECT d.doc_id, s.pos, s.tok
        FROM __udtf_docs d, LATERAL split_tokens(d.text) s
        ORDER BY d.doc_id, s.pos
        """
    )
