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
