"""MERGE / upsert (SCD-1 corpus refresh) as a single full-outer join.

A training-data pipeline re-crawls sources continuously; applying a
batch of revised + new documents to the corpus table is ANSI
``MERGE INTO … WHEN MATCHED THEN UPDATE WHEN NOT MATCHED THEN INSERT``.
Spark's DataFrame API has no MERGE against plain parquet, but the
SCD-1 semantics are exactly one FULL OUTER join on the key:

* matched          → take the source row (whole-row replace),
* source-only      → insert the source row,
* target-only      → keep the target row.

Scale shape: ONE shuffle on the merge key (Catalyst broadcasts the
source side when it is small, which a per-batch update set usually is);
AQE skew-split covers hot keys.  No window functions, no driver
collection.  The same plan is what Delta/Iceberg execute under their
MERGE before the file-rewrite step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(target: DataFrame, source: DataFrame, keys: list[str]) -> DataFrame:
    """SCD-1 merge of ``source`` into ``target`` on ``keys``.

    Whole-row replace semantics: a matched target row takes ALL source
    column values (including NULLs — a plain ``coalesce`` per column
    would wrongly resurrect target values under source NULLs, so a
    presence flag drives the choice).  Both frames must share a schema;
    output column order follows ``target``.
    """
    if target.columns != source.columns:
        raise ValueError(
            f"merge_upsert requires identical schemas: "
            f"target={target.columns} source={source.columns}"
        )
    non_keys = [c for c in target.columns if c not in keys]
    src = source.select(
        *[F.col(c).alias(f"__s_{c}") for c in source.columns]
    ).withColumn("__present", F.lit(True))
    cond = [F.col(k) == F.col(f"__s_{k}") for k in keys]
    joined = target.join(src, cond, "full_outer")
    picked = [
        F.coalesce(F.col(k), F.col(f"__s_{k}")).alias(k) for k in keys
    ] + [
        F.when(F.col("__present"), F.col(f"__s_{c}"))
        .otherwise(F.col(c))
        .alias(c)
        for c in non_keys
    ]
    return joined.select(*picked)
