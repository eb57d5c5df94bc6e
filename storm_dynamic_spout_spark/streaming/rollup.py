"""Continuous rollup: an incrementally-maintained time-bucketed
aggregate table (north-star extension; the "hypertable rollup" /
continuous-aggregate pattern of time-series stores).

A 100 TB event stream is queried through its rollups — nobody scans
raw events for "hourly volume by type".  The engine maintains the
rollup *incrementally*: each micro-batch contributes one partial
aggregate (map-side combine + ONE shuffle on the rollup keys), which
merges into the persistent table with decomposable merge functions
(count/sum add; min/max fold).  Cost per batch is O(batch + |table|),
never O(history) — the raw events are re-read by nothing.

Exactly-once table maintenance on at-least-once delivery: the table
swap is atomic (tmp + rename) and a ``batch_id`` high-water mark makes
re-delivered batches no-ops — the standard idempotent-foreachBatch
recipe, same shape as the engine's other control tables.

Exactness across engines: the measure column should be an exact
integer (e.g. cents = ``round(value*100)::long``) so partial sums merge
associatively — double partial-sums would differ from a one-pass sum in
the last ulp and break oracle hash-matches (see catalog histogram note).

Engine mapping notes (reference parity): the reference has no
aggregation at all (SURVEY §2.4 absent); this is the §2.4 "declared"
surface extended to streaming state, same micro-batch merge discipline
as ``streaming/dedup_stream.py``.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ContinuousRollup:
    """Maintains ``(bucket_start, *key_cols) -> (n, sum_m, min_m, max_m)``
    incrementally across micro-batches."""

    def __init__(
        self,
        workdir: str,
        key_cols: list[str],
        measure_col: str,
        time_col: str = "ts",
        bucket: str = "hour",
        distinct_col: str | None = None,
    ) -> None:
        """``distinct_col`` adds a mergeable distinct-count: the table
        stores an HLL sketch per rollup key (``hll_sketch_agg``), merged
        across batches with ``hll_union_agg`` — register-wise max is
        commutative/associative, so the incremental estimate equals the
        one-pass estimate EXACTLY, not just approximately.  This is the
        only way distinct-counts compose incrementally at 100 TB
        (an exact distinct would need the full value set per bucket)."""
        self.table_dir = os.path.join(workdir, "rollup")
        self.meta_path = os.path.join(workdir, "rollup-meta.json")
        self.key_cols = list(key_cols)
        self.measure_col = measure_col
        self.time_col = time_col
        self.bucket = bucket
        self.distinct_col = distinct_col
        os.makedirs(self.table_dir, exist_ok=True)

    # -- state ---------------------------------------------------------------

    def _last_batch_id(self) -> int:
        if not os.path.exists(self.meta_path):
            return -1
        with open(self.meta_path) as fh:
            return int(json.load(fh).get("last_batch_id", -1))

    def _set_last_batch_id(self, batch_id: int) -> None:
        tmp = self.meta_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"last_batch_id": int(batch_id)}, fh)
        os.replace(tmp, self.meta_path)

    def table(self, spark: SparkSession) -> DataFrame | None:
        if not any(f.endswith(".parquet") for f in os.listdir(self.table_dir)):
            return None
        return spark.read.parquet(self.table_dir)

    def read(self, spark: SparkSession) -> DataFrame | None:
        """The rollup with derived columns (avg = sum/n; the distinct
        estimate decoded from the HLL sketch) — decomposable aggregates
        store only mergeable state, deriving at read time."""
        t = self.table(spark)
        if t is None:
            return None
        out = t.withColumn("avg_m", F.col("sum_m") / F.col("n"))
        if self.distinct_col is not None:
            out = out.withColumn(
                "n_distinct", F.hll_sketch_estimate(F.col("hll"))
            )
        return out

    # -- the per-batch step --------------------------------------------------

    def _partial(self, batch_df: DataFrame) -> DataFrame:
        bucket_start = F.date_trunc(self.bucket, F.col(self.time_col))
        aggs = [
            F.count(F.lit(1)).alias("n"),
            F.sum(self.measure_col).alias("sum_m"),
            F.min(self.measure_col).alias("min_m"),
            F.max(self.measure_col).alias("max_m"),
        ]
        if self.distinct_col is not None:
            aggs.append(F.hll_sketch_agg(self.distinct_col).alias("hll"))
        return (
            batch_df.withColumn("bucket_start", bucket_start)
            .groupBy("bucket_start", *self.key_cols)
            .agg(*aggs)
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> bool:
        """Merge one micro-batch into the rollup.  Returns False (no-op)
        for an already-applied ``batch_id`` — idempotent under
        at-least-once redelivery.  ONE shuffle on the rollup keys; the
        persistent table is read back compact (it is the aggregate, not
        the history)."""
        import uuid

        if batch_id <= self._last_batch_id():
            return False
        spark = batch_df.sparkSession
        partial = self._partial(batch_df)
        existing = self.table(spark)
        merged_src = (
            partial if existing is None else existing.unionByName(partial)
        )
        merge_aggs = [
            F.sum("n").alias("n"),
            F.sum("sum_m").alias("sum_m"),
            F.min("min_m").alias("min_m"),
            F.max("max_m").alias("max_m"),
        ]
        if self.distinct_col is not None:
            merge_aggs.append(F.hll_union_agg("hll").alias("hll"))
        merged = merged_src.groupBy("bucket_start", *self.key_cols).agg(*merge_aggs)
        tmp = f"{self.table_dir}-tmp-{uuid.uuid4().hex[:8]}"
        merged.write.mode("overwrite").parquet(tmp)
        import shutil

        old = f"{self.table_dir}-old-{uuid.uuid4().hex[:8]}"
        os.rename(self.table_dir, old)
        os.rename(tmp, self.table_dir)
        shutil.rmtree(old)
        self._set_last_batch_id(batch_id)
        return True
