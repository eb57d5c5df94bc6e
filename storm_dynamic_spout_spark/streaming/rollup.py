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

Exactly-once table maintenance on at-least-once delivery: each merge
writes a NEW versioned table directory containing both the parquet
files and a ``_rollup_meta.json`` batch_id marker, then publishes it
with ONE atomic ``os.replace`` of the ``rollup-CURRENT`` pointer file —
data and high-water mark commit together, so a crash at any point
either leaves the previous version fully live (the batch re-applies
idempotently on replay) or the new version fully live (the replay
no-ops).  There is no window where the table is absent or the marker
disagrees with the data; a CURRENT pointer naming a missing directory
is surfaced as corruption, never read as an empty table.

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
        self.workdir = workdir
        self.current_path = os.path.join(workdir, "rollup-CURRENT")
        self.key_cols = list(key_cols)
        self.measure_col = measure_col
        self.time_col = time_col
        self.bucket = bucket
        self.distinct_col = distinct_col
        os.makedirs(workdir, exist_ok=True)

    #: batch_id marker inside each version dir.  The leading underscore
    #: makes Spark's file index skip it (same convention as _SUCCESS),
    #: so the parquet read never sees it.
    META_NAME = "_rollup_meta.json"

    # -- state ---------------------------------------------------------------

    def _current_dir(self) -> str | None:
        """The live version directory, or None before the first commit.
        A CURRENT pointer naming a missing directory is corruption (the
        table was deleted out from under the marker) — raise, never
        silently treat it as an empty rollup."""
        if not os.path.exists(self.current_path):
            return None
        with open(self.current_path) as fh:
            name = fh.read().strip()
        d = os.path.join(self.workdir, name)
        if not os.path.isdir(d):
            raise RuntimeError(
                f"rollup corruption: CURRENT points at missing version {d!r}"
            )
        return d

    @property
    def table_dir(self) -> str:
        """Path of the live version dir (a not-yet-existing placeholder
        before the first commit, so globs simply match nothing)."""
        d = self._current_dir()
        return d if d is not None else os.path.join(self.workdir, "rollup-none")

    def _last_batch_id(self) -> int:
        d = self._current_dir()
        if d is None:
            return -1
        with open(os.path.join(d, self.META_NAME)) as fh:
            return int(json.load(fh).get("last_batch_id", -1))

    def table(self, spark: SparkSession) -> DataFrame | None:
        d = self._current_dir()
        if d is None:
            return None
        return spark.read.parquet(d)

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
        the history).

        Commit protocol (exactly-once): write the merged table AND its
        batch_id marker into a fresh version directory, then publish
        with one atomic ``os.replace`` of the CURRENT pointer.  A crash
        before the replace leaves the old version live (this batch_id is
        above the watermark, so replay re-merges it); a crash after
        leaves the new version live (replay no-ops).  Unpublished
        version dirs are garbage-collected on the next successful
        commit."""
        import shutil
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
        new_name = f"rollup-v{int(batch_id)}-{uuid.uuid4().hex[:8]}"
        new_dir = os.path.join(self.workdir, new_name)
        merged.write.mode("overwrite").parquet(new_dir)
        with open(os.path.join(new_dir, self.META_NAME), "w") as fh:
            json.dump({"last_batch_id": int(batch_id)}, fh)
        ptr_tmp = self.current_path + ".tmp"
        with open(ptr_tmp, "w") as fh:
            fh.write(new_name)
        os.replace(ptr_tmp, self.current_path)  # the single commit point
        for name in os.listdir(self.workdir):
            if name.startswith("rollup-v") and name != new_name:
                shutil.rmtree(os.path.join(self.workdir, name), ignore_errors=True)
        return True
