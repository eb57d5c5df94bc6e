"""Plan guard for table_partition_prune: the date-range read must
touch only the matching partition directories (directory-level
pruning, not row-level filtering), and PartitionFilters must appear in
the scan."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.catalog.sources_io import PRUNE_HI, PRUNE_LO
from storm_dynamic_spout_spark.engine import load_table

SF = "/root/testdata/sf0.001"


def test_date_range_scan_prunes_partitions(spark):
    e = load_table(spark, SF, "events").withColumn("event_date", F.to_date("ts"))
    path = tempfile.mkdtemp(prefix="sdss-prune-guard-")
    e.write.mode("overwrite").partitionBy("event_date").parquet(path)
    back = spark.read.parquet(path)
    filtered = back.filter(F.col("event_date").between(F.lit(PRUNE_LO), F.lit(PRUNE_HI)))

    def selected_partitions(df):
        scan = df._jdf.queryExecution().executedPlan().collectLeaves().head()
        return scan.selectedPartitions().partitionCount()

    n_all = selected_partitions(back)
    n_pruned = selected_partitions(filtered)
    assert n_all == 30, n_all  # one dir per fixture date
    assert n_pruned == 7, n_pruned  # only the in-range dirs survive

    scan_str = (
        filtered._jdf.queryExecution().executedPlan().collectLeaves().head().toString()
    )
    assert "PartitionFilters" in scan_str
    assert "(event_date" in scan_str.split("PartitionFilters")[1].split("]")[0]
    # metadata-only pruning: no residual row-level filter on the
    # partition column (it is not written into the data files)
    assert "DataFilters: []" in scan_str


def test_partition_count_matches_distinct_dates(spark):
    e = load_table(spark, SF, "events").withColumn("event_date", F.to_date("ts"))
    n_dates = e.select("event_date").distinct().count()
    path = tempfile.mkdtemp(prefix="sdss-prune-guard2-")
    e.write.mode("overwrite").partitionBy("event_date").parquet(path)
    back = spark.read.parquet(path)
    dirs = {
        [s for s in f.split("/") if s.startswith("event_date=")][0]
        for f in back.inputFiles()
    }
    assert len(dirs) == n_dates
