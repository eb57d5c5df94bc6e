"""Cluster sizing for the 100 TB design point.

`engine.build_session` carries the local defaults; this module derives
the conf set for a real cluster from first principles, so the same code
deploys from local[32] to 1000 executors by swapping the conf dict.

The arithmetic encodes the rules the local plans were audited against
(tests/test_plan_guards.py):

- **Shuffle partition count** targets ~`target_partition_mb` per
  post-shuffle partition: big shuffles (the 100 TB fact join) get
  ~`shuffled_bytes / target` partitions, never fewer than 2 per core —
  AQE coalesces DOWN from this initial count at runtime, which is cheap;
  starting too LOW cannot be fixed at runtime and spills.
- **Input split size** (`files.maxPartitionBytes`) balances scan
  parallelism against per-task overhead; with row-group pruning and
  pushdown the scan tasks are the cheap part, so 256 MB splits keep the
  task count ~400k for 100 TB — fine for a 1000-executor scheduler.
- **Broadcast threshold** stays at the default 10 MB unless the driver
  has headroom: broadcasting is per-executor memory, and a 1000-executor
  fleet multiplies every broadcast by 1000.
- **AQE on** everywhere: skew-join splitting replaces manual salting for
  sort-merge joins; `operators/skew.py` remains for hash-aggregate skew.
- **RocksDB state store** for streaming state (bounded memory); state
  rows are fixed-width per key by design (`streaming/stateful.py`).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class ClusterSpec:
    executors: int = 1000
    cores_per_executor: int = 4
    executor_memory_gb: int = 16
    # largest shuffle the workload performs (fact-fact join / big agg)
    max_shuffled_tb: float = 10.0


def derive_confs(spec: ClusterSpec, target_partition_mb: int = 128) -> dict[str, str]:
    """Conf dict for a cluster run; every value derived, none magic."""
    total_cores = spec.executors * spec.cores_per_executor
    shuffled_mb = spec.max_shuffled_tb * 1024 * 1024
    by_size = int(shuffled_mb / target_partition_mb)
    by_cores = total_cores * 2  # ≥2 waves so stragglers overlap
    shuffle_partitions = max(by_size, by_cores)
    return {
        "spark.sql.shuffle.partitions": str(shuffle_partitions),
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.coalescePartitions.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": f"{target_partition_mb}m",
        "spark.sql.files.maxPartitionBytes": "256m",
        "spark.sql.autoBroadcastJoinThreshold": "10m",
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.parquet.filterPushdown": "true",
        "spark.sql.streaming.stateStore.providerClass": (
            "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
        ),
        "spark.sql.execution.arrow.pyspark.enabled": "true",
        "spark.sql.session.timeZone": "UTC",
    }


def partitions_for_table(table_tb: float, target_partition_mb: int = 128) -> int:
    """How many partitions a repartition()/bucketBy of a table this size
    should use (e.g. bucket count for the co-located fact join)."""
    return max(int(table_tb * 1024 * 1024 / target_partition_mb), 1)
