"""FileTopic: a partitioned, offset-addressed append log on disk.

The Kafka-topic stand-in for tests and local development: same logical
model as the reference's consumer view of a topic — records keyed by
``(partition, offset)`` with per-partition monotonically increasing
offsets (``consumer/ConsumerPartition.java:33-96``,
``consumer/ConsumerState.java:39-48``) — but backed by parquet files so
both batch reads (bounded sideline replays, ``kafka/Consumer.java``
``startingOffsets``/``endingOffsets`` analogue) and Structured Streaming
reads (the live firehose) work against the same data with no broker.

Scale note: the storage layout is one parquet file per append batch
under ``<root>/data/``; Spark's file streaming source lists and
micro-batches those files exactly the way the Kafka source batches
offset ranges. At cluster scale the same engine code runs against
``format("kafka")`` — the only difference is the source options, which
``sources.registry`` owns.
"""

from __future__ import annotations

import json
import os
import zlib
from typing import Any, Iterable

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Engine-default source schema (SURVEY §1.3): exactly Spark's Kafka
#: source shape minus the broker-only columns.
TOPIC_SCHEMA = T.StructType(
    [
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("key", T.StringType(), True),
        T.StructField("value", T.StringType(), True),
        T.StructField("timestamp", T.TimestampType(), True),
    ]
)

_ARROW_SCHEMA = pa.schema(
    [
        ("partition", pa.int32()),
        ("offset", pa.int64()),
        ("key", pa.string()),
        ("value", pa.string()),
        ("timestamp", pa.timestamp("us")),
    ]
)


def _hash_partition(key: str | None, num_partitions: int) -> int:
    """Deterministic key→partition assignment (crc32, like Kafka's
    default murmur2-mod partitioner in spirit; null key → partition 0)."""
    if key is None:
        return 0
    return zlib.crc32(key.encode("utf-8")) % num_partitions


class FileTopic:
    """A partitioned append log: ``append`` on the producer side,
    ``read``/``read_stream``/``read_range`` on the consumer side,
    ``latest_offsets`` as the ConsumerState snapshot
    (``ConsumerState.java:161-199`` builder analogue).
    """

    def __init__(self, root: str, num_partitions: int = 4) -> None:
        self.root = root
        self.num_partitions = num_partitions
        self.data_dir = os.path.join(root, "data")
        self._meta_path = os.path.join(root, "_topic.json")
        os.makedirs(self.data_dir, exist_ok=True)
        if os.path.exists(self._meta_path):
            meta = json.loads(open(self._meta_path).read())
            self.num_partitions = meta["num_partitions"]
            self._next_offsets = {int(k): v for k, v in meta["next_offsets"].items()}
            self._batch_seq = meta["batch_seq"]
            self._clock_us = meta["clock_us"]
            self._earliest_offsets = {
                int(k): v for k, v in meta.get("earliest_offsets", {}).items()
            } or {p: 0 for p in range(self.num_partitions)}
            # finish an interrupted compaction: the intent record names
            # the files whose rows were already rewritten — deleting them
            # is idempotent, so recovery just re-runs the delete phase
            pending = meta.get("pending_compaction")
            if pending:
                for f in pending["drop_files"]:
                    path = os.path.join(self.data_dir, f)
                    if os.path.exists(path):
                        os.remove(path)
                self._save_meta()  # clears pending (not a field on self)
            # finish an interrupted append: the intent record (persisted
            # AFTER the hidden tmp file was fully written, with the offset
            # advance) names the batch file to publish — renaming is
            # idempotent, so recovery just re-runs the publish phase
            pending_batch = meta.get("pending_batch")
            if pending_batch:
                tmp = os.path.join(self.data_dir, pending_batch["tmp"])
                final = os.path.join(self.data_dir, pending_batch["final"])
                if os.path.exists(tmp):
                    os.replace(tmp, final)
                self._save_meta()
            # orphaned tmp files (crash BEFORE the intent was persisted):
            # their offsets were never claimed, so they are dead data —
            # drop them; readers never saw them (hidden "." prefix)
            for f in os.listdir(self.data_dir):
                if f.startswith(".tmp-batch-"):
                    os.remove(os.path.join(self.data_dir, f))
        else:
            self._next_offsets = {p: 0 for p in range(num_partitions)}
            self._batch_seq = 0
            self._clock_us = 1_700_000_000_000_000  # deterministic logical clock
            self._earliest_offsets = {p: 0 for p in range(num_partitions)}
            self._save_meta()

    # -- producer side ------------------------------------------------------

    def _save_meta(
        self,
        pending_compaction: dict | None = None,
        pending_batch: dict | None = None,
    ) -> None:
        # atomic write (tmp + rename): a crash mid-write must not corrupt
        # the offset bookkeeping — same crash-safety bar as the
        # reference's ZK state (persistence/ZookeeperPersistenceAdapter)
        meta = {
            "num_partitions": self.num_partitions,
            "next_offsets": self._next_offsets,
            "batch_seq": self._batch_seq,
            "clock_us": self._clock_us,
            "earliest_offsets": self._earliest_offsets,
        }
        if pending_compaction is not None:
            meta["pending_compaction"] = pending_compaction
        if pending_batch is not None:
            meta["pending_batch"] = pending_batch
        tmp = self._meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(meta, f)
        os.replace(tmp, self._meta_path)

    def append(self, records: Iterable[tuple[str | None, str]]) -> int:
        """Append ``(key, value)`` records; returns the count written.

        Offsets are assigned per partition monotonically; the logical
        clock advances 1ms per record so event-time ordering matches
        offset ordering (deterministic, test-friendly).
        """
        cols: dict[str, list[Any]] = {k: [] for k in ("partition", "offset", "key", "value", "timestamp")}
        n = 0
        for key, value in records:
            p = _hash_partition(key, self.num_partitions)
            off = self._next_offsets[p]
            self._next_offsets[p] = off + 1
            self._clock_us += 1000
            cols["partition"].append(p)
            cols["offset"].append(off)
            cols["key"].append(key)
            cols["value"].append(value)
            cols["timestamp"].append(self._clock_us)
            n += 1
        if n == 0:
            return 0
        table = pa.Table.from_pydict(
            {
                "partition": pa.array(cols["partition"], pa.int32()),
                "offset": pa.array(cols["offset"], pa.int64()),
                "key": pa.array(cols["key"], pa.string()),
                "value": pa.array(cols["value"], pa.string()),
                "timestamp": pa.array(cols["timestamp"], pa.timestamp("us")),
            },
            schema=_ARROW_SCHEMA,
        )
        # Crash-safe publish in three steps (duplicate-(partition,offset)
        # rows are impossible, the invariant offset-window replays and
        # sideline bounds depend on):
        #   1. write the batch to a HIDDEN tmp file (readers + Spark's file
        #      source ignore "."-prefixed names) — a crash here leaves an
        #      orphan that __init__ sweeps, offsets unclaimed;
        #   2. atomically persist the offset advance together with a
        #      publish intent — once durable, the offsets are burned and
        #      can never be reassigned;
        #   3. rename tmp → final (atomic, idempotent — __init__ re-runs
        #      it if we crash before clearing the intent).
        final = f"batch-{self._batch_seq:08d}.parquet"
        tmp = f".tmp-{final}"
        self._batch_seq += 1
        pq.write_table(table, os.path.join(self.data_dir, tmp))
        self._save_meta(pending_batch={"tmp": tmp, "final": final})
        os.replace(
            os.path.join(self.data_dir, tmp), os.path.join(self.data_dir, final)
        )
        self._save_meta()
        return n

    # -- consumer side ------------------------------------------------------

    def earliest_offsets(self) -> dict[int, int]:
        """First offset still present per partition — the Kafka
        ``beginningOffsets`` analogue. Advances when :meth:`compact`
        applies a retention floor; replays below it return no rows."""
        return dict(self._earliest_offsets)

    def compact(self, retain_offsets: dict[int, int] | None = None) -> dict[str, int]:
        """Merge all sealed batch files into one compacted file, dropping
        rows below the per-partition retention floor (first offset to
        KEEP). The broker-side maintenance op the reference delegates to
        Kafka log retention/cleanup (``kafka/Consumer.java`` trusts
        ``beginningOffsets``); Delta-style OPTIMIZE for the file layout.

        Crash-safe in two phases, mirroring a Delta commit: (1) write the
        compacted file, then atomically persist an intent record naming
        the superseded files; (2) delete them and clear the intent. A
        crash between the phases is healed on the next open by re-running
        the idempotent delete phase (see ``__init__``).

        MUST run in a maintenance window with no live ``read_stream``
        attached: Spark's file source tracks seen files by name, so the
        rewritten file would re-deliver old rows into an in-flight
        stream. Batch ``read``/``read_range`` callers are unaffected.

        Returns ``{"files_before", "files_after", "rows_dropped"}``.
        """
        import pyarrow.compute as pc

        floors = {p: self._earliest_offsets.get(p, 0) for p in range(self.num_partitions)}
        if retain_offsets:
            for p, off in retain_offsets.items():
                floors[int(p)] = max(floors[int(p)], int(off))
        files = sorted(f for f in os.listdir(self.data_dir) if f.endswith(".parquet"))
        if not files:
            self._earliest_offsets = floors
            self._save_meta()
            return {"files_before": 0, "files_after": 0, "rows_dropped": 0}
        merged = pa.concat_tables(
            pq.read_table(os.path.join(self.data_dir, f), schema=_ARROW_SCHEMA)
            for f in files
        )
        floor_per_row = pc.take(
            pa.array([floors[p] for p in range(self.num_partitions)], pa.int64()),
            merged.column("partition"),
        )
        kept = merged.filter(pc.greater_equal(merged.column("offset"), floor_per_row))
        files_after = 0
        if kept.num_rows > 0:
            # sort so parquet row-group min/max stats stay tight for the
            # offset-range pushdown in read_range
            kept = kept.sort_by([("partition", "ascending"), ("offset", "ascending")])
            out = f"compacted-{self._batch_seq:08d}.parquet"
            self._batch_seq += 1
            pq.write_table(kept, os.path.join(self.data_dir, out))
            files_after = 1
        # phase 1: durable intent (the compacted file is already on disk)
        self._earliest_offsets = floors
        self._save_meta(pending_compaction={"drop_files": files})
        # phase 2: idempotent delete, then clear the intent
        for f in files:
            os.remove(os.path.join(self.data_dir, f))
        self._save_meta()
        return {
            "files_before": len(files),
            "files_after": files_after,
            "rows_dropped": merged.num_rows - kept.num_rows,
        }

    def latest_offsets(self) -> dict[int, int]:
        """ConsumerState snapshot: last *written* offset per partition
        (−1 when empty). The sideline START/RESOLVE snapshots read this
        (``SidelineSpoutHandler.java:544-576``)."""
        return {p: off - 1 for p, off in self._next_offsets.items()}

    def read(self, spark: SparkSession) -> DataFrame:
        """Full batch scan (schema-pinned; no inference job)."""
        return spark.read.schema(TOPIC_SCHEMA).parquet(self.data_dir)

    def read_stream(self, spark: SparkSession, max_files_per_trigger: int | None = None) -> DataFrame:
        """The live firehose: Structured Streaming file source.
        ``max_files_per_trigger`` is the backpressure knob — the
        ``maxOffsetsPerTrigger`` analogue (SURVEY §2.7 M1)."""
        reader = spark.readStream.schema(TOPIC_SCHEMA)
        if max_files_per_trigger is not None:
            reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
        return reader.parquet(self.data_dir)

    def offset_range_condition(
        self,
        start_offsets: dict[int, int] | None = None,
        end_offsets: dict[int, int] | None = None,
    ):
        """The per-partition window ``start < offset <= end`` as ONE
        disjunctive Column — pushed to the parquet scan on batch reads
        (min/max row-group pruning) and applied per micro-batch on
        streaming replays. Both bounds are "last finished offset"
        snapshots: start exclusive, end inclusive."""
        conds = []
        for p in range(self.num_partitions):
            c = F.col("partition") == p
            if start_offsets is not None:
                c = c & (F.col("offset") > int(start_offsets.get(p, -1)))
            if end_offsets is not None:
                c = c & (F.col("offset") <= int(end_offsets.get(p, -1)))
            conds.append(c)
        cond = conds[0]
        for c in conds[1:]:
            cond = cond | c
        return cond

    def read_range(
        self,
        spark: SparkSession,
        start_offsets: dict[int, int] | None = None,
        end_offsets: dict[int, int] | None = None,
    ) -> DataFrame:
        """Bounded replay: the Kafka batch source ``startingOffsets``/
        ``endingOffsets`` analogue (``kafka/Consumer.java:261-310`` seek
        + ``VirtualSpout.java:293-303`` ending bound)."""
        return self.read(spark).filter(
            self.offset_range_condition(start_offsets, end_offsets)
        )
