"""Streaming control plane: dynamic filter chains, routing, sideline
state machine, retry/DLQ tables (SURVEY §2.9, §2.10).

All components are plain Python around public Spark APIs — predicates
are SQL strings (persistable + DuckDB-checkable), state lives in JSON
control tables, and runtime mutation happens at micro-batch boundaries
inside foreachBatch (SURVEY §7 hard parts 1-5).
"""

from storm_dynamic_spout_spark.streaming.coordinator import (
    Coordinator,
    FifoBufferPolicy,
    RatioBufferPolicy,
    RoundRobinBufferPolicy,
    ThrottledBufferPolicy,
    calculate_partition_assignment,
    merge_routes,
)
from storm_dynamic_spout_spark.streaming.file_topic import TOPIC_SCHEMA, FileTopic
from storm_dynamic_spout_spark.streaming.filter_chain import FilterChain
from storm_dynamic_spout_spark.streaming.dedup_stream import StreamingDedupIndex
from storm_dynamic_spout_spark.streaming.idempotent_sink import (
    IdempotentParquetSink,
)
from storm_dynamic_spout_spark.streaming.firehose import Firehose, write_sink_batch
from storm_dynamic_spout_spark.streaming.metrics import (
    JsonLinesRecorder,
    LogRecorder,
    MetricsRecorder,
    TimerManager,
    PartitionProgress,
    attach_query_listener,
    record_route_lag,
    route_progress,
)
from storm_dynamic_spout_spark.streaming.retry import (
    ExponentialBackoffRetryPolicy,
    FailedTuplesFirstRetryPolicy,
    NeverRetryPolicy,
    RetryPolicy,
    schedule_failures,
    split_due,
    split_exhausted,
)
from storm_dynamic_spout_spark.streaming.sideline import (
    FileWatchTrigger,
    InMemorySidelinePersistence,
    SidelineController,
    SidelinePayload,
    SidelinePersistence,
    SidelineRequest,
    SidelineTrigger,
    SidelineType,
    TriggerEvent,
)

__all__ = [
    "TOPIC_SCHEMA",
    "Coordinator",
    "ExponentialBackoffRetryPolicy",
    "FailedTuplesFirstRetryPolicy",
    "FifoBufferPolicy",
    "FileTopic",
    "FileWatchTrigger",
    "FilterChain",
    "Firehose",
    "IdempotentParquetSink",
    "InMemorySidelinePersistence",
    "JsonLinesRecorder",
    "LogRecorder",
    "MetricsRecorder",
    "NeverRetryPolicy",
    "PartitionProgress",
    "RatioBufferPolicy",
    "RetryPolicy",
    "RoundRobinBufferPolicy",
    "SidelineController",
    "SidelinePayload",
    "SidelinePersistence",
    "SidelineRequest",
    "SidelineTrigger",
    "SidelineType",
    "StreamingDedupIndex",
    "TimerManager",
    "ThrottledBufferPolicy",
    "TriggerEvent",
    "attach_query_listener",
    "calculate_partition_assignment",
    "merge_routes",
    "route_progress",
    "schedule_failures",
    "split_due",
    "split_exhausted",
    "write_sink_batch",
]
