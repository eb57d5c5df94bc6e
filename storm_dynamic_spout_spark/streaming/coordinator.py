"""Route coordinator + merge/backpressure policies (SURVEY §2.7, §2.10).

The reference runs one thread per virtual spout under a capped pool
(``coordinator/SpoutCoordinator.java:58-178``) and merges their output
through a pluggable bounded ``MessageBuffer`` — round-robin (fair),
FIFO, throttled-by-regex, or weighted-ratio
(``buffer/RoundRobinBuffer.java``, ``FifoBuffer.java``,
``ThrottledMessageBuffer.java:79-90,310-327``,
``RatioMessageBuffer.java:76-149``).

Engine mapping: each route is a Structured Streaming query (Spark's
StreamingQueryManager is the thread pool); the merge point is either a
``unionByName`` of routed DataFrames into one sink (FIFO shape) or
parallel queries whose *rates* implement the buffer policy:

- RoundRobin / fairness → equal per-route rate caps + FAIR scheduler
- Throttled → matching route ids get a smaller ``maxFilesPerTrigger``
  (the ``maxOffsetsPerTrigger`` analogue) and a slower trigger
- Ratio → trigger cadence proportional to the configured ratio

Per-row interleaving ratios are not reproducible in Spark (SURVEY §7
hard part 4) — the engine guarantees *throughput* ratios, not row
ordering; tests assert rates, not interleaving.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Buffer policies → per-route rate/trigger settings
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class RoutePlan:
    """Resolved execution settings for one route."""

    route_id: str
    max_files_per_trigger: int | None
    trigger_interval_ms: int


class BufferPolicy:
    """Maps a route id to its rate settings (MessageBuffer SPI analogue,
    ``buffer/MessageBuffer.java:40-79``)."""

    def plan(self, route_id: str) -> RoutePlan:  # pragma: no cover - abstract
        raise NotImplementedError


@dataclass(frozen=True)
class FifoBufferPolicy(BufferPolicy):
    """No fairness: every route unthrottled (FifoBuffer.java:41-124)."""

    trigger_interval_ms: int = 0

    def plan(self, route_id: str) -> RoutePlan:
        return RoutePlan(route_id, None, self.trigger_interval_ms)


@dataclass(frozen=True)
class RoundRobinBufferPolicy(BufferPolicy):
    """Fair merge: equal bounded rate per route so a chatty stream can't
    starve others (RoundRobinBuffer.java:55-206; default bound 2000/route
    ``README.md:139`` → files-per-trigger cap here)."""

    max_per_trigger: int = 2000
    trigger_interval_ms: int = 0

    def plan(self, route_id: str) -> RoutePlan:
        return RoutePlan(route_id, self.max_per_trigger, self.trigger_interval_ms)


@dataclass(frozen=True)
class ThrottledBufferPolicy(BufferPolicy):
    """Routes matching ``throttle_regex`` get the smaller throttled rate
    (ThrottledMessageBuffer createBuffer regex match :310-327) — e.g.
    throttle sideline replays to protect the live stream."""

    throttle_regex: str = "^sideline.*"
    normal_max_per_trigger: int = 2000
    throttled_max_per_trigger: int = 200
    trigger_interval_ms: int = 0

    def plan(self, route_id: str) -> RoutePlan:
        if re.match(self.throttle_regex, route_id):
            return RoutePlan(route_id, self.throttled_max_per_trigger, self.trigger_interval_ms)
        return RoutePlan(route_id, self.normal_max_per_trigger, self.trigger_interval_ms)


@dataclass(frozen=True)
class RatioBufferPolicy(BufferPolicy):
    """Weighted merge: non-throttled routes get ``ratio``× the cadence
    (RatioMessageBuffer.java:76-149; default 5:1). Implemented as trigger
    cadence — throughput ratio, not per-row ordering."""

    throttle_regex: str = "^sideline.*"
    ratio: int = 5
    base_trigger_interval_ms: int = 1000
    #: optional per-trigger cap; with a cap set, trigger cadence alone
    #: fixes the max throughput ratio (cap × triggers/sec per route)
    max_per_trigger: int | None = None

    def plan(self, route_id: str) -> RoutePlan:
        if re.match(self.throttle_regex, route_id):
            return RoutePlan(route_id, self.max_per_trigger, self.base_trigger_interval_ms * self.ratio)
        return RoutePlan(route_id, self.max_per_trigger, self.base_trigger_interval_ms)


# ---------------------------------------------------------------------------
# Stream merge (M1/M3/M6): union of routed streams
# ---------------------------------------------------------------------------


def merge_routes(dfs: dict[str, DataFrame], route_col: str = "route_id") -> DataFrame:
    """Union routed streams into one, tagging provenance — the
    ``srcVirtualSpoutId`` of ``MessageId.java:33-61`` becomes a literal
    column so ack/fail routing survives the merge. ``unionByName`` keeps
    schema-by-name semantics across routes."""
    if not dfs:
        raise ValueError("merge_routes requires at least one route")
    tagged = [
        df.withColumn(route_col, F.lit(rid)) for rid, df in sorted(dfs.items())
    ]
    out = tagged[0]
    for df in tagged[1:]:
        out = out.unionByName(df)
    return out


# ---------------------------------------------------------------------------
# Coordinator (O2): query registry over StreamingQueryManager
# ---------------------------------------------------------------------------


class Coordinator:
    """SpoutCoordinator analogue: start/stop named streaming queries,
    capped concurrency, graceful shutdown with timeout
    (``SpoutCoordinator.java:295-391`` submit, ``:476-515`` close)."""

    def __init__(self, spark: SparkSession, max_concurrent_routes: int = 10) -> None:
        self.spark = spark
        self.max_concurrent_routes = max_concurrent_routes
        self._queries: dict[str, object] = {}

    def start_route(
        self,
        route_id: str,
        df: DataFrame,
        sink_builder,
        policy: BufferPolicy | None = None,
    ):
        """``sink_builder(writer, plan) -> StreamingQuery`` receives the
        pre-configured DataStreamWriter; policy decides rate/trigger."""
        if route_id in self._queries:
            raise ValueError(f"route already running: {route_id}")
        if len(self._queries) >= self.max_concurrent_routes:
            raise RuntimeError(
                f"max_concurrent_routes={self.max_concurrent_routes} reached"
            )
        plan = (policy or FifoBufferPolicy()).plan(route_id)
        writer = df.writeStream.queryName(route_id)
        if plan.trigger_interval_ms:
            writer = writer.trigger(processingTime=f"{plan.trigger_interval_ms} milliseconds")
        query = sink_builder(writer, plan)
        self._queries[route_id] = query
        return query

    def stop_route(self, route_id: str, timeout_s: float = 30.0) -> None:
        q = self._queries.pop(route_id, None)
        if q is not None:
            q.stop()
            q.awaitTermination(timeout_s)

    def active_routes(self) -> list[str]:
        return sorted(self._queries)

    def close(self, timeout_s: float = 30.0) -> None:
        for rid in list(self._queries):
            self.stop_route(rid, timeout_s)


# ---------------------------------------------------------------------------
# Partition distributor (S5) — parity algorithm
# ---------------------------------------------------------------------------


def calculate_partition_assignment(
    total_consumers: int, consumer_index: int, partition_ids: list[int]
) -> list[int]:
    """Static split of sorted partition ids across a consumer cohort
    (``consumer/PartitionDistributor.java:48-109``): contiguous chunks,
    earlier consumers take the remainder. Spark's sources do this
    natively (one task per partition); kept for API parity and for
    driver-side partition planning."""
    if total_consumers <= 0:
        raise ValueError("total_consumers must be > 0")
    if not 0 <= consumer_index < total_consumers:
        raise ValueError("consumer_index out of range")
    ids = sorted(partition_ids)
    n = len(ids)
    base = n // total_consumers
    extra = n % total_consumers
    start = consumer_index * base + min(consumer_index, extra)
    size = base + (1 if consumer_index < extra else 0)
    return ids[start : start + size]
