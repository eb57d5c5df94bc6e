"""Contiguous-prefix offset tracking (SURVEY §2.9 T1).

The reference's correctness kernel: offsets *start* in order but
*finish* out of order; the committable position of a partition is the
highest offset whose predecessors have ALL finished — committing past a
gap would lose the in-flight record on restart
(``consumer/PartitionOffsetManager.java:34-52`` semantics, ``:102-165``
algorithm; rationale ``kafka/Consumer.java:62-90``).

Spark's micro-batch checkpoint makes this unnecessary on the main path
(the batch is the atomic unit), so this tracker exists for the one case
the survey carves out: per-record ordering emulation when a ``foreach``
sink acks records individually — plus parity with the reference's only
micro-benchmark harness (``PartitionOffsetManagerTest.java:211-268``,
run via ``python -m storm_dynamic_spout_spark.streaming.offsets``).

The reference keeps a TreeSet per partition (O(log n) per op); here a
min-heap of started offsets + a hash set of out-of-order finishes gives
the same amortized O(log n) starts and O(1)-amortized finishes.
"""

from __future__ import annotations

import heapq


class PartitionOffsetManager:
    """Tracks started vs finished offsets for ONE partition."""

    def __init__(self, last_finished_offset: int = -1) -> None:
        self._last_finished = last_finished_offset
        self._started: list[int] = []  # min-heap of in-flight offsets
        self._finished_out_of_order: set[int] = set()

    def start_offset(self, offset: int) -> None:
        """Record an offset as emitted/in-flight
        (PartitionOffsetManager.startOffset)."""
        heapq.heappush(self._started, offset)

    def finish_offset(self, offset: int) -> None:
        """Record an offset as acked; advance the contiguous prefix as
        far as possible (PartitionOffsetManager.finishOffset)."""
        self._finished_out_of_order.add(offset)
        while self._started and self._started[0] in self._finished_out_of_order:
            done = heapq.heappop(self._started)
            self._finished_out_of_order.discard(done)
            self._last_finished = done

    def last_finished_offset(self) -> int:
        """Highest CONTIGUOUS finished offset — the safe commit point."""
        return self._last_finished

    def last_started_offset(self) -> int:
        """Highest started offset (or last finished when nothing is
        in-flight) — the reference's lastStartedOffset."""
        if not self._started:
            return self._last_finished
        return max(self._started)

    @property
    def in_flight(self) -> int:
        return len(self._started)


class PartitionOffsetsManager:
    """Multi-partition wrapper (``consumer/PartitionOffsetsManager.java:
    43-183``): one manager per (namespace, partition); the aggregate
    state is the ConsumerState snapshot."""

    def __init__(self) -> None:
        self._managers: dict[int, PartitionOffsetManager] = {}

    def for_partition(self, partition: int) -> PartitionOffsetManager:
        if partition not in self._managers:
            self._managers[partition] = PartitionOffsetManager()
        return self._managers[partition]

    def start_offset(self, partition: int, offset: int) -> None:
        self.for_partition(partition).start_offset(offset)

    def finish_offset(self, partition: int, offset: int) -> None:
        self.for_partition(partition).finish_offset(offset)

    def state(self) -> dict[int, int]:
        """ConsumerState: last safe commit offset per partition."""
        return {p: m.last_finished_offset() for p, m in sorted(self._managers.items())}


# ---------------------------------------------------------------------------
# Micro-benchmark harness (PartitionOffsetManagerTest.java:211-268 parity:
# sizes 10 → 1.28M, acks arrive out of order within a random spread of 100)
# ---------------------------------------------------------------------------


def run_micro_benchmark(sizes: tuple[int, ...] = (10, 1_000, 10_000, 100_000, 1_280_000)) -> list[dict]:
    import random
    import time

    results = []
    for n in sizes:
        rng = random.Random(42)
        mgr = PartitionOffsetManager()
        t0 = time.perf_counter()
        for off in range(n):
            mgr.start_offset(off)
        start_ms = (time.perf_counter() - t0) * 1000
        # out-of-order acks: shuffle within a sliding window of 100
        offsets = list(range(n))
        for i in range(0, n, 100):
            window = offsets[i : i + 100]
            rng.shuffle(window)
            offsets[i : i + 100] = window
        t0 = time.perf_counter()
        for off in offsets:
            mgr.finish_offset(off)
        finish_ms = (time.perf_counter() - t0) * 1000
        assert mgr.last_finished_offset() == n - 1, "tracker lost offsets"
        results.append(
            {"n": n, "start_ms": round(start_ms, 2), "finish_ms": round(finish_ms, 2)}
        )
    return results


if __name__ == "__main__":
    for row in run_micro_benchmark():
        print(row)
