"""Contiguous-prefix offset tracker tests — mirrors the reference's
contiguity cases (PartitionOffsetManagerTest.java:180-209) plus a
hypothesis property: for any ack order, the commit point is always the
contiguous prefix, never past a gap."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from storm_dynamic_spout_spark.streaming.offsets import (
    PartitionOffsetManager,
    PartitionOffsetsManager,
    run_micro_benchmark,
)


def test_in_order_acks_advance():
    m = PartitionOffsetManager()
    for off in range(3):
        m.start_offset(off)
    assert m.last_finished_offset() == -1
    m.finish_offset(0)
    assert m.last_finished_offset() == 0
    m.finish_offset(1)
    m.finish_offset(2)
    assert m.last_finished_offset() == 2
    assert m.in_flight == 0


def test_out_of_order_acks_hold_at_gap():
    m = PartitionOffsetManager()
    for off in range(4):
        m.start_offset(off)
    m.finish_offset(2)  # gap at 0,1 → cannot commit
    assert m.last_finished_offset() == -1
    m.finish_offset(0)
    assert m.last_finished_offset() == 0  # 1 still in flight
    m.finish_offset(3)
    assert m.last_finished_offset() == 0
    m.finish_offset(1)  # gap closes → prefix jumps to 3
    assert m.last_finished_offset() == 3


def test_initial_offset_resume():
    m = PartitionOffsetManager(last_finished_offset=99)
    assert m.last_finished_offset() == 99
    assert m.last_started_offset() == 99
    m.start_offset(100)
    assert m.last_started_offset() == 100
    m.finish_offset(100)
    assert m.last_finished_offset() == 100


def test_multi_partition_state():
    ms = PartitionOffsetsManager()
    ms.start_offset(0, 0)
    ms.start_offset(0, 1)
    ms.start_offset(1, 0)
    ms.finish_offset(0, 1)  # out of order on p0
    ms.finish_offset(1, 0)
    assert ms.state() == {0: -1, 1: 0}
    ms.finish_offset(0, 0)
    assert ms.state() == {0: 1, 1: 0}


@settings(max_examples=200, deadline=None)
@given(st.permutations(list(range(30))))
def test_any_ack_order_commits_only_contiguous_prefix(ack_order):
    m = PartitionOffsetManager()
    for off in range(30):
        m.start_offset(off)
    finished = set()
    for off in ack_order:
        m.finish_offset(off)
        finished.add(off)
        # invariant: commit point = largest k with {0..k} ⊆ finished
        expect = -1
        while expect + 1 in finished:
            expect += 1
        assert m.last_finished_offset() == expect
    assert m.last_finished_offset() == 29


def test_micro_benchmark_small_sizes():
    rows = run_micro_benchmark(sizes=(10, 1_000, 10_000))
    assert [r["n"] for r in rows] == [10, 1_000, 10_000]
    assert all(r["finish_ms"] >= 0 for r in rows)
