"""Observability paths: the error-report sink (S8 — exceptions from a
route surfaced like reportError) and the MetricsRecorder/listener
wiring (O8/O9), plus the DynamicEngine route registry (O1)."""

from __future__ import annotations

import time

import pytest

from storm_dynamic_spout_spark.engine import DynamicEngine, EngineConfig
from storm_dynamic_spout_spark.streaming import (
    FileTopic,
    MetricsRecorder,
    attach_query_listener,
)


def test_query_listener_records_progress_and_errors(spark, tmp_path):
    recorder = MetricsRecorder()
    listener = attach_query_listener(spark, recorder)
    try:
        topic = FileTopic(str(tmp_path / "t"), num_partitions=2)
        topic.append([("a", "1"), ("b", "2")])

        # healthy query → started + input rows recorded
        ok = (
            topic.read_stream(spark)
            .writeStream.format("noop")
            .queryName("healthy_route")
            .option("checkpointLocation", str(tmp_path / "ck1"))
            .start()
        )
        ok.processAllAvailable()
        ok.stop()

        # failing query → errored count + exception gauge (S8 reportError)
        def boom(batch_df, batch_id):
            raise RuntimeError("synthetic batch failure")

        bad = (
            topic.read_stream(spark)
            .writeStream.queryName("failing_route")
            .option("checkpointLocation", str(tmp_path / "ck2"))
            .foreachBatch(boom)
            .start()
        )
        with pytest.raises(Exception):
            bad.awaitTermination(30)
        # listener events are async; wait for the terminated event
        deadline = time.time() + 15
        while time.time() < deadline and recorder.counters.get("queries.errored", 0) == 0:
            time.sleep(0.2)

        assert recorder.counters["queries.started"] >= 2
        assert recorder.counters["query.healthy_route.input_rows"] == 2
        assert recorder.counters["queries.errored"] >= 1
        assert any("exception" in k for k in recorder.gauges)
        # batch-phase timings recorded from durationMs
        assert any(k.startswith("query.healthy_route.duration_ms.") for k in recorder.gauges)
        assert recorder.gauges.get("query.healthy_route.batch_id") is not None
    finally:
        spark.streams.removeListener(listener)


def test_dynamic_engine_route_registry():
    class FakeQuery:
        stopped = False

        def stop(self):
            self.stopped = True

    eng = DynamicEngine.__new__(DynamicEngine)  # skip session creation
    eng.config = EngineConfig()
    eng._routes = {}
    q = FakeQuery()
    eng.add_route("r1", q)
    assert eng.has_route("r1") and eng.get_route("r1") is q
    with pytest.raises(ValueError):
        eng.add_route("r1", q)  # duplicate id rejected
    eng.close()
    assert q.stopped and not eng.has_route("r1")


def test_offset_total_parsing():
    from storm_dynamic_spout_spark.streaming.metrics import _offset_total

    assert _offset_total('{"logOffset": 7}') == 7          # file source
    assert _offset_total("42") == 42                        # bare int
    assert _offset_total('{"t": {"0": 10, "1": 5}}') == 15  # kafka-shaped, summed
    assert _offset_total(None) is None
    assert _offset_total("not json") is None
    assert _offset_total('{"a": "xyz"}') is None            # unparseable leaf


def test_listener_source_lag_from_rate_source(spark, tmp_path):
    """Sources that report latestOffset (rate here; Kafka in prod) get
    per-source lag gauges straight from StreamingQueryProgress."""
    import time as _time

    from storm_dynamic_spout_spark.streaming import attach_query_listener

    recorder = MetricsRecorder()
    listener = attach_query_listener(spark, recorder)
    try:
        q = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "100")
            .load()
            .writeStream.format("noop")
            .queryName("rate_route")
            .option("checkpointLocation", str(tmp_path / "ck_rate"))
            .start()
        )
        deadline = _time.time() + 30
        key = "query.rate_route.source.0.lag"
        while _time.time() < deadline and key not in recorder.gauges:
            _time.sleep(0.2)
        q.stop()
        assert key in recorder.gauges
        assert recorder.gauges[key] >= 0
    finally:
        spark.streams.removeListener(listener)


def test_record_route_lag_gauges():
    from storm_dynamic_spout_spark.streaming.metrics import record_route_lag

    recorder = MetricsRecorder()
    total = record_route_lag(recorder, "firehose", {0: 3, 1: 0, 2: 5})
    assert total == 8
    assert recorder.gauges["route.firehose.partition.0.lag"] == 3
    assert recorder.gauges["route.firehose.partition.2.lag"] == 5
    assert recorder.gauges["route.firehose.lag.total"] == 8
