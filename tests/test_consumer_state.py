"""Consumer-state persistence SPI (O6) + the monitor thread (O2) +
declared output stream ids/fields (SpoutConfig.java:70,
DynamicSpout.java:552-563): the config keys these features read were
previously declared-but-unwired — these tests pin the wiring."""

from __future__ import annotations

import time

from storm_dynamic_spout_spark.engine import EngineConfig
from storm_dynamic_spout_spark.streaming.app import DynamicStreamApp
from storm_dynamic_spout_spark.streaming.consumer_state import (
    FileConsumerStatePersistence,
    InMemoryConsumerStatePersistence,
)


def _vals(df, route=None):
    if route is not None:
        df = df.filter(df.route_id == route)
    return sorted(r["value"] for r in df.collect())


# -- pure-unit SPI tests (no Spark) -----------------------------------------


def test_file_adapter_crud(tmp_path):
    ad = FileConsumerStatePersistence(str(tmp_path / "cs"))
    assert ad.retrieve_state("firehose") is None
    ad.persist_state("firehose", {0: 10, 1: 25})
    ad.persist_state("sideline-s1", {0: 3})
    assert ad.retrieve_state("firehose") == {0: 10, 1: 25}
    assert ad.list_routes() == ["firehose", "sideline-s1"]
    ad.persist_state("firehose", {0: 12, 1: 25})  # overwrite = latest wins
    assert ad.retrieve_state("firehose") == {0: 12, 1: 25}
    ad.delete_state("sideline-s1")
    ad.delete_state("sideline-s1")  # idempotent
    assert ad.list_routes() == ["firehose"]


def test_in_memory_adapter_isolation():
    ad = InMemoryConsumerStatePersistence()
    ad.persist_state("r", {0: 1})
    got = ad.retrieve_state("r")
    got[0] = 999  # caller mutation must not leak into the store
    assert ad.retrieve_state("r") == {0: 1}


# -- app wiring -------------------------------------------------------------


def test_flush_consumer_state_records_high_water_marks(spark, tmp_path):
    app = DynamicStreamApp(spark, str(tmp_path / "t"), str(tmp_path / "w"))
    app.produce([("k1", "v1"), ("k2", "v2"), ("k3", "v3")])
    app.open()
    app.process_all_available()
    states = app.flush_consumer_state()
    assert "firehose" in states
    # persisted state equals the delivered per-partition max offsets
    assert app.consumer_state.retrieve_state("firehose") == states["firehose"]
    delivered = {
        (r["partition"], r["offset"]) for r in app._full_output().collect()
    }
    for p, o in states["firehose"].items():
        assert (p, o) in delivered
    app.close()


def test_monitor_thread_flushes_on_cadence(spark, tmp_path):
    app = DynamicStreamApp(
        spark,
        str(tmp_path / "t"),
        str(tmp_path / "w"),
        config=EngineConfig(
            {
                "coordinator.monitor_interval_ms": 50,
                "coordinator.state_flush_interval_ms": 50,
            }
        ),
    )
    app.produce([("k", "v1")])
    app.open()
    app.process_all_available()
    app.start_monitor()
    deadline = time.monotonic() + 30
    while time.monotonic() < deadline:
        if (
            app.recorder.counters.get("consumer_state.flushes", 0) >= 1
            and app.consumer_state.retrieve_state("firehose") is not None
        ):
            break
        time.sleep(0.1)
    app.stop_monitor()
    try:
        assert app.recorder.counters.get("consumer_state.flushes", 0) >= 1
        assert app.consumer_state.retrieve_state("firehose") is not None
        # lag gauge recorded by the monitor loop (O9 assign_value path)
        assert any("lag.total" in k for k in app.recorder.gauges)
    finally:
        app.close()


def test_custom_stream_ids_and_output_fields(spark, tmp_path):
    app = DynamicStreamApp(
        spark,
        str(tmp_path / "t"),
        str(tmp_path / "w"),
        config=EngineConfig(
            {
                "output.stream_id": "main",
                "output.failed_stream_id": "dead-letters",
                "output.fields": "key,value",
            }
        ),
    )
    assert app.dlq_dir.endswith("dead-letters")
    app.produce([("k1", "v1"), ("k2", "v2")])
    app.open()
    app.process_all_available()
    # rows tagged with the configured live-route id
    assert _vals(app.output(), "main") == ["v1", "v2"]
    # declared projection applies to the output view...
    assert app.output().columns == ["key", "value", "route_id"]
    # ...while progress/lag still work off the stored control columns
    assert sum(app.lag().values()) == 0
    app.close()


def test_remote_adapter_seam_is_injectable(spark, tmp_path):
    """The O6 swap: a custom adapter object (stand-in for ZK/DB) receives
    the flush — same seam shape as the O7 sideline persistence."""
    calls: list[tuple[str, dict[int, int]]] = []

    class RecordingAdapter(InMemoryConsumerStatePersistence):
        def persist_state(self, route_id, offsets):
            calls.append((route_id, dict(offsets)))
            super().persist_state(route_id, offsets)

    app = DynamicStreamApp(
        spark,
        str(tmp_path / "t"),
        str(tmp_path / "w"),
        consumer_state=RecordingAdapter(),
    )
    app.produce([("k", "v")])
    app.open()
    app.process_all_available()
    app.flush_consumer_state()
    assert calls and calls[0][0] == "firehose"
    app.close()
