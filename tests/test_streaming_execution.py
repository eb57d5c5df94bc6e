"""Structured Streaming *execution* tests: the T13 event-time operators
and stream merges running as real streaming queries (not just their
batch-expressed oracle forms) over file-backed streams.

Covers: watermarked tumbling-window aggregation (append mode),
stream-static dimension join, stream-stream join with watermarks
(SURVEY §2.3), merge of two routed streams into one sink (M1), and
at-least-once restart from checkpoint (T1/T2).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.streaming import FileTopic, merge_routes


def _wait(query):
    query.processAllAvailable()


def test_streaming_windowed_agg_with_watermark(spark, tmp_path):
    topic = FileTopic(str(tmp_path / "t"), num_partitions=2)
    # events across two distinct hours (logical clock starts at a fixed
    # epoch; 1ms per record ⇒ same hour unless we append a lot — so fake
    # hours via the value and use the timestamp column directly)
    topic.append([("a", "1"), ("b", "2"), ("a", "3")])
    stream = topic.read_stream(spark)
    agg = (
        stream.withWatermark("timestamp", "1 hour")
        .groupBy(F.window("timestamp", "1 hour").alias("w"), "key")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("ws"), "key", "n")
    )
    out = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        _wait(out)
        rows = {(r["key"]): r["n"] for r in spark.table("win_agg").collect()}
        assert rows == {"a": 2, "b": 1}
    finally:
        out.stop()


def test_stream_static_dimension_join(spark, sf_dir, tmp_path):
    topic = FileTopic(str(tmp_path / "t"), num_partitions=2)
    topic.append([("1", "x"), ("2", "y"), ("99", "z")])  # 99: no dim match
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet").select(
        F.col("n_nationkey").cast("string").alias("key"), "n_name"
    )
    stream = topic.read_stream(spark)
    joined = stream.join(F.broadcast(nation), "key", "inner")
    out = (
        joined.writeStream.format("memory")
        .queryName("dim_join")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        _wait(out)
        got = {r["key"]: r["n_name"] for r in spark.table("dim_join").collect()}
        assert set(got) == {"1", "2"}  # unmatched key dropped by inner join
    finally:
        out.stop()


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """Two streams joined on key with watermarks both sides — the
    stateful stream-stream equi-join of SURVEY §2.3."""
    left = FileTopic(str(tmp_path / "l"), num_partitions=2)
    right = FileTopic(str(tmp_path / "r"), num_partitions=2)
    left.append([("k1", "l1"), ("k2", "l2")])
    right.append([("k1", "r1"), ("k3", "r3")])
    ls = (
        left.read_stream(spark)
        .withWatermark("timestamp", "1 hour")
        .select(F.col("key"), F.col("value").alias("lv"), F.col("timestamp").alias("lts"))
    )
    rs = (
        right.read_stream(spark)
        .withWatermark("timestamp", "1 hour")
        .select(F.col("key"), F.col("value").alias("rv"), F.col("timestamp").alias("rts"))
    )
    joined = ls.join(
        rs,
        (ls.key == rs.key)
        & (rs.rts >= ls.lts - F.expr("INTERVAL 1 HOUR"))
        & (rs.rts <= ls.lts + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select(ls.key, "lv", "rv")
    out = (
        joined.writeStream.format("memory")
        .queryName("ss_join")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        _wait(out)
        rows = [(r["key"], r["lv"], r["rv"]) for r in spark.table("ss_join").collect()]
        assert rows == [("k1", "l1", "r1")]
    finally:
        out.stop()


def test_union_merge_of_routed_streams(spark, tmp_path):
    """M1: two routes union into one sink with provenance tags — the
    MessageBuffer merge as a streaming plan."""
    live = FileTopic(str(tmp_path / "live"), num_partitions=2)
    replay = FileTopic(str(tmp_path / "replay"), num_partitions=2)
    live.append([("a", "live1"), ("b", "live2")])
    replay.append([("a", "old1")])
    merged = merge_routes(
        {
            "firehose": live.read_stream(spark),
            "sideline-s1": replay.read_stream(spark),
        }
    )
    out = (
        merged.writeStream.format("memory")
        .queryName("merged")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        _wait(out)
        rows = spark.table("merged").groupBy("route_id").count().collect()
        got = {r["route_id"]: r["count"] for r in rows}
        assert got == {"firehose": 2, "sideline-s1": 1}
    finally:
        out.stop()


def test_checkpoint_restart_at_least_once(spark, tmp_path):
    """T1/T2: restart the same query from its checkpoint — already-
    committed batches are not re-emitted, new appends are."""
    topic = FileTopic(str(tmp_path / "t"), num_partitions=2)
    out_dir = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    topic.append([("a", "v1"), ("b", "v2")])

    def start():
        return (
            topic.read_stream(spark)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .start()
        )

    q = start()
    _wait(q)
    q.stop()
    topic.append([("c", "v3")])
    q = start()
    _wait(q)
    q.stop()
    from storm_dynamic_spout_spark.streaming.file_topic import TOPIC_SCHEMA

    vals = sorted(
        r["value"] for r in spark.read.schema(TOPIC_SCHEMA).parquet(out_dir).collect()
    )
    assert vals == ["v1", "v2", "v3"]  # no duplicates, no loss


def test_custom_stateful_operator_across_batches(spark, tmp_path):
    """applyInPandasWithState: per-key state survives micro-batch
    boundaries — counts accumulate over two separate appends processed
    as separate batches."""
    from storm_dynamic_spout_spark.streaming import FileTopic
    from storm_dynamic_spout_spark.streaming.stateful import running_stats_per_key

    topic = FileTopic(str(tmp_path / "t"), num_partitions=2)
    topic.append([("a", "v1"), ("a", "v2"), ("b", "v3")])
    stats = running_stats_per_key(topic.read_stream(spark, max_files_per_trigger=1))
    out = (
        stats.writeStream.format("memory")
        .queryName("running_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        out.processAllAvailable()
        topic.append([("a", "v4")])  # second batch for key 'a'
        out.processAllAvailable()
        rows = spark.table("running_stats").collect()
        # memory sink in update mode appends each update; take the last per key
        latest = {}
        for r in rows:
            latest[r["key"]] = max(latest.get(r["key"], 0), r["n_records"])
        assert latest == {"a": 3, "b": 1}  # state carried across batches
    finally:
        out.stop()


def test_streaming_drop_duplicates_across_batches(spark, tmp_path):
    """Stateful streaming dedup (T13): dropDuplicates on key holds its
    seen-set across micro-batches — a re-sent key in a later batch is
    suppressed."""
    from storm_dynamic_spout_spark.streaming import FileTopic

    topic = FileTopic(str(tmp_path / "t"), num_partitions=2)
    topic.append([("k1", "v1"), ("k2", "v2")])
    deduped = topic.read_stream(spark, max_files_per_trigger=1).dropDuplicates(["key"])
    out = (
        deduped.writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        out.processAllAvailable()
        topic.append([("k1", "v1-dup"), ("k3", "v3")])  # k1 re-sent later
        out.processAllAvailable()
        rows = {r["key"]: r["value"] for r in spark.table("stream_dedup").collect()}
        assert rows == {"k1": "v1", "k2": "v2", "k3": "v3"}  # dup suppressed
    finally:
        out.stop()


# ---------------------------------------------------------------------------
# S4: offset-out-of-range / data-loss recovery (the failOnDataLoss=false +
# earliest-reset contract; kafka/Consumer.java:548-625 resets to the
# earliest available offset instead of dying, and the reference's
# DynamicSpoutTest exercises it via MockConsumer)
# ---------------------------------------------------------------------------


def _segment_files(topic):
    import os

    return sorted(
        f for f in os.listdir(topic.data_dir) if f.endswith(".parquet")
    )


def test_data_loss_batch_read_resets_to_earliest(spark, tmp_path):
    """A stored offset below the first surviving record: read_range must
    deliver exactly the surviving window — earliest-reset — not fail."""
    import os

    topic = FileTopic(str(tmp_path / "t"), num_partitions=2)
    topic.append([("a", "v1"), ("b", "v2")])
    topic.append([("a", "v3"), ("b", "v4")])
    first = _segment_files(topic)[0]
    os.remove(os.path.join(topic.data_dir, first))  # broker expired the segment

    # consumer resumes from its stored offsets (below earliest now)
    start = {p: -1 for p in range(topic.num_partitions)}
    rows = topic.read_range(spark, start_offsets=start).collect()
    assert sorted(r["value"] for r in rows) == ["v3", "v4"]


def test_data_loss_under_live_stream_recovers_and_continues(spark, tmp_path):
    """Delete a committed segment between restarts: the stream must come
    back from its checkpoint, not re-fail on the missing file, and keep
    delivering post-loss appends (at-least-once over surviving data)."""
    import os

    topic = FileTopic(str(tmp_path / "t"), num_partitions=2)
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    topic.append([("a", "v1"), ("b", "v2")])

    def start():
        return (
            topic.read_stream(spark)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck)
            .start()
        )

    q = start()
    _wait(q)
    q.stop()

    # data loss while the consumer is down, then new data arrives
    for f in _segment_files(topic):
        os.remove(os.path.join(topic.data_dir, f))
    topic.append([("c", "v5")])

    q = start()
    _wait(q)
    q.stop()

    from storm_dynamic_spout_spark.streaming.file_topic import TOPIC_SCHEMA

    vals = sorted(
        r["value"] for r in spark.read.schema(TOPIC_SCHEMA).parquet(out_dir).collect()
    )
    # pre-loss rows were already committed downstream; post-loss appends
    # flow; nothing re-emitted, nothing crashed
    assert vals == ["v1", "v2", "v5"]


def test_replay_below_retention_floor_resets_to_earliest(spark, tmp_path):
    """Sideline replay whose recorded start is below the compaction
    retention floor: delivered window starts at the floor (earliest),
    mirroring MockConsumer's earliest-reset in DynamicSpoutTest."""
    topic = FileTopic(str(tmp_path / "t"), num_partitions=1)
    topic.append([(None, f"v{i}") for i in range(6)])  # offsets 0..5, p0
    topic.compact(retain_offsets={0: 3})  # floor: offsets < 3 are gone
    assert topic.earliest_offsets() == {0: 3}

    # consumer's stored window (start=-1 → from 0) predates the floor
    rows = topic.read_range(spark, start_offsets={0: -1}).collect()
    assert sorted(r["offset"] for r in rows) == [3, 4, 5]


def test_transform_with_state_matches_apply_in_pandas_with_state(spark, tmp_path):
    """Spark 4 transformWithState (StatefulProcessor + typed value
    state) carries per-key state across micro-batches and produces the
    same answers as the applyInPandasWithState implementation.  The
    operator needs protobuf (the TWS state-server wire format), absent
    from this sandbox — the construction-time gate is asserted instead
    and the full scenario runs wherever protobuf exists."""
    import pytest

    from storm_dynamic_spout_spark.streaming import FileTopic
    from storm_dynamic_spout_spark.streaming.stateful import running_stats_per_key_tws

    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError:
        topic = FileTopic(str(tmp_path / "t"), num_partitions=2)
        topic.append([("a", "v1")])
        with pytest.raises(ImportError, match="protobuf"):
            running_stats_per_key_tws(
                topic.read_stream(spark, max_files_per_trigger=1)
            )
        return

    topic = FileTopic(str(tmp_path / "t"), num_partitions=2)
    topic.append([("a", "v1"), ("a", "v2"), ("b", "v3")])
    stats = running_stats_per_key_tws(
        topic.read_stream(spark, max_files_per_trigger=1)
    )
    out = (
        stats.writeStream.format("memory")
        .queryName("running_stats_tws")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        out.processAllAvailable()
        topic.append([("a", "v4")])
        out.processAllAvailable()
        rows = spark.table("running_stats_tws").collect()
        latest = {}
        for r in rows:
            latest[r["key"]] = max(latest.get(r["key"], 0), r["n_records"])
        assert latest == {"a": 3, "b": 1}
    finally:
        out.stop()
