"""FileTopic compaction: retention floors + small-file merge with
two-phase crash safety.

The reference delegates log retention to the Kafka broker and trusts
``beginningOffsets`` when seeking (``kafka/Consumer.java``); here the
file-backed topic owns that maintenance op itself, Delta-OPTIMIZE
style: rewrite → durable intent → idempotent delete.
"""

from __future__ import annotations

import json
import os

from storm_dynamic_spout_spark.streaming import FileTopic


def _data_files(topic):
    return sorted(f for f in os.listdir(topic.data_dir) if f.endswith(".parquet"))


def test_compact_merges_files_keeps_all_rows(spark, tmp_path):
    topic = FileTopic(str(tmp_path / "t"), num_partitions=2)
    for i in range(5):
        topic.append([(f"k{i}", f"v{i}"), (f"k{i}x", f"w{i}")])
    assert len(_data_files(topic)) == 5
    before = sorted(
        (r["partition"], r["offset"], r["value"])
        for r in topic.read(spark).collect()
    )
    stats = topic.compact()
    assert stats == {"files_before": 5, "files_after": 1, "rows_dropped": 0}
    assert len(_data_files(topic)) == 1
    after = sorted(
        (r["partition"], r["offset"], r["value"])
        for r in topic.read(spark).collect()
    )
    assert after == before
    # offsets bookkeeping untouched by a pure merge
    assert topic.earliest_offsets() == {0: 0, 1: 0}


def test_compact_applies_retention_floor(spark, tmp_path):
    topic = FileTopic(str(tmp_path / "t"), num_partitions=1)
    topic.append([("k", str(i)) for i in range(10)])  # offsets 0..9, one file
    topic.append([("k", str(i)) for i in range(10, 14)])  # offsets 10..13
    stats = topic.compact(retain_offsets={0: 10})
    assert stats["rows_dropped"] == 10
    rows = topic.read(spark).collect()
    assert sorted(r["offset"] for r in rows) == [10, 11, 12, 13]
    assert topic.earliest_offsets() == {0: 10}
    # next offset keeps advancing from where it was — retention never
    # rewinds the producer clock
    assert topic.latest_offsets() == {0: 13}
    topic.append([("k", "new")])
    assert topic.latest_offsets() == {0: 14}
    # a replay window entirely below the floor yields no rows
    assert topic.read_range(spark, {0: -1}, {0: 9}).count() == 0


def test_retention_floor_survives_reopen(spark, tmp_path):
    root = str(tmp_path / "t")
    topic = FileTopic(root, num_partitions=1)
    topic.append([("k", str(i)) for i in range(6)])
    topic.compact(retain_offsets={0: 4})
    reopened = FileTopic(root)
    assert reopened.earliest_offsets() == {0: 4}
    assert sorted(r["offset"] for r in reopened.read(spark).collect()) == [4, 5]


def test_interrupted_compaction_healed_on_open(spark, tmp_path):
    root = str(tmp_path / "t")
    topic = FileTopic(root, num_partitions=1)
    topic.append([("k", "a"), ("k", "b")])
    topic.append([("k", "c")])
    # run a real compaction to get the merged file on disk, then
    # simulate a crash between phase 1 and phase 2: restore one
    # superseded file and re-write the meta with the intent pending
    files_before = _data_files(topic)
    topic.compact()
    stale = os.path.join(topic.data_dir, files_before[0])
    with open(stale, "wb") as f:
        f.write(b"partial garbage from the pre-compaction file")
    meta = json.loads(open(topic._meta_path).read())
    meta["pending_compaction"] = {"drop_files": files_before}
    with open(topic._meta_path, "w") as f:
        json.dump(meta, f)
    # reopen: recovery must re-run the delete phase and clear the intent
    healed = FileTopic(root)
    assert not os.path.exists(stale)
    meta = json.loads(open(healed._meta_path).read())
    assert "pending_compaction" not in meta
    assert sorted(r["value"] for r in healed.read(spark).collect()) == ["a", "b", "c"]


def test_compact_empty_topic_is_noop(tmp_path):
    topic = FileTopic(str(tmp_path / "t"), num_partitions=2)
    stats = topic.compact(retain_offsets={0: 5})
    assert stats == {"files_before": 0, "files_after": 0, "rows_dropped": 0}
    assert topic.earliest_offsets() == {0: 5, 1: 0}
