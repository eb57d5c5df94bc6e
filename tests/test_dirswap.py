"""Crash-safety of the index compaction swap (streaming/dirswap.py):
every interruption state of swap_publish must heal on restart instead
of presenting a silently-empty index — the failure mode where a crash
between the two renames plus makedirs(exist_ok=True) on restart loses
the whole index while its data sits in an orphaned dir."""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from storm_dynamic_spout_spark.engine import load_table
from storm_dynamic_spout_spark.streaming.ann_stream import StreamingAnnIndex
from storm_dynamic_spout_spark.streaming.dedup_stream import StreamingDedupIndex
from storm_dynamic_spout_spark.streaming.dirswap import (
    recover_interrupted_swap,
    swap_publish,
)

SF = "/root/testdata/sf0.001"


def _seed_index(spark, workdir):
    idx = StreamingAnnIndex(workdir)
    emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
    idx.process_batch(emb.filter(F.col("vec_id") < 80))
    idx.process_batch(emb.filter((F.col("vec_id") >= 80) & (F.col("vec_id") < 120)))
    return idx


def test_crash_between_renames_recovers_from_old(spark):
    """State: live dir renamed away, tmp never promoted (the lethal
    window).  A restarted instance must restore the old dir, not start
    empty."""
    workdir = tempfile.mkdtemp(prefix="swap-t1-")
    idx = _seed_index(spark, workdir)
    n = idx.index_df(spark).count()
    # simulate: crash right after rename(live -> old); tmp was partial
    # (no _SUCCESS) so it must NOT be promoted
    os.rename(idx.index_dir, f"{idx.index_dir}-old-deadbeef")
    os.makedirs(f"{idx.index_dir}-compact-deadbeef")
    with open(f"{idx.index_dir}-compact-deadbeef/part-0.parquet", "wb") as fh:
        fh.write(b"partial garbage")
    reopened = StreamingAnnIndex(workdir)
    assert reopened.index_df(spark) is not None, "index lost after crash"
    assert reopened.index_df(spark).count() == n
    assert not os.path.exists(f"{idx.index_dir}-compact-deadbeef")


def test_crash_after_merge_complete_promotes_tmp(spark):
    """State: tmp fully written (_SUCCESS), live renamed away, second
    rename never ran — restart must promote the finished merge."""
    workdir = tempfile.mkdtemp(prefix="swap-t2-")
    idx = _seed_index(spark, workdir)
    n = idx.index_df(spark).count()
    merged = idx.index_df(spark).dropDuplicates(["__id"]).repartition(1)
    tmp = f"{idx.index_dir}-compact-cafebabe"
    merged.write.mode("overwrite").parquet(tmp)
    os.rename(idx.index_dir, f"{idx.index_dir}-old-cafebabe")
    reopened = StreamingAnnIndex(workdir)
    assert reopened.index_df(spark).count() == n
    assert not os.path.exists(f"{idx.index_dir}-old-cafebabe")


def test_completed_swap_leftovers_are_cleaned(spark):
    """State: swap finished but rmtree(old) didn't run — live dir wins,
    stale orphans removed."""
    workdir = tempfile.mkdtemp(prefix="swap-t3-")
    idx = _seed_index(spark, workdir)
    n = idx.compact_index(spark)
    stale = f"{idx.index_dir}-old-0badf00d"
    shutil.copytree(idx.index_dir, stale)
    reopened = StreamingAnnIndex(workdir)
    assert reopened.index_df(spark).count() == n
    assert not os.path.exists(stale)


def test_dedup_index_compaction_is_crash_safe(spark):
    """Same recovery contract on the dedup signature index."""
    workdir = tempfile.mkdtemp(prefix="swap-t4-")
    idx = StreamingDedupIndex(workdir)
    docs = load_table(spark, SF, "documents").select("doc_id", "text").limit(80)
    idx.process_batch(docs, lambda df: df.count())
    n = idx.index_df(spark).count()
    os.rename(idx.index_dir, f"{idx.index_dir}-old-feedface")
    reopened = StreamingDedupIndex(workdir)
    assert reopened.index_df(spark) is not None, "index lost after crash"
    assert reopened.index_df(spark).count() == n


def test_swap_publish_roundtrip_without_spark(tmp_path):
    """Pure-filesystem contract: publish replaces the live dir and
    removes both working dirs."""
    live = str(tmp_path / "idx")
    os.makedirs(live)
    with open(os.path.join(live, "a.parquet"), "w") as fh:
        fh.write("v1")

    def write_tmp(tmp):
        os.makedirs(tmp)
        with open(os.path.join(tmp, "b.parquet"), "w") as fh:
            fh.write("v2")
        open(os.path.join(tmp, "_SUCCESS"), "w").close()

    swap_publish(live, write_tmp)
    assert sorted(os.listdir(live)) == ["_SUCCESS", "b.parquet"]
    assert recover_interrupted_swap(live) is None
