"""Streaming incremental bloom filter (streaming/bloom_stream.py)."""

from __future__ import annotations

import pyspark.sql.functions as F

from storm_dynamic_spout_spark.streaming.bloom_stream import StreamingBloomFilter


def _batch(spark, ids):
    return spark.createDataFrame([(int(i),) for i in ids], "k long")


def test_no_false_negatives_across_batches(spark, tmp_path):
    """Every previously-ingested key MUST classify possibly_seen=True
    in later batches — the guarantee the fast path rests on."""
    bf = StreamingBloomFilter(str(tmp_path), "k")
    b1 = bf.classify_batch(_batch(spark, range(0, 500)))
    assert b1.filter("possibly_seen").count() == 0  # cold bitmap
    # batch 2: 250 repeats + 250 fresh
    b2 = bf.classify_batch(_batch(spark, range(250, 750)))
    repeats = b2.filter((F.col("k") < 500) & ~F.col("possibly_seen")).count()
    assert repeats == 0, "a seen key classified definite-new"


def test_fresh_keys_mostly_fast_path(spark, tmp_path):
    """A mostly-new batch must route ~all rows past the exact check:
    false positives at this fill level stay under a few percent."""
    bf = StreamingBloomFilter(str(tmp_path), "k")
    bf.classify_batch(_batch(spark, range(0, 2000)))
    fresh = bf.classify_batch(_batch(spark, range(100000, 102000)))
    fp = fresh.filter("possibly_seen").count()
    assert fp <= 0.03 * 2000, fp
    assert 0 < bf.saturation(spark) < 0.05


def test_redelivery_is_all_possible(spark, tmp_path):
    """Re-delivered batch (at-least-once): every key already in the
    bitmap → all rows flagged for the exact check, none slip through
    as new."""
    bf = StreamingBloomFilter(str(tmp_path), "k")
    bf.classify_batch(_batch(spark, range(0, 300)))
    again = bf.classify_batch(_batch(spark, range(0, 300)))
    assert again.filter(~F.col("possibly_seen")).count() == 0


def test_compaction_preserves_classification(spark, tmp_path):
    bf = StreamingBloomFilter(str(tmp_path), "k")
    for lo in (0, 400, 800):
        bf.classify_batch(_batch(spark, range(lo, lo + 400)))
    words = bf.compact_bitmap(spark)
    m_words = bf.m_bits >> 6
    assert 0 < words <= m_words
    # everything ingested pre-compaction still tests positive
    again = bf.classify_batch(_batch(spark, range(0, 1200)))
    assert again.filter(~F.col("possibly_seen")).count() == 0


def test_interrupted_compaction_heals(spark, tmp_path):
    import os

    bf = StreamingBloomFilter(str(tmp_path), "k")
    bf.classify_batch(_batch(spark, range(0, 100)))
    bf.compact_bitmap(spark)
    # simulate a crash mid-swap: live dir renamed to -old, new dir
    # not yet published (the dirswap crash window)
    token = "tok123"
    os.rename(bf.bitmap_dir, f"{bf.bitmap_dir}-old-{token}")
    healed = StreamingBloomFilter(str(tmp_path), "k")
    out = healed.classify_batch(_batch(spark, range(0, 100)))
    assert out.filter(~F.col("possibly_seen")).count() == 0, (
        "bitmap lost across interrupted swap"
    )


def test_fast_path_composition_equals_exact_dedup(spark, tmp_path):
    """The advertised usage, end-to-end: definite-new rows skip the
    exact history anti-join, possible-dups pay it — across batches
    the union of the two paths must emit EXACTLY the keys a plain
    exact streaming dedup would (same set, no loss, no dupes)."""
    import os

    bf = StreamingBloomFilter(str(tmp_path / "bloom"), "k")
    hist_dir = str(tmp_path / "history")
    os.makedirs(hist_dir)

    def has_history():
        return any(f.endswith(".parquet") for f in os.listdir(hist_dir))

    emitted = []
    batches = [
        list(range(0, 400)),
        list(range(200, 600)),          # 200 repeats
        list(range(0, 100)) + list(range(550, 700)),  # mixed repeats
    ]
    for ids in batches:
        classified = bf.classify_batch(_batch(spark, ids)).dropDuplicates(["k"])
        definite_new = classified.filter(~F.col("possibly_seen")).select("k")
        possible = classified.filter(F.col("possibly_seen")).select("k")
        if has_history():
            survived = possible.join(
                spark.read.parquet(hist_dir), "k", "left_anti"
            )
        else:
            survived = possible
        new_keys = definite_new.unionByName(survived).localCheckpoint(eager=True)
        emitted.append({r.k for r in new_keys.collect()})
        new_keys.write.mode("append").parquet(hist_dir)

    # ground truth: first batch to contain each key emits it
    seen: set[int] = set()
    for i, ids in enumerate(batches):
        expect = set(ids) - seen
        assert emitted[i] == expect, f"batch {i}"
        seen |= set(ids)
