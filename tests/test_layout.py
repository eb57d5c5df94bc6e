"""Write-side layout: hive partitioning + within-file clustering
(operators/layout.py) — the properties that make 100 TB tables cheap
to read back: directory pruning, bounded file counts, sorted row
groups."""

from __future__ import annotations

import os

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from storm_dynamic_spout_spark.engine import load_table
from storm_dynamic_spout_spark.operators.layout import write_clustered


def test_write_clustered_layout_and_pruning(spark, sf_dir, tmp_path):
    orders = load_table(spark, sf_dir, "orders")
    out = str(tmp_path / "orders_by_status")
    write_clustered(
        orders,
        out,
        partition_by=["o_orderstatus"],
        cluster_by=["o_orderdate"],
        target_files=2,
    )

    # hive-style directories, one per status value
    dirs = sorted(d for d in os.listdir(out) if d.startswith("o_orderstatus="))
    assert dirs == ["o_orderstatus=F", "o_orderstatus=O", "o_orderstatus=P"]

    # bounded file count: repartition(2, status) means each directory is
    # written by at most 2 tasks — no small-files explosion
    for d in dirs:
        files = [f for f in os.listdir(os.path.join(out, d)) if f.endswith(".parquet")]
        assert 1 <= len(files) <= 2, (d, files)

    # round-trip fidelity (partition column comes back from the path)
    back = spark.read.parquet(out)
    assert back.count() == orders.count()
    assert set(back.columns) == set(orders.columns)

    # a status filter is PARTITION pruning, not a data filter: it must
    # appear in PartitionFilters in the scan, and prune to one dir
    plan = (
        back.filter(F.col("o_orderstatus") == "F")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pf = plan.split("PartitionFilters:")[1].split("]")[0]
    assert "o_orderstatus" in pf, plan

    # clustering: within every file the o_orderdate row-group stats are
    # sorted ⇒ a date range touches a contiguous span of row groups
    for d in dirs:
        pdir = os.path.join(out, d)
        for f in os.listdir(pdir):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(pdir, f)).metadata
            idx = {md.schema.column(i).name: i for i in range(md.num_columns)}["o_orderdate"]
            mins = [md.row_group(rg).column(idx).statistics.min for rg in range(md.num_row_groups)]
            assert mins == sorted(mins), (d, f, mins)


def test_firehose_sink_is_partitioned_and_prunes(spark, tmp_path):
    """The firehose output is a real partitioned table: event_date (and
    route_id in app mode) are hive keys, date predicates land in
    PartitionFilters, and compact_output merges the per-batch file
    spray without changing the data."""
    import os

    from storm_dynamic_spout_spark.streaming import FileTopic
    from storm_dynamic_spout_spark.streaming.filter_chain import FilterChain
    from storm_dynamic_spout_spark.streaming.firehose import Firehose
    from storm_dynamic_spout_spark.streaming.sideline import SidelineController

    topic = FileTopic(str(tmp_path / "t"), num_partitions=2)
    ctl = SidelineController(topic, FilterChain(), str(tmp_path / "state"))
    fh = Firehose(
        spark, topic, ctl,
        output_dir=str(tmp_path / "out"),
        checkpoint_dir=str(tmp_path / "ck"),
    )
    fh.start(max_files_per_trigger=1)  # one micro-batch per append file
    try:
        for i in range(4):
            topic.append([("k", f"v{i}")])
        fh.process_all_available()
    finally:
        fh.stop()

    # hive layout on disk
    assert any(d.startswith("event_date=") for d in os.listdir(fh.output_dir))

    # date predicate prunes at the directory level
    df = fh.output().filter("offset >= 0")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan

    before = sorted(r["value"] for r in fh.output().collect())
    assert before == ["v0", "v1", "v2", "v3"]

    # per-batch spray -> compacted, data identical
    def data_files(root):
        out = []
        for dirpath, _, files in os.walk(root):
            out += [f for f in files if f.endswith(".parquet")]
        return out

    assert len(data_files(fh.output_dir)) >= 4
    fh.compact_output(target_files=1)
    assert len(data_files(fh.output_dir)) < 4
    assert sorted(r["value"] for r in fh.output().collect()) == before


def test_app_optimize_output_compacts_and_preserves(spark, tmp_path):
    """DynamicStreamApp.optimize_output: per-batch file spray in the
    merged output collapses per (route_id, event_date) partition, data
    and layout (hive keys) identical; refuses to run while open."""
    import os

    import pytest

    from storm_dynamic_spout_spark.streaming.app import DynamicStreamApp

    app = DynamicStreamApp(
        spark, topic_path=str(tmp_path / "t"), workdir=str(tmp_path / "w"),
        num_partitions=2,
    )
    app.open(max_files_per_trigger=1)
    try:
        for i in range(4):
            app.produce([("k", f"v{i}")])
        app.process_all_available()
        with pytest.raises(RuntimeError):
            app.optimize_output()
    finally:
        app.close()

    before = sorted((r["offset"], r["value"]) for r in app.output().collect())

    def data_files(root):
        out = []
        for dirpath, _, files in os.walk(root):
            out += [f for f in files if f.endswith(".parquet")]
        return out

    n_before = len(data_files(app.out_dir))
    assert n_before >= 4
    app.optimize_output(target_files=1)
    assert len(data_files(app.out_dir)) < n_before
    assert any(d.startswith("route_id=") for d in os.listdir(app.out_dir))
    assert sorted((r["offset"], r["value"]) for r in app.output().collect()) == before
