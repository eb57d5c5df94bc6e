"""Multiple concurrent sidelines — the reference's core identity is
multiplexing MANY virtual spouts behind one interface (README.md:76-98);
here: several sidelines active at once, each with its own filter,
offset window, and replay, plus state-machine error paths."""

from __future__ import annotations

import pytest

from storm_dynamic_spout_spark.streaming.app import DynamicStreamApp
from storm_dynamic_spout_spark.streaming.sideline import SidelineRequest


def _vals(df, route=None):
    if route is not None:
        df = df.filter(df.route_id == route)
    return sorted(r["value"] for r in df.collect())


def test_three_concurrent_sidelines(spark, tmp_path):
    app = DynamicStreamApp(spark, str(tmp_path / "t"), str(tmp_path / "w"), num_partitions=8)
    app.produce([("t1", "a0"), ("t2", "b0"), ("t3", "c0"), ("ok", "k0")])
    app.open()
    app.process_all_available()

    # three sidelines started at DIFFERENT offsets → different windows
    app.sideline_start("s1", "key = 't1'")
    app.produce([("t1", "a1"), ("t2", "b1"), ("ok", "k1")])
    app.process_all_available()

    app.sideline_start("s2", "key = 't2'")
    app.produce([("t1", "a2"), ("t2", "b2"), ("t3", "c1"), ("ok", "k2")])
    app.process_all_available()

    app.sideline_start("s3", "key = 't3'")
    app.produce([("t3", "c2"), ("ok", "k3")])
    app.process_all_available()

    # firehose saw everything except each tenant after ITS start point
    assert _vals(app.output(), "firehose") == ["a0", "b0", "b1", "c0", "c1", "k0", "k1", "k2", "k3"]

    # resolve all three; each replay delivers exactly its own window
    for sid in ("s1", "s2", "s3"):
        app.sideline_resume(sid)
        app.sideline_resolve(sid)
        app.run_replay(sid)
    assert _vals(app.output(), "sideline-s1") == ["a1", "a2"]
    assert _vals(app.output(), "sideline-s2") == ["b2"]
    assert _vals(app.output(), "sideline-s3") == ["c2"]
    # every record delivered exactly once across all four routes
    assert len(_vals(app.output())) == 13
    app.close()


def test_state_machine_error_paths(spark, tmp_path):
    app = DynamicStreamApp(spark, str(tmp_path / "t"), str(tmp_path / "w"))
    ctl = app.controller
    with pytest.raises(KeyError):
        ctl.resume("missing")
    ctl.start(SidelineRequest("s1", "key = 'x'"))
    with pytest.raises(ValueError):  # duplicate start
        ctl.start(SidelineRequest("s1", "key = 'x'"))
    with pytest.raises(ValueError):  # replay before resume/resolve
        ctl.replay_df(spark, "s1")
    ctl.resume("s1")
    with pytest.raises(ValueError):  # resume is not re-enterable
        ctl.resume("s1")
    ctl.resolve("s1")
    with pytest.raises(ValueError):  # resolve is terminal
        ctl.resolve("s1")


def test_sideline_windows_are_independent_per_partition(spark, tmp_path):
    """Offset snapshots are PER PARTITION: records for other partitions
    produced between START and RESOLVE stay exactly once in the replay
    regardless of partition distribution (8 partitions)."""
    app = DynamicStreamApp(spark, str(tmp_path / "t"), str(tmp_path / "w"), num_partitions=8)
    app.open()
    app.produce([(f"k{i}", f"pre{i}") for i in range(16)])
    app.process_all_available()
    app.sideline_start("s", "key LIKE 'k1%'")  # k1, k10..k15
    app.produce([(f"k{i}", f"mid{i}") for i in range(16)])
    app.process_all_available()
    app.sideline_resume("s")
    app.sideline_resolve("s")
    n = app.run_replay("s")
    replayed = _vals(app.output(), "sideline-s")
    assert replayed == sorted(f"mid{i}" for i in [1] + list(range(10, 16)))
    assert n == len(replayed)
    app.close()
