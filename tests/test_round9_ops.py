"""Round-9 operator contracts not covered by the driver oracle rows:
LPA's converge-or-max-rounds mode (r8 verdict item 7), the fixed-rate
video frame sampler's stride/clock arithmetic, and the trained IVF
assignment's agreement with a brute-force argmax."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F


def _lpa(spark, edge_rows, rounds, converge):
    from storm_dynamic_spout_spark.operators.graph import lpa_labels

    edges = spark.createDataFrame(edge_rows, "a long, b long")
    return {
        r["node"]: r["lbl"]
        for r in lpa_labels(edges, "a", "b", rounds, converge=converge).collect()
    }


def test_lpa_converge_mode_matches_fixed_rounds_at_fixpoint(spark):
    """Once the fixed round count reaches the fixpoint, both modes must
    return identical labels — on a clique, on two disjoint edges (the
    bipartite oscillation case the self-vote damps), and on a path."""
    cases = [
        [(a, b) for a in range(1, 5) for b in range(a + 1, 5)],  # clique
        [(1, 2), (10, 11)],  # two isolated edges (bipartite pieces)
        [(1, 2), (2, 3), (3, 4)],  # path
    ]
    for edges in cases:
        fixed = _lpa(spark, edges, rounds=6, converge=False)
        conv = _lpa(spark, edges, rounds=6, converge=True)
        assert fixed == conv, edges


def test_lpa_converge_stops_early_and_respects_cap(spark):
    """converge=True must stop as soon as a round changes nothing (a
    clique stabilizes well before a generous cap — same answer either
    way), and the cap must still bound pathological inputs: with
    rounds=1 both modes return the same one-round labels."""
    clique = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    assert set(_lpa(spark, clique, rounds=20, converge=True).values()) == {1}
    one_fixed = _lpa(spark, clique, rounds=1, converge=False)
    one_conv = _lpa(spark, clique, rounds=1, converge=True)
    assert one_fixed == one_conv


def test_frame_sample_stride_arithmetic_and_clock(spark):
    """Every stride-th index starting at 0, timestamps from the avih
    header clock (usec_per_frame), shas equal to direct hashes of the
    container's own frame payloads; stride > n_frames yields just
    frame 0."""
    from storm_dynamic_spout_spark.operators.multimodal import (
        frame_sample_stride,
        make_mjpeg_avi,
        parse_mjpeg_avi,
    )

    n_frames, fps = 7, 10
    buf = make_mjpeg_avi(b"seed-r9", 16, 16, n_frames, fps=fps)
    _, frames = parse_mjpeg_avi(buf)
    df = spark.createDataFrame([(1, bytearray(buf))], "doc_id long, content binary")

    got = frame_sample_stride(df, stride=3).orderBy("frame_index").collect()
    assert [r["frame_index"] for r in got] == [0, 3, 6]
    assert [r["ts_micros"] for r in got] == [0, 300_000, 600_000]
    assert all(r["width"] == 16 and r["height"] == 16 for r in got)
    assert [r["frame_sha"] for r in got] == [
        hashlib.sha256(frames[i]).hexdigest() for i in (0, 3, 6)
    ]

    wide = frame_sample_stride(df, stride=100).collect()
    assert [r["frame_index"] for r in wide] == [0]


def test_ivf_assign_labels_matches_bruteforce(spark):
    """The fused train+assign operator must agree with a per-row
    python brute force: centroids = per-label means, assignment =
    argmax cosine with ties to the smallest label."""
    from storm_dynamic_spout_spark.operators.similarity import ivf_assign_labels

    rows = [
        (i, [float((i * 7 + j * 3) % 5 + 1) for j in range(4)], i % 3)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {
        r["vec_id"]: r["assigned"]
        for r in ivf_assign_labels(df, "vec_id", "embedding", "label").collect()
    }

    by_label: dict[int, list[list[float]]] = {}
    for _, vec, lbl in rows:
        by_label.setdefault(lbl, []).append(vec)
    cents = {
        lbl: [sum(v[j] for v in vs) / len(vs) for j in range(4)]
        for lbl, vs in by_label.items()
    }

    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return d / (na * nb)

    for vid, vec, _ in rows:
        want = min(cents, key=lambda lbl: (-cos(vec, cents[lbl]), lbl))
        assert got[vid] == want, vid


def test_ivf_assign_plan_collapses_map_side(spark):
    """The n x k candidate fan-out must collapse by min_by partial
    aggregation — no window over the corpus, centroids broadcast."""
    from storm_dynamic_spout_spark.operators.similarity import ivf_assign_labels

    rows = [(i, [float(j) for j in range(4)], i % 3) for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    plan = (
        ivf_assign_labels(df, "vec_id", "embedding", "label")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan
    assert "BroadcastExchange" in plan or "BroadcastNestedLoopJoin" in plan
    assert "partial" in plan.lower()
