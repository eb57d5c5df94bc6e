"""Hypothesis properties for the pure-math cores of the round-7
operators — no SparkSession, milliseconds per case.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=200, deadline=None)
@given(st.lists(st.integers(min_value=-32768, max_value=32767), max_size=300))
def test_halve_samples_matches_python_floor_mean(xs):
    from storm_dynamic_spout_spark.operators.multimodal import halve_samples

    res = halve_samples(xs)
    exp = [(xs[2 * i] + xs[2 * i + 1]) // 2 for i in range(len(xs) // 2)]
    assert list(res) == exp
    # stays in int16 range (the operator packs the stream as <i2)
    assert all(-32768 <= v <= 32767 for v in res)


@settings(max_examples=200, deadline=None)
@given(
    st.tuples(
        st.integers(min_value=-(1 << 29), max_value=(1 << 29) - 1),
        st.integers(min_value=-(1 << 29), max_value=(1 << 29) - 1),
    ),
    st.tuples(
        st.integers(min_value=-(1 << 29), max_value=(1 << 29) - 1),
        st.integers(min_value=-(1 << 29), max_value=(1 << 29) - 1),
    ),
)
def test_spatial_cell_key_injective(a, b):
    """The (cx, cy) → bigint packing used by grid_neighbor_pairs:
    distinct cells must get distinct keys (a collision would emit
    duplicate pair rows), and keys must fit in int64."""

    def key(cx, cy):
        return (cx + (1 << 30)) * (1 << 31) + (cy + (1 << 30))

    ka, kb = key(*a), key(*b)
    assert (ka == kb) == (a == b)
    assert -(1 << 63) <= ka < (1 << 63)


@settings(max_examples=100, deadline=None)
@given(st.integers(min_value=0, max_value=(1 << 62)), st.integers(min_value=1, max_value=5))
def test_split_block_mask_math(h, k):
    """The split-block bloom mask: k seeded bit choices inside one
    64-bit word — between 1 and k bits set, deterministic, and the
    word test (w & m) == m is monotone under adding more keys
    (bit_or can only add bits, never unset one)."""
    import hashlib

    def mask(key, k):
        m = 0
        for seed in range(1, k + 1):
            hv = int.from_bytes(
                hashlib.md5(f"{seed}:{key}".encode()).digest()[:8], "big"
            )
            m |= 1 << (hv % 64)
        return m

    m = mask(h, k)
    assert m == mask(h, k)
    assert 1 <= bin(m).count("1") <= k
    word = m | mask(h + 1, k)  # another key lands in the same word
    assert (word & m) == m  # no false negative after more inserts


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=20), max_size=400),
    st.integers(min_value=1, max_value=10),
)
def test_misra_gries_guarantee(xs, k):
    """The MG bound the two-pass heavy hitters relies on: every item
    with count > n/(k+1) survives in the summary, and each surviving
    estimate undercounts by at most n/(k+1)."""
    from collections import Counter

    from storm_dynamic_spout_spark.operators.sketch import misra_gries

    summary = misra_gries(xs, k)
    exact = Counter(xs)
    n = len(xs)
    assert len(summary) <= k
    for v, c in exact.items():
        if c * (k + 1) > n:
            assert v in summary, f"heavy item {v} (count {c}, n {n}) dropped"
    for v, est in summary.items():
        assert 0 < est <= exact[v]
        assert (exact[v] - est) * (k + 1) <= n


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=-32768, max_value=32767), max_size=200),
    st.integers(min_value=1, max_value=32768),
)
def test_trim_silence_bounds_properties(xs, threshold):
    """Trim bookkeeping: lead + kept + trail == n, kept starts and
    ends loud, nothing loud is ever trimmed, all-silent clips trim
    entirely to leading silence."""
    from storm_dynamic_spout_spark.operators.multimodal import trim_silence_bounds

    lead, trail, kept = trim_silence_bounds(xs, threshold)
    assert lead + trail + len(kept) == len(xs)
    assert list(kept) == xs[lead : len(xs) - trail]
    if len(kept):
        assert abs(kept[0]) >= threshold and abs(kept[-1]) >= threshold
    else:
        assert trail == 0 and lead == len(xs)
        assert all(abs(v) < threshold for v in xs)
    assert all(abs(v) < threshold for v in xs[:lead])
    if len(kept):
        assert all(abs(v) < threshold for v in xs[len(xs) - trail :])


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=12), max_size=150),
    st.lists(st.integers(min_value=0, max_value=12), max_size=150),
    st.integers(min_value=1, max_value=8),
)
def test_merge_summaries_keeps_heavy_hitter_recall(xs, ys, k):
    """Merged-and-trimmed MG summaries must (1) hold ≤ k counters,
    (2) never overestimate, (3) underestimate by at most n/(k+1), so
    every item with global count > n/(k+1) survives the merge — the
    cross-batch completeness stream_heavy_hitters relies on."""
    from collections import Counter

    from storm_dynamic_spout_spark.operators.sketch import (
        merge_summaries,
        misra_gries,
    )

    merged = merge_summaries(misra_gries(xs, k), misra_gries(ys, k), k)
    exact = Counter(xs) + Counter(ys)
    n = len(xs) + len(ys)
    assert len(merged) <= k
    for item, est in merged.items():
        assert est <= exact[item]
    for item, c in exact.items():
        assert merged.get(item, 0) >= c - n / (k + 1)
        if c * (k + 1) > n:
            assert item in merged


@settings(max_examples=150, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=200),
    st.lists(st.integers(min_value=0, max_value=400), min_size=1, max_size=200),
    st.integers(min_value=1, max_value=60),
)
def test_kmv_intersection_sees_exactly_true_commons_below_theta(xs, ys, k):
    """The theta-sketch invariant agg_kmv_intersect's join encodes:
    below theta = min(max(kmv_a), max(kmv_b)), the two k-minimum-value
    sketches retain EVERY hash the full sets share and nothing else —
    so n_common from the sketches equals the ground-truth common-hash
    count below theta computed from the FULL sets.  Fails if theta,
    the k-slice, or the join filter is off by one.  Also pins the
    integer floor-division estimator to its Python mirror."""
    import hashlib

    def h60(v):
        return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)

    ha = {h60(v) for v in xs}
    hb = {h60(v) for v in ys}
    kmv_a = sorted(ha)[:k]
    kmv_b = sorted(hb)[:k]
    theta = min(kmv_a[-1], kmv_b[-1])
    sketch_common = {h for h in set(kmv_a) & set(kmv_b) if h <= theta}
    true_common_below = {h for h in ha & hb if h <= theta}
    assert sketch_common == true_common_below
    est = len(sketch_common) * (1 << 60) // theta if theta else 0
    assert est >= len(sketch_common)  # domain/theta >= 1 by construction


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=9),
    st.integers(min_value=1, max_value=4),
    st.integers(min_value=0, max_value=2**31 - 1),
)
def test_sobel_energy_matches_naive_loop(h, w, c, seed):
    """Vectorized integer Sobel energy == per-pixel reference loop
    (valid mode, 601 floor luma), and flat images score exactly 0."""
    import numpy as np

    from storm_dynamic_spout_spark.operators.multimodal import sobel_energy

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    a = px.astype(np.int64)
    if c >= 3:
        luma = (299 * a[..., 0] + 587 * a[..., 1] + 114 * a[..., 2]) // 1000
    else:
        luma = a[..., 0]
    exp = 0
    for y in range(1, h - 1):
        for x in range(1, w - 1):
            gx = (
                luma[y - 1, x + 1] + 2 * luma[y, x + 1] + luma[y + 1, x + 1]
                - luma[y - 1, x - 1] - 2 * luma[y, x - 1] - luma[y + 1, x - 1]
            )
            gy = (
                luma[y + 1, x - 1] + 2 * luma[y + 1, x] + luma[y + 1, x + 1]
                - luma[y - 1, x - 1] - 2 * luma[y - 1, x] - luma[y - 1, x + 1]
            )
            exp += abs(int(gx)) + abs(int(gy))
    assert sobel_energy(px) == exp
    assert sobel_energy(np.full((h, w), 7, dtype=np.uint8)) == 0
