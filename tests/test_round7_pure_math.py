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
