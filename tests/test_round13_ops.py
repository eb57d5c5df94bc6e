"""Round-13 catalog-query contracts beyond the driver oracle rows:
structural invariants of the Bradley-Terry readout (win/comparison
bookkeeping, mean-one normalization), the kappa bounds, and the BPE
application's rank/frequency discipline — cheap pins that hold at any
SF, complementing the bit-exact operator pins in
tests/test_round13_staging.py."""

from __future__ import annotations

from storm_dynamic_spout_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_rank_bradley_terry_bookkeeping(spark):
    rows = QUERIES["rank_bradley_terry"](spark, SF).collect()
    items = [r["item"] for r in rows]
    # one row per event_type seen in a comparison, sorted output
    assert items == sorted(items) and len(items) == len(set(items))
    # every comparison produces exactly one win and touches two items
    assert sum(r["n_wins"] for r in rows) * 2 == sum(
        r["n_comparisons"] for r in rows
    )
    # strengths are positive and mean-normalized to ~1
    assert all(r["strength"] > 0 for r in rows)
    mean = sum(r["strength"] for r in rows) / len(rows)
    assert abs(mean - 1.0) < 1e-4
    # the fit must order a clearly-dominant record above a losing one
    by_winrate = sorted(rows, key=lambda r: r["n_wins"] / r["n_comparisons"])
    assert by_winrate[0]["strength"] < by_winrate[-1]["strength"]


def test_rank_cohen_kappa_bounds(spark):
    row = QUERIES["rank_cohen_kappa"](spark, SF).first()
    import duckdb

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{SF}/documents.parquet')"
    ).fetchone()[0]
    # both raters label every document, so every item pairs up
    assert row["n_items"] == n_docs
    assert 0.0 <= row["po"] <= 1.0
    assert 0.0 <= row["pe"] < 1.0  # 5-label marginals can't be degenerate
    assert row["kappa"] is not None and row["kappa"] <= 1.0
    # kappa's defining identity at 6dp rounding tolerance
    want = (row["po"] - row["pe"]) / (1.0 - row["pe"])
    assert abs(row["kappa"] - want) < 5e-6


def test_text_bpe_apply_rank_discipline(spark):
    rows = QUERIES["text_bpe_apply"](spark, SF).collect()
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    counts = [r["n_occurrences"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r["n_occurrences"] > 0 for r in rows)
    # the applied tokenizer's head vocabulary must contain at least one
    # LEARNED token (multi-character = a merge product, since the start
    # state is single characters)
    assert any(len(r["token"]) > 1 for r in rows), [r["token"] for r in rows]
    # tokens are unique
    toks = [r["token"] for r in rows]
    assert len(toks) == len(set(toks))


def test_chars_boundary_inputs(spark):
    """Spark's sequence(1,0) descends — '' must yield [] (not ['','']),
    and 1-char words a singleton; the same bug class as the
    token_ngram_hashes short-doc crash fixed this round."""
    from storm_dynamic_spout_spark.operators.text import chars

    import pyspark.sql.functions as F

    rows = {
        r["w"]: list(r["c"])
        for r in spark.createDataFrame([("",), ("x",), ("ab",)], "w string")
        .select("w", chars(F.col("w")).alias("c"))
        .collect()
    }
    assert rows == {"": [], "x": ["x"], "ab": ["a", "b"]}
