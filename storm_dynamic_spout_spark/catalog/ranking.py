"""Preference-ranking and annotation-quality queries (round 13):
Bradley-Terry strengths over a pairwise comparison log and Cohen's
kappa between an annotation column and an in-pipeline classifier —
the two readouts an RLHF preference-data pipeline runs before its
comparisons reach a reward-model fit.

Oracle SQL mirrors the engines' integer micro-unit arithmetic exactly
(the repo convention): the Bradley-Terry MM fold is replayed in DuckDB
as a ``list_reduce`` over a packed pair table with a LIST accumulator
(struct_pack accumulators rebind — see events_forecast_holt), using
the same overflow-safe div/mod split as ``operators/ranking.py``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from storm_dynamic_spout_spark.catalog.llm import _sql_lang_case
from storm_dynamic_spout_spark.catalog.registry import query, t
from storm_dynamic_spout_spark.operators import text as X
from storm_dynamic_spout_spark.operators.ranking import (
    BT_ITERATIONS,
    bradley_terry_strengths,
    cohen_kappa,
    pairwise_win_counts,
)

_MICRO = 1_000_000

#: The comparison log both engines derive from the events table: per
#: user, adjacent events (by event_id) pit their event_types against
#: each other, the higher ``value`` wins; same-type and equal-value
#: adjacencies are skipped (no self-pairs, no ties).
_COMPARISONS_SQL = """
    lagged AS (
      SELECT event_type, value,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id)
               AS pt,
             lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv
      FROM events
    ),
    comp AS (
      SELECT CASE WHEN value > pv THEN event_type ELSE pt END AS winner,
             CASE WHEN value > pv THEN pt ELSE event_type END AS loser
      FROM lagged
      WHERE pt IS NOT NULL AND event_type <> pt AND value <> pv
    )"""


def _bt_oracle() -> str:
    # the per-pair MM contribution under the CURRENT strengths `acc`,
    # micro-rounded BEFORE the per-item sum (exact, order-free)
    contrib = (
        f"CASE WHEN pa[j] = i OR pb[j] = i THEN CAST(round(n[j] * {_MICRO}"
        f" / ((acc[pa[j]] + acc[pb[j]]) / {_MICRO}.0)) AS BIGINT)"
        f" ELSE 0 END"
    )
    denom = (
        f"CAST(list_sum(list_transform(range(1, len(n) + 1), j -> {contrib}))"
        f" AS BIGINT)"
    )
    return f"""
    WITH {_COMPARISONS_SQL},
    pairs AS (
      SELECT least(winner, loser) AS item_a,
             greatest(winner, loser) AS item_b,
             CAST(sum(CASE WHEN winner < loser THEN 1 ELSE 0 END) AS BIGINT)
               AS wins_a,
             CAST(sum(CASE WHEN winner < loser THEN 0 ELSE 1 END) AS BIGINT)
               AS wins_b
      FROM comp GROUP BY 1, 2
    ),
    witem AS (
      SELECT item, CAST(sum(w) AS BIGINT) AS wins,
             CAST(sum(nc) AS BIGINT) AS ncomp
      FROM (SELECT item_a AS item, wins_a AS w, wins_a + wins_b AS nc
            FROM pairs
            UNION ALL
            SELECT item_b, wins_b, wins_a + wins_b FROM pairs)
      GROUP BY item
    ),
    -- pack the model-sized tables into parallel lists so the fixed
    -- MM iteration count folds as pure list arithmetic (items indexed
    -- by sorted position; pairs reference items by position)
    packed AS (
      SELECT (SELECT list(item ORDER BY item) FROM witem) AS items,
             (SELECT list(wins ORDER BY item) FROM witem) AS wins,
             (SELECT list(ncomp ORDER BY item) FROM witem) AS ncomp,
             (SELECT list(list_position((SELECT list(item ORDER BY item)
                FROM witem), item_a) ORDER BY item_a, item_b) FROM pairs)
               AS pa,
             (SELECT list(list_position((SELECT list(item ORDER BY item)
                FROM witem), item_b) ORDER BY item_a, item_b) FROM pairs)
               AS pb,
             (SELECT list(wins_a + wins_b ORDER BY item_a, item_b)
                FROM pairs) AS n
    ),
    -- {BT_ITERATIONS} MM iterations from the uniform start p=1e6
    -- micro-units; the inner [index, denom] pairing computes each
    -- item's denominator once, then the overflow-safe div/mod split
    -- mirrors operators/ranking.py bit for bit
    folded AS (
      SELECT items, wins, ncomp,
        list_reduce(
          list_prepend(
            list_transform(items, it -> CAST({_MICRO} AS BIGINT)),
            list_transform(range(1, {BT_ITERATIONS} + 1),
                           z -> CAST([] AS BIGINT[]))),
          (acc, x) -> list_transform(
            list_transform(range(1, len(items) + 1),
                           i -> [CAST(i AS BIGINT), {denom}]),
            d -> GREATEST(
              (wins[d[1]] * {_MICRO}) // d[2] * {_MICRO}
                + CAST(round(((wins[d[1]] * {_MICRO}) % d[2])
                             / d[2] * {_MICRO}) AS BIGINT),
              CAST(1 AS BIGINT)))) AS p
      FROM packed
    ),
    normed AS (
      SELECT items, wins, ncomp, p,
             list_sum(list_transform(p, v -> CAST(v AS DOUBLE))) / len(p)
               AS m
      FROM folded
    )
    SELECT items[u.i] AS item,
           round(p[u.i] / m * {_MICRO}) / {_MICRO} AS strength,
           wins[u.i] AS n_wins,
           ncomp[u.i] AS n_comparisons
    FROM normed, UNNEST(range(1, len(items) + 1)) AS u(i)
    ORDER BY item
    """


@query("rank_bradley_terry", oracle=_bt_oracle())
def rank_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry preference strengths (operators/ranking.py — the
    RLHF preference-data fit) over a comparison log derived from the
    events table: per user, adjacent events pit their event_types
    against each other and the higher ``value`` wins.  Hunter's MM
    update runs a fixed {BT_ITERATIONS} iterations with integer
    micro-unit contributions rounded BEFORE the per-item sum, so both
    engines' aggregates are exact and order-free.

    Why at 100 TB: the comparison log is the corpus-sized side and is
    scanned once per iteration with the CURRENT strengths (|items|
    rows — the model) broadcast onto it; the pair table the fit
    actually iterates on is the PAIR VOCABULARY, collapsed from the
    log by one hash aggregate up front."""
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    lagged = e.select(
        "event_type",
        "value",
        F.lag("event_type").over(w).alias("__pt"),
        F.lag("value").over(w).alias("__pv"),
    )
    comp = lagged.filter(
        F.col("__pt").isNotNull()
        & (F.col("event_type") != F.col("__pt"))
        & (F.col("value") != F.col("__pv"))
    ).select(
        F.when(F.col("value") > F.col("__pv"), F.col("event_type"))
        .otherwise(F.col("__pt"))
        .alias("winner"),
        F.when(F.col("value") > F.col("__pv"), F.col("__pt"))
        .otherwise(F.col("event_type"))
        .alias("loser"),
    )
    pairs = pairwise_win_counts(comp, "winner", "loser")
    return bradley_terry_strengths(pairs, BT_ITERATIONS).orderBy("item")


def _kappa_oracle() -> str:
    po = "n_agree / CAST(n AS DOUBLE)"
    pe = "pe_num / (CAST(n AS DOUBLE) * n)"
    return f"""
    WITH j AS (
      SELECT a.la, b.lb
      FROM (SELECT doc_id AS item, lang AS la FROM documents) a
      JOIN (SELECT doc_id AS item, {_sql_lang_case()} AS lb
            FROM documents) b USING (item)
    ),
    c AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree
      FROM j
    ),
    ma AS (SELECT la AS label, CAST(count(*) AS BIGINT) AS ca
           FROM j GROUP BY 1),
    mb AS (SELECT lb AS label, CAST(count(*) AS BIGINT) AS cb
           FROM j GROUP BY 1),
    pe_t AS (
      SELECT CAST(sum(COALESCE(ca, 0) * COALESCE(cb, 0)) AS BIGINT)
               AS pe_num
      FROM ma FULL OUTER JOIN mb USING (label)
    )
    SELECT n AS n_items,
           round({po}, 6) AS po,
           round({pe}, 6) AS pe,
           CASE WHEN {pe} < 1.0
                THEN round(({po} - {pe}) / (1.0 - {pe}), 6) END AS kappa
    FROM c, pe_t
    """


@query("rank_cohen_kappa", oracle=_kappa_oracle())
def rank_cohen_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa (operators/ranking.py — the labeling-pipeline
    quality gate) between the documents table's annotated ``lang``
    and the in-pipeline language-ID heuristic's prediction, framed as
    two raters over the same label log — chance-corrected agreement,
    the number that says whether the classifier can stand in for the
    annotation.  One row: (n_items, po, pe, kappa).

    Why at 100 TB: two filtered projections of the label log joined
    on item (one shuffle on doc id), exact integer count aggregates,
    and a label-vocabulary-sized marginal join — the corpus-sized
    work is the one equi-join; everything downstream is model-sized."""
    d = t(spark, sf_dir, "documents")
    log = d.select(
        F.col("doc_id").alias("item"),
        F.lit("gold").alias("rater"),
        F.col("lang").alias("label"),
    ).unionByName(
        d.select(
            F.col("doc_id").alias("item"),
            F.lit("langid").alias("rater"),
            X.lang_id(F.col("text")).alias("label"),
        )
    )
    return cohen_kappa(log, "item", "rater", "label", "gold", "langid")
