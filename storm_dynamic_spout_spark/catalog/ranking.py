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
from storm_dynamic_spout_spark.operators.skew import fan_out_narrow
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
    # fan_out_narrow: lang_id regex per row is the CPU pass (skew.py note)
    d = fan_out_narrow(t(spark, sf_dir, "documents"))
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


# ---------------------------------------------------------------------------
# stream_bradley_terry (round 14 — the r13-staged streaming fit)
# ---------------------------------------------------------------------------

#: MM iterations per micro-batch in the streaming fit — must match
#: streaming/bt_stream.BT_STREAM_ITERATIONS (imported lazily in the
#: query body; duplicated here so the oracle SQL builds at import time
#: without touching the streaming module, and drift-pinned in
#: tests/test_round14_ops.py).
_BT_STREAM_K = 4


def _bts_fold(iters: int, init_expr: str, suffix: str) -> str:
    """One warm-startable MM fold over packed lists with per-stage
    columns wins{s}/pa{s}/pb{s}/n{s}.  ``denom = 0`` keeps the
    accumulator — items absent from a stage's pair table retain their
    warm-start value, which for stage 1's uniform init is EXACTLY the
    engine's new-items-enter-at-1e6 rule (tools/proto_bt_stream_oracle
    validated this end-to-end in round 13)."""
    contrib = (
        f"CASE WHEN pa{suffix}[j] = i OR pb{suffix}[j] = i THEN"
        f" CAST(round(n{suffix}[j] * {_MICRO}"
        f" / ((acc[pa{suffix}[j]] + acc[pb{suffix}[j]]) / {_MICRO}.0)) AS BIGINT)"
        f" ELSE 0 END"
    )
    denom = (
        f"CAST(list_sum(list_transform(range(1, len(n{suffix}) + 1),"
        f" j -> {contrib})) AS BIGINT)"
    )
    return f"""
      list_reduce(
        list_prepend({init_expr},
                     list_transform(range(1, {iters} + 1),
                                    z -> CAST([] AS BIGINT[]))),
        (acc, x) -> list_transform(
          list_transform(range(1, len(items) + 1),
                         i -> [CAST(i AS BIGINT), {denom}]),
          d -> CASE WHEN d[2] = 0 THEN acc[d[1]] ELSE GREATEST(
            (wins{suffix}[d[1]] * {_MICRO}) // d[2] * {_MICRO}
              + CAST(round(((wins{suffix}[d[1]] * {_MICRO}) % d[2])
                           / d[2] * {_MICRO}) AS BIGINT),
            CAST(1 AS BIGINT)) END))"""


def _bts_pairs_cte(name: str, where: str) -> str:
    return f"""{name} AS (
  SELECT least(winner, loser) AS item_a, greatest(winner, loser) AS item_b,
         CAST(sum(CASE WHEN winner < loser THEN 1 ELSE 0 END) AS BIGINT)
           AS wins_a,
         CAST(sum(CASE WHEN winner < loser THEN 0 ELSE 1 END) AS BIGINT)
           AS wins_b
  FROM comp {where} GROUP BY 1, 2)"""


def _bts_packed_stage(s: str, pairs: str) -> str:
    pos = "(SELECT list(item ORDER BY item) FROM all_items)"
    return f"""
    (SELECT list(coalesce(w.wins, 0) ORDER BY a.item)
       FROM all_items a LEFT JOIN w{s} w USING (item)) AS wins{s},
    (SELECT list(list_position({pos}, item_a) ORDER BY item_a, item_b)
       FROM {pairs}) AS pa{s},
    (SELECT list(list_position({pos}, item_b) ORDER BY item_a, item_b)
       FROM {pairs}) AS pb{s},
    (SELECT list(wins_a + wins_b ORDER BY item_a, item_b) FROM {pairs}) AS n{s}"""


def _bt_stream_oracle() -> str:
    """The two-batch warm-started schedule replayed as two nested
    list_reduce folds, the second seeded by the first, over ONE global
    sorted item list (aligning every stage's packed lists).  Stage 1 =
    even event_ids; stage 2's pair table is CUMULATIVE (all events) —
    exactly what StreamingBradleyTerry's state holds after batch 1."""
    comparisons = """
lagged AS (
  SELECT event_id, event_type, value,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS pt,
         lag(value) OVER (PARTITION BY user_id ORDER BY event_id) AS pv
  FROM events
),
comp AS (
  SELECT event_id,
         CASE WHEN value > pv THEN event_type ELSE pt END AS winner,
         CASE WHEN value > pv THEN pt ELSE event_type END AS loser
  FROM lagged WHERE pt IS NOT NULL AND event_type <> pt AND value <> pv
)"""
    return f"""
WITH {comparisons},
{_bts_pairs_cte('pairs1', 'WHERE event_id % 2 = 0')},
{_bts_pairs_cte('pairs2', '')},
all_items AS (
  SELECT DISTINCT item FROM (
    SELECT item_a AS item FROM pairs2 UNION ALL SELECT item_b FROM pairs2) t
),
w1 AS (SELECT item, CAST(sum(w) AS BIGINT) AS wins FROM (
    SELECT item_a AS item, wins_a AS w FROM pairs1
    UNION ALL SELECT item_b, wins_b FROM pairs1) t GROUP BY 1),
w2 AS (SELECT item, CAST(sum(w) AS BIGINT) AS wins FROM (
    SELECT item_a AS item, wins_a AS w FROM pairs2
    UNION ALL SELECT item_b, wins_b FROM pairs2) t GROUP BY 1),
nc2 AS (SELECT item, CAST(sum(nc) AS BIGINT) AS ncomp FROM (
    SELECT item_a AS item, wins_a + wins_b AS nc FROM pairs2
    UNION ALL SELECT item_b, wins_a + wins_b FROM pairs2) t GROUP BY 1),
packed AS (
  SELECT
    (SELECT list(item ORDER BY item) FROM all_items) AS items,
    (SELECT list(coalesce(n.ncomp, 0) ORDER BY a.item)
       FROM all_items a LEFT JOIN nc2 n USING (item)) AS ncomp,
    {_bts_packed_stage('1', 'pairs1')},
    {_bts_packed_stage('2', 'pairs2')}
),
f1 AS (
  SELECT *,
  {_bts_fold(_BT_STREAM_K, f'list_transform(items, it -> CAST({_MICRO} AS BIGINT))', '1')}
    AS p1 FROM packed
),
f2 AS (
  SELECT *, {_bts_fold(_BT_STREAM_K, 'p1', '2')} AS p2 FROM f1
),
normed AS (
  SELECT items, wins2, ncomp, p2,
         list_sum(list_transform(p2, v -> CAST(v AS DOUBLE))) / len(p2) AS m
  FROM f2
)
SELECT items[u.i] AS item,
       round(p2[u.i] / m * {_MICRO}) / {_MICRO} AS strength,
       wins2[u.i] AS n_wins, ncomp[u.i] AS n_comparisons
FROM normed, UNNEST(range(1, len(items) + 1)) AS u(i)
ORDER BY item
"""


@query("stream_bradley_terry", oracle=_bt_stream_oracle())
def stream_bradley_terry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming-incremental Bradley-Terry fit (streaming/bt_stream.py
    — the round-14 registration of the r13-staged operator), driven in
    two micro-batches over the events comparison log (even event_ids
    arrive first, odd second): each batch appends its canonical
    pair-table DELTA (the model's sufficient statistic) and runs a few
    warm-started MM iterations, new items entering at the uniform
    strength.  Strengths after batch k are a pure function of the
    batch schedule (integer micro-unit updates), so the DuckDB oracle
    replays the schedule as two nested list_reduce folds, the second
    seeded by the first.  Multi-batch stateful mechanics (idempotent
    replay, crash windows, delta collapse) get scenario coverage in
    tests/test_round14_staging.py.

    Why at 100 TB: the corpus-sized work per batch is ONE hash
    aggregate (the batch's pair delta); the fit iterates on the pair
    VOCABULARY with the item model broadcast — both tiny next to the
    log, and the state never re-reads the log."""
    import tempfile

    from storm_dynamic_spout_spark.streaming.bt_stream import (
        BT_STREAM_ITERATIONS,
        StreamingBradleyTerry,
    )

    assert BT_STREAM_ITERATIONS == _BT_STREAM_K
    e = t(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("event_id")
    lagged = e.select(
        "event_id",
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
        "event_id",
        F.when(F.col("value") > F.col("__pv"), F.col("event_type"))
        .otherwise(F.col("__pt"))
        .alias("winner"),
        F.when(F.col("value") > F.col("__pv"), F.col("__pt"))
        .otherwise(F.col("event_type"))
        .alias("loser"),
    )
    fit = StreamingBradleyTerry(tempfile.mkdtemp(prefix="sdss-bt-"))
    fit.process_batch(comp.filter(F.col("event_id") % 2 == 0), 0)
    fit.process_batch(comp.filter(F.col("event_id") % 2 == 1), 1)
    return fit.strengths_report(spark).orderBy("item")
