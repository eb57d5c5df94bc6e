"""Preference-ranking operators for training-data pipelines.

RLHF-style preference datasets arrive as pairwise comparisons ("A beat
B"); turning them into per-item quality strengths is a Bradley-Terry
fit (Bradley & Terry '52), and the minorization-maximization update
(Hunter '04) is embarrassingly aggregate-shaped: each iteration is one
pair-table scan + one per-item aggregate + a broadcast-sized strength
table — no gradient state, no driver-side math.

Engine determinism (the repo's micro-unit convention): each pair's
contribution ``n_ij / (p_i + p_j)`` is rounded to 1e-6 integer
micro-units BEFORE the per-item sum, so every iteration's aggregate is
exact integer arithmetic — order-independent across partitions and
bit-identical to a plain-Python fold (pinned in
tests/test_round13_staging.py).  Strengths stay positive rationals of
micro-sums; the final report rounds to 1e-6.

Scale shape at 100 TB: the comparisons table is the corpus-sized side
and is scanned once per iteration with the CURRENT strengths broadcast
onto it (|items| rows — the model, not the data); per-item win totals
are computed once up front.  Iterations are a fixed, small constant
(MM converges geometrically) — the plan is iterations x (broadcast
join + partial agg), never a shuffle of the comparisons on anything
but item id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed MM iterations — geometric convergence makes 12 plenty for
#: reporting-grade strengths (two-item 3:1 matchup lands within 3e-3
#: of the closed-form MLE); both engines run the identical count, and
#: each iteration is ~one Spark job, so the default also bounds the
#: catalog-query construction cost.
BT_ITERATIONS = 12
_MICRO = 1_000_000


def pairwise_win_counts(
    df: DataFrame, winner_col: str, loser_col: str
) -> DataFrame:
    """Canonical (item_a < item_b) pair table from a comparison log:
    one row per unordered pair with ``wins_a`` / ``wins_b`` — the
    sufficient statistic for Bradley-Terry (n_ij and W_i derive from
    it), shrinking the corpus-sized log to the pair vocabulary."""
    a_wins = F.col(winner_col) < F.col(loser_col)
    return (
        df.select(
            F.least(winner_col, loser_col).alias("item_a"),
            F.greatest(winner_col, loser_col).alias("item_b"),
            F.when(a_wins, 1).otherwise(0).alias("__wa"),
            F.when(a_wins, 0).otherwise(1).alias("__wb"),
        )
        .groupBy("item_a", "item_b")
        .agg(
            F.sum("__wa").cast("long").alias("wins_a"),
            F.sum("__wb").cast("long").alias("wins_b"),
        )
    )


def item_win_totals(pairs: DataFrame) -> DataFrame:
    """Per-item win totals (item, __wins) from a canonical pair table."""
    return (
        pairs.select(F.col("item_a").alias("item"), F.col("wins_a").alias("__w"))
        .unionByName(
            pairs.select(
                F.col("item_b").alias("item"), F.col("wins_b").alias("__w")
            )
        )
        .groupBy("item")
        .agg(F.sum("__w").cast("long").alias("__wins"))
    )


def mm_strength_iterations(
    pairs: DataFrame, init: DataFrame, iterations: int
) -> DataFrame:
    """``iterations`` Hunter-MM updates over a canonical pair table from
    an arbitrary starting state ``init`` (item, __p_micro) — the raw
    micro-unit engine behind :func:`bradley_terry_strengths` (uniform
    start) and the streaming warm-started refit
    (streaming/bt_stream.py, which seeds each batch from the previous
    strengths so a few iterations per batch track the growing log).
    Returns (item, __p_micro)."""
    # The pair table is referenced in EVERY iteration's denominator
    # join (plus the win totals): without truncating its lineage each
    # reference re-derives it from the comparison log — for the
    # catalog queries that is K+2 corpus window scans (the r12
    # self-join-recompute class; PLAN_INVENTORY showed 0 reused
    # exchanges).  Deterministic integer aggregate, so the lazy
    # checkpoint is safe (operators/dedup.py DETERMINISM note).
    pairs = pairs.localCheckpoint(eager=False)
    wins = item_win_totals(pairs)
    n_ij = F.col("wins_a") + F.col("wins_b")
    # strengths live as integer micro-units: exact to compare, exact to
    # broadcast, and the per-pair denominator reads two of them.  Lazy
    # checkpoint is safe: the subtree is a deterministic integer
    # aggregate (see the DETERMINISM note in operators/dedup.py), and
    # it stops each iteration from recomputing the full history.
    strengths = init.localCheckpoint(eager=False)
    for _ in range(iterations):
        pa = strengths.select(
            F.col("item").alias("item_a"), F.col("__p_micro").alias("__pa")
        )
        pb = strengths.select(
            F.col("item").alias("item_b"), F.col("__p_micro").alias("__pb")
        )
        # per-pair contribution n_ij / (p_i + p_j), micro-rounded
        # BEFORE the per-item sum (exact, order-free); the factor
        # _MICRO cancels the micro-scaled denominator
        contrib = F.round(
            n_ij
            * F.lit(_MICRO)
            / ((F.col("__pa") + F.col("__pb")) / F.lit(float(_MICRO)))
        ).cast("long")
        denom = (
            pairs.join(F.broadcast(pa), "item_a")
            .join(F.broadcast(pb), "item_b")
            .select("item_a", "item_b", contrib.alias("__c"))
        )
        per_item = (
            denom.select(F.col("item_a").alias("item"), F.col("__c"))
            .unionByName(
                denom.select(F.col("item_b").alias("item"), F.col("__c"))
            )
            .groupBy("item")
            .agg(F.sum("__c").cast("long").alias("__denom_micro"))
        )
        # W_i * 1e12 / denom, computed as an overflow-safe split:
        # naive __wins * 1e6 * 1e6 wraps silently past ~9.2M wins
        # (Spark non-ANSI long arithmetic).  Splitting at one _MICRO —
        # whole = (W*1e6) div denom, rem = (W*1e6) mod denom, result =
        # whole*1e6 + round(rem/denom * 1e6) — is algebraically exact
        # (whole*1e6 is an integer, so the half-up round commutes) and
        # keeps every intermediate ≤ W*1e6, raising the overflow bound
        # to ~9.2e12 wins per item.  rem/denom is one correctly-rounded
        # IEEE division of two sub-2^53 longs — bit-identical in
        # Python, DuckDB, and Spark (pinned in
        # tests/test_round13_staging.py).
        num = F.col("__wins") * F.lit(_MICRO)
        whole = F.expr(f"(__wins * {_MICRO}) div __denom_micro")
        rem = F.pmod(num, F.col("__denom_micro"))
        strengths = (
            wins.join(per_item, "item")
            .select(
                "item",
                # guard the all-losses item (denominator fine, W=0 ->
                # p=0 is the correct MLE drift; +1 keeps it a valid
                # positive int)
                F.greatest(
                    whole * F.lit(_MICRO)
                    + F.round(
                        rem / F.col("__denom_micro") * F.lit(_MICRO)
                    ).cast("long"),
                    F.lit(1),
                ).alias("__p_micro"),
            )
            # lazy checkpoint: deterministic (exact integer micro-unit
            # update over the checkpointed previous state) — truncates
            # the per-iteration lineage growth
            .localCheckpoint(eager=False)
        )
    return strengths


def normalized_strength_report(
    pairs: DataFrame, strengths: DataFrame
) -> DataFrame:
    """The reporting view of a raw micro-unit strength state: mean-one
    normalization (the BT scale is otherwise unidentified) plus win /
    comparison bookkeeping.  Returns
    (item, strength, n_wins, n_comparisons)."""
    wins = item_win_totals(pairs)
    n_ij = F.col("wins_a") + F.col("wins_b")
    mean_p = strengths.agg(
        F.avg(F.col("__p_micro").cast("double")).alias("__mean")
    )
    n_comp = (
        pairs.select(F.col("item_a").alias("item"), n_ij.alias("__n"))
        .unionByName(pairs.select(F.col("item_b").alias("item"), n_ij.alias("__n")))
        .groupBy("item")
        .agg(F.sum("__n").cast("long").alias("n_comparisons"))
    )
    return (
        strengths.crossJoin(F.broadcast(mean_p))
        .join(wins, "item")
        .join(n_comp, "item")
        .select(
            "item",
            (
                F.round(
                    F.col("__p_micro") / F.col("__mean") * _MICRO
                ) / _MICRO
            ).alias("strength"),
            F.col("__wins").alias("n_wins"),
            "n_comparisons",
        )
    )


def bradley_terry_strengths(
    pairs: DataFrame, iterations: int = BT_ITERATIONS
) -> DataFrame:
    """Per-item Bradley-Terry strength from a canonical pair table
    (``item_a < item_b``, ``wins_a``, ``wins_b``) via Hunter's MM
    update ``p_i <- W_i / sum_j n_ij / (p_i + p_j)``, run a fixed
    number of iterations from the uniform start p=1.

    Items must have at least one win AND one loss for the MLE to be
    finite (the standard BT identifiability condition); callers filter
    degenerate items first or accept their drift toward 0/inf within
    the fixed iteration budget.  Output strengths are normalized so
    their mean is 1 (the scale is otherwise unidentified), with a
    deterministic micro-rounded report column.

    Returns (item, strength, n_wins, n_comparisons)."""
    # one lineage truncation shared by the init, every MM iteration
    # (mm_strength_iterations re-marks it — a no-op-sized copy of the
    # vocab-sized table), and the final report join, so the comparison
    # log is aggregated exactly once per fit; deterministic integer
    # aggregate, so the lazy checkpoint is safe (operators/dedup.py
    # DETERMINISM note)
    pairs = pairs.localCheckpoint(eager=False)
    init = item_win_totals(pairs).select(
        "item", F.lit(_MICRO).cast("long").alias("__p_micro")
    )
    strengths = mm_strength_iterations(pairs, init, iterations)
    return normalized_strength_report(pairs, strengths)


def cohen_kappa(
    df: DataFrame,
    item_col: str,
    rater_col: str,
    label_col: str,
    rater_a,
    rater_b,
) -> DataFrame:
    """Inter-annotator agreement between two raters over the items both
    labeled (Cohen '60): ``kappa = (po - pe) / (1 - pe)`` with observed
    agreement ``po`` and the chance agreement ``pe`` from the two
    raters' label marginals — the labeling-pipeline quality gate run
    before preference data reaches a reward-model fit.

    Engine determinism: po/pe/kappa derive from exact integer counts
    (agreements, per-label marginals) in one fixed double expression;
    a degenerate task where chance agreement is 1 (both raters always
    emit the same single label) has undefined kappa -> NULL, guarded
    identically on any engine.

    Scale shape: two filtered projections of the label log joined on
    item (shuffle keyed on item id), collapsed immediately into ONE
    (label_a, label_b, count) contingency aggregate — the single
    corpus-sized pass.  n / n_agree / both marginals / pe all derive
    from that label-vocabulary²-sized cell table (lazily checkpointed:
    its three consumers would otherwise each re-run the corpus join —
    the guide-§2 shared-subtree rule).  Returns one row:
    (n_items, po, pe, kappa)."""
    a = df.filter(F.col(rater_col) == rater_a).select(
        F.col(item_col).alias("__item"), F.col(label_col).alias("__la")
    )
    b = df.filter(F.col(rater_col) == rater_b).select(
        F.col(item_col).alias("__item"), F.col(label_col).alias("__lb")
    )
    # lazy checkpoint: subtree must be deterministic (see
    # operators/dedup.py DETERMINISM note) — exact integer counts of a
    # pure equi-join
    cell = (
        a.join(b, "__item")
        .groupBy("__la", "__lb")
        .agg(F.count(F.lit(1)).cast("long").alias("__c"))
        # deterministic subtree (operators/dedup.py DETERMINISM note)
        .localCheckpoint(eager=False)
    )
    counts = cell.agg(
        # coalesce keeps the empty-log case identical to the former
        # count(*): n = 0 (sum over no rows is NULL), n_agree NULL
        F.coalesce(F.sum("__c"), F.lit(0)).cast("long").alias("__n"),
        F.sum(F.when(F.col("__la") == F.col("__lb"), F.col("__c")).otherwise(0))
        .cast("long")
        .alias("__n_agree"),
    )
    ma = cell.groupBy(F.col("__la").alias("__label")).agg(
        F.sum("__c").cast("long").alias("__ca")
    )
    mb = cell.groupBy(F.col("__lb").alias("__label")).agg(
        F.sum("__c").cast("long").alias("__cb")
    )
    pe_num = (
        ma.join(mb, "__label", "full_outer")
        .select(
            (
                F.coalesce(F.col("__ca"), F.lit(0))
                * F.coalesce(F.col("__cb"), F.lit(0))
            ).alias("__prod")
        )
        .agg(F.sum("__prod").cast("long").alias("__pe_num"))
    )
    po = F.col("__n_agree") / F.col("__n").cast("double")
    pe = F.col("__pe_num") / (F.col("__n").cast("double") * F.col("__n"))
    return (
        counts.crossJoin(F.broadcast(pe_num))
        .select(
            F.col("__n").alias("n_items"),
            F.round(po, 6).alias("po"),
            F.round(pe, 6).alias("pe"),
            F.when(pe < 1.0, F.round((po - pe) / (1.0 - pe), 6)).alias("kappa"),
        )
    )
