"""Experimentation operators: deterministic arm assignment and CUPED
variance reduction.

The reference feeds event streams into exactly this class of consumer
(its Storm topologies sit in front of analytics backends; the engine
owns the whole query — same rationale as catalog/analytics.py).  The
A/B readout itself lives in ``catalog/analytics.py events_ab_test``;
this module holds the reusable pieces a real experimentation stack
composes:

- ``hash_arm``: deterministic identity-hash arm split (xxhash64 of the
  unit id + experiment salt, modulo arm count) — re-runnable, joins
  with nothing.
- ``cuped_adjust``: CUPED (Controlled-experiment Using Pre-Experiment
  Data; Deng, Xu, Kohavi & Walker, WSDM 2013) — regress the experiment
  metric on a pre-period covariate and subtract the explained part:
  ``y_cv = y - theta * (x - mean(x))`` with
  ``theta = cov(y, x) / var(x)``.  Same arm means in expectation,
  variance shrunk by the squared correlation — the standard trick for
  detecting small effects without more traffic.

Why at 100 TB: theta and mean(x) are ONE corpus-level aggregate
(map-side partial covariance/variance), broadcast back over the unit
table on a one-row cross join; the adjustment is codegen arithmetic.
Nothing unit-scaled crosses an exchange twice.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_arm(unit_col: Column, n_arms: int = 2, salt: str = "exp") -> Column:
    """Deterministic arm id in [0, n_arms): xxhash64(salt, unit) mod
    n_arms, made non-negative (xxhash64 is signed).  Stable across
    runs, sessions, and engines that agree on xxHash64 seeds."""
    h = F.xxhash64(F.lit(salt), unit_col)
    return ((h % n_arms) + n_arms) % n_arms


def cuped_adjust(
    df: DataFrame,
    metric_col: str,
    covariate_col: str,
    out_col: str = "metric_cv",
) -> DataFrame:
    """Append the CUPED-adjusted metric column.

    ``theta`` uses population moments (covar_pop/var_pop — the
    estimator in the WSDM'13 paper); a zero-variance covariate leaves
    the metric unchanged (theta := 0), so a constant pre-period never
    divides by zero or destroys the metric."""
    y, x = F.col(metric_col), F.col(covariate_col)
    stats = df.agg(
        F.covar_pop(y, x).alias("__cov"),
        F.var_pop(x).alias("__var"),
        F.avg(x).alias("__mx"),
    )
    theta = F.when(F.col("__var") > 0, F.col("__cov") / F.col("__var")).otherwise(
        F.lit(0.0)
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(out_col, y - theta * (x - F.col("__mx")))
        .drop("__cov", "__var", "__mx")
    )
