"""Registry for (spark_fn, oracle_sql) query pairs.

Every declared operator from SURVEY.md §2 registers here; the driver
contract (__spark_entry__.py) exposes the two dicts verbatim.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from storm_dynamic_spout_spark.engine import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None):
    """Register a (spark_fn, oracle_sql) pair under ``name``.

    ``oracle=None`` → non-SQL-expressible op; driver records a weaker
    rows-only check (noted in the fn docstring).
    """

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)
