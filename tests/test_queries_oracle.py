"""Every registered query hash-matches its DuckDB oracle (t2 mirror)."""

from __future__ import annotations

import pytest

from storm_dynamic_spout_spark.queries import ORACLES, QUERIES
from tests.oracle_util import compare_spark_duck


def _oracle_cases():
    return sorted(ORACLES.keys())


@pytest.mark.parametrize("name", _oracle_cases())
def test_query_matches_oracle(spark, duck, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    compare_spark_duck(df, duck, ORACLES[name])


def test_all_queries_run(spark, sf_dir):
    """Queries without an oracle still must run and return a DataFrame."""
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        assert df.count() >= 0, name
