"""Query catalog: importing this package populates the registry."""

from storm_dynamic_spout_spark.catalog import (  # noqa: F401
    aggregates,
    filters,
    joins,
    llm,
    scalars,
    setops,
    streaming_time,
    tpch,
    udfs,
    windows,
)
from storm_dynamic_spout_spark.catalog.registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
