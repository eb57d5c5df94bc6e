"""Query catalog façade — see storm_dynamic_spout_spark.catalog.

Kept as the stable import point for __spark_entry__, bench.py and tests.
"""

from storm_dynamic_spout_spark.catalog import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
