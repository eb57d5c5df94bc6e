"""storm_dynamic_spout_spark — a PySpark-native analytics/streaming engine.

A from-scratch re-expression of the capabilities of
salesforce/storm-dynamic-spout (a Storm spout container with dynamic
virtual spouts, sidelining, retry management and pluggable buffers —
see /root/reference) on top of Apache Spark's DataFrame / SQL /
Structured Streaming stack, plus the standard relational-analytics and
LLM-data-pipeline operator surface the reference lacks.

Design stance (SURVEY.md §4): zero custom Catalyst rules. Every data
operator is declared via the DataFrame/SQL API so Catalyst/Tungsten
handle pushdown, pruning, join strategy, codegen, and AQE. All custom
logic lives in the control plane (plain Python around public Spark
APIs): dynamic predicate routing, sideline state machine, retry/DLQ
tables, reconciliation.
"""

from storm_dynamic_spout_spark.engine import EngineConfig, build_session

__all__ = ["EngineConfig", "build_session"]

__version__ = "0.1.0"
