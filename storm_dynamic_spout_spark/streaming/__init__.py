"""Streaming control plane: dynamic filter chains, routing, sideline
state machine, retry/DLQ tables (SURVEY §2.9, §2.10).

All components are plain Python around public Spark APIs — predicates
are SQL strings (persistable + DuckDB-checkable), state lives in JSON
control tables, and runtime mutation happens at micro-batch boundaries
inside foreachBatch (SURVEY §7 hard parts 1-5).
"""

from storm_dynamic_spout_spark.streaming.filter_chain import FilterChain

__all__ = ["FilterChain"]
