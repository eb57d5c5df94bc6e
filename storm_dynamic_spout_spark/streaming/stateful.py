"""Custom stateful streaming operators via applyInPandasWithState
(SURVEY §1.3 / north-star: "applyInPandasWithState for custom stateful
operators").

The reference's only cross-record state is offset bookkeeping (T1);
the engine additionally exposes the general mechanism: user-defined
per-key state that survives across micro-batches, Arrow-batched, with
the state store (RocksDB by default, ``engine.build_session``) bounding
memory at scale. The canonical example here — per-key running counters
with last-seen tracking — is the shape of tenant quotas, rate
accounting, and per-source watermark bookkeeping."""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_STATS_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), True),
        T.StructField("n_records", T.LongType(), False),
        T.StructField("max_offset", T.LongType(), False),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n_records", T.LongType(), False),
        T.StructField("max_offset", T.LongType(), False),
    ]
)


def running_stats_per_key(grouped_stream: DataFrame) -> DataFrame:
    """Per-key running (count, max offset) maintained across
    micro-batches. Input: a streaming DataFrame with ``key`` and
    ``offset`` columns. Output: one updated row per key per batch.

    State is a single fixed-width tuple per key — the state store holds
    |keys| rows regardless of stream length."""

    def update(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, max_off = state.get if state.exists else (0, -1)
        for pdf in pdfs:
            n += len(pdf)
            if len(pdf):
                max_off = max(max_off, int(pdf["offset"].max()))
        state.update((n, max_off))
        yield pd.DataFrame(
            {"key": [key[0]], "n_records": [n], "max_offset": [max_off]}
        )

    return grouped_stream.groupBy("key").applyInPandasWithState(
        update,
        outputStructType=RUNNING_STATS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_stats_per_key_tws(grouped_stream: DataFrame) -> DataFrame:
    """The same per-key running stats on Spark 4's ``transformWithState``
    API (``StatefulProcessor`` + typed state variables) — the successor
    to applyInPandasWithState: explicit state lifecycle (init/close),
    composable typed state (value/list/map states), timers, and TTL.
    Both implementations are kept so either engine surface can be
    targeted; results are identical (the scenario test asserts it).

    Requires the RocksDB state store provider (the engine session
    default) AND the ``protobuf`` package — transformWithState's state
    server speaks protobuf between the JVM and the Python worker.
    Absent protobuf (this sandbox), construction raises the documented
    ImportError up front instead of crashing the stream mid-query; the
    applyInPandasWithState implementation above is the always-available
    fallback with identical results."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithState requires the protobuf package for its "
            "JVM<->Python state server; install protobuf or use "
            "running_stats_per_key (applyInPandasWithState) instead"
        ) from e

    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class _RunningStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats", "n_records BIGINT, max_offset BIGINT"
            )

        def handleInputRows(self, key, rows, timerValues):  # noqa: N803
            n, max_off = (
                self._state.get() if self._state.exists() else (0, -1)
            )
            for pdf in rows:
                n += len(pdf)
                if len(pdf):
                    max_off = max(max_off, int(pdf["offset"].max()))
            self._state.update((n, max_off))
            yield pd.DataFrame(
                {"key": [key[0]], "n_records": [n], "max_offset": [max_off]}
            )

        def close(self) -> None:
            pass

    return grouped_stream.groupBy("key").transformWithStateInPandas(
        statefulProcessor=_RunningStats(),
        outputStructType=RUNNING_STATS_SCHEMA,
        outputMode="Update",
        timeMode="None",
    )
