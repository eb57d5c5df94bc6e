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
