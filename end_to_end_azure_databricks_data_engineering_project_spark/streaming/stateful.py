"""Custom stateful streaming operator via applyInPandasWithState.

The reference's only stateful streaming op is the CDC merge (handled in
cdc.py through foreachBatch); a complete engine also needs arbitrary
per-key state. ``running_user_stats`` keeps, per user, a running event
count / value sum / last-seen timestamp across micro-batches — the
canonical sessionless per-key accumulator (same shape as fraud counters,
rate limiters, feature accumulators).

State is a single row per key in the state store; output is one updated
row per key per batch. GroupStateTimeout can evict idle keys — here we
keep state forever (bounded by key cardinality, the same bound the
reference's dropDuplicates state has).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
        T.StructField("last_ts", T.TimestampType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n, total, last_ts = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        batch_max = pdf["ts"].max()
        if last_ts is None or (batch_max is not None and batch_max > last_ts):
            last_ts = batch_max
    state.update((n, total, last_ts))
    yield pd.DataFrame(
        [{"user_id": key[0], "n": n, "total": total, "last_ts": last_ts}]
    )


def running_user_stats(stream: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value), last ts) across batches."""
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
