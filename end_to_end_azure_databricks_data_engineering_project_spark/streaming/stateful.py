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


# ---------------------------------------------------------------------------
# Spark 4.x successor API: transformWithStateInPandas (StatefulProcessor).
# Same running-stats semantics as running_user_stats, expressed against the
# new composable state-variable API (ValueState here; the API also offers
# ListState/MapState and timers — this operator is the engine's template
# for it). Requires the RocksDB state-store provider (bundled with Spark)
# AND the google.protobuf python package (the state-server wire protocol):
# HAVE_TWS_PROTO gates callers/tests — absent protobuf, the streaming
# python runner crashes at init with an ImportError from
# pyspark/sql/streaming/proto/StateMessage_pb2.py. Install `protobuf`
# to activate; the operator itself is complete and tested where it is.

import importlib.util as _ilu

try:  # find_spec on a dotted name imports the parent package first
    HAVE_TWS_PROTO = _ilu.find_spec("google.protobuf") is not None
except ModuleNotFoundError:
    HAVE_TWS_PROTO = False

from pyspark.sql.streaming.stateful_processor import (  # noqa: E402
    StatefulProcessor,
    StatefulProcessorHandle,
)


class RunningStatsProcessor(StatefulProcessor):
    """Per-key running (count, sum(value), last event ts) with a single
    ValueState row per key — the transformWithState twin of
    ``running_user_stats``'s applyInPandasWithState operator."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._stats = handle.getValueState("stats", STATE_SCHEMA)

    def handleInputRows(self, key, rows, timerValues):
        if self._stats.exists():
            n, total, last_ts = self._stats.get()
        else:
            n, total, last_ts = 0, 0.0, None
        for pdf in rows:
            n += len(pdf)
            total += float(pdf["value"].sum())
            batch_max = pdf["ts"].max()
            if last_ts is None or (batch_max is not None and batch_max > last_ts):
                last_ts = batch_max
        self._stats.update((n, total, last_ts))
        yield pd.DataFrame(
            [{"user_id": key[0], "n": n, "total": total, "last_ts": last_ts}]
        )

    def close(self) -> None:
        pass


def running_user_stats_tws(stream: DataFrame) -> DataFrame:
    """``running_user_stats`` on the Spark 4.x transformWithState API —
    identical output contract; state lives in the RocksDB provider's
    state variables instead of the legacy GroupState row."""
    return (
        stream.select("user_id", "ts", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningStatsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
