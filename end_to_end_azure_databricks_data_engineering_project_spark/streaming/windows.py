"""Event-time streaming aggregations (beyond the reference's surface —
it handles late data only via CDC re-pull + sequence_by; a complete
engine also needs true event-time windows for stream analytics).

 - ``windowed_counts``: tumbling/sliding event-time window counts with a
   late-data watermark (state is bounded by the watermark horizon).
 - ``streaming_dedup``: exactly-once-per-key stream dedup with a
   watermark bound on the key state.
 - ``run_available_now``: drain-all-then-stop execution (the reference's
   trigger(once) pattern, ``silver_Dimensions.py:58``) into a memory
   sink for tests/demos.

At scale: state lives in the HDFS/RocksDB state store per shuffle
partition; watermarks bound it. The aggregation itself is the standard
partial/final hash agg over (window, keys).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_counts(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_len: str = "1 hour",
    slide: str | None = None,
    late_threshold: str = "30 minutes",
    measures: list | None = None,
) -> DataFrame:
    """Tumbling (or sliding) event-time aggregates per key with watermark.

    ``measures``: extra aggregate Columns beyond the count (each must
    carry an alias). Default: ``sum(value) AS total_value`` when the
    stream has a ``value`` column, count-only otherwise — the generic
    signature no longer throws on streams without ``value``."""
    win = (
        F.window(ts_col, window_len, slide) if slide else F.window(ts_col, window_len)
    )
    if measures is None:
        measures = (
            [F.sum("value").alias("total_value")] if "value" in stream.columns else []
        )
    aggs = [F.count(F.lit(1)).alias("n"), *measures]
    out = (
        stream.withWatermark(ts_col, late_threshold)
        .groupBy(win.alias("win"), F.col(key_col))
        .agg(*aggs)
    )
    agg_cols = [c for c in out.columns if c not in ("win", key_col)]
    return out.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        key_col,
        *agg_cols,
    )


def streaming_dedup(
    stream: DataFrame, keys: list[str], ts_col: str = "ts", horizon: str = "1 hour"
) -> DataFrame:
    """Drop duplicate keys within the watermark horizon (bounded state)."""
    return stream.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(keys)


def session_windows(
    stream: DataFrame,
    key: str = "user_id",
    ts_col: str = "ts",
    gap: str = "30 minutes",
    late_threshold: str = "10 minutes",
    value_col: str = "value",
) -> DataFrame:
    """Event-time session windows: rows of a key within ``gap`` of each
    other merge into one growing window (native ``session_window`` —
    the streaming twin of the batch ``sessionize`` catalog entry's
    lag+cumsum). State is one open session per active key; the
    watermark finalizes sessions ``late_threshold`` behind the max
    event time and frees their state, so memory is bounded by the
    number of keys active within the horizon, not stream length."""
    return (
        stream.withWatermark(ts_col, late_threshold)
        .groupBy(F.session_window(ts_col, gap).alias("w"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(value_col).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            key,
            "n_events",
            "total_value",
        )
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    within: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Stream-stream inner interval join: a right row matches a left
    row with the same key when ``right_ts ∈ [left_ts, left_ts +
    within]`` — the impression→click attribution shape.

    Both sides carry event-time watermarks, which is what makes the
    join state BOUNDED: Spark can discard a buffered left row once the
    right watermark passes ``left_ts + within`` (no future right row
    can match it) and a buffered right row once the left watermark
    passes ``right_ts``. Without the interval bound the state would
    grow forever; with it, per-executor state ≈ rate × (watermark +
    within) per side, independent of stream length — the property that
    lets this run indefinitely at 100 TB/day. The join itself hash-
    partitions both streams on the key: one co-shuffle, then purely
    local matching. ``left_ts``/``right_ts`` must be distinct names so
    the joined schema is unambiguous."""
    if left_ts == right_ts:
        raise ValueError("left_ts and right_ts must be distinct column names")
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    # qualify through the aliases — unqualified names would be
    # AMBIGUOUS_REFERENCE whenever both inputs carry both ts columns
    lts, rts = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rts >= lts)
        & (rts <= lts + F.expr(f"INTERVAL {within}"))
    )
    return l.join(r, cond, "inner").drop(F.col(f"r.{key}"))


def run_available_now(
    df: DataFrame, query_name: str, checkpoint: str, output_mode: str = "append"
):
    """Drain all available input once into a memory sink; returns the
    StreamingQuery (caller awaits + reads ``spark.sql(SELECT * FROM name)``).

    Note: with availableNow + ``append``, windowed aggregates only emit
    windows finalized by the watermark — a single drain emits nothing;
    use ``complete`` (or ``update``) for drain-style window demos."""
    return (
        df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
