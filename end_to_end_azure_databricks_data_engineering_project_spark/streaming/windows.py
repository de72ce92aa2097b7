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
) -> DataFrame:
    """Tumbling (or sliding) event-time counts per key with watermark."""
    win = (
        F.window(ts_col, window_len, slide) if slide else F.window(ts_col, window_len)
    )
    return (
        stream.withWatermark(ts_col, late_threshold)
        .groupBy(win.alias("win"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            key_col,
            "n",
            "total_value",
        )
    )


def streaming_dedup(
    stream: DataFrame, keys: list[str], ts_col: str = "ts", horizon: str = "1 hour"
) -> DataFrame:
    """Drop duplicate keys within the watermark horizon (bounded state)."""
    return stream.withWatermark(ts_col, horizon).dropDuplicatesWithinWatermark(keys)


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
