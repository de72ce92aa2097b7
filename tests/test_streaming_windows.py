"""Event-time streaming: tumbling-window counts with watermark, and
streaming dedup — driven to completion with availableNow over a file
source, verified against the equivalent batch aggregation."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.streaming.windows import (
    run_available_now,
    streaming_dedup,
    windowed_counts,
)

SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _write_events(spark, path):
    rows = []
    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    for i in range(200):
        rows.append(
            (i, base + dt.timedelta(minutes=i), i % 7,
             ["click", "view"][i % 2], float(i % 10))
        )
    df = spark.createDataFrame(rows, SCHEMA)
    df.write.mode("overwrite").parquet(path)
    return df


def test_windowed_counts_match_batch(spark, tmp_path):
    src = str(tmp_path / "events")
    batch_df = _write_events(spark, src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = windowed_counts(stream, window_len="1 hour", late_threshold="10 minutes")
    q = run_available_now(agg, "win_counts", str(tmp_path / "ckpt"), "complete")
    q.awaitTermination(120)

    got = {
        (r.window_start, r.event_type): (r.n, r.total_value)
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    expected = {
        (r.ws, r.event_type): (r.n, r.tv)
        for r in batch_df.groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .select(F.col("w.start").alias("ws"), "event_type", "n", "tv")
        .collect()
    }
    assert got == expected and len(got) > 0


def test_streaming_dedup_within_watermark(spark, tmp_path):
    src = str(tmp_path / "events2")
    base = dt.datetime(2024, 1, 1)
    rows = [(1, base, 1, "click", 1.0), (1, base + dt.timedelta(minutes=1), 1, "click", 2.0),
            (2, base, 2, "view", 3.0)]
    spark.createDataFrame(rows, SCHEMA).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    dedup = streaming_dedup(stream, ["event_id"], horizon="2 hours")
    q = run_available_now(dedup, "dedup_out", str(tmp_path / "ckpt2"))
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dedup_out").collect()
    assert sorted(r.event_id for r in out) == [1, 2]
