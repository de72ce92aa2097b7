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


def test_stream_stream_join_with_watermarks(spark, tmp_path):
    """Stream-stream inner join: purchases joined to the same user's
    clicks within the preceding 30 minutes (watermarks bound both join
    states) — verified against the equivalent batch join."""
    src = str(tmp_path / "ss_events")
    base = dt.datetime(2024, 1, 1)
    rows = []
    for u in range(4):
        for i in range(10):
            rows.append((u * 100 + i, base + dt.timedelta(minutes=3 * i), u, "click", 1.0))
        rows.append((u * 100 + 50, base + dt.timedelta(minutes=14), u, "purchase", 9.0))
    batch = spark.createDataFrame(rows, SCHEMA)
    batch.write.mode("overwrite").parquet(src)

    def join_streams(clicks, purchases):
        c = clicks.select(
            F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts")
        ).withWatermark("click_ts", "1 hour")
        p = purchases.select(
            "user_id", F.col("ts").alias("purchase_ts"), F.col("event_id").alias("purchase_id")
        ).withWatermark("purchase_ts", "1 hour")
        cond = (
            (F.col("c_user") == F.col("user_id"))
            & (F.col("click_ts") <= F.col("purchase_ts"))
            & (F.col("click_ts") >= F.col("purchase_ts") - F.expr("INTERVAL 30 MINUTES"))
        )
        return p.join(c, cond).select("purchase_id", "user_id", "click_ts")

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    out = join_streams(
        stream.filter("event_type = 'click'"), stream.filter("event_type = 'purchase'")
    )
    q = (
        out.writeStream.format("memory").queryName("ss_join")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r.purchase_id, r.user_id, r.click_ts)
           for r in spark.sql("SELECT * FROM ss_join").collect()}
    expected = {
        (r.purchase_id, r.user_id, r.click_ts)
        for r in join_streams(
            batch.filter("event_type = 'click'"), batch.filter("event_type = 'purchase'")
        ).collect()
    }
    assert got == expected and len(got) > 0


def test_native_session_window(spark, tmp_path):
    """Spark-native session_window (gap-based) in streaming — verified
    against the batch session_window aggregation."""
    src = str(tmp_path / "sess_events")
    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for u in range(3):
        for burst in range(3):  # 3 bursts separated by > 30 min
            for i in range(4):
                rows.append((eid, base + dt.timedelta(hours=burst, minutes=i), u, "click", 1.0))
                eid += 1
    batch = spark.createDataFrame(rows, SCHEMA)
    batch.write.mode("overwrite").parquet(src)

    def sess(df):
        return (
            df.withWatermark("ts", "2 hours")
            .groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
            .agg(F.count(F.lit(1)).alias("n"))
            .select("user_id", F.col("sw.start").alias("sess_start"), "n")
        )

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        sess(stream).writeStream.format("memory").queryName("sess_out")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {(r.user_id, r.sess_start, r.n)
           for r in spark.sql("SELECT * FROM sess_out").collect()}
    expected = {(r.user_id, r.sess_start, r.n) for r in sess(batch).collect()}
    assert got == expected
    assert len(got) == 9  # 3 users × 3 bursts


def test_windowed_counts_without_value_column(spark, tmp_path):
    """Streams lacking a 'value' column aggregate count-only instead of
    throwing AnalysisException (round-1 ADVICE #5)."""
    import datetime as dt

    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.windows import (
        run_available_now,
        windowed_counts,
    )

    src = str(tmp_path / "src")
    t0 = dt.datetime(2025, 1, 1)
    spark.createDataFrame(
        [(t0 + dt.timedelta(minutes=i), "click") for i in range(10)],
        "ts timestamp, event_type string",
    ).write.parquet(src)
    stream = spark.readStream.schema("ts timestamp, event_type string").parquet(src)
    agg = windowed_counts(stream, window_len="1 hour")
    assert "total_value" not in agg.columns
    q = run_available_now(agg, "novalue_win", str(tmp_path / "ck"), "complete")
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM novalue_win").collect()
    assert len(rows) == 1 and rows[0].n == 10


def test_windowed_counts_custom_measures(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import functions as F

    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.windows import (
        run_available_now,
        windowed_counts,
    )

    src = str(tmp_path / "src")
    t0 = dt.datetime(2025, 1, 1)
    spark.createDataFrame(
        [(t0 + dt.timedelta(minutes=i), "click", float(i)) for i in range(10)],
        "ts timestamp, event_type string, amount double",
    ).write.parquet(src)
    stream = spark.readStream.schema(
        "ts timestamp, event_type string, amount double"
    ).parquet(src)
    agg = windowed_counts(
        stream,
        window_len="1 hour",
        measures=[F.max("amount").alias("mx"), F.avg("amount").alias("avg_amt")],
    )
    q = run_available_now(agg, "custom_win", str(tmp_path / "ck"), "complete")
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM custom_win").collect()
    assert rows[0].mx == 9.0 and rows[0].avg_amt == 4.5 and rows[0].n == 10


def test_interval_join_streams_match_batch(spark, tmp_path):
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.windows import interval_join

    base = dt.datetime(2024, 1, 1)
    imp_schema = "ad_id long, imp_ts timestamp"
    clk_schema = "ad_id long, click_ts timestamp"
    imps = [(i % 5, base + dt.timedelta(minutes=3 * i)) for i in range(40)]
    # clicks: some inside the 30-minute window, some after, some before
    clks = [(i % 5, base + dt.timedelta(minutes=3 * i + d))
            for i in range(40) for d in (1, 29, 31, -2)]
    imp_df = spark.createDataFrame(imps, imp_schema)
    clk_df = spark.createDataFrame(clks, clk_schema)
    imp_df.write.mode("overwrite").parquet(str(tmp_path / "imps"))
    clk_df.write.mode("overwrite").parquet(str(tmp_path / "clks"))

    joined = interval_join(
        spark.readStream.schema(imp_schema).parquet(str(tmp_path / "imps")),
        spark.readStream.schema(clk_schema).parquet(str(tmp_path / "clks")),
        key="ad_id", left_ts="imp_ts", right_ts="click_ts",
        within="30 minutes", watermark="1 hour",
    )
    q = run_available_now(joined, "attrib", str(tmp_path / "ckpt_ij"))
    q.awaitTermination(120)

    got = {(r.ad_id, r.imp_ts, r.click_ts)
           for r in spark.sql("SELECT * FROM attrib").collect()}
    expected = {
        (r.ad_id, r.imp_ts, r.click_ts)
        for r in imp_df.join(
            clk_df,
            (imp_df.ad_id == clk_df.ad_id)
            & (clk_df.click_ts >= imp_df.imp_ts)
            & (clk_df.click_ts <= imp_df.imp_ts + F.expr("INTERVAL 30 minutes")),
        ).select(imp_df.ad_id, "imp_ts", "click_ts").collect()
    }
    assert got == expected and len(got) > 0


def test_interval_join_resolves_shared_column_names(spark, tmp_path):
    """Both inputs carrying BOTH ts column names must not be ambiguous —
    the join condition is qualified through the l/r aliases."""
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.windows import interval_join

    base = dt.datetime(2024, 1, 1)
    schema = "ad_id long, imp_ts timestamp, click_ts timestamp"
    rows = [(i % 3, base + dt.timedelta(minutes=i),
             base + dt.timedelta(minutes=i + 5)) for i in range(12)]
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / "both")
    )
    s1 = spark.readStream.schema(schema).parquet(str(tmp_path / "both"))
    s2 = spark.readStream.schema(schema).parquet(str(tmp_path / "both"))
    joined = interval_join(
        s1, s2, key="ad_id", left_ts="imp_ts", right_ts="click_ts",
        within="30 minutes", watermark="1 hour",
    )  # must not raise AMBIGUOUS_REFERENCE at construction
    q = run_available_now(joined, "shared_cols", str(tmp_path / "ckpt_sc"))
    q.awaitTermination(120)
    assert spark.sql("SELECT * FROM shared_cols").count() > 0


def test_interval_join_rejects_ambiguous_ts(spark):
    import pytest as _pytest

    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.windows import interval_join

    df = spark.range(1).select(
        F.col("id").alias("k"), F.current_timestamp().alias("ts")
    )
    with _pytest.raises(ValueError):
        interval_join(df, df, key="k", left_ts="ts", right_ts="ts")


def test_session_windows_match_batch(spark, tmp_path):
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.windows import session_windows

    base = dt.datetime(2024, 1, 1)
    # user 1: two bursts separated by > 30 min; user 2: one long session
    rows, eid = [], 0
    for m in [0, 5, 10, 60, 65]:
        rows.append((eid, base + dt.timedelta(minutes=m), 1, "click", 1.0)); eid += 1
    for m in [0, 20, 40, 55]:
        rows.append((eid, base + dt.timedelta(minutes=m), 2, "view", 2.0)); eid += 1
    df = spark.createDataFrame(rows, SCHEMA)
    src = str(tmp_path / "sess_events")
    df.write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(SCHEMA).parquet(src)
    agg = session_windows(stream, gap="30 minutes")
    q = run_available_now(agg, "sessions", str(tmp_path / "ckpt_sw"), "complete")
    q.awaitTermination(120)

    got = {
        (r.user_id, r.session_start, r.session_end): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    expected = {
        (r.user_id, r.ss, r.se): (r.n, r.tv)
        for r in df.groupBy(
            F.session_window("ts", "30 minutes").alias("w"), "user_id"
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("tv"))
        .select(F.col("w.start").alias("ss"), F.col("w.end").alias("se"),
                "user_id", "n", "tv")
        .collect()
    }
    assert got == expected
    # semantics spot-check: user 1 split into two sessions, user 2 one
    assert sum(1 for (u, *_ ) in got if u == 1) == 2
    assert sum(1 for (u, *_ ) in got if u == 2) == 1
