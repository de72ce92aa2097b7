"""Skew helpers, bucketed co-located joins, and the custom stateful
streaming operator."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.skew import (
    salted_count_distinct,
    salted_latest_per_key,
    write_bucketed,
)
from end_to_end_azure_databricks_data_engineering_project_spark.operators.transforms import (
    dedup_keep_latest,
)


def _skewed(spark):
    # key 1 holds 90% of rows (the hot key)
    rows = [(1 if i % 10 else 2, f"v{i}", dt.datetime(2025, 1, 1) + dt.timedelta(seconds=i))
            for i in range(2000)]
    return spark.createDataFrame(rows, "k int, v string, ts timestamp")


def test_salted_latest_matches_plain(spark):
    df = _skewed(spark)
    plain = {(r.k, r.v, r.ts) for r in dedup_keep_latest(df, ["k"], "ts", "v").collect()}
    salted = {(r.k, r.v, r.ts) for r in
              salted_latest_per_key(df, ["k"], "ts", "v", n_salt=8).collect()}
    assert salted == plain and len(salted) == 2


def test_salted_count_distinct(spark):
    df = _skewed(spark)
    out = {r.k: r.n_distinct_v for r in salted_count_distinct(df, ["k"], "v").collect()}
    expected = {
        r.k: r.n for r in
        df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert out == expected


def test_bucketed_join_is_shuffle_free(spark, tmp_path):
    # spark.sql.warehouse.dir is static — bucketed tables land in the
    # session default warehouse; dropped in the finally block.
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    o = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "o_orderkey", "o_totalprice"
    )
    write_bucketed(li, "li_b", "l_orderkey", 8)
    write_bucketed(o.withColumnRenamed("o_orderkey", "l_orderkey"), "o_b", "l_orderkey", 8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        joined = spark.table("li_b").join(spark.table("o_b"), "l_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan  # co-located: no shuffle on either side
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS li_b")
        spark.sql("DROP TABLE IF EXISTS o_b")


def test_running_user_stats_stateful(spark, tmp_path):
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.stateful import (
        running_user_stats,
    )

    src = str(tmp_path / "ev")
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(minutes=i), i % 3, "click", float(i))
            for i in range(30)]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.user_id: (r.n, r.total) for r in spark.sql("SELECT * FROM user_stats").collect()}
    expected = {
        u: (len([i for i in range(30) if i % 3 == u]),
            float(sum(i for i in range(30) if i % 3 == u)))
        for u in (0, 1, 2)
    }
    assert got == expected


def test_running_user_stats_transformwithstate(spark, tmp_path):
    """The Spark 4.x transformWithState twin must produce the same final
    per-key stats as the applyInPandasWithState operator. Requires the
    RocksDB state-store provider (bundled) AND google.protobuf (NOT in
    this container — pyspark's transform_with_state_driver_worker dies
    at init importing StateMessage_pb2 without it), so the test skips
    there instead of asserting a crash."""
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.stateful import (
        HAVE_TWS_PROTO,
        running_user_stats_tws,
    )

    if not HAVE_TWS_PROTO:
        pytest.skip("google.protobuf absent: transformWithState wire protocol unavailable")

    src = str(tmp_path / "ev")
    base = dt.datetime(2024, 1, 1)
    rows = [(i, base + dt.timedelta(minutes=i), i % 3, "click", float(i))
            for i in range(30)]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double"
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(src)

    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            running_user_stats_tws(stream)
            .writeStream.format("memory")
            .queryName("user_stats_tws")
            .outputMode("update")
            .option("checkpointLocation", str(tmp_path / "ckpt_tws"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r.user_id: (r.n, r.total)
            for r in spark.sql("SELECT * FROM user_stats_tws").collect()
        }
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)
    expected = {
        u: (len([i for i in range(30) if i % 3 == u]),
            float(sum(i for i in range(30) if i % 3 == u)))
        for u in (0, 1, 2)
    }
    assert got == expected


def test_distributed_row_number_matches_global_window(spark):
    """Range-partitioned ranking with per-range offsets must assign
    EXACTLY row_number() over a global orderBy — independent of where
    the range sampler places boundaries — without the single-partition
    window (the r9 verdict's last design flag, closed in bpe_encode)."""
    from pyspark.sql import Window

    from end_to_end_azure_databricks_data_engineering_project_spark.operators.skew import distributed_row_number

    df = spark.range(5000).selectExpr(
        "concat('tok_', CAST((id * 2654435761) % 100000 AS STRING), '_', id) AS token"
    )
    got = {
        r.token: r.rank
        for r in distributed_row_number(df, ["token"], n_ranges=13).collect()
    }
    w = Window.partitionBy().orderBy("token")
    import pyspark.sql.functions as F2

    want = {
        r.token: r.rank
        for r in df.withColumn("rank", F2.row_number().over(w)).collect()
    }
    assert got == want
    # partitioning-independent
    got2 = {
        r.token: r.rank
        for r in distributed_row_number(
            df.repartition(17), ["token"], n_ranges=5
        ).collect()
    }
    assert got2 == want
    # empty input
    empty = spark.createDataFrame([], "token string")
    assert distributed_row_number(empty, ["token"]).count() == 0
