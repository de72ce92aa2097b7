from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.expectations import (
    expect_all,
    expect_all_or_drop,
)
from end_to_end_azure_databricks_data_engineering_project_spark.operators.transforms import (
    bucketize,
    dedup_keep_latest,
    drop_columns,
    normalize_case,
    regexp_clean,
)


def test_silver_cleanse_chain(spark):
    """The DimTrack cleanse chain (silver_Dimensions.py:137-168):
    bucket duration, regexp the name, drop the rescue column."""
    df = spark.createDataFrame(
        [(1, "a-b-c", 100, "x"), (2, "plain", 200, None), (3, "z", 400, None)],
        "track_id int, track_name string, duration_sec int, _rescued_data string",
    )
    out = bucketize(df, "duration_sec", "duration_flag", [150, 300], ["low", "medium", "high"])
    out = regexp_clean(out, "track_name", "-", " ")
    out = drop_columns(out, ["_rescued_data"])
    rows = {r.track_id: r for r in out.collect()}
    assert rows[1].duration_flag == "low" and rows[1].track_name == "a b c"
    assert rows[2].duration_flag == "medium"
    assert rows[3].duration_flag == "high"
    assert "_rescued_data" not in out.columns


def test_normalize_case_trims_and_uppers(spark):
    df = spark.createDataFrame([("  ann b  ",)], "user_name string")
    assert normalize_case(df, "user_name").first().user_name == "ANN B"


def test_dedup_keep_latest_deterministic(spark):
    t = dt.datetime
    df = spark.createDataFrame(
        [(1, "old", t(2025, 1, 1)), (1, "new", t(2025, 2, 1)), (2, "only", t(2025, 1, 1))],
        "k int, v string, ts timestamp",
    )
    out = {r.k: r.v for r in dedup_keep_latest(df, ["k"], "ts").collect()}
    assert out == {1: "new", 2: "only"}


def test_expect_all_or_drop_drops_and_counts(spark):
    df = spark.createDataFrame(
        [(1, 10), (None, 20), (3, None), (4, 40)], "user_id int, v int"
    )
    res = expect_all_or_drop(df, {"key": "user_id IS NOT NULL", "val": "v > 0"})
    kept = res.df.collect()
    assert {r.user_id for r in kept} == {1, 4}
    m = res.metrics()
    assert m["rows_seen"] == 4
    assert m["violations__key"] == 1
    assert m["violations__val"] == 1  # NULL v counts as violation


def test_expect_all_warn_only(spark):
    df = spark.createDataFrame([(1,), (None,)], "user_id int")
    res = expect_all(df, {"key": "user_id IS NOT NULL"})
    assert res.df.count() == 2
    assert res.metrics()["violations__key"] == 1


def test_expect_all_or_quarantine_routes_and_names_rules(spark):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.expectations import (
        expect_all_or_quarantine,
    )

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (None, 3.0), (4, None)],
        "user_id int, value double",
    )
    rules = {"has_user": "user_id IS NOT NULL", "positive": "value > 0"}
    passed, quarantined = expect_all_or_quarantine(df, rules)
    assert sorted(r.user_id for r in passed.collect()) == [1]
    got = {r.user_id if r.user_id is not None else None: sorted(r["_failed_expectations"])
           for r in quarantined.collect()}
    assert got[2] == ["positive"]
    assert got[None] == ["has_user"]
    assert got[4] == ["positive"]  # NULL rule result counts as failure
    assert "_failed_expectations" not in passed.columns


def test_expect_all_or_quarantine_empty_rules(spark):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.expectations import (
        expect_all_or_quarantine,
    )

    df = spark.range(3)
    passed, quarantined = expect_all_or_quarantine(df, {})
    assert passed.count() == 3 and quarantined.count() == 0
