"""MERGE ... WHEN NOT MATCHED BY SOURCE THEN DELETE (the Delta
full-sync idiom) — sources/tables.py _sql_merge + merge_keyed
full_scope.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog


@pytest.fixture()
def setup(spark, tmp_path):
    cat = Catalog(spark, tmp_path / "wh")
    t = cat.table("dim")
    t.overwrite(
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "k long, v string"
        ),
        enable_cdf=True,
    )
    spark.createDataFrame(
        [(2, "B"), (4, "d")], "k long, v string"
    ).createOrReplaceTempView("src")
    return cat, t


def test_full_sync_result_is_source_snapshot(setup):
    cat, t = setup
    cat.sql(
        "MERGE INTO dim USING src ON dim.k = src.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )
    assert sorted((r.k, r.v) for r in t.read().collect()) == [
        (2, "B"), (4, "d"),
    ]


def test_full_sync_change_feed_exact(setup):
    cat, t = setup
    v0 = t.current_version()
    cat.sql(
        "MERGE INTO dim USING src ON dim.k = src.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT * "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )
    ch = sorted(
        (r.k, r._change_type)
        for r in t.changes_since(v0, keys=["k"]).collect()
    )
    assert ch == [
        (1, "delete"), (2, "update_post"), (2, "update_pre"),
        (3, "delete"), (4, "insert"),
    ]


def test_by_source_delete_alone(setup):
    cat, t = setup
    cat.sql(
        "MERGE INTO dim USING src ON dim.k = src.k "
        "WHEN NOT MATCHED BY SOURCE THEN DELETE"
    )
    # matched rows keep their OLD values (no UPDATE clause), unmatched
    # target rows are gone, nothing inserted
    assert sorted((r.k, r.v) for r in t.read().collect()) == [(2, "b")]


def test_by_target_alias_for_insert(setup):
    cat, t = setup
    cat.sql(
        "MERGE INTO dim USING src ON dim.k = src.k "
        "WHEN NOT MATCHED BY TARGET THEN INSERT *"
    )
    assert t.read().count() == 4  # insert k=4 only


def test_conditional_by_source_raises(setup):
    cat, _ = setup
    with pytest.raises(ValueError, match="unsupported MERGE clause"):
        cat.sql(
            "MERGE INTO dim USING src ON dim.k = src.k "
            "WHEN NOT MATCHED BY SOURCE AND v = 'x' THEN DELETE"
        )


def test_full_scope_python_api(spark, tmp_path):
    t = Catalog(spark, tmp_path / "wh").table("t")
    t.overwrite(spark.range(0, 100).select(
        F.col("id").alias("k"), F.lit("old").alias("v")
    ).repartition(4, "k"))
    keep = spark.range(0, 10).select(
        F.col("id").alias("k"), F.lit("new").alias("v")
    )
    t.merge_keyed(
        keep, ["k"], lambda cur, b: b, full_scope=True,
    )
    rows = t.read().collect()
    assert len(rows) == 10 and all(r.v == "new" for r in rows)
