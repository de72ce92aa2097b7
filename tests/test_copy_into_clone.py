"""COPY INTO (idempotent file-level batch load) and CREATE TABLE ...
SHALLOW CLONE — sources/tables.py copy_into / clone routing.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog


def _land(spark, path, lo, hi, parts=2):
    spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("x")
    ).coalesce(parts).write.parquet(path)


@pytest.fixture()
def env(spark, tmp_path):
    src = str(tmp_path / "landing")
    _land(spark, src + "/day=1", 0, 10)
    return Catalog(spark, tmp_path / "wh"), src


def test_copy_into_loads_then_noops(env):
    cat, src = env
    r1 = cat.sql(
        f"COPY INTO tgt FROM '{src}' FILEFORMAT = PARQUET"
    ).collect()[0]
    assert (r1.num_files_loaded, r1.num_rows_loaded) == (2, 10)
    r2 = cat.sql(
        f"COPY INTO tgt FROM '{src}' FILEFORMAT = PARQUET"
    ).collect()[0]
    assert (r2.num_files_loaded, r2.num_rows_loaded) == (0, 0)
    assert cat.table("tgt").read().count() == 10


def test_copy_into_incremental_new_files_only(spark, env):
    cat, src = env
    cat.sql(f"COPY INTO tgt FROM '{src}' FILEFORMAT = PARQUET")
    _land(spark, src + "/day=2", 10, 15, parts=1)
    r = cat.sql(
        f"COPY INTO tgt FROM '{src}' FILEFORMAT = PARQUET"
    ).collect()[0]
    assert r.num_rows_loaded == 5
    assert cat.table("tgt").read().count() == 15


def test_copy_into_pattern_filter(spark, env):
    cat, src = env
    _land(spark, src + "/day=2", 10, 15, parts=1)
    res = cat.table("t2").copy_into(src, pattern="day=2/*")
    assert res["num_rows_loaded"] == 5


def test_copy_into_ledger_survives_reopen(spark, tmp_path, env):
    cat, src = env
    cat.sql(f"COPY INTO tgt FROM '{src}' FILEFORMAT = PARQUET")
    fresh = Catalog(cat.spark, cat.root)
    r = fresh.sql(
        f"COPY INTO tgt FROM '{src}' FILEFORMAT = PARQUET"
    ).collect()[0]
    assert r.num_files_loaded == 0


def test_copy_into_schema_enforced(spark, env):
    cat, src = env
    cat.sql(f"COPY INTO tgt FROM '{src}' FILEFORMAT = PARQUET")
    bad = str(src) + "_bad"
    spark.range(0, 3).select(
        F.col("id").alias("k"), F.lit("s").alias("x")
    ).coalesce(1).write.parquet(bad)
    with pytest.raises(Exception):  # x: double stored vs string incoming
        cat.table("tgt").copy_into(bad)


def test_copy_into_bad_shapes(env):
    cat, src = env
    with pytest.raises(ValueError, match="PARQUET only"):
        cat.sql(f"COPY INTO tgt FROM '{src}' FILEFORMAT = CSV")
    with pytest.raises(ValueError, match="unsupported COPY"):
        cat.sql("COPY tgt FROM somewhere")


def test_shallow_clone_zero_copy_and_replace(spark, env):
    cat, src = env
    cat.sql(f"COPY INTO tgt FROM '{src}' FILEFORMAT = PARQUET")
    cat.sql("CREATE TABLE tc SHALLOW CLONE tgt")
    t, c = cat.table("tgt"), cat.table("tc")
    assert c.read().count() == 10
    si = {os.stat(str(f)).st_ino for f in t.data_files(t.current_version())}
    ci = {os.stat(str(f)).st_ino for f in c.data_files(c.current_version())}
    assert si == ci  # hardlinked, not copied
    # plain CREATE over an existing table still raises; OR REPLACE works
    with pytest.raises(ValueError, match="already exists"):
        cat.sql("CREATE TABLE tc SHALLOW CLONE tgt")
    cat.table("t2").overwrite(
        spark.createDataFrame([(1, 9.0)], "k long, x double")
    )
    cat.sql("CREATE OR REPLACE TABLE tc SHALLOW CLONE t2")
    assert cat.table("tc").read().count() == 1
