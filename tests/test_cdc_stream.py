"""TRUE streaming CDC: bronze file stream → foreachBatch SCD merge —
and ManagedTable crash recovery."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.config import TABLE_BY_NAME
from end_to_end_azure_databricks_data_engineering_project_spark.operators.cdc import END_AT
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog, ManagedTable
from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import cdc_stream

T0 = dt.datetime(2025, 1, 1)
T1 = dt.datetime(2025, 6, 1)


def test_streaming_cdc_scd2(spark, tmp_path):
    cfg = TABLE_BY_NAME["dim_artist"]
    src = tmp_path / "bronze" / "dim_artist"
    catalog = Catalog(spark, tmp_path / "wh")

    spark.createDataFrame(
        [(1, "a", "Pop", "US", T0), (2, "b", "Rock", "DE", T0)], cfg.spark_schema
    ).write.parquet(str(src / "run=1"))

    q = cdc_stream(spark, cfg, str(tmp_path / "bronze"), catalog, str(tmp_path / "ck"))
    q.awaitTermination(120)
    gold = catalog.table("gold_dim_artist").read()
    assert gold.count() == 2

    # second batch of files: an update + a gated NULL key
    spark.createDataFrame(
        [(1, "a", "Jazz", "US", T1), (None, "ghost", "Pop", "XX", T1)], cfg.spark_schema
    ).write.parquet(str(src / "run=2"))
    q = cdc_stream(spark, cfg, str(tmp_path / "bronze"), catalog, str(tmp_path / "ck"))
    q.awaitTermination(120)
    gold = catalog.table("gold_dim_artist").read()
    assert gold.count() == 3  # closed + open for key 1, open for key 2
    assert gold.filter(F.col(END_AT).isNotNull()).count() == 1
    assert gold.filter("artist_id IS NULL").count() == 0

    # restart with same checkpoint: no new files → no change (exactly-once)
    q = cdc_stream(spark, cfg, str(tmp_path / "bronze"), catalog, str(tmp_path / "ck"))
    q.awaitTermination(120)
    assert catalog.table("gold_dim_artist").read().count() == 3


def test_managed_table_crashed_writer_recovery(spark, tmp_path):
    """A version dir written without a pointer commit (simulated crash)
    is invisible to readers and harmlessly superseded by the next write."""
    t = ManagedTable(spark, tmp_path, "crashy")
    t.overwrite(spark.createDataFrame([(1,)], "id int"))
    # simulate: writer died after writing v1 files but before commit
    orphan = t._version_dir(1)
    spark.createDataFrame([(999,)], "id int").write.parquet(str(orphan))
    assert t.current_version() == 0
    assert t.read().count() == 1 and t.read().first().id == 1
    # next writer takes version 1+... and commits atomically over it
    t.overwrite(spark.createDataFrame([(2,), (3,)], "id int"))
    assert t.read().count() == 2
    assert json.loads((t.dir / "_latest").read_text())["version"] >= 1
