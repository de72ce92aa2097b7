"""The reference's exact end-to-end scenario at full fixture scale
(FIXTURES.md / readme.md:114-118): 500/500/500/365/1000 initial rows,
then the incremental batch (50 updates + 20 new users, 50/50 dim
updates, 300 new facts) — asserting the documented post-phase-2 shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark import fixtures
from end_to_end_azure_databricks_data_engineering_project_spark.__main__ import CLEANSERS
from end_to_end_azure_databricks_data_engineering_project_spark.config import TABLES
from end_to_end_azure_databricks_data_engineering_project_spark.operators.cdc import END_AT, START_AT
from end_to_end_azure_databricks_data_engineering_project_spark.sources.ingest import ingest_all
from end_to_end_azure_databricks_data_engineering_project_spark.sources.watermark import WatermarkStore
from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import (
    build_medallion_pipeline,
)


@pytest.mark.slow
def test_full_reference_scenario(spark, tmp_path):
    cfgs = list(TABLES)
    store = WatermarkStore(tmp_path / "state")

    def run(sources):
        ingest_all(spark, cfgs, sources, str(tmp_path / "bronze"), store)
        pipe, catalog = build_medallion_pipeline(
            spark, cfgs, str(tmp_path / "bronze"), str(tmp_path / "wh"),
            str(tmp_path / "state"), CLEANSERS,
        )
        pipe.run_all()
        return catalog

    catalog = run(fixtures.phase1(spark, scale=1.0))
    gold_user = catalog.table("gold_dim_user").read()
    assert gold_user.count() == 500
    assert gold_user.filter(F.col(END_AT).isNotNull()).count() == 0

    catalog = run(fixtures.phase2(spark, scale=1.0))
    gold_user = catalog.table("gold_dim_user").read()

    # 50 updated keys: exactly 2 versions (closed + open Premium/Family)
    counts = gold_user.groupBy("user_id").count()
    assert counts.filter("count = 2").count() == 50
    # untouched + 20 new keys: 1 open version each
    assert counts.filter("count = 1").count() == 470
    # ghost row (NULL key) was gated out
    assert gold_user.filter(F.col("user_id").isNull()).count() == 0
    # updated keys: old version closed exactly at the new version's start
    pairs = (
        gold_user.filter(F.col(END_AT).isNotNull()).alias("old")
        .join(
            gold_user.filter(F.col(END_AT).isNull()).alias("new"),
            F.col("old.user_id") == F.col("new.user_id"),
        )
        .filter(F.col(f"old.{END_AT}") == F.col(f"new.{START_AT}"))
    )
    assert pairs.count() == 50
    # stale update (key 2 with cdc < T0) ignored: key 2 updated via the
    # regular path only
    k2 = gold_user.filter("user_id = 2").orderBy(START_AT).collect()
    assert [r[END_AT] is None for r in k2] == [False, True]

    # SCD1 fact: 1000 + 300 new, one row per stream_id
    gold_fact = catalog.table("gold_fact_stream").read()
    assert gold_fact.count() == 1300
    assert gold_fact.select("stream_id").distinct().count() == 1300

    # DimArtist modeled in gold too (the reference's gap, closed)
    assert catalog.table("gold_dim_artist").read().count() >= 500
