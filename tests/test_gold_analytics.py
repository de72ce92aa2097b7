"""Gold-layer domain analytics over the pipeline output (the queries the
reference's gold layer exists to serve)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark import fixtures
from end_to_end_azure_databricks_data_engineering_project_spark.__main__ import CLEANSERS
from end_to_end_azure_databricks_data_engineering_project_spark.config import TABLES
from end_to_end_azure_databricks_data_engineering_project_spark.plans.gold_analytics import (
    device_mix_by_weekday,
    listener_activity,
    subscription_history_churn,
    top_genres_by_listen_time,
)
from end_to_end_azure_databricks_data_engineering_project_spark.sources.ingest import ingest_all
from end_to_end_azure_databricks_data_engineering_project_spark.sources.watermark import WatermarkStore
from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import (
    build_medallion_pipeline,
)


@pytest.fixture(scope="module")
def catalog(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("gold")
    cfgs = list(TABLES)
    store = WatermarkStore(tmp / "state")
    cat = None
    for sources in (fixtures.phase1(spark, 0.3), fixtures.phase2(spark, 0.3)):
        ingest_all(spark, cfgs, sources, str(tmp / "bronze"), store)
        pipe, cat = build_medallion_pipeline(
            spark, cfgs, str(tmp / "bronze"), str(tmp / "wh"), str(tmp / "state"), CLEANSERS,
        )
        pipe.run_all()
    return cat


def test_flagship_top_genres(spark, catalog):
    out = top_genres_by_listen_time(catalog)
    rows = out.collect()
    assert len(rows) > 0
    assert {"genre", "year", "month", "total_listen_sec", "n_streams"} <= set(out.columns)
    assert all(r.total_listen_sec > 0 for r in rows)
    # descending order by listen time
    vals = [r.total_listen_sec for r in rows]
    assert vals == sorted(vals, reverse=True)


def test_listener_activity_consistent_totals(spark, catalog):
    act = listener_activity(catalog)
    fact = catalog.table("gold_fact_stream").read()
    # joined totals can't exceed the fact's total (dangling FKs drop out)
    assert (
        act.agg(F.sum("n_streams")).first()[0]
        <= fact.count()
    )
    assert act.filter("subscription_type IS NULL").count() == 0


def test_device_mix_pivot_shape(spark, catalog):
    out = device_mix_by_weekday(catalog)
    assert {"weekday", "Mobile", "Desktop", "Smart Speaker"} <= set(out.columns)
    assert out.count() <= 7


def test_churn_transitions_match_scd2(spark, catalog):
    churn = subscription_history_churn(catalog)
    rows = churn.collect()
    assert len(rows) > 0
    # phase-2 updates all moved to Premium (or Family for the planted
    # duplicate-key user); some versions differ only in country, so
    # prev == curr subscription is possible — but not for all rows
    assert any(r.prev_type != r.curr_type for r in rows)
    assert {r.curr_type for r in rows} <= {"Premium", "Family"}
    # closed→open chain is contiguous for every transition row
    assert churn.filter(F.col("changed_at").isNull()).count() == 0
