"""Continuous gold (r12 verdict #6): ``gold_stream`` drives the same
incremental change-feed drain as ``gold_flow``, as a true Structured
Streaming query — so continuous gold must (a) converge to exactly the
state the batch drains produce on the same silver input sequence,
(b) propagate updates AND deletes while running, and (c) survive a
stop/restart (cursor in the atomic marker, not the checkpoint).
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.config import TableConfig
from end_to_end_azure_databricks_data_engineering_project_spark.operators.cdc import END_AT
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog
from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import (
    gold_flow,
    gold_stream,
)


def _cfg(schema):
    return TableConfig(
        schema_name="gold", table="cust", cdc_col="seq",
        keys=("k",), spark_schema=schema, scd_type=2,
    )


def _rows(spark, lo, hi, val, seq):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(val).alias("val"),
        F.lit(seq).cast("double").alias("seq"),
    )


def _wait(predicate, timeout=60, poll=0.5):
    t0 = time.time()
    while time.time() - t0 < timeout:
        if predicate():
            return True
        time.sleep(poll)
    return False


def _gold_state(catalog):
    return sorted(
        (r.k, r.val, r.seq, r["__START_AT"], r[END_AT])
        for r in catalog.table("gold_cust").read().collect()
    )


@pytest.mark.slow
def test_continuous_gold_matches_batch_drains_and_survives_restart(
    spark, tmp_path
):
    base_schema = _rows(spark, 0, 0, "x", 1.0).schema
    cfg = _cfg(base_schema)

    # two identical medallions: one drained continuously, one by
    # explicit batch calls — the same silver input sequence must yield
    # byte-identical gold SCD2 state
    cats = {}
    for side in ("stream", "batch"):
        root = tmp_path / side
        cat = Catalog(spark, root / "wh")
        (root / "state").mkdir(parents=True)
        cat.table("silver_cust").overwrite(
            _rows(spark, 0, 20, "v1", 1.0)
            .repartitionByRange(2, "k").sortWithinPartitions("k")
        )
        cats[side] = cat
    batch_drain = gold_flow(
        spark, cfg, cats["batch"], str(tmp_path / "batch" / "state")
    )
    q = gold_stream(
        spark, cfg, cats["stream"], str(tmp_path / "stream" / "state"),
        str(tmp_path / "stream" / "ckpt"),
    )
    try:
        batch_drain()
        assert _wait(lambda: cats["stream"].table("gold_cust").exists()
                     and cats["stream"].table("gold_cust").read().count() == 20)

        # updates + a delete while the stream is live
        for cat in cats.values():
            cat.table("silver_cust").update_where(
                "k < 5", {"val": "'v2'", "seq": "2.0"}
            )
            cat.table("silver_cust").delete_where("k = 7")
        batch_drain()
        want = _gold_state(cats["batch"])
        assert _wait(lambda: _gold_state(cats["stream"]) == want), (
            f"stream={_gold_state(cats['stream'])}\nwant={want}"
        )
    finally:
        q.stop()

    # restart: more changes while DOWN, then a fresh stream (same
    # checkpoint + marker) must catch up to the batch side again
    for cat in cats.values():
        cat.table("silver_cust").update_where(
            "k >= 15", {"val": "'v3'", "seq": "3.0"}
        )
        cat.table("silver_cust").delete_where("k = 2")
    batch_drain()
    q2 = gold_stream(
        spark, cfg, cats["stream"], str(tmp_path / "stream" / "state"),
        str(tmp_path / "stream" / "ckpt"),
    )
    try:
        want = _gold_state(cats["batch"])
        assert _wait(lambda: _gold_state(cats["stream"]) == want)
    finally:
        q2.stop()

    # the closed-key histories agree too (deletes closed, not erased)
    g = cats["stream"].table("gold_cust").read()
    assert g.filter(f"k = 7 AND {END_AT} IS NULL").count() == 0
    assert g.filter(f"k = 2 AND {END_AT} IS NULL").count() == 0
