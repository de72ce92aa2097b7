"""Delta Change-Data-Feed emission (round-9 verdict stretch item 7):
CDF-enabled tables materialize each merge's row-level changes into
_change_data/ files referenced by protocol ``cdc`` actions (writer
version 4 + delta.enableChangeDataFeed in metaData), and the engine's
own change feed consumes them as a fast path with identical semantics.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.cdc import scd1_merge
from end_to_end_azure_databricks_data_engineering_project_spark.sources import deltalog
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog


def _base(spark, n=100):
    return spark.range(n).select(
        F.col("id").alias("k"), F.lit("old").alias("val"), F.lit(1).alias("seq")
    )


def _merge(t, spark, rows):
    batch = spark.createDataFrame(rows, "k long, val string, seq int")
    t.merge_keyed(batch, ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"))


def test_cdf_merge_emits_protocol_cdc_actions(spark, tmp_path):
    t = Catalog(spark, tmp_path / "wh").table("t")
    t.overwrite(_base(spark).repartition(4, "k"), enable_cdf=True)
    actions0 = deltalog.read_actions(t.dir, 0)
    proto = next(a["protocol"] for a in actions0 if "protocol" in a)
    assert proto["minWriterVersion"] == 4  # CDF is a writer-v4 feature
    meta = next(a["metaData"] for a in actions0 if "metaData" in a)
    assert meta["configuration"] == {"delta.enableChangeDataFeed": "true"}
    _merge(t, spark, [(7, "new", 2), (5000, "ins", 2)])
    d = t._pointer_state()["delta"]["version"]
    actions = deltalog.read_actions(t.dir, d)
    cdcs = [a["cdc"] for a in actions if "cdc" in a]
    assert cdcs, "merge on a CDF table must emit cdc actions"
    for c in cdcs:
        assert c["path"].startswith("_change_data/cdc-")
        assert c["dataChange"] is False
        assert c["size"] > 0
        assert (t.dir / c["path"]).exists()
    # the change files carry Delta's protocol change types
    rows = spark.read.parquet(
        *[str(t.dir / c["path"]) for c in cdcs]
    ).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r["_change_type"], []).append(r["k"])
    assert by_type["update_preimage"] == [7] and by_type["update_postimage"] == [7]
    assert by_type["insert"] == [5000]
    assert "delete" not in by_type


@pytest.mark.slow
def test_changes_since_cdc_fast_path_matches_diff_path(spark, tmp_path):
    cat = Catalog(spark, tmp_path / "wh")
    a, b = cat.table("with_cdf"), cat.table("without_cdf")
    a.overwrite(_base(spark).repartition(4, "k"), enable_cdf=True)
    b.overwrite(_base(spark).repartition(4, "k"))
    v0a, v0b = a.current_version(), b.current_version()
    for t in (a, b):
        _merge(t, spark, [(3, "x", 2), (9999, "y", 2)])
        t.append(_base(spark).filter("k < 0"))  # empty append in range
        _merge(t, spark, [(3, "z", 3)])
    assert a._manifest(a.current_version()).get("cdc")  # fast path armed
    assert not b._manifest(b.current_version()).get("cdc")
    fa = a.changes_since(v0a, keys=["k"])
    fb = b.changes_since(v0b, keys=["k"])
    rows_a = sorted((r.k, r.val, r["_change_type"]) for r in fa.collect())
    rows_b = sorted((r.k, r.val, r["_change_type"]) for r in fb.collect())
    assert rows_a == rows_b and rows_a
    # keyless consumption also agrees (pairing left to the caller)
    ra = sorted((r.k, r["_change_type"]) for r in a.changes_since(v0a).collect())
    rb = sorted((r.k, r["_change_type"]) for r in b.changes_since(v0b).collect())
    assert ra == rb


def test_non_cdf_table_never_writes_change_data(spark, tmp_path):
    t = Catalog(spark, tmp_path / "wh").table("t")
    t.overwrite(_base(spark).repartition(4, "k"))
    _merge(t, spark, [(7, "new", 2)])
    assert not (t.dir / "_change_data").exists()
    d = t._pointer_state()["delta"]["version"]
    assert not any("cdc" in a for a in deltalog.read_actions(t.dir, d))
    proto = next(
        a["protocol"] for a in deltalog.read_actions(t.dir, 0) if "protocol" in a
    )
    assert proto["minWriterVersion"] == 2  # no CDF -> base writer version


def test_vacuum_ages_out_change_data_with_its_version(spark, tmp_path):
    t = Catalog(spark, tmp_path / "wh").table("t")
    t.overwrite(_base(spark).repartition(4, "k"), enable_cdf=True)
    _merge(t, spark, [(1, "a", 2)])
    old_cdc = {f.name for f in (t.dir / "_change_data").glob("*.parquet")}
    for i in range(3):
        _merge(t, spark, [(2 + i, "b", 3 + i)])
    t.vacuum(keep=2)
    left = {f.name for f in (t.dir / "_change_data").glob("*.parquet")}
    assert not (left & old_cdc)  # the vacuumed merge's cdc files are gone
    assert left  # retained merges keep theirs
    # retained-range change feed still works off the fast path
    v = t.current_version()
    _merge(t, spark, [(50, "c", 9)])
    feed = t.changes_since(v, keys=["k"])
    assert {r["_change_type"] for r in feed.collect()} == {"update_pre", "update_post"}


def test_streaming_cdc_into_cdf_table_emits_change_feed(spark, tmp_path):
    """End-to-end: a TRUE streaming CDC pipeline (bronze file stream ->
    foreachBatch SCD2 merge) against a CDF-enabled gold table — every
    merge micro-batch materializes cdc files + protocol actions, and
    the engine feed off them matches the SCD2 history."""
    import datetime as dt

    from end_to_end_azure_databricks_data_engineering_project_spark.config import TABLE_BY_NAME
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import cdc_stream

    T0 = dt.datetime(2025, 1, 1)
    T1 = dt.datetime(2025, 6, 1)
    cfg = TABLE_BY_NAME["dim_artist"]
    src = tmp_path / "bronze" / "dim_artist"
    cat = Catalog(spark, tmp_path / "wh")
    # pre-create the gold table CDF-enabled (empty, the stream merges in)
    gold = cat.table("gold_dim_artist")
    gold.overwrite(
        spark.createDataFrame([(0, "seed", "Pop", "US", T0)], cfg.spark_schema)
        .withColumn("__START_AT", F.col("updated_at"))
        .withColumn("__END_AT", F.lit(None).cast("timestamp")),
        enable_cdf=True,
    )
    spark.createDataFrame(
        [(1, "a", "Pop", "US", T0)], cfg.spark_schema
    ).write.parquet(str(src / "run=1"))
    q = cdc_stream(spark, cfg, str(tmp_path / "bronze"), cat, str(tmp_path / "ck"))
    q.awaitTermination(120)
    v_after_first = gold.current_version()
    spark.createDataFrame(
        [(1, "a", "Jazz", "US", T1)], cfg.spark_schema
    ).write.parquet(str(src / "run=2"))
    q = cdc_stream(spark, cfg, str(tmp_path / "bronze"), cat, str(tmp_path / "ck"))
    q.awaitTermination(120)
    # the SCD2 update merge materialized a change feed
    m = gold._manifest(gold.current_version())
    assert m.get("cdc"), "streaming merge on a CDF table must emit cdc files"
    d = gold._pointer_state()["delta"]["version"]
    assert any("cdc" in a for a in deltalog.read_actions(gold.dir, d))
    feed = gold.changes_since(v_after_first, keys=["artist_id", "__START_AT"])
    got = {(r.artist_id, r.genre, r["_change_type"]) for r in feed.collect()}
    # closing the old version = update (same key+start, END_AT set);
    # the new open version = insert
    assert (1, "Jazz", "insert") in got
    assert (1, "Pop", "update_pre") in got and (1, "Pop", "update_post") in got
