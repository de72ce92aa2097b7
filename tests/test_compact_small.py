"""Incremental bin-packing OPTIMIZE: ``compact_small`` rewrites only
sub-threshold files (Delta's default OPTIMIZE semantics) and carries
right-sized files by reference — maintenance cost O(small files), never
O(table). Content-identical → dataChange=false: transparent to every
incremental consumer."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.sources import deltalog, deltareader
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog


@pytest.fixture()
def table(spark, tmp_path):
    return Catalog(spark, tmp_path / "wh").table("t")


def _inodes(table):
    return {f.name: os.stat(f).st_ino for f in table.data_files()}


def _seed(spark, table, n_small=6):
    # one big (~800 KB) file + n_small tiny append files
    table.overwrite(
        spark.range(200_000).select(F.col("id").alias("k")).coalesce(1)
    )
    big = set(_inodes(table))
    for i in range(n_small):
        table.append(
            spark.createDataFrame([(1_000_000 + i,)], "k long").coalesce(1)
        )
    return big


def test_packs_small_files_and_carries_big_by_reference(spark, table):
    big = _seed(spark, table)
    before = _inodes(table)
    v = table.compact_small(max_file_bytes=64 << 10)
    m = table._manifest(v)
    assert len(m["removed"]) == 6 and len(m["added"]) == 1
    after = _inodes(table)
    assert all(after[n] == i for n, i in before.items() if n in big)
    assert table.read().count() == 200_006
    assert table._op(v) == "compact"


def test_transparent_to_incremental_consumers(spark, table):
    _seed(spark, table)
    v0 = table.current_version()
    table.compact_small(max_file_bytes=64 << 10)
    table.append(spark.createDataFrame([(2_000_000,)], "k long"))
    d = table.appended_since(v0)
    assert d is not None and d.count() == 1  # compact contributed zero delta
    cf = table.changes_since(v0)
    assert cf is not None
    assert sorted((r.k, r._change_type) for r in cf.collect()) == [
        (2_000_000, "insert")
    ]


def test_noop_below_two_small_files(spark, table):
    _seed(spark, table, n_small=1)
    v = table.current_version()
    assert table.compact_small(max_file_bytes=1) is None  # nothing small
    assert table.compact_small(max_file_bytes=64 << 10) is None  # only one
    assert table.current_version() == v


def test_partitioned_table_packs_within_partitions(spark, table):
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(10)], "k int, p string"
    )
    table.overwrite(df, partition_by=["p"])
    for i in range(4):
        table.append(
            spark.createDataFrame([(100 + i, "a")], "k int, p string")
        )
    n_before = len(table.data_files())
    table.compact_small(max_file_bytes=1 << 20)
    assert len(table.data_files()) < n_before
    assert table.read().count() == 14
    assert table.read_pruned({"p": ("a", "a")}).count() == 9
    assert table.read_pruned({"p": ("b", "b")}).count() == 5


def test_delta_log_marks_datachange_false_and_reader_replays(spark, table):
    _seed(spark, table)
    v = table.compact_small(max_file_bytes=64 << 10)
    dv = table._pointer_state()["delta"]["version"]
    actions = [json.loads(line) for line in
               deltalog.commit_path(table.dir, dv).read_text().splitlines()]
    ops = [a["commitInfo"]["operation"] for a in actions if "commitInfo" in a]
    assert ops == ["OPTIMIZE"]
    assert all(not a["add"]["dataChange"] for a in actions if "add" in a)
    assert all(not a["remove"]["dataChange"] for a in actions if "remove" in a)
    got = sorted(r.k for r in deltareader.read_delta(spark, table.dir).collect())
    assert got == sorted(r.k for r in table.read().collect())


def test_epoch_replay_skipped(spark, table):
    _seed(spark, table)
    assert table.compact_small(
        max_file_bytes=64 << 10, epoch=1, epoch_key="maint"
    ) is not None
    # replay of the same maintenance epoch: no commit
    table.append(spark.createDataFrame([(3_000_000,)], "k long").coalesce(1))
    table.append(spark.createDataFrame([(3_000_001,)], "k long").coalesce(1))
    assert table.compact_small(
        max_file_bytes=64 << 10, epoch=1, epoch_key="maint"
    ) is None


def test_compact_small_converges(spark, table):
    """Review finding: once the small set is already ~target-sized
    chunks, repacking must be refused — not an endless rewrite of the
    same bytes every maintenance cycle."""
    _seed(spark, table)
    v = table.compact_small(max_file_bytes=64 << 10)
    assert v is not None
    # second pass: nothing to improve — no commit
    assert table.compact_small(max_file_bytes=64 << 10) is None
    assert table.current_version() == v
    # and packing N small files into >= N outputs is refused up front
    assert table.compact_small(max_file_bytes=1) is None


def test_auto_maintenance_hook_packs_pipeline_sinks(spark, tmp_path):
    """DLT auto-compact parity: with the hook attached, repeated
    pipeline runs keep the silver sink bin-packed and the vacuum
    cadence engages — no scheduled OPTIMIZE job needed."""
    import datetime as dt

    from end_to_end_azure_databricks_data_engineering_project_spark.config import TABLE_BY_NAME
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.ingest import ingest_all
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.watermark import WatermarkStore
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import (
        auto_maintenance_hook,
        build_medallion_pipeline,
    )

    cfgs = [TABLE_BY_NAME["dim_user"]]
    store = WatermarkStore(tmp_path / "state")
    pipe = catalog = None
    hook = None
    for day in range(6):
        users = spark.createDataFrame(
            [(day * 10 + i, f"user {day}-{i}", "US", "Free", None, None,
              dt.datetime(2025, 1, 1 + day)) for i in range(5)],
            "user_id int, user_name string, country string,"
            " subscription_type string, start_date date, end_date date,"
            " updated_at timestamp",
        )
        ingest_all(spark, cfgs, {"dim_user": users}, str(tmp_path / "bronze"), store)
        if pipe is None:
            pipe, catalog = build_medallion_pipeline(
                spark, cfgs, str(tmp_path / "bronze"), str(tmp_path / "wh"),
                str(tmp_path / "state"),
            )
            hook = auto_maintenance_hook(
                catalog, max_file_bytes=1 << 20, vacuum_every=3, vacuum_keep=2,
                min_small_files=2,  # pack every run: this test wants the
                # collapse visible within 6 runs (default gate is 8)
            )
        pipe.run_all(on_event=hook)
    silver = catalog.table("silver_dim_user")
    # 6 daily appends would be >= 6 small files unpacked; the hook keeps
    # the count collapsed (pack commits interleave, so just assert small)
    assert len(silver.data_files()) <= 3
    assert silver.read().count() == 30
    # vacuum cadence pruned old versions
    assert silver._pointer_state().get("committed_floor", 0) > 0
    # gold unaffected and exact
    assert catalog.table("gold_dim_user").read().count() == 30


def test_min_small_files_gate_prevents_per_run_repack(spark, table):
    """Delta autoCompact's minNumFiles analog: below the gate the call
    is a stat scan + no commit, so a continuous maintenance hook never
    repacks all accumulated small bytes on every single run."""
    base = spark.range(100).select(F.col("id").alias("k"))
    table.overwrite(base.coalesce(1))
    for i in range(3):
        table.append(base.limit(5).coalesce(1))
    # 4 small files < gate of 8: no commit
    v = table.current_version()
    assert table.compact_small(max_file_bytes=1 << 20, min_small_files=8) is None
    assert table.current_version() == v
    # at/above the gate: packs
    assert table.compact_small(max_file_bytes=1 << 20, min_small_files=4) is not None
    assert len(table.data_files()) == 1
    assert table.read().count() == 115
