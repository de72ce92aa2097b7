"""Partition columns on ManagedTable (round-9 verdict item 2): hive
directory layout inside the shared store, Delta-style semantics —
partition columns fixed at creation, data files omit them (readers
reconstruct from paths), partition values enter the stats index for
listing-time pruning, and the Delta log carries partitionValues /
partitionColumns. Mirrors the reference's directory-layout bronze
pruning (readme.md:27, incremental_loop.json:81-90).
"""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.sources import deltalog
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import (
    Catalog,
    ConcurrentWriteError,
)


@pytest.fixture()
def table(spark, tmp_path):
    return Catalog(spark, tmp_path / "wh").table("t")


def _events(spark, lo, hi, day):
    return spark.createDataFrame(
        [(i, f"u{i % 5}", float(i), dt.date(2024, 1, day)) for i in range(lo, hi)],
        "id long, user string, amount double, d date",
    ).coalesce(1)


def test_partitioned_write_roundtrip_and_layout(spark, table):
    df = _events(spark, 0, 100, 1).unionByName(_events(spark, 100, 200, 2))
    table.overwrite(df, partition_by=["d"])
    assert table.partition_columns() == ["d"]
    got = sorted(tuple(r) for r in table.read().collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want  # values AND column order reconstructed exactly
    # physical layout: hive dirs inside the store, no parquet in vdir
    names = table._resolve(table.current_version())[0]
    assert all(n.startswith("d=") for n in names), names
    assert not list(table._version_dir(table.current_version()).glob("*.parquet"))
    # data files themselves omit the partition column (Delta-style)
    raw = spark.read.parquet(str(table.store / names[0]))
    assert "d" not in raw.columns


def test_partition_pruning_at_listing_time(spark, table):
    for day in (1, 2, 3, 4):
        df = _events(spark, day * 100, day * 100 + 50, day)
        if table.exists():
            table.append(df)
        else:
            table.overwrite(df, partition_by=["d"])
    all_files = table.data_files()
    pruned = table.pruned_files({"d": (dt.date(2024, 1, 2), dt.date(2024, 1, 2))})
    assert len(pruned) == 1 and len(all_files) == 4
    got = table.read_pruned({"d": (dt.date(2024, 1, 2), dt.date(2024, 1, 2))})
    assert sorted(r.id for r in got.collect()) == list(range(200, 250))
    # range predicates spanning partitions prune correctly too
    pruned2 = table.pruned_files({"d": (dt.date(2024, 1, 3), None)})
    assert len(pruned2) == 2


def test_append_applies_bound_partitioning_automatically(spark, table):
    table.overwrite(_events(spark, 0, 50, 1), partition_by=["d"])
    table.append(_events(spark, 50, 90, 2))
    m = table._manifest(table.current_version())
    assert m["partition_columns"] == ["d"]
    assert all(n.startswith("d=2024-01-02/") for n in m["added"])
    assert table.read().count() == 90
    # incremental consumers see the partition column reconstructed
    delta = table.appended_since(table.current_version() - 1)
    rows = delta.collect()
    assert sorted(r.id for r in rows) == list(range(50, 90))
    assert {r.d for r in rows} == {dt.date(2024, 1, 2)}


def test_conflicting_partitioning_refused(spark, table):
    table.overwrite(_events(spark, 0, 10, 1), partition_by=["d"])
    with pytest.raises(ConcurrentWriteError, match="partition_columns"):
        table.overwrite(_events(spark, 0, 10, 1), partition_by=["user"])
    # and a batch missing the partition column fails loudly
    with pytest.raises(ValueError, match="partition column"):
        table.overwrite(spark.range(3).select(F.col("id")), partition_by=["d"])


def test_merge_keyed_on_partitioned_table(spark, table):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.cdc import scd1_merge

    base = spark.createDataFrame(
        [(i, f"v{i}", 1, dt.date(2024, 1, 1 + i % 3)) for i in range(90)],
        "k long, val string, seq int, d date",
    ).repartition(2, "k")
    table.overwrite(base, partition_by=["d"])
    n_before = len(table.data_files())
    batch = spark.createDataFrame(
        [(7, "v7b", 2, dt.date(2024, 1, 2))], "k long, val string, seq int, d date"
    )
    table.merge_keyed(batch, ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"))
    m = table._manifest(table.current_version())
    assert len(m["removed"]) < n_before  # pruned, not a full rewrite
    got = {r.k: (r.val, r.d) for r in table.read().collect()}
    assert got[7] == ("v7b", dt.date(2024, 1, 2))
    assert got[8][0] == "v8" and len(got) == 90


def test_delta_log_carries_partition_metadata(spark, table):
    table.overwrite(_events(spark, 0, 60, 3), partition_by=["d", "user"])
    actions = deltalog.read_actions(table.dir, 0)
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    assert meta["partitionColumns"] == ["d", "user"]
    adds = deltalog.read_adds(table.dir, 0)
    assert adds
    for a in adds:
        assert a["partitionValues"]["d"] == "2024-01-03"
        assert a["partitionValues"]["user"].startswith("u")
        assert a["path"].startswith("_data/d=2024-01-03/user=")


def test_vacuum_gc_sweeps_empty_partition_dirs(spark, table):
    table.overwrite(_events(spark, 0, 30, 1), partition_by=["d"])
    table.overwrite(_events(spark, 0, 30, 2))  # replaces day-1 files
    table.vacuum(keep=1)
    dirs = {p.name for p in table.store.iterdir() if p.is_dir()}
    assert dirs == {"d=2024-01-02"}  # day-1 partition dir swept
    assert table.read().count() == 30


def test_clone_and_restore_preserve_partitioning(spark, tmp_path):
    cat = Catalog(spark, tmp_path / "wh")
    src = cat.table("src")
    src.overwrite(_events(spark, 0, 40, 1), partition_by=["d"])
    v0 = src.current_version()
    src.append(_events(spark, 40, 60, 2))
    dst = cat.table("dst")
    src.clone_to(dst)
    assert dst.partition_columns() == ["d"]
    assert dst.read().count() == 60
    dst.append(_events(spark, 60, 70, 3))  # bound partitioning applies
    assert {str(r.d) for r in dst.read().select("d").distinct().collect()} == {
        "2024-01-01", "2024-01-02", "2024-01-03"
    }
    src.restore(v0)
    assert src.read().count() == 40
    assert len(src.pruned_files({"d": (dt.date(2024, 1, 2), None)})) == 0


def test_null_partition_values_roundtrip(spark, table):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, grp string"
    )
    table.overwrite(df, partition_by=["grp"])
    got = {(r.id, r.grp) for r in table.read().collect()}
    assert got == {(1, "a"), (2, None), (3, "b")}
    # the null-partition file is never pruned away by a range predicate
    # machinery error (it simply has no stats entry for grp)
    assert table.read_pruned({"id": (2, 2)}).first().grp is None
    # delta log encodes the null partition as JSON null
    adds = deltalog.read_adds(table.dir, 0)
    vals = {a["partitionValues"]["grp"] for a in adds}
    assert None in vals and "a" in vals


def test_partition_column_mid_schema_keeps_committed_order(spark, table):
    """Review-caught bug class: Spark relocates path-derived partition
    columns to the END of a frame even under an explicit schema, so a
    partition column that is NOT schema-last used to misalign every
    positional consumer (tuple compares, unionAll/exceptAll in the
    change feed, CDF diffs). Every read path must restore the
    committed column order."""
    df = spark.createDataFrame(
        [(i, dt.date(2024, 1, 1 + i % 3), f"v{i}", float(i)) for i in range(60)],
        "k long, d date, val string, amount double",  # d is column 2 of 4
    )
    table.overwrite(df.repartition(2, "k"), partition_by=["d"], enable_cdf=True)
    v0 = table.current_version()
    assert table.read().columns == ["k", "d", "val", "amount"]
    assert sorted(tuple(r) for r in table.read().collect()) == sorted(
        tuple(r) for r in df.collect()
    )
    assert table.read_pruned(
        {"d": (dt.date(2024, 1, 2), dt.date(2024, 1, 2))}
    ).columns == ["k", "d", "val", "amount"]
    # append + incremental consumers
    extra = spark.createDataFrame(
        [(100, dt.date(2024, 2, 1), "new", 1.5)],
        "k long, d date, val string, amount double",
    )
    table.append(extra)
    delta = table.appended_since(v0)
    assert delta.columns == ["k", "d", "val", "amount"]
    assert [tuple(r) for r in delta.collect()] == [
        (100, dt.date(2024, 2, 1), "new", 1.5)
    ]
    # merge + change feed + CDF diff (exceptAll is positional)
    v1 = table.current_version()
    batch = spark.createDataFrame(
        [(7, dt.date(2024, 1, 2), "upd", -1.0)],
        "k long, d date, val string, amount double",
    )
    table.merge_keyed(
        batch, ["k"],
        lambda cur, b: cur.join(b.select("k"), "k", "left_anti").unionByName(b),
    )
    feed = table.changes_since(v1, keys=["k"])
    got = {(r["_change_type"], r.k, r.val, str(r.d)) for r in feed.collect()}
    assert ("update_post", 7, "upd", "2024-01-02") in got
    assert any(t == "update_pre" and k == 7 and v == "v7" for t, k, v, _ in got)
    # the materialized CDF files carry the right values too
    m = table._manifest(table.current_version())
    cdc = spark.read.parquet(
        *[str(table.dir / "_change_data" / n) for n in m["cdc"]]
    )
    pre = cdc.filter("_change_type = 'update_preimage'").collect()
    assert [(r.k, r.val) for r in pre] == [(7, "v7")]
