"""Deletion vectors (r12): the small-delete path.

A DELETE matching a tiny fraction of a file must cost O(matched rows),
not O(file): the matched rows land as tombstone parquet under
``_deletion_vectors/`` (full rows + the file's basename), the manifest
maps file → [(dv, rows)], and EVERY reader subtracts a file's
tombstones from its rows — multiset-exact, scoped per file. Mirrors
Delta's deletionVectors feature (theirs: roaring bitmaps over row
indexes; same read semantics).

Acceptance (r11 verdict #6): mixed DV+rewrite history survives the
independent protocol reader AND vacuum; merges/compaction/clone/restore
never resurrect tombstoned rows; the change feed stays exact.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.sources import deltalog, deltareader
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog


@pytest.fixture()
def table(spark, tmp_path):
    return Catalog(spark, tmp_path / "wh").table("t")


def _seed(spark, table, n=1000, files=4, cdf=False):
    base = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("g"),
        F.lit("old").alias("val"),
    )
    table.overwrite(
        base.repartitionByRange(files, "k").sortWithinPartitions("k"),
        enable_cdf=cdf,
    )
    return table.current_version()


def _inodes(table):
    return {f.name: os.stat(f).st_ino for f in table.data_files()}


def test_small_delete_takes_dv_path_without_rewrite(spark, table):
    _seed(spark, table)
    before = _inodes(table)
    v = table.delete_where("k >= 10 AND k <= 12")
    m = table._manifest(v)
    assert m.get("dv_added") and not m["added"] and not m["removed"]
    ((entries),) = m["dv_added"].values()
    assert entries[0][1] == 3  # tombstoned row count in the manifest
    assert _inodes(table) == before  # zero data files rewritten
    assert table.read().count() == 997
    assert table.read().filter("k = 11").count() == 0
    # delta log: remove+add of the SAME path, add carrying the dv list
    dv = table._pointer_state()["delta"]["version"]
    acts = list(deltalog.read_actions(table.dir, dv))
    adds = [a["add"] for a in acts if "add" in a]
    rems = [a["remove"] for a in acts if "remove" in a]
    assert len(adds) == 1 and len(rems) == 1
    assert adds[0]["path"] == rems[0]["path"] and adds[0]["dv"]


def test_large_delete_still_rewrites(spark, table):
    _seed(spark, table)
    v = table.delete_where("k >= 500 AND k < 750")  # whole file
    m = table._manifest(v)
    assert m["removed"] and not m.get("dv_added")
    assert table.read().count() == 750


def test_mixed_dv_and_rewrite_in_one_delete(spark, table):
    """One DELETE can tombstone one file and rewrite another: a range
    grazing a file boundary matches few rows in one file, many in the
    next."""
    _seed(spark, table)
    # [240, 500): 10 rows of file [0,250), all of [250,500)
    v = table.delete_where("k >= 240 AND k < 500")
    m = table._manifest(v)
    assert m.get("dv_added") and m["removed"]
    assert table.read().count() == 740
    assert table.read().filter("k >= 240 AND k < 500").count() == 0


def test_stacked_dvs_and_rereads_are_exact(spark, table):
    _seed(spark, table)
    table.delete_where("k = 10")
    table.delete_where("k = 11")  # second DV on the same file
    assert table.read().count() == 998
    # a previously tombstoned row must not re-match (no double tombstone)
    assert table.delete_where("k >= 10 AND k <= 11") is None


def test_merge_on_dvd_file_does_not_resurrect(spark, table):
    _seed(spark, table)
    table.delete_where("k = 10")
    table.merge_keyed(
        spark.createDataFrame([(12, 0, "new")], "k long, g long, val string"),
        ["k"],
        lambda cur, b: cur.join(b.select("k"), "k", "left_anti").unionByName(b),
    )
    assert table.read().filter("k = 10").count() == 0
    assert table.read().filter("k = 12").first().val == "new"
    assert table.read().count() == 999
    # the rewrite folded the DV away
    assert table._resolve_dv(table.current_version()) == {}


def test_change_feed_exact_across_dv_deletes(spark, table):
    v0 = _seed(spark, table)
    table.delete_where("k >= 10 AND k <= 12")
    feed = table.changes_since(v0)
    assert sorted((r.k, r._change_type) for r in feed.collect()) == [
        (10, "delete"), (11, "delete"), (12, "delete"),
    ]
    # and across a later merge touching the same file (old side folds
    # the PRIOR dv: tombstoned rows never re-surface as phantom deletes)
    v1 = table.current_version()
    table.merge_keyed(
        spark.createDataFrame([(13, 6, "new")], "k long, g long, val string"),
        ["k"],
        lambda cur, b: cur.join(b.select("k"), "k", "left_anti").unionByName(b),
    )
    feed2 = table.changes_since(v1, keys=["k"])
    got = sorted((r.k, r._change_type) for r in feed2.collect())
    assert got == [(13, "update_post"), (13, "update_pre")]


def test_protocol_reader_and_vacuum_survive_mixed_history(spark, table):
    """The r11-verdict acceptance: DV + rewrite + checkpoint + vacuum,
    replayed by the INDEPENDENT public-protocol reader."""
    _seed(spark, table, cdf=True)
    table.delete_where("k >= 10 AND k <= 12")          # DV
    table.delete_where("k >= 500 AND k < 750")         # rewrite
    table.delete_where("k = 900")                      # DV on another file
    want = sorted(r.k for r in table.read().collect())
    got = sorted(r.k for r in deltareader.read_delta(spark, table.dir).collect())
    assert got == want
    table.write_delta_checkpoint()
    table.vacuum(keep=2)
    got2 = sorted(r.k for r in deltareader.read_delta(spark, table.dir).collect())
    assert got2 == want
    assert sorted(r.k for r in table.read().collect()) == want


def test_compact_small_purges_heavy_dvs(spark, table):
    _seed(spark, table, n=100, files=1)
    table.delete_where("k < 10")  # 10% of the file: DV at the threshold
    assert table._resolve_dv(table.current_version())
    # max_file_bytes=1: the file is NOT small — it joins the rewrite
    # set purely as a DV-purge candidate (the Delta OPTIMIZE rule)
    v = table.compact_small(max_file_bytes=1)
    assert v is not None
    assert table._resolve_dv(table.current_version()) == {}
    assert table.read().count() == 90
    # dataChange=false: transparent to incremental consumers
    assert table._op(v) == "compact"


def test_restore_pins_the_targets_dv_state(spark, table):
    _seed(spark, table)
    v1 = table.delete_where("k = 10")
    table.delete_where("k = 11")
    table.restore(v1)  # back to: 10 deleted, 11 alive
    assert table.read().filter("k = 10").count() == 0
    assert table.read().filter("k = 11").count() == 1
    assert table.read().count() == 999
    # the protocol reader agrees (the restore commit re-adds the path
    # with the TARGET's dv list)
    got = sorted(r.k for r in deltareader.read_delta(spark, table.dir).collect())
    assert got == sorted(r.k for r in table.read().collect())


def test_clone_folds_dvs_into_the_copy(spark, table, tmp_path):
    _seed(spark, table)
    table.delete_where("k = 10")
    target = Catalog(spark, tmp_path / "wh2").table("c")
    table.clone_to(target)
    assert target.read().filter("k = 10").count() == 0
    assert target.read().count() == 999
    assert target._resolve_dv(target.current_version()) == {}
    # clone is independent: vacuuming the source's dv files can't hurt it
    table.delete_where("k = 11")
    table.compact_small(max_file_bytes=1 << 20, min_small_files=2)
    table.vacuum(keep=1)
    assert target.read().count() == 999


def test_vacuum_gcs_unreferenced_dv_files(spark, table):
    _seed(spark, table)
    table.delete_where("k = 10")
    dvdir = table._dv_dir()
    assert len(list(dvdir.glob("dv-*.parquet"))) == 1
    # rewrite the file (merge) -> dv unreferenced by the NEW version,
    # still referenced by retained history until vacuum drops it
    table.merge_keyed(
        spark.createDataFrame([(12, 0, "x")], "k long, g long, val string"),
        ["k"],
        lambda cur, b: cur.join(b.select("k"), "k", "left_anti").unionByName(b),
    )
    table.vacuum(keep=1)
    assert len(list(dvdir.glob("dv-*.parquet"))) == 0
    assert table.read().filter("k = 10").count() == 0


def test_time_travel_sees_pre_and_post_dv_states(spark, table):
    v0 = _seed(spark, table)
    v1 = table.delete_where("k = 10")
    assert table.read_at(v0).count() == 1000
    assert table.read_at(v1).count() == 999
