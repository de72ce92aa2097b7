"""ManagedTable.changes_since — Delta-CDF-style row-level change feed.

Spans append AND merge commits (diffing only the files the merge
touched); with keys, delete+insert of the same key pairs into
update_pre/update_post. Non-derivable ranges (snapshot rewrite /
compaction) return None, mirroring appended_since's contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.cdc import scd1_merge
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog


@pytest.fixture()
def table(spark, tmp_path):
    t = Catalog(spark, tmp_path / "wh").table("t")
    base = spark.range(100).select(
        F.col("id").alias("k"), F.lit("old").alias("val"), F.lit(1).alias("seq")
    )
    t.overwrite(base.repartition(4, "k"))
    return t


def _feed(table, v, keys=None):
    df = table.changes_since(v, keys=keys)
    return {(r.k, r.val, r._change_type) for r in df.collect()}


def test_appends_are_inserts(spark, table):
    v0 = table.current_version()
    table.append(spark.createDataFrame([(200, "new", 2)], "k long, val string, seq int"))
    table.append(spark.createDataFrame([(201, "new2", 2)], "k long, val string, seq int"))
    assert _feed(table, v0) == {(200, "new", "insert"), (201, "new2", "insert")}


def test_merge_diffs_only_touched_files(spark, table):
    v0 = table.current_version()
    batch = spark.createDataFrame(
        [(3, "changed", 2), (500, "inserted", 2)], "k long, val string, seq int"
    )
    table.merge_keyed(batch, ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"))

    # without keys: raw insert/delete multiset
    got = _feed(table, v0)
    assert (3, "old", "delete") in got
    assert (3, "changed", "insert") in got
    assert (500, "inserted", "insert") in got
    # rows co-located in touched files but unchanged do NOT appear
    assert not any(k not in (3, 500) for k, _, _ in got)

    # with keys: the k=3 pair becomes an update
    keyed = _feed(table, v0, keys=["k"])
    assert (3, "old", "update_pre") in keyed
    assert (3, "changed", "update_post") in keyed
    assert (500, "inserted", "insert") in keyed
    assert len(keyed) == 3


def test_feed_spans_append_then_merge(spark, table):
    v0 = table.current_version()
    table.append(spark.createDataFrame([(300, "apnd", 2)], "k long, val string, seq int"))
    batch = spark.createDataFrame([(7, "upd7", 3)], "k long, val string, seq int")
    table.merge_keyed(batch, ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"))
    keyed = _feed(table, v0, keys=["k"])
    assert keyed == {
        (300, "apnd", "insert"),
        (7, "old", "update_pre"),
        (7, "upd7", "update_post"),
    }


def test_snapshot_rewrite_not_derivable(spark, table):
    v0 = table.current_version()
    table.overwrite(
        spark.createDataFrame([(1, "x", 9)], "k long, val string, seq int")
    )
    assert table.changes_since(v0) is None
    assert table.changes_since(None) is None


def test_compaction_is_transparent_to_the_feed(spark, table):
    """r11 (verdict r10 #2): compact() is content-identical and
    dataChange=false — it must contribute ZERO row-level changes and
    must NOT break the feed (or appended_since) for the commits around
    it. Routine OPTIMIZE maintenance can't force consumers into full
    re-reads."""
    v0 = table.current_version()
    table.append(spark.createDataFrame([(200, "new", 2)], "k long, val string, seq int"))
    table.compact()
    table.append(spark.createDataFrame([(201, "new2", 2)], "k long, val string, seq int"))
    # change feed spans the compaction, carrying only the real changes
    assert _feed(table, v0) == {(200, "new", "insert"), (201, "new2", "insert")}
    # append chain too
    delta = table.appended_since(v0)
    assert delta is not None
    assert {(r.k, r.val) for r in delta.collect()} == {(200, "new"), (201, "new2")}
    # compaction-only range: empty (not None) delta for both feeds
    v_pre = table.current_version()
    table.compact(target_partitions=2)
    assert table.appended_since(v_pre).count() == 0
    assert table.changes_since(v_pre).count() == 0
    # ... and a merge after the compaction still flows as changes
    batch = spark.createDataFrame([(0, "upd", 3)], "k long, val string, seq int")
    table.merge_keyed(batch, ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"))
    assert _feed(table, v_pre, keys=["k"]) == {
        (0, "old", "update_pre"), (0, "upd", "update_post")
    }


def test_cursor_at_head_is_empty_feed(spark, table):
    v = table.current_version()
    df = table.changes_since(v)
    assert df.count() == 0
    assert "_change_type" in df.columns


def test_stale_sequence_merge_emits_no_changes(spark, table):
    """A merge whose batch loses to the current row (stale seq) rewrites
    the touched file with identical content → empty diff."""
    v0 = table.current_version()
    stale = spark.createDataFrame([(3, "stale", 0)], "k long, val string, seq int")
    table.merge_keyed(stale, ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"))
    assert _feed(table, v0) == set()
