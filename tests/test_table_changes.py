"""table_changes() — Databricks' CDF SQL table-valued function over
the ManagedTable change feed (sources/tables.py table_changes +
Catalog._rewrite_table_changes).

Contract under test (Databricks CDF semantics):
- INCLUSIVE Delta-log version range; end defaults to latest.
- Output = table columns + _change_type / _commit_version /
  _commit_timestamp; change types are Databricks' own
  ('insert' / 'delete' / 'update_preimage' / 'update_postimage').
- Timestamp boundaries: start -> first commit at-or-after, end ->
  last commit at-or-before.
- Version 0 serves the creation snapshot as inserts; CDF-materialized
  merges serve exact pre/post images; DV deletes serve exact delete
  rows; a mid-range overwrite/restore raises.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog


def _rows(spark, lo, hi, mult=10.0):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), (F.col("id") * mult).alias("bal")
    )


@pytest.fixture()
def cdf_table(spark, tmp_path):
    """A CDF table with 4 commits: v0 create (10 rows), v1 append
    (3 rows), v2 merge-update (keys 0-2, bal += 5), v3 delete (k=12)."""
    cat = Catalog(spark, tmp_path / "wh")
    t = cat.table("acct")
    t.overwrite(_rows(spark, 0, 10), enable_cdf=True)
    t.append(_rows(spark, 10, 13))
    batch = _rows(spark, 0, 3).withColumn("bal", F.col("bal") + 5)
    t.merge_keyed(
        batch, ["k"],
        lambda cur, b: cur.join(
            b.select("k"), "k", "left_anti"
        ).unionByName(b),
    )
    t.delete_where("k = 12")
    return cat, t


def _counts(df):
    return {
        (r["_commit_version"], r["_change_type"]): r["n"]
        for r in df.groupBy("_commit_version", "_change_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_full_history_change_types_and_counts(cdf_table):
    _, t = cdf_table
    got = _counts(t.table_changes(0))
    assert got == {
        (0, "insert"): 10,
        (1, "insert"): 3,
        (2, "update_preimage"): 3,
        (2, "update_postimage"): 3,
        (3, "delete"): 1,
    }


def test_inclusive_version_range_and_default_end(cdf_table):
    _, t = cdf_table
    assert set(_counts(t.table_changes(1, 2))) == {
        (1, "insert"), (2, "update_preimage"), (2, "update_postimage"),
    }
    # end defaults to latest
    assert (3, "delete") in _counts(t.table_changes(3))
    # single-commit range
    assert _counts(t.table_changes(3, 3)) == {(3, "delete"): 1}


def test_update_images_carry_exact_rows(cdf_table):
    _, t = cdf_table
    ch = t.table_changes(2, 2)
    pre = {(r["k"], r["bal"]) for r in ch.filter(
        "_change_type = 'update_preimage'").collect()}
    post = {(r["k"], r["bal"]) for r in ch.filter(
        "_change_type = 'update_postimage'").collect()}
    assert pre == {(0, 0.0), (1, 10.0), (2, 20.0)}
    assert post == {(0, 5.0), (1, 15.0), (2, 25.0)}


def test_delete_row_content_from_dv_commit(cdf_table):
    _, t = cdf_table
    dels = t.table_changes(3, 3).collect()
    assert [(r["k"], r["bal"], r["_change_type"]) for r in dels] == [
        (12, 120.0, "delete")
    ]


def test_commit_timestamps_monotone(cdf_table):
    _, t = cdf_table
    ts = [
        r["_commit_timestamp"]
        for r in t.table_changes(0)
        .select("_commit_version", "_commit_timestamp")
        .distinct()
        .orderBy("_commit_version")
        .collect()
    ]
    assert ts == sorted(ts) and len(ts) == 4


def test_timestamp_boundaries(cdf_table):
    _, t = cdf_table
    idx = t._delta_commit_index()
    # start = exact ts of commit 1 -> first at-or-after is commit 1
    import datetime as dt

    start = dt.datetime.fromtimestamp(idx[1][3] / 1000)
    vs = {
        r["_commit_version"]
        for r in t.table_changes(start).select("_commit_version").collect()
    }
    assert vs == {1, 2, 3}
    # end = 1ms before commit 3 -> last at-or-before is commit 2
    end = dt.datetime.fromtimestamp((idx[3][3] - 1) / 1000)
    vs = {
        r["_commit_version"]
        for r in t.table_changes(0, end).select("_commit_version").collect()
    }
    assert vs == {0, 1, 2}


def test_sql_rewrite_routes_and_nests(cdf_table):
    cat, _ = cdf_table
    out = cat.sql(
        "SELECT _change_type AS ct, count(*) AS n FROM ("
        "  SELECT * FROM table_changes('acct', 1, 2)"
        ") GROUP BY 1 ORDER BY 1"
    ).collect()
    assert [(r["ct"], r["n"]) for r in out] == [
        ("insert", 3), ("update_postimage", 3), ("update_preimage", 3),
    ]
    # quoted-timestamp boundary through SQL
    n = cat.sql(
        "SELECT count(*) AS n FROM table_changes('acct', 3, 3)"
    ).collect()[0]["n"]
    assert n == 1


def test_sql_rewrite_never_fires_inside_string_literals(cdf_table):
    cat, _ = cdf_table
    row = cat.sql(
        "SELECT 'table_changes(''acct'', 0)' AS s"
    ).collect()[0]
    assert row["s"] == "table_changes('acct', 0)"


def test_errors_bad_start_empty_range_bad_boundary(cdf_table):
    cat, t = cdf_table
    with pytest.raises(ValueError, match="past the latest commit"):
        t.table_changes(99)
    with pytest.raises(ValueError, match="empty range"):
        t.table_changes(3, 1)
    with pytest.raises(ValueError, match="neither a version"):
        cat.sql("SELECT * FROM table_changes('acct', 1.5)")


def test_overwrite_mid_range_raises_but_later_start_works(spark, tmp_path):
    cat = Catalog(spark, tmp_path / "wh")
    t = cat.table("plain")
    t.overwrite(_rows(spark, 0, 5))
    t.overwrite(_rows(spark, 0, 5).withColumn("bal", F.col("bal") + 1))
    t.append(_rows(spark, 5, 7))
    with pytest.raises(ValueError, match="not derivable"):
        t.table_changes(0)
    # starting AFTER the snapshot replace works (append derives exactly)
    assert _counts(t.table_changes(2)) == {(2, "insert"): 2}


def test_non_cdf_merge_derives_delete_plus_insert(spark, tmp_path):
    cat = Catalog(spark, tmp_path / "wh")
    t = cat.table("nocdf")
    t.overwrite(_rows(spark, 0, 8).repartition(4, "k"))
    batch = _rows(spark, 0, 2).withColumn("bal", F.col("bal") + 5)
    t.merge_keyed(
        batch, ["k"],
        lambda cur, b: cur.join(
            b.select("k"), "k", "left_anti"
        ).unionByName(b),
    )
    got = _counts(t.table_changes(1, 1))
    assert got == {(1, "insert"): 2, (1, "delete"): 2}
