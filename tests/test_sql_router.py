"""Catalog.sql routing: the Delta SQL surface Spark's parser rejects
on temp views — DELETE/UPDATE (incl. no-WHERE full-table forms), MERGE
INTO mapped onto ``merge_keyed``, time-travel references rewritten onto
snapshots, and PRECISE errors for unroutable shapes (qualified names,
unsupported clauses) instead of spark.sql parser noise.

Reference surface: ad-hoc SQL (sample_exploration.py:11-13) + the gold
merge semantics (DimUser.py:20-29) expressed as Databricks SQL.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import (
    Catalog,
    ManagedTable,
)


@pytest.fixture()
def cat(spark, tmp_path):
    return Catalog(spark, tmp_path / "wh")


def _mk(cat, spark, rows="(1, 'a'), (2, 'b')"):
    t = cat.table("t")
    t.overwrite(cat.spark.sql(f"SELECT * FROM VALUES {rows} AS v(k, val)"))
    return t


# -- DELETE / UPDATE shapes ------------------------------------------------


def test_delete_without_where_clears_table(cat, spark):
    t = _mk(cat, spark)
    cat.sql("DELETE FROM t")
    assert t.read().count() == 0


def test_update_without_where_hits_all_rows(cat, spark):
    t = _mk(cat, spark)
    cat.sql("UPDATE t SET val = 'z'")
    assert {r.val for r in t.read().collect()} == {"z"}


def test_qualified_table_name_raises_precisely(cat, spark):
    _mk(cat, spark)
    with pytest.raises(ValueError, match="qualified or backquoted"):
        cat.sql("DELETE FROM main.t WHERE k = 1")
    with pytest.raises(ValueError, match="qualified or backquoted"):
        cat.sql("UPDATE `t` SET val = 'x' WHERE k = 1")


def test_unsupported_delete_tail_raises(cat, spark):
    _mk(cat, spark)
    with pytest.raises(ValueError, match="unsupported DELETE"):
        cat.sql("DELETE FROM t USING s WHERE t.k = s.k")


def test_missing_table_raises(cat, spark):
    with pytest.raises(ValueError, match="no such table"):
        cat.sql("DELETE FROM nope WHERE k = 1")


# -- MERGE INTO --------------------------------------------------------------


def test_merge_upsert_roundtrip(cat, spark):
    t = _mk(cat, spark)
    src = cat.table("s")
    src.overwrite(spark.sql(
        "SELECT * FROM VALUES (2, 'b2'), (3, 'c') AS v(k, val)"
    ))
    v = cat.sql(
        "MERGE INTO t USING s ON t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    assert v == t.current_version()
    got = {(r.k, r.val) for r in t.read().collect()}
    assert got == {(1, "a"), (2, "b2"), (3, "c")}


def test_merge_cdc_with_delete_clause(cat, spark):
    """The Databricks CDC idiom: op='D' rows delete, others upsert —
    the delete condition references the SOURCE alias, and the source's
    extra op column never leaks into the target (SET */INSERT * project
    the TARGET schema)."""
    t = _mk(cat, spark)
    spark.sql(
        "SELECT * FROM VALUES (1, 'a9', 'D'), (2, 'b2', 'U'), (9, 'i', 'I') "
        "AS v(k, val, op)"
    ).createOrReplaceTempView("cdc_feed")
    cat.sql(
        "MERGE INTO t USING (SELECT * FROM cdc_feed) s ON t.k = s.k "
        "WHEN MATCHED AND s.op = 'D' THEN DELETE "
        "WHEN MATCHED THEN UPDATE SET * "
        "WHEN NOT MATCHED THEN INSERT *"
    )
    got = {(r.k, r.val) for r in t.read().collect()}
    assert got == {(2, "b2"), (9, "i")}
    assert t.read().columns == ["k", "val"]


def test_merge_unconditional_delete_only(cat, spark):
    t = _mk(cat, spark)
    cat.table("s").overwrite(spark.sql(
        "SELECT * FROM VALUES (1, 'x'), (7, 'y') AS v(k, val)"
    ))
    cat.sql(
        "MERGE INTO t USING s ON t.k = s.k WHEN MATCHED THEN DELETE"
    )
    got = {(r.k, r.val) for r in t.read().collect()}
    assert got == {(2, "b")}  # key 7 unmatched: no effect


def test_merge_file_pruning_carries_untouched_files(cat, spark):
    """The SQL route must inherit merge_keyed's physical shape: a
    1-key merge against a clustered table rewrites one file, the rest
    carry by reference (same inode)."""
    import os

    t = cat.table("big")
    base = spark.range(400).select(
        F.col("id").alias("k"), F.lit("old").alias("val")
    )
    t.overwrite(base.repartitionByRange(8, "k").sortWithinPartitions("k"))
    before = {f.name: os.stat(f).st_ino for f in t.data_files()}
    cat.table("delta_src").overwrite(spark.sql(
        "SELECT * FROM VALUES (3, 'new') AS v(k, val)"
    ))
    cat.sql(
        "MERGE INTO big USING delta_src ON big.k = delta_src.k "
        "WHEN MATCHED THEN UPDATE SET *"
    )
    after = {f.name: os.stat(f).st_ino for f in t.data_files()}
    carried = {n for n in before if n in after and before[n] == after[n]}
    assert len(carried) >= 7
    assert t.read().filter("k = 3").first().val == "new"
    assert t.read().count() == 400


def test_merge_bad_shapes_raise_precisely(cat, spark):
    _mk(cat, spark)
    cat.table("s").overwrite(spark.sql("SELECT 1 AS k, 'x' AS val"))
    with pytest.raises(ValueError, match="unsupported MERGE clause"):
        cat.sql(
            "MERGE INTO t USING s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET val = s.val"
        )
    with pytest.raises(ValueError, match="SAME name"):
        cat.sql(
            "MERGE INTO t USING s ON t.k = s.kk "
            "WHEN MATCHED THEN UPDATE SET *"
        )
    with pytest.raises(ValueError, match="column equalities"):
        cat.sql(
            "MERGE INTO t USING s ON t.k < s.k "
            "WHEN MATCHED THEN UPDATE SET *"
        )


# -- time travel in SELECT routing -------------------------------------------


def test_select_version_as_of(cat, spark):
    t = _mk(cat, spark)
    cat.sql("DELETE FROM t WHERE k = 1")
    assert cat.sql("SELECT count(*) AS n FROM t").first().n == 1
    assert cat.sql(
        "SELECT count(*) AS n FROM t VERSION AS OF 0"
    ).first().n == 2
    # inside a subquery too
    assert cat.sql(
        "SELECT (SELECT count(*) FROM t VERSION AS OF 0) AS n"
    ).first().n == 2


def test_select_timestamp_as_of(cat, spark):
    t = _mk(cat, spark)
    cat.sql("DELETE FROM t WHERE k = 1")
    stamps = sorted(r.timestamp for r in t.history().collect())
    # a literal instant after the last commit resolves to the head
    import datetime as dt

    iso = dt.datetime.fromtimestamp(stamps[-1] / 1000 + 1).isoformat()
    assert cat.sql(
        f"SELECT count(*) AS n FROM t TIMESTAMP AS OF '{iso}'"
    ).first().n == 1


def test_time_travel_never_rewrites_inside_literals(cat, spark):
    t = _mk(cat, spark)
    df = cat.sql("SELECT 't VERSION AS OF 0' AS s FROM t LIMIT 1")
    assert df.first().s == "t VERSION AS OF 0"


# -- scanner hardening (the r11 ADVICE medium) --------------------------------


def test_dml_bounds_bails_on_escape_syntax():
    """Backslash escapes / double-quoted literals aren't modeled by the
    bounds scanner — their presence must bail to {} (no pruning: always
    a superset), never derive bounds from literal content."""
    f = ManagedTable._dml_bounds
    assert f("c = 'a\\' AND x = 5 AND y = \\'b'") == {}
    assert f('c = "a AND x = 5 AND z"') == {}
    # the plain forms still derive bounds
    assert f("x = 5 AND y <= 3") == {"x": (5, 5), "y": (None, 3)}
    assert f("c = 'it''s fine' AND x > 2") == {
        "c": ("it's fine", "it's fine"), "x": (2, None),
    }


def test_split_assignments_handles_escaped_quotes():
    got = Catalog._split_assignments(
        "a = 'x\\'s, b', c = concat('p,q', d)"
    )
    assert got == {"a": "'x\\'s, b'", "c": "concat('p,q', d)"}


def test_split_on_where_sees_through_double_quotes():
    got = Catalog._split_on_where('a = "use where, ok" WHERE k = 1')
    assert got == ('a = "use where, ok"', "k = 1")


# -- utility verbs (r12): DESCRIBE / OPTIMIZE / VACUUM / RESTORE --------------


def test_describe_history_and_detail(cat, spark):
    t = _mk(cat, spark)
    cat.sql("DELETE FROM t WHERE k = 1")
    hist = cat.sql("DESCRIBE HISTORY t")
    ops = [r.operation for r in hist.collect()]
    assert "DELETE" in ops and len(ops) == 2
    detail = {r.info_name: r.info_value for r in cat.sql("DESCRIBE DETAIL t").collect()}
    assert detail["name"] == "t" and detail["num_files"] is not None


def test_optimize_and_vacuum_route(cat, spark):
    t = _mk(cat, spark)
    for i in range(8):
        t.append(spark.sql(f"SELECT {10 + i} AS k, 'x' AS val").coalesce(1))
    n_before = len(t.data_files())
    v = cat.sql("OPTIMIZE t")
    assert v is not None and len(t.data_files()) < n_before
    cat.sql("VACUUM t RETAIN 2 VERSIONS")
    assert t._pointer_state().get("committed_floor", 0) > 0
    assert t.read().count() == 10
    # ZORDER form routes to the clustering compact
    t2 = cat.table("z")
    t2.overwrite(spark.range(100).selectExpr("id AS a", "id % 7 AS b"))
    cat.sql("OPTIMIZE z ZORDER BY (a, b)")
    assert t2.read().count() == 100


def test_restore_to_version_as_of(cat, spark):
    t = _mk(cat, spark)
    cat.sql("DELETE FROM t WHERE k = 1")
    assert t.read().count() == 1
    cat.sql("RESTORE TABLE t TO VERSION AS OF 0")
    assert t.read().count() == 2
    # bad shapes raise precisely
    import pytest as _pytest
    with _pytest.raises(ValueError, match="unsupported OPTIMIZE|unsupported"):
        cat.sql("OPTIMIZE t WHERE k = 1")
    with _pytest.raises(ValueError, match="no readable delta commit"):
        cat.sql("RESTORE TABLE t TO VERSION AS OF 99")


def test_merge_duplicate_source_keys_raise(cat, spark):
    _mk(cat, spark)
    spark.sql(
        "SELECT * FROM VALUES (1, 'x'), (1, 'y') AS v(k, val)"
    ).createOrReplaceTempView("dup_src")
    with pytest.raises(ValueError, match="multiple rows per key"):
        cat.sql(
            "MERGE INTO t USING (SELECT * FROM dup_src) s ON t.k = s.k "
            "WHEN MATCHED THEN UPDATE SET *"
        )


# -- INSERT routing (completes the DML verb set) ------------------------------


def test_insert_into_appends_and_overwrite_replaces(cat, spark):
    t = _mk(cat, spark)
    v = cat.sql("INSERT INTO t VALUES (3, 'c'), (4, 'd')")
    assert v == t.current_version()
    assert t.read().count() == 4
    # positional column mapping (SQL INSERT semantics)
    cat.sql("INSERT INTO t SELECT 5, 'e'")
    assert {(r.k, r.val) for r in t.read().filter("k = 5").collect()} == {(5, "e")}
    cat.sql("INSERT OVERWRITE t SELECT k, val FROM t WHERE k <= 2")
    assert t.read().count() == 2


def test_insert_into_creates_missing_table(cat, spark):
    cat.sql("INSERT INTO fresh SELECT 1 AS a, 'x' AS b")
    assert cat.table("fresh").read().count() == 1


def test_insert_column_count_mismatch_raises(cat, spark):
    _mk(cat, spark)
    with pytest.raises(ValueError, match="column"):
        cat.sql("INSERT INTO t SELECT 1")
    with pytest.raises(ValueError, match="unsupported INSERT"):
        cat.sql("INSERT INTO t")


def test_insert_select_supports_time_travel(cat, spark):
    t = _mk(cat, spark)
    cat.sql("DELETE FROM t WHERE k = 1")
    cat.sql("INSERT INTO t SELECT k, val FROM t VERSION AS OF 0 WHERE k = 1")
    assert t.read().count() == 2


# -- DDL routing (r13: CREATE / ALTER / DROP onto ManagedTables) --------------


def test_create_table_with_schema_partitioning_and_cdf(cat, spark):
    cat.sql(
        "CREATE TABLE users (user_id BIGINT, country STRING, bal DOUBLE) "
        "PARTITIONED BY (country) "
        "TBLPROPERTIES ('delta.enableChangeDataFeed'='true')"
    )
    t = cat.table("users")
    assert t.exists()
    assert [f.name for f in t.table_schema().fields] == [
        "user_id", "country", "bal",
    ]
    assert t.partition_columns() == ["country"]
    assert t.cdf_enabled()
    assert t.read().count() == 0
    # IF NOT EXISTS: no-op; bare duplicate: precise error
    assert cat.sql("CREATE TABLE IF NOT EXISTS users (x INT)") is None
    with pytest.raises(ValueError, match="already exists"):
        cat.sql("CREATE TABLE users (x INT)")


def test_ctas_insert_alter_select_roundtrip(cat, spark):
    _mk(cat, spark)
    cat.sql("CREATE TABLE t2 AS SELECT k, val FROM t WHERE k = 1")
    assert cat.sql("SELECT * FROM t2").count() == 1
    cat.sql("INSERT INTO t2 VALUES (9, 'z')")
    cat.sql("ALTER TABLE t2 ADD COLUMNS (score INT, note STRING)")
    sch = cat.table("t2").table_schema()
    assert [f.name for f in sch.fields] == ["k", "val", "score", "note"]
    # old rows read as NULL in the evolved columns; no file rewritten
    got = {r.k: (r.score, r.note) for r in cat.sql("SELECT * FROM t2").collect()}
    assert got == {1: (None, None), 9: (None, None)}
    cat.sql("UPDATE t2 SET score = k * 10")
    got = {r.k: r.score for r in cat.table("t2").read().collect()}
    assert got == {1: 10, 9: 90}


def test_alter_add_column_rejects_duplicates_and_exotic_shapes(cat, spark):
    _mk(cat, spark)
    with pytest.raises(ValueError, match="already exist"):
        cat.sql("ALTER TABLE t ADD COLUMN (val STRING)")
    with pytest.raises(ValueError, match="unsupported ALTER TABLE action"):
        cat.sql("ALTER TABLE t RENAME TO t9")
    with pytest.raises(ValueError, match="unsupported ALTER TABLE action"):
        cat.sql("ALTER TABLE t ALTER COLUMN val TYPE INT")


def test_alter_constraint_verbs_route(cat, spark):
    _mk(cat, spark)
    cat.sql("ALTER TABLE t ADD CONSTRAINT k_pos CHECK (k > 0)")
    with pytest.raises(Exception, match="k_pos"):
        cat.sql("INSERT INTO t VALUES (-5, 'bad')")
    cat.sql("ALTER TABLE t DROP CONSTRAINT k_pos")
    cat.sql("INSERT INTO t VALUES (-5, 'ok now')")
    assert cat.table("t").read().filter("k = -5").count() == 1
    cat.sql("ALTER TABLE t DROP CONSTRAINT IF EXISTS nope")  # no-op


def test_drop_table_routes(cat, spark):
    _mk(cat, spark)
    cat.sql("DROP TABLE t")
    assert not cat.table("t").exists()
    assert cat.sql("DROP TABLE IF EXISTS t") is None
    with pytest.raises(ValueError, match="does not exist"):
        cat.sql("DROP TABLE t")


def test_unroutable_ddl_raises_precisely(cat, spark):
    with pytest.raises(ValueError, match="unsupported CREATE TABLE shape"):
        cat.sql("CREATE TABLE x")
    with pytest.raises(ValueError, match="unsupported CREATE shape"):
        cat.sql("CREATE FUNCTION f AS 'com.example.F'")
    with pytest.raises(ValueError, match="qualified or backquoted"):
        cat.sql("CREATE TABLE main.x (k INT)")
