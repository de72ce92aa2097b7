"""Persistent catalog views (CREATE/DROP VIEW) — sources/tables.py
Catalog._sql_ddl view branch + register_views fixpoint.
"""

from __future__ import annotations

import pytest

from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, tmp_path / "wh")
    c.sql("CREATE TABLE t (k BIGINT, x DOUBLE)")
    c.sql("INSERT INTO t VALUES (1, 1.0), (2, 2.0), (3, 3.0)")
    return c


def test_view_tracks_latest_table_state(cat):
    cat.sql("CREATE VIEW big AS SELECT * FROM t WHERE x >= 2.0")
    assert cat.sql("SELECT count(*) AS n FROM big").collect()[0].n == 2
    cat.sql("INSERT INTO t VALUES (4, 4.0)")
    assert cat.sql("SELECT count(*) AS n FROM big").collect()[0].n == 3


def test_view_on_view_and_persistence(cat, spark):
    cat.sql("CREATE VIEW big AS SELECT * FROM t WHERE x >= 2.0")
    cat.sql("CREATE VIEW agg AS SELECT count(*) AS n FROM big")
    fresh = Catalog(spark, cat.root)
    assert fresh.sql("SELECT n FROM agg").collect()[0].n == 2


def test_or_replace_rebinds(cat):
    cat.sql("CREATE VIEW v AS SELECT * FROM t")
    cat.sql("CREATE OR REPLACE VIEW v AS SELECT * FROM t WHERE k = 1")
    assert cat.sql("SELECT count(*) AS n FROM v").collect()[0].n == 1


def test_name_collisions_both_directions(cat):
    cat.sql("CREATE VIEW v AS SELECT 1 AS one")
    with pytest.raises(ValueError, match="already exists"):
        cat.sql("CREATE VIEW v AS SELECT 2 AS two")
    with pytest.raises(ValueError, match="VIEW of that name"):
        cat.sql("CREATE TABLE v (k INT)")
    with pytest.raises(ValueError, match="TABLE of that name"):
        cat.sql("CREATE VIEW t AS SELECT 1 AS one")


def test_bad_view_sql_fails_and_is_not_persisted(cat):
    with pytest.raises(Exception):
        cat.sql("CREATE VIEW bad AS SELECT nope FROM t")
    assert "bad" not in cat._load_views()


def test_drop_view(cat):
    cat.sql("CREATE VIEW v AS SELECT 1 AS one")
    cat.sql("DROP VIEW v")
    with pytest.raises(ValueError, match="does not exist"):
        cat.sql("DROP VIEW v")
    cat.sql("DROP VIEW IF EXISTS v")  # no-op
