"""Column DEFAULT values + column-list INSERT — sources/tables.py
_parse_generated_clauses (CURRENT_DEFAULT metadata) and the INSERT
router's column-list mapping.

Delta allowColumnDefaults scope: defaults fill on SQL INSERT when the
column is omitted from the column list — never on DataFrame appends.
"""

from __future__ import annotations

import pytest

from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    c = Catalog(spark, tmp_path / "wh")
    c.sql(
        "CREATE TABLE ev ("
        "  id BIGINT GENERATED ALWAYS AS IDENTITY,"
        "  name STRING,"
        "  status STRING DEFAULT 'active',"
        "  score DOUBLE DEFAULT (1.0 + 0.5),"
        "  note STRING"
        ")"
    )
    return c


def test_defaults_fill_omitted_columns(cat):
    cat.sql("INSERT INTO ev (name) VALUES ('a'), ('b')")
    rows = cat.sql(
        "SELECT name, status, score, note FROM ev ORDER BY name"
    ).collect()
    assert [(r.status, r.score, r.note) for r in rows] == [
        ("active", 1.5, None), ("active", 1.5, None),
    ]
    ids = [r.id for r in cat.sql("SELECT id FROM ev").collect()]
    assert len(set(ids)) == 2  # identity still allocates


def test_listed_values_override_defaults_any_order(cat):
    cat.sql("INSERT INTO ev (name, status) VALUES ('c', 'archived')")
    cat.sql("INSERT INTO ev (score, name) VALUES (9.0, 'd')")
    got = {
        r.name: (r.status, r.score)
        for r in cat.sql("SELECT name, status, score FROM ev").collect()
    }
    assert got["c"] == ("archived", 1.5)
    assert got["d"] == ("active", 9.0)


def test_parenthesized_body_still_routes(cat):
    cat.sql("INSERT INTO ev (name) (VALUES ('e'))")
    cat.sql("INSERT INTO ev (name) (SELECT 'f')")
    assert cat.sql("SELECT count(*) AS n FROM ev").collect()[0].n == 2


def test_metadata_persists_and_df_appends_skip_defaults(cat, spark):
    cat.sql("INSERT INTO ev (name) VALUES ('a')")
    t = Catalog(spark, cat.root).table("ev")  # fresh handle
    md = {f.name: dict(f.metadata) for f in t.table_schema().fields}
    assert md["status"] == {"CURRENT_DEFAULT": "'active'"}
    assert md["score"] == {"CURRENT_DEFAULT": "(1.0 + 0.5)"}
    t.append(spark.createDataFrame(
        [("z", None, None, None)],
        "name string, status string, score double, note string",
    ))
    r = cat.sql("SELECT status FROM ev WHERE name = 'z'").collect()[0]
    assert r.status is None  # DataFrame append: NO default fill


def test_keywords_inside_comment_strings_are_inert(cat):
    """COMMENT text containing DEFAULT / GENERATED must not be parsed
    as a clause (literal-mask guard)."""
    cat.sql(
        "CREATE TABLE cmt ("
        "  a STRING COMMENT 'the default is none; generated always as "
        "identity elsewhere',"
        "  b INT DEFAULT 7"
        ")"
    )
    t = cat.table("cmt")
    md = {f.name: dict(f.metadata) for f in t.table_schema().fields}
    assert "CURRENT_DEFAULT" not in md["a"]
    assert "delta.identity.start" not in md["a"]
    assert md["b"]["CURRENT_DEFAULT"] == "7"
    cat.sql("INSERT INTO cmt (a) VALUES ('x')")
    r = cat.sql("SELECT a, b FROM cmt").collect()[0]
    assert (r.a, r.b) == ("x", 7)


def test_errors(cat):
    with pytest.raises(ValueError, match="unknown column"):
        cat.sql("INSERT INTO ev (nope) VALUES (1)")
    with pytest.raises(ValueError, match="duplicate column"):
        cat.sql("INSERT INTO ev (name, name) VALUES ('x', 'y')")
    with pytest.raises(ValueError, match="column list names"):
        cat.sql("INSERT INTO ev (name) VALUES ('x', 'y')")
    with pytest.raises(Exception):  # non-constant default fails the DDL
        cat.sql("CREATE TABLE bad (x INT DEFAULT (nope + 1))")
