"""ANALYZE TABLE ... COMPUTE STATISTICS — sources/tables.py analyze()
and the SQL router's ANALYZE verb.

Contract: table-level stats come free from manifest metadata (no scan);
column stats (min/max/null count/approx ndv, avg+max length for
strings) run as ONE aggregation pass; results bind as the
analyze_stats table property with the snapshot version recorded, and
DESCRIBE-DETAIL-style key/value rows come back from the SQL verb.
"""

from __future__ import annotations

import pytest

from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog


@pytest.fixture()
def catalog(spark, tmp_path):
    cat = Catalog(spark, tmp_path / "wh")
    cat.sql("CREATE TABLE t (k BIGINT, s STRING, x DOUBLE, e ARRAY<INT>)")
    cat.sql(
        "INSERT INTO t SELECT id, CASE WHEN id = 2 THEN NULL ELSE "
        "repeat('a', CAST(id AS INT) + 1) END, id * 1.5, array(1) "
        "FROM range(5)"
    )
    return cat


def test_table_level_stats_no_columns(catalog):
    catalog.sql("ANALYZE TABLE t COMPUTE STATISTICS")
    st = catalog.table("t").detail()["analyze_stats"]
    assert st["num_rows"] == 5
    assert st["size_bytes"] > 0
    assert st["columns"] == {}
    assert st["computed_at_version"] == catalog.table("t").current_version()


def test_column_stats_exact_fields(catalog):
    out = catalog.sql("ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS k, s")
    kv = {r.info_name: r.info_value for r in out.collect()}
    assert kv["k.min"] == "0" and kv["k.max"] == "4"
    assert kv["k.null_count"] == "0"
    assert kv["s.null_count"] == "1"
    assert kv["s.max_len"] == "5"  # repeat('a', 4+1)
    st = catalog.table("t").detail()["analyze_stats"]
    assert st["columns"]["k"]["approx_ndv"] == 5  # small n: HLL exact


def test_for_all_columns_skips_complex_types(catalog):
    catalog.sql("ANALYZE TABLE t COMPUTE STATISTICS FOR ALL COLUMNS")
    st = catalog.table("t").detail()["analyze_stats"]
    assert set(st["columns"]) == {"k", "s", "x"}  # e (array) skipped


def test_explicit_complex_column_rejected(catalog):
    with pytest.raises(ValueError, match="complex"):
        catalog.sql("ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS e")


def test_unknown_column_and_bad_shape(catalog):
    with pytest.raises(ValueError, match="unknown column"):
        catalog.sql("ANALYZE TABLE t COMPUTE STATISTICS FOR COLUMNS nope")
    with pytest.raises(ValueError, match="unsupported ANALYZE"):
        catalog.sql("ANALYZE TABLE t ESTIMATE STATISTICS")


def test_staleness_version_advances(catalog):
    catalog.sql("ANALYZE TABLE t COMPUTE STATISTICS")
    v1 = catalog.table("t").detail()["analyze_stats"]["computed_at_version"]
    catalog.sql("INSERT INTO t VALUES (9, 'zz', 9.0, array(2))")
    # stats are advisory: still the old snapshot's, version says so
    st = catalog.table("t").detail()["analyze_stats"]
    assert st["computed_at_version"] == v1
    assert st["num_rows"] == 5
    catalog.sql("ANALYZE TABLE t COMPUTE STATISTICS")
    st2 = catalog.table("t").detail()["analyze_stats"]
    assert st2["num_rows"] == 6
    assert st2["computed_at_version"] > v1
