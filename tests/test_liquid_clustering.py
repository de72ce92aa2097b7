"""Liquid clustering (Databricks CLUSTER BY) — sources/tables.py
cluster_columns / set_cluster_columns + DDL/OPTIMIZE routing.

Contract: clustering columns are advisory and MUTABLE (unlike
partitioning); writes land unclustered; OPTIMIZE range-clusters the
rewrite so per-file min/max ranges become disjoint and the stats index
prunes sharply.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog


def _nfiles(df):
    return df.select(F.input_file_name()).distinct().count()


@pytest.fixture()
def clustered(spark, tmp_path):
    cat = Catalog(spark, tmp_path / "wh")
    cat.sql("CREATE TABLE ev (k BIGINT, x DOUBLE) CLUSTER BY (k)")
    t = cat.table("ev")
    t.append(
        spark.range(0, 50_000).select(
            F.col("id").alias("k"), (F.col("id") * 1.0).alias("x")
        ).repartition(16)
    )
    return cat, t


def test_optimize_clusters_and_prunes(clustered):
    cat, t = clustered
    assert t.cluster_columns() == ["k"]
    before = _nfiles(t.read_pruned({"k": (0, 1000)}))
    cat.sql("OPTIMIZE ev")
    total = len(t.data_files(t.current_version()))
    after = _nfiles(t.read_pruned({"k": (0, 1000)}))
    assert t.read().count() == 50_000  # content preserved
    assert after < total  # disjoint ranges -> the stats index skips
    assert after < before  # strictly better than the unclustered layout


def test_zorder_blocked_on_clustered_table(clustered):
    cat, _ = clustered
    with pytest.raises(ValueError, match="not allowed on a CLUSTER BY"):
        cat.sql("OPTIMIZE ev ZORDER BY (k)")


def test_alter_cluster_by_and_none(clustered):
    cat, t = clustered
    cat.sql("ALTER TABLE ev CLUSTER BY (x)")
    assert t.cluster_columns() == ["x"]
    cat.sql("ALTER TABLE ev CLUSTER BY NONE")
    assert t.cluster_columns() == []
    # now OPTIMIZE is plain small-file compaction, and ZORDER is legal
    cat.sql("OPTIMIZE ev ZORDER BY (k)")
    assert t.read().count() == 50_000


def test_cluster_by_validation(spark, tmp_path, clustered):
    cat, _ = clustered
    with pytest.raises(ValueError, match="unknown column"):
        cat.sql("ALTER TABLE ev CLUSTER BY (nope)")
    with pytest.raises(ValueError, match="mutually exclusive"):
        cat.sql(
            "CREATE TABLE bad (k BIGINT) PARTITIONED BY (k) CLUSTER BY (k)"
        )


def test_cluster_columns_survive_reopen(clustered, spark):
    cat, t = clustered
    fresh = Catalog(spark, cat.root).table("ev")
    assert fresh.cluster_columns() == ["k"]
