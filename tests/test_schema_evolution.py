"""Delta-style schema enforcement + evolution on ManagedTable.

Reference intent: Delta sinks enforce table schema on write and support
additive evolution (the Autoloader rescue path handles upstream drift;
silver/gold Delta tables enforce on append — silver_Dimensions.py:55).
ManagedTable appends align to the committed canonical schema
(_schema.json per version): reordered columns are fine, missing
nullable columns null-fill, type changes and new columns raise —
``evolve=True`` widens the schema with NO rewrite of old files, because
``read()`` pins the stored schema and the parquet reader null-fills
per file.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import (
    Catalog,
    SchemaMismatchError,
)


@pytest.fixture()
def table(spark, tmp_path):
    t = Catalog(spark, tmp_path / "wh").table("t")
    t.append(
        spark.createDataFrame(
            [(1, "a", 1.0), (2, "b", 2.0)], "id long, name string, score double"
        )
    )
    return t


def test_reordered_columns_align(spark, table):
    table.append(
        spark.createDataFrame([("c", 3.0, 3)], "name string, score double, id long")
    )
    assert [f.name for f in table.read().schema.fields] == ["id", "name", "score"]
    assert table.read().filter("id = 3").first().name == "c"


def test_missing_nullable_column_null_fills(spark, table):
    table.append(spark.createDataFrame([(4, "d")], "id long, name string"))
    row = table.read().filter("id = 4").first()
    assert row.score is None
    assert table.read().count() == 3


def test_type_change_raises(spark, table):
    bad = spark.createDataFrame([(5, "e", 5)], "id long, name string, score long")
    with pytest.raises(SchemaMismatchError, match="score"):
        table.append(bad)


def test_new_column_requires_evolve(spark, table):
    extra = spark.createDataFrame(
        [(5, "e", 5.0, "US")], "id long, name string, score double, country string"
    )
    with pytest.raises(SchemaMismatchError, match="country"):
        table.append(extra)

    v_before = table.current_version()
    table.append(extra, evolve=True)
    assert table.current_version() == v_before + 1
    df = table.read()
    assert [f.name for f in df.schema.fields] == ["id", "name", "score", "country"]
    # old files were NOT rewritten; reader null-fills them
    assert df.filter("id = 1").first().country is None
    assert df.filter("id = 5").first().country == "US"
    # subsequent appends enforce the WIDENED schema (country now optional)
    table.append(spark.createDataFrame([(6, "f", 6.0)], "id long, name string, score double"))
    assert df.sparkSession.createDataFrame([], "x int") is not None  # session alive
    assert table.read().filter("id = 6").first().country is None


def test_merge_keyed_aligns_merge_output(spark, table):
    # batch schema may differ from the table's (CDC batches lack SCD
    # columns); enforcement applies to merge_fn's OUTPUT, realigning
    # reordered columns to the canonical schema
    batch = spark.createDataFrame([("z", 9.0, 1)], "name string, score double, id long")
    table.merge_keyed(
        batch,
        ["id"],
        lambda cur, b: cur.join(b.select("id"), "id", "left_anti")
        .unionByName(b)
        .select("score", "name", "id"),  # scrambled output order
    )
    df = table.read()
    assert [f.name for f in df.schema.fields] == ["id", "name", "score"]
    assert df.filter("id = 1").first().name == "z"
    assert df.count() == 2


def test_appended_since_pins_current_schema(spark, table):
    v0 = table.current_version()
    table.append(
        spark.createDataFrame([(7, "g", 7.0, "DE")],
                              "id long, name string, score double, country string"),
        evolve=True,
    )
    delta = table.appended_since(v0)
    assert [f.name for f in delta.schema.fields] == ["id", "name", "score", "country"]
    assert delta.count() == 1 and delta.first().country == "DE"


def test_batch_nullability_cannot_narrow_canonical_schema(spark, tmp_path):
    """A batch built from non-nullable expressions (e.g. F.lit) must not
    rewrite a nullable canonical column to non-nullable — the next batch
    that legitimately omits the column would then be rejected."""
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    t = Catalog(spark, tmp_path / "wh").table("t")
    t.overwrite(
        spark.createDataFrame([(1, "a")], "k long, note string")  # note nullable
    )
    assert t.table_schema()["note"].nullable
    # batch with a non-nullable note expression
    t.append(
        spark.range(2, 3).select(
            F.col("id").alias("k"), F.lit("x").alias("note")
        )
    )
    assert t.table_schema()["note"].nullable  # still nullable
    # a batch omitting note must null-fill, not raise
    t.append(spark.range(3, 4).select(F.col("id").alias("k")))
    assert t.read().filter("note IS NULL").count() == 1


def test_read_pruned_pins_schema_after_evolution(spark, tmp_path):
    """read_pruned over a mix of pre- and post-evolution files must see
    the committed (evolved) schema, not an arbitrary file footer."""
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    t = Catalog(spark, tmp_path / "wh").table("t")
    t.overwrite(spark.range(0, 10).select(F.col("id").alias("k")))
    t.append(
        spark.range(10, 20).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("extra")
        ),
        evolve=True,
    )
    out = t.read_pruned({"k": (0, 15)})
    assert "extra" in out.columns
    rows = {r.k: r.extra for r in out.collect()}
    assert rows[5] is None and rows[12] == 24
    # predicate on the EVOLVED column must not throw on old files
    out2 = t.read_pruned({"extra": (20, 30)})
    assert sorted(r.k for r in out2.collect()) == [10, 11, 12, 13, 14, 15]
