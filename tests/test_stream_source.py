"""ManagedTable as a TRUE readStream source (S7 upgraded from
drain-based to `spark.readStream.format("managed_table")`): offsets
are delta-log versions, partitions are files read executor-side as
Arrow batches, and the source consumes ONLY the public transaction
log. Asserts Delta-streaming semantics: exactly-once across restarts,
append-mode data-update refusal (+ ignoreChanges), CDF change rows,
OPTIMIZE transparency, schema-evolution null-fill, precise errors.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructField, StructType, StringType

from end_to_end_azure_databricks_data_engineering_project_spark.sources.streamsource import (
    ManagedTableDataSource,
)
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog


@pytest.fixture()
def cat(spark, tmp_path):
    spark.dataSource.register(ManagedTableDataSource)
    return Catalog(spark, tmp_path / "wh")


def _rows(spark, lo, hi, val):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(val).alias("val")
    )


def _drain(spark, table, ckpt, out, **opts):
    reader = spark.readStream.format("managed_table").option(
        "path", str(table.dir)
    )
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(str(out))


def test_appends_stream_exactly_once_across_restarts(spark, cat, tmp_path):
    t = cat.table("src")
    t.overwrite(_rows(spark, 0, 10, "a"))
    t.append(_rows(spark, 10, 15, "b"))
    out, ckpt = tmp_path / "out", tmp_path / "ck"
    assert _drain(spark, t, ckpt, out).count() == 15
    t.append(_rows(spark, 15, 18, "c"))
    got = _drain(spark, t, ckpt, out)
    assert got.count() == 18  # only the 3 new rows arrived on restart
    assert {r.val for r in got.collect()} == {"a", "b", "c"}
    # compaction is dataChange=false: transparent to the stream
    t.append(_rows(spark, 18, 19, "d").coalesce(1))
    t.append(_rows(spark, 19, 20, "d").coalesce(1))
    t.compact_small(max_file_bytes=16 << 20)
    assert _drain(spark, t, ckpt, out).count() == 20


def test_appends_mode_refuses_data_updates_unless_ignored(
    spark, cat, tmp_path
):
    t = cat.table("src")
    t.overwrite(_rows(spark, 0, 100, "a")
                .repartitionByRange(2, "k").sortWithinPartitions("k"))
    out, ckpt = tmp_path / "out", tmp_path / "ck"
    assert _drain(spark, t, ckpt, out).count() == 100
    t.update_where("k < 50", {"val": "'b'"})
    with pytest.raises(Exception, match="data update|cdf"):
        _drain(spark, t, ckpt, out)
    # ignoreChanges skips the rewrite commit (Delta's documented escape)
    t2_out, t2_ck = tmp_path / "out2", tmp_path / "ck2"
    got = _drain(
        spark, t, t2_ck, t2_out, ignoreChanges="true", startingVersion=-1
    )
    # initial snapshot (v0) is consumed; the UPDATE commit is skipped
    assert got.count() == 100


def test_cdf_mode_yields_change_rows(spark, cat, tmp_path):
    t = cat.table("src")
    t.overwrite(
        _rows(spark, 0, 50, "a")
        .repartitionByRange(2, "k").sortWithinPartitions("k"),
        enable_cdf=True,
    )
    t.update_where("k = 3", {"val": "'b'"})
    t.delete_where("k = 4")
    got = _drain(
        spark, t, tmp_path / "ck", tmp_path / "out", mode="cdf"
    )
    counts = {
        r._change_type: r.n
        for r in got.groupBy("_change_type").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    assert counts["insert"] == 50
    assert counts["update_preimage"] == 1
    assert counts["update_postimage"] == 1
    assert counts["delete"] == 1
    post = got.filter("_change_type = 'update_postimage'").collect()
    assert [(r.k, r.val) for r in post] == [(3, "b")]


def test_schema_evolution_nullfills_old_files(spark, cat, tmp_path):
    t = cat.table("src")
    t.overwrite(_rows(spark, 0, 5, "a"))
    evolved = StructType(
        list(t.table_schema().fields)
        + [StructField("tier", StringType(), True)]
    )
    t.append(
        spark.createDataFrame([(99, "b", "gold")], evolved), evolve=True
    )
    got = _drain(spark, t, tmp_path / "ck", tmp_path / "out")
    rows = {r.k: r.tier for r in got.collect()}
    assert rows[0] is None and rows[99] == "gold"


def test_starting_version_skips_history(spark, cat, tmp_path):
    t = cat.table("src")
    t.overwrite(_rows(spark, 0, 10, "a"))       # delta v0
    t.append(_rows(spark, 10, 12, "b"))          # delta v1
    t.append(_rows(spark, 12, 13, "c"))          # delta v2
    got = _drain(
        spark, t, tmp_path / "ck", tmp_path / "out", startingVersion=1
    )
    assert {r.val for r in got.collect()} == {"c"}


def test_partitioned_table_raises_precisely(spark, cat, tmp_path):
    t = cat.table("part")
    t.overwrite(
        _rows(spark, 0, 10, "a").withColumn("g", F.col("k") % 2),
        partition_by=["g"],
    )
    with pytest.raises(Exception, match="partitioned tables"):
        (
            spark.readStream.format("managed_table")
            .option("path", str(t.dir))
            .load()
        )
