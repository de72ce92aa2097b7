"""ManagedTable RESTORE / shallow CLONE / read_at time travel."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog


def _t(spark, tmp_path, name="t"):
    return Catalog(spark, tmp_path / "wh").table(name)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_restore_rolls_content_forward(spark, tmp_path):
    t = _t(spark, tmp_path)
    v0 = t.overwrite(spark.range(5).select(F.col("id").alias("k")))
    t.append(spark.range(5, 8).select(F.col("id").alias("k")))
    assert t.read().count() == 8
    new_v = t.restore(v0)
    assert new_v == t.current_version()  # the restore commit moved the pointer
    assert _rows(t.read()) == _rows(spark.range(5).select(F.col("id").alias("k")))
    # rolled-past version still time-travel readable (audit)
    assert t.read_at(v0 + 1).count() == 8


def test_restore_is_append_barrier(spark, tmp_path):
    t = _t(spark, tmp_path)
    v0 = t.overwrite(spark.range(3).select(F.col("id").alias("k")))
    t.append(spark.range(3, 5).select(F.col("id").alias("k")))
    t.restore(v0)
    # incremental consumers must NOT derive a delta across a restore
    assert t.appended_since(v0) is None


def test_restore_missing_version_raises(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.overwrite(spark.range(2).select(F.col("id").alias("k")))
    with pytest.raises(FileNotFoundError):
        t.restore(99)


def test_read_at_and_restore_refuse_orphan_writer_dirs(spark, tmp_path):
    # a crashed writer leaves a claimed-but-uncommitted dir above the
    # pointer; it must not be readable or restorable as a snapshot
    t = _t(spark, tmp_path)
    t.overwrite(spark.range(2).select(F.col("id").alias("k")))
    orphan = t._claim_next_version()  # simulate crash before commit
    with pytest.raises(FileNotFoundError, match="not committed"):
        t.read_at(orphan)
    with pytest.raises(FileNotFoundError, match="not committed"):
        t.restore(orphan)
    # a LATER commit moving the pointer past the orphan must not make
    # the partial dir readable: the _op marker (written only after a
    # successful data write) is what distinguishes finished snapshots
    t.overwrite(spark.range(9).select(F.col("id").alias("k")))
    assert t.current_version() > orphan
    with pytest.raises(FileNotFoundError, match="not committed"):
        t.read_at(orphan)
    with pytest.raises(FileNotFoundError, match="not committed"):
        t.restore(orphan)


def test_read_at_refuses_losing_writer_dir(spark, tmp_path):
    """A losing concurrent writer can finish its data write AND _op
    marker before its _commit raises — only the pointer's committed
    ledger distinguishes that dir from real history."""
    t = _t(spark, tmp_path)
    t.overwrite(spark.range(3).select(F.col("id").alias("k")))
    lost = t._claim_next_version()
    spark.range(99).select(F.col("id").alias("k")).write.mode(
        "overwrite"
    ).parquet(str(t._version_dir(lost)))
    t._write_op_marker(lost, "snapshot")  # ...but _commit never ran
    t.overwrite(spark.range(5).select(F.col("id").alias("k")))  # winner
    assert t.current_version() > lost
    with pytest.raises(FileNotFoundError, match="not committed"):
        t.read_at(lost)
    with pytest.raises(FileNotFoundError, match="not committed"):
        t.restore(lost)


def test_clone_is_shallow_and_isolated(spark, tmp_path):
    cat = Catalog(spark, tmp_path / "wh")
    src, dst = cat.table("src"), cat.table("dst")
    src.overwrite(spark.range(10).select(F.col("id").alias("k")))
    src.clone_to(dst)
    assert _rows(dst.read()) == _rows(src.read())
    # shallow: shared inodes, no data copy (store-to-store hardlinks)
    src_files = {f.name: os.stat(f).st_ino for f in src.data_files()}
    dst_files = {f.name: os.stat(f).st_ino for f in dst.data_files()}
    assert src_files == dst_files and src_files
    # diverging writes don't interfere
    dst.append(spark.range(10, 12).select(F.col("id").alias("k")))
    assert src.read().count() == 10 and dst.read().count() == 12
    # clone carries stats -> skipping works on the clone
    assert dst.file_stats() is not None


def test_clone_onto_existing_raises(spark, tmp_path):
    cat = Catalog(spark, tmp_path / "wh")
    src, dst = cat.table("src2"), cat.table("dst2")
    src.overwrite(spark.range(3).select(F.col("id").alias("k")))
    dst.overwrite(spark.range(1).select(F.col("id").alias("k")))
    with pytest.raises(ValueError):
        src.clone_to(dst)


def test_read_at_pins_schema_before_evolution(spark, tmp_path):
    t = _t(spark, tmp_path)
    v0 = t.overwrite(spark.range(3).select(F.col("id").alias("k")))
    t.append(
        spark.range(3, 4).select(F.col("id").alias("k"), F.lit("x").alias("extra")),
        evolve=True,
    )
    assert "extra" in t.read().columns
    assert t.read_at(v0).columns == ["k"]  # pre-evolution schema pinned
