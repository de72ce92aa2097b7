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
    # shallow: shared inodes, no data copy (store-to-store hardlinks).
    # Names differ by design: clones rename to embed the TARGET's
    # version, else _gc_store's in-flight guard (embedded v > pointer)
    # would retain source-named files long after the clone commit is
    # vacuumed (r10 advisor finding).
    src_inodes = sorted(os.stat(f).st_ino for f in src.data_files())
    dst_inodes = sorted(os.stat(f).st_ino for f in dst.data_files())
    assert src_inodes == dst_inodes and src_inodes
    assert all(
        int(f.name.split("-", 1)[0][1:]) <= dst.current_version()
        for f in dst.data_files()
    )
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


def test_vacuumed_clone_files_are_collected(spark, tmp_path):
    """The r10 advisor leak: cloned files used to keep the SOURCE's
    name-embedded versions, so _gc_store's in-flight guard (embedded
    version > pointer => spare) retained them on the target long after
    the clone commit was vacuumed. With clone-time renaming, replacing
    the clone's content and vacuuming must actually free the store."""
    cat = Catalog(spark, tmp_path / "wh")
    src, dst = cat.table("src3"), cat.table("dst3")
    src.overwrite(spark.range(10).select(F.col("id").alias("k")))
    # push the SOURCE's version (and so its store-file names) high
    for _ in range(4):
        src.overwrite(spark.range(10).select(F.col("id").alias("k")))
    src.clone_to(dst)
    cloned = {f.name for f in dst.data_files()}
    assert cloned
    dst.overwrite(spark.range(3).select(F.col("id").alias("k")))
    dst.vacuum(keep=1)  # clone commit dropped -> its files unreferenced
    left = {f.name for f in dst.store.glob("*.parquet")}
    assert not (cloned & left), "vacuum must GC the vacuumed clone's files"
    # source untouched (hardlinked inodes are per-store directory entries)
    assert src.read().count() == 10
