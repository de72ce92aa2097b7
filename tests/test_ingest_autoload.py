"""Incremental watermark ingestion + autoloader-style file discovery with
rescue-mode schema handling (reference incremental_loop.json + cloudFiles
readers)."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.config import TABLE_BY_NAME
from end_to_end_azure_databricks_data_engineering_project_spark.sources.autoload import (
    FileLedger,
    read_new_files,
    with_rescue,
)
from end_to_end_azure_databricks_data_engineering_project_spark.sources.ingest import ingest_table
from end_to_end_azure_databricks_data_engineering_project_spark.sources.watermark import WatermarkStore

T0 = dt.datetime(2025, 1, 1)
T1 = dt.datetime(2025, 2, 1)


def _src(spark, rows):
    return spark.createDataFrame(
        rows,
        "user_id int, user_name string, country string, subscription_type string,"
        " start_date date, end_date date, updated_at timestamp",
    )


def test_incremental_watermark_pull(spark, tmp_path):
    cfg = TABLE_BY_NAME["dim_user"]
    store = WatermarkStore(tmp_path / "state")
    bronze = str(tmp_path / "bronze")
    phase1 = _src(spark, [(1, "a", "US", "Free", None, None, T0), (2, "b", "DE", "Free", None, None, T0)])

    r1 = ingest_table(spark, cfg, phase1, bronze, store, run_ts="r1")
    assert r1.rows == 2 and r1.landed_path is not None
    assert store.read("dim_user") == "2025-01-01 00:00:00"

    # second run with no new rows: nothing written, watermark unchanged
    r2 = ingest_table(spark, cfg, phase1, bronze, store, run_ts="r2")
    assert r2.rows == 0 and r2.landed_path is None

    # phase 2: only rows past the watermark are pulled
    phase2 = phase1.union(
        _src(spark, [(1, "a", "US", "Premium", None, None, T1), (3, "c", "FR", "Free", None, None, T1)])
    )
    r3 = ingest_table(spark, cfg, phase2, bronze, store, run_ts="r3")
    assert r3.rows == 2
    landed = spark.read.parquet(r3.landed_path)
    assert {r.user_id for r in landed.collect()} == {1, 3}
    assert store.read("dim_user") == "2025-02-01 00:00:00"


def test_backfill_override(spark, tmp_path):
    import dataclasses

    cfg = dataclasses.replace(TABLE_BY_NAME["dim_user"], from_date="2025-01-15 00:00:00")
    store = WatermarkStore(tmp_path / "state")
    store.write("dim_user", "2025-02-15 00:00:00")  # stored says later
    df = _src(spark, [(1, "a", "US", "Free", None, None, T1)])
    r = ingest_table(spark, cfg, df, str(tmp_path / "bronze"), store)
    assert r.rows == 1  # from_date override re-pulled the T1 row


def test_rescue_column_packs_extras(spark):
    cfg = TABLE_BY_NAME["dim_artist"]
    df = spark.createDataFrame(
        [(1, "x", "Pop", "US", T0, "surprise")],
        "artist_id int, artist_name string, genre string, country string,"
        " updated_at timestamp, unexpected_col string",
    )
    out = with_rescue(df, cfg.spark_schema)
    row = out.first()
    assert json.loads(row._rescued_data) == {"unexpected_col": "surprise"}
    assert out.columns[:-1] == [f.name for f in cfg.spark_schema.fields]


def test_rescue_missing_columns_null(spark):
    cfg = TABLE_BY_NAME["dim_artist"]
    df = spark.createDataFrame([(1, "x")], "artist_id int, artist_name string")
    row = with_rescue(df, cfg.spark_schema).first()
    assert row.genre is None and row._rescued_data is None


def test_file_ledger_incremental_discovery(spark, tmp_path):
    cfg = TABLE_BY_NAME["dim_artist"]
    src = tmp_path / "bronze" / "dim_artist"
    loc = str(tmp_path / "schema_loc")
    d1 = spark.createDataFrame([(1, "x", "Pop", "US", T0)], cfg.spark_schema)
    d1.write.parquet(str(src / "run=1"))

    df, new = read_new_files(spark, str(src), cfg.spark_schema, loc)
    assert df.count() == 1 and len(new) > 0
    FileLedger(loc).commit(new)

    # nothing new → None
    df2, new2 = read_new_files(spark, str(src), cfg.spark_schema, loc)
    assert df2 is None and not new2

    # a second run's files (with an extra column) get picked up + rescued
    d2 = spark.createDataFrame(
        [(2, "y", "Rock", "DE", T1, "extra")],
        "artist_id int, artist_name string, genre string, country string,"
        " updated_at timestamp, bonus string",
    )
    d2.write.parquet(str(src / "run=2"))
    df3, new3 = read_new_files(spark, str(src), cfg.spark_schema, loc)
    rows = df3.collect()
    assert {r.artist_id for r in rows} == {2}
    assert json.loads(rows[0]._rescued_data) == {"bonus": "extra"}
    FileLedger(loc).commit(new3)


def test_exactly_once_replay_before_commit(spark, tmp_path):
    """Crash between read and ledger-commit → same files re-read (at-least-once
    pull; downstream key/seq merge makes it exactly-once end to end)."""
    cfg = TABLE_BY_NAME["dim_artist"]
    src = tmp_path / "b" / "dim_artist"
    loc = str(tmp_path / "loc")
    spark.createDataFrame([(1, "x", "Pop", "US", T0)], cfg.spark_schema).write.parquet(str(src / "run=1"))
    _, new1 = read_new_files(spark, str(src), cfg.spark_schema, loc)
    _, new2 = read_new_files(spark, str(src), cfg.spark_schema, loc)  # no commit in between
    assert new1 == new2


def test_promote_rescued_field(spark):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.autoload import promote_rescued
    from pyspark.sql import types as TT

    cfg = TABLE_BY_NAME["dim_artist"]
    df = spark.createDataFrame(
        [(1, "x", "Pop", "US", T0, "42", "keep"), (2, "y", "Rock", "DE", T0, None, None)],
        "artist_id int, artist_name string, genre string, country string,"
        " updated_at timestamp, listeners string, other string",
    )
    rescued = with_rescue(df, cfg.spark_schema)
    out = promote_rescued(rescued, "listeners", TT.IntegerType())
    rows = {r.artist_id: r for r in out.collect()}
    assert rows[1].listeners == 42
    assert rows[2].listeners is None
    # promoted field removed from rescue doc; other extras retained
    assert json.loads(rows[1]._rescued_data) == {"other": "keep"}
    assert rows[2]._rescued_data is None


def test_partitioned_bronze_layout(spark, tmp_path):
    cfg = TABLE_BY_NAME["dim_user"]
    store = WatermarkStore(tmp_path / "state")
    df = _src(spark, [(1, "a", "US", "Free", None, None, T0),
                      (2, "b", "DE", "Free", None, None, T1)])
    r = ingest_table(spark, cfg, df, str(tmp_path / "bronze"), store,
                     run_ts="r1", partition_by_cdc_date=True)
    assert r.rows == 2
    parts = sorted(p.name for p in (tmp_path / "bronze" / "dim_user" / "run=r1").iterdir()
                   if p.name.startswith("cdc_date="))
    assert parts == ["cdc_date=2025-01-01", "cdc_date=2025-02-01"]
    back = spark.read.parquet(r.landed_path)
    assert back.count() == 2 and "cdc_date" in back.columns


def test_ingest_runs_single_job_per_pull(spark, tmp_path):
    """The row count and max watermark ride the write action as observed
    metrics — one source scan, one Spark job per pull (verdict r1 #5:
    no count+max action separate from the write)."""
    cfg = TABLE_BY_NAME["dim_user"]
    store = WatermarkStore(tmp_path / "state")
    src = _src(spark, [(i, f"u{i}", "US", "Free", None, None, T0) for i in range(50)])
    sc = spark.sparkContext
    sc.setJobGroup("ingest_jobs", "count jobs per drain")
    try:
        r = ingest_table(spark, cfg, src, str(tmp_path / "bronze"), store, run_ts="rj")
    finally:
        sc.setJobGroup(None, None)
    assert r.rows == 50
    jobs = sc.statusTracker().getJobIdsForGroup("ingest_jobs")
    assert len(jobs) == 1, f"expected 1 job per pull, saw {len(jobs)}"


def test_stream_source_rescues_extras(spark, tmp_path):
    """Streaming twin of test_rescue_column_packs_extras (verdict r1 #6):
    the stream reads the merged superset schema and packs undeclared
    columns into _rescued_data, like the batch drain."""
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.autoload import (
        _merged_stream_schema,
        stream_source,
    )

    cfg = TABLE_BY_NAME["dim_artist"]
    src = str(tmp_path / "bronze" / "dim_artist")
    spark.createDataFrame(
        [(1, "x", "Pop", "US", T0, "surprise")],
        "artist_id int, artist_name string, genre string, country string,"
        " updated_at timestamp, unexpected_col string",
    ).write.parquet(src)

    out = stream_source(
        spark, src, cfg.spark_schema, schema_location=str(tmp_path / "schema")
    )
    q = (
        out.writeStream.format("memory")
        .queryName("rescue_twin")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM rescue_twin").collect()
    assert len(rows) == 1
    assert json.loads(rows[0]._rescued_data) == {"unexpected_col": "surprise"}
    declared = [f.name for f in cfg.spark_schema.fields]
    assert [c for c in rows[0].asDict()] == declared + ["_rescued_data"]

    # restart parity: the schema ledger remembers the extra column even
    # after the original files are gone
    import shutil as _sh

    _sh.rmtree(src)
    merged = _merged_stream_schema(
        spark, src, cfg.spark_schema, str(tmp_path / "schema")
    )
    assert "unexpected_col" in [f.name for f in merged.fields]


def test_partitioned_bronze_prunes_partitions(spark, tmp_path):
    """partition_by_cdc_date bronze layout: a cdc_date filter on the
    read side must resolve to PartitionFilters (directory pruning — at
    100 TB the daily query touches one partition dir, not the table)."""
    cfg = TABLE_BY_NAME["dim_user"]
    store = WatermarkStore(tmp_path / "state")
    bronze = str(tmp_path / "bronze")
    rows = [
        (1, "a", "US", "Free", None, None, dt.datetime(2025, 1, 1, 5)),
        (2, "b", "DE", "Free", None, None, dt.datetime(2025, 1, 2, 6)),
        (3, "c", "FR", "Paid", None, None, dt.datetime(2025, 1, 3, 7)),
    ]
    res = ingest_table(
        spark, cfg, _src(spark, rows), bronze, store,
        run_ts="rp", partition_by_cdc_date=True,
    )
    assert res.rows == 3
    df = spark.read.parquet(res.landed_path).filter(F.col("cdc_date") == "2025-01-02")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "cdc_date" in plan.split(
        "PartitionFilters", 1
    )[1][:200]
    got = [r["user_id"] for r in df.collect()]
    assert got == [2]


def test_silver_drain_crash_then_late_file_loses_nothing(spark, tmp_path, monkeypatch):
    import pytest
    """The r6 review's data-loss scenario: drain appends batch B, crashes
    BEFORE the ledger commit; a new bronze file lands; the rerun must
    finish B's bookkeeping only and then drain the newcomer as a fresh
    epoch — pre-fix, the rerun's skip branch ledger-committed the
    newcomer without ever appending its rows (silent permanent loss)."""
    import end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows as flows_mod
    from end_to_end_azure_databricks_data_engineering_project_spark.config import TABLE_BY_NAME
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.autoload import FileLedger
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import silver_flow

    cfg = TABLE_BY_NAME["dim_user"]
    bronze = tmp_path / "bronze" / "dim_user"
    bronze.mkdir(parents=True)
    schema = (
        "user_id int, user_name string, country string, subscription_type string,"
        " start_date date, end_date date, updated_at timestamp"
    )

    def drop_file(name, ids):
        import datetime as dt
        rows = [(i, f"u{i}", "US", "Free", None, None, dt.datetime(2025, 1, 1))
                for i in ids]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / "stage" / name))
        import shutil
        src = next((tmp_path / "stage" / name).glob("*.parquet"))
        shutil.copy(src, bronze / f"{name}.parquet")

    catalog = Catalog(spark, tmp_path / "wh")
    run = silver_flow(spark, cfg, str(tmp_path / "bronze"), catalog,
                      str(tmp_path / "state"))
    (tmp_path / "state").mkdir(exist_ok=True)

    drop_file("f1", [1, 2, 3])
    assert run() == 3

    # file 2 arrives; the drain appends it but CRASHES before the
    # ledger commit
    drop_file("f2", [4, 5])
    real_commit = FileLedger.commit
    def crash_commit(self, files):
        raise RuntimeError("simulated crash before ledger commit")
    monkeypatch.setattr(FileLedger, "commit", crash_commit)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run()
    monkeypatch.setattr(FileLedger, "commit", real_commit)

    # a NEW file lands before the rerun
    drop_file("f3", [6])

    # rerun: recovery finishes f2's bookkeeping from the commit-recorded
    # WAL (no re-append), then drains f3 as a fresh epoch in the same run
    assert run() == 1
    assert run() == 0  # quiescent
    got = sorted(r.user_id for r in catalog.table("silver_dim_user").read().collect())
    assert got == [1, 2, 3, 4, 5, 6]  # nothing lost, nothing duplicated
    # all WAL sidecars retired once bookkeeping is durable
    assert not list((tmp_path / "state" / "autoload_dim_user").glob("drain_*.json"))


def test_silver_drain_race_loser_marks_nothing_seen(spark, tmp_path, monkeypatch):
    """The r6 advisor hole: a drain that LOSES the same-epoch append race
    (append returns None) used to ledger-commit its OWN file listing; if
    that listing held a file the winner never appended (landed between
    the two listings), the file was marked seen and its rows silently,
    permanently lost. Post-fix the loser marks nothing seen and the file
    is re-discovered by the next drain."""
    import datetime as dt
    import shutil

    from end_to_end_azure_databricks_data_engineering_project_spark.config import TABLE_BY_NAME
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog, ManagedTable
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import silver_flow

    cfg = TABLE_BY_NAME["dim_user"]
    bronze = tmp_path / "bronze" / "dim_user"
    bronze.mkdir(parents=True)
    schema = (
        "user_id int, user_name string, country string, subscription_type string,"
        " start_date date, end_date date, updated_at timestamp"
    )

    def drop_file(name, ids):
        rows = [(i, f"u{i}", "US", "Free", None, None, dt.datetime(2025, 1, 1))
                for i in ids]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / "stage" / name))
        src = next((tmp_path / "stage" / name).glob("*.parquet"))
        shutil.copy(src, bronze / f"{name}.parquet")

    import end_to_end_azure_databricks_data_engineering_project_spark.sources.autoload as al
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.autoload import FileLedger

    catalog = Catalog(spark, tmp_path / "wh")
    run = silver_flow(spark, cfg, str(tmp_path / "bronze"), catalog,
                      str(tmp_path / "state"))
    drop_file("f1", [1, 2])
    assert run() == 2

    # Interleaving: f2a lands → winner lists {f2a} → f2b lands → loser
    # lists {f2a, f2b} (same ledger state, same epoch) → winner appends,
    # ledger-commits, finishes → loser's append hits the in-lock epoch
    # guard and returns None. Pre-fix the loser then ledger-committed
    # its OWN listing, marking f2b seen though nobody appended it.
    drop_file("f2a", [3])
    drop_file("f2b", [4])
    real_list = al._list_parquet_files
    real_append = ManagedTable.append
    fired = {"done": False}

    def losing_append(self, df, **kw):
        if fired["done"]:
            return real_append(self, df, **kw)
        fired["done"] = True
        # run the interleaved winner to completion (its listing predated
        # f2b); then our append loses the same-epoch race
        monkeypatch.setattr(
            al, "_list_parquet_files",
            lambda root: [p for p in real_list(root) if "f2b" not in p],
        )
        monkeypatch.setattr(ManagedTable, "append", real_append)
        assert run() == 1  # winner drains f2a only
        monkeypatch.setattr(al, "_list_parquet_files", real_list)
        return real_append(self, df, **kw)  # same-epoch → None

    monkeypatch.setattr(ManagedTable, "append", losing_append)
    assert run() == 0  # loser: must mark NOTHING seen
    monkeypatch.setattr(ManagedTable, "append", real_append)
    seen = FileLedger(str(tmp_path / "state" / "autoload_dim_user")).seen()
    assert not any("f2b" in f for f in seen)  # the advisor's lost file

    # the next drain re-discovers f2b and lands its rows
    assert run() == 1
    got = sorted(r.user_id for r in catalog.table("silver_dim_user").read().collect())
    assert got == [1, 2, 3, 4]


def test_numeric_watermark_first_pull_ingests_everything(spark, tmp_path):
    """A numeric CDC column with the timestamp-shaped EPOCH sentinel
    previously cast to NULL, dropped every row, and left the table stuck
    at 0 rows forever — the first pull must be a full load and advance
    the numeric watermark."""
    from dataclasses import replace as _replace

    from pyspark.sql import types as T
    from end_to_end_azure_databricks_data_engineering_project_spark.config import TABLE_BY_NAME
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.ingest import ingest_table

    base = TABLE_BY_NAME["fact_stream"]
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("seq", T.LongType()),
        ]
    )
    cfg = _replace(base, table="numtab", cdc_col="seq", spark_schema=schema)
    store = WatermarkStore(tmp_path / "state")
    src = spark.createDataFrame([(i, 100 + i) for i in range(5)], "id long, seq long")
    r1 = ingest_table(spark, cfg, src, str(tmp_path / "bronze"), store)
    assert r1.rows == 5
    assert store.read("numtab") == "104"
    # incremental pull: only rows past the numeric watermark
    src2 = spark.createDataFrame([(9, 104), (10, 105)], "id long, seq long")
    r2 = ingest_table(spark, cfg, src2, str(tmp_path / "bronze"), store)
    assert r2.rows == 1 and store.read("numtab") == "105"


def test_with_rescue_all_null_extras_stay_null(spark):
    """mergeSchema null-fill: rows from files lacking the extra column
    must keep _rescued_data NULL, not the misleading '{}'."""
    from pyspark.sql import types as T
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.autoload import (
        RESCUE_COL,
        with_rescue,
    )

    declared = T.StructType([T.StructField("k", T.LongType())])
    df = spark.createDataFrame(
        [(1, "x"), (2, None)], "k long, extra string"
    )
    out = {r.k: r[RESCUE_COL] for r in with_rescue(df, declared).collect()}
    assert out[1] == '{"extra":"x"}'
    assert out[2] is None


def test_promote_rescued_rejects_dotted_field(spark):
    import pytest as _pytest

    from end_to_end_azure_databricks_data_engineering_project_spark.sources.autoload import (
        promote_rescued,
    )
    from pyspark.sql import types as T

    df = spark.createDataFrame([(1, '{"geo.lat":"1"}')], "k long, _rescued_data string")
    with _pytest.raises(ValueError, match="plain identifier"):
        promote_rescued(df, "geo.lat", T.DoubleType())
