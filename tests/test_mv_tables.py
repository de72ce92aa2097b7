"""Incremental aggregate MV correctness (batch-slicing independence) and
ManagedTable snapshot semantics (time-travel, vacuum, atomicity)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog, ManagedTable
from end_to_end_azure_databricks_data_engineering_project_spark.streaming.mv import IncrementalAgg, Measure


def _facts(spark, start, n, t0):
    rows = [
        (start + i, (start + i) % 5, float((start + i) % 100) + 0.25,
         t0 + dt.timedelta(seconds=start + i))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, grp int, amount double, ts timestamp")


def test_incremental_mv_equals_full_recompute(spark, tmp_path):
    t0 = dt.datetime(2025, 1, 1)
    catalog = Catalog(spark, tmp_path / "wh")
    fact = catalog.table("fact")
    mv = IncrementalAgg(
        catalog, "rev_by_grp", "fact", ["grp"],
        [Measure("total", "amount", "sum"), Measure("n", "amount", "count"),
         Measure("max_amount", "amount", "max")],
        cursor_col="ts", state_root=str(tmp_path / "state"),
    )
    # three uneven appends; refresh after each
    for start, n in [(0, 137), (137, 1), (138, 262)]:
        batch = _facts(spark, start, n, t0)
        if fact.exists():
            fact.append(batch)
        else:
            fact.overwrite(batch)
        assert mv.refresh() == n
    # idempotent: nothing new
    assert mv.refresh() == 0

    got = {
        r.grp: (float(r.total), r.n, r.max_amount) for r in mv.read().collect()
    }
    full = {
        r.grp: (float(r.total), r.n, r.max_amount)
        for r in fact.read()
        .groupBy("grp")
        .agg(
            F.sum(F.col("amount").cast("decimal(28,2)")).alias("total"),
            F.count(F.lit(1)).alias("n"),
            F.max("amount").alias("max_amount"),
        )
        .collect()
    }
    assert got == full


def test_managed_table_time_travel_and_vacuum(spark, tmp_path):
    t = ManagedTable(spark, tmp_path, "tt")
    df1 = spark.createDataFrame([(1, "a")], "id int, v string")
    df2 = spark.createDataFrame([(2, "b")], "id int, v string")
    v0 = t.overwrite(df1)
    v1 = t.append(df2)
    assert (v0, v1) == (0, 1)
    # current sees both; old snapshot dir still readable (time travel)
    assert t.read().count() == 2
    old = spark.read.parquet(str(t._version_dir(0)))
    assert old.count() == 1
    # vacuum keeps the latest `keep` versions
    t.overwrite(df1)  # v2
    t.vacuum(keep=1)
    assert not t._version_dir(0).exists()
    assert t.read().count() == 1


def test_managed_table_atomic_pointer(spark, tmp_path):
    """A reader holding the old pointer keeps a consistent snapshot even
    after a new commit (snapshot isolation on plain parquet)."""
    t = ManagedTable(spark, tmp_path, "iso")
    t.overwrite(spark.createDataFrame([(i,) for i in range(10)], "id int"))
    old_df = t.read()  # plan bound to v0 files
    t.overwrite(spark.createDataFrame([(99,)], "id int"))
    assert old_df.count() == 10  # still the old snapshot
    assert t.read().count() == 1


def test_managed_table_compact(spark, tmp_path):
    t = ManagedTable(spark, tmp_path, "cmp")
    for i in range(4):
        batch = spark.createDataFrame([(i * 10 + j,) for j in range(10)], "id int")
        t.append(batch) if t.exists() else t.overwrite(batch)
    files_before = len(list(t._version_dir(t.current_version()).glob("*.parquet")))
    t.compact(target_partitions=1)
    files_after = len(list(t._version_dir(t.current_version()).glob("*.parquet")))
    assert files_after < files_before
    assert t.read().count() == 40


def test_parallel_ingest_matches_serial(spark, tmp_path):
    import datetime as dt

    from end_to_end_azure_databricks_data_engineering_project_spark.config import TABLE_BY_NAME
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.ingest import ingest_all
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.watermark import WatermarkStore

    t0 = dt.datetime(2025, 1, 1)
    users = spark.createDataFrame(
        [(i, f"u{i}", "US", "Free", None, None, t0) for i in range(5)],
        TABLE_BY_NAME["dim_user"].spark_schema,
    )
    artists = spark.createDataFrame(
        [(i, f"a{i}", "Pop", "US", t0) for i in range(7)],
        TABLE_BY_NAME["dim_artist"].spark_schema,
    )
    cfgs = [TABLE_BY_NAME["dim_user"], TABLE_BY_NAME["dim_artist"]]
    res = ingest_all(
        spark, cfgs, {"dim_user": users, "dim_artist": artists},
        str(tmp_path / "bronze"), WatermarkStore(tmp_path / "state"), parallel=2,
    )
    assert {r.table: r.rows for r in res} == {"dim_user": 5, "dim_artist": 7}


def test_incremental_mv_hll_distinct(spark, tmp_path):
    """Mergeable HLL distinct: incremental sketch-union equals the
    from-scratch sketch estimate exactly, and is close to truth."""
    import datetime as dt

    from pyspark.sql import functions as F

    t0 = dt.datetime(2025, 1, 1)
    catalog = Catalog(spark, tmp_path / "wh")
    fact = catalog.table("fact")
    mv = IncrementalAgg(
        catalog, "users_by_grp", "fact", ["grp"],
        [Measure("n_users", "id", "approx_distinct")],
        cursor_col="ts", state_root=str(tmp_path / "state"),
    )
    for start, n in [(0, 150), (150, 250)]:
        batch = _facts(spark, start, n, t0).withColumn("id", F.col("id") % 97)
        fact.append(batch) if fact.exists() else fact.overwrite(batch)
        mv.refresh()
    got = {r.grp: r.n_users for r in mv.read().collect()}
    scratch = {
        r.grp: r.est for r in fact.read()
        .groupBy("grp")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("id")).alias("est"))
        .collect()
    }
    assert got == scratch  # sketch union is exact w.r.t. recompute
    exact = {
        r.grp: r.n for r in fact.read()
        .groupBy("grp").agg(F.countDistinct("id").alias("n")).collect()
    }
    for g, est in got.items():
        assert abs(est - exact[g]) / exact[g] < 0.05
