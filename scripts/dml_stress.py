"""Predicate DML at growing table size (round-11 DML verbs).

``delete_where``/``update_where`` share merge_keyed's physical shape:
candidate files are pruned by the manifest's per-file min/max stats
against the bounds the condition implies, one bounded discovery scan
finds the files actually holding a matching row, only those are
rewritten. This harness grows a key-clustered table 32x in FILE COUNT
while deleting/updating the same narrow key range, and reports:

  files      — table file count before the op
  candidates — files the derived bounds leave for discovery to open
  touched    — files the op actually rewrote (manifest removed list)
  wall_sec   — end-to-end op wall (includes commit)

Pass criteria: candidates/touched stay ~constant while files grow 32x,
and the op wall stays ~flat (it tracks the touched files, not the
table).

Usage: PYTHONPATH=/root/repo python scripts/dml_stress.py
"""
from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from end_to_end_azure_databricks_data_engineering_project_spark.session import get_spark
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

ROWS_PER_FILE = 20_000
RANGE_KEYS = 200  # narrow contiguous range: the clustered-layout sweet spot

spark = get_spark("dml_stress", cpus=16, shuffle_partitions=16)
root = Path(tempfile.mkdtemp(prefix="dml_stress_"))
results = []
try:
    for n_files in (64, 512, 2048):
        cat = Catalog(spark, root / f"wh{n_files}")
        t = cat.table("dim")
        n_rows = ROWS_PER_FILE * n_files
        base = spark.range(n_rows).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), (F.xxhash64("id") % 1000)).alias("val"),
        )
        t.overwrite(
            base.repartitionByRange(n_files, "k").sortWithinPartitions("k")
        )
        lo = n_rows // 2
        hi = lo + RANGE_KEYS - 1
        names, stats = t._resolve(t.current_version())
        bounds = t._dml_bounds(f"k >= {lo} AND k <= {hi}")
        cand = [n for n in names if t._stats_overlap(stats.get(n), bounds)]

        t0 = time.perf_counter()
        v = t.update_where(
            f"k >= {lo} AND k <= {hi}", {"val": "concat(val, '!')"}
        )
        upd_wall = time.perf_counter() - t0
        upd_touched = len(t._manifest(v)["removed"])

        t0 = time.perf_counter()
        v = t.delete_where(f"k >= {lo} AND k <= {hi}")
        del_wall = time.perf_counter() - t0
        del_touched = len(t._manifest(v)["removed"])

        assert t.read().count() == n_rows - RANGE_KEYS
        results.append({
            "files": n_files,
            "candidates": len(cand),
            "update": {"touched": upd_touched, "wall_sec": round(upd_wall, 2)},
            "delete": {"touched": del_touched, "wall_sec": round(del_wall, 2)},
        })
        print(json.dumps(results[-1]))
        shutil.rmtree(root / f"wh{n_files}")
finally:
    shutil.rmtree(root, ignore_errors=True)
print(json.dumps({"dml_stress": results}))
