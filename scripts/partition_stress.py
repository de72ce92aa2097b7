"""Partition-pruning stress (round 10): measure listing-time pruning on
a hive-partitioned ManagedTable — files opened and wall-clock for a
one-partition slice vs the full scan, at increasing partition counts.

Usage: PYTHONPATH=. python scripts/partition_stress.py [sf_dir]
"""
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.session import get_spark
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

spark = get_spark("partition_stress", cpus=16, shuffle_partitions=16)
li = spark.read.parquet(f"{SF}/lineitem.parquet")
li.count()  # warm

root = Path(tempfile.mkdtemp(prefix="part_stress_"))
try:
    for n_parts in (16, 64, 256):
        df = li.withColumn(
            "bucket", (F.col("l_orderkey") % n_parts).cast("int")
        )
        t = Catalog(spark, root / f"wh{n_parts}").table("fact")
        t.overwrite(df.repartition(max(16, n_parts // 4)), partition_by=["bucket"])
        n_files = len(t.data_files())

        def agg(frame):
            return frame.agg(
                F.sum(F.round(F.col("l_extendedprice") * 100).cast("bigint"))
            ).collect()[0][0]

        t0 = time.perf_counter()
        full = agg(t.read())
        t_full = time.perf_counter() - t0
        t0 = time.perf_counter()
        pruned_df = t.read_pruned({"bucket": (3, 3)})
        one = agg(pruned_df)
        t_pruned = time.perf_counter() - t0
        opened = len(pruned_df.inputFiles())
        want = agg(df.filter("bucket = 3"))
        assert one == want  # exact-integer cents: bit-stable compare
        print(json.dumps({
            "partitions": n_parts,
            "table_files": n_files,
            "files_opened_for_one_partition": opened,
            "full_scan_sec": round(t_full, 3),
            "pruned_scan_sec": round(t_pruned, 3),
            "speedup": round(t_full / t_pruned, 2),
        }))
finally:
    shutil.rmtree(root, ignore_errors=True)
