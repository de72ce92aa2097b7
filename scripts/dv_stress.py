"""Deletion-vector cost stress (r12): a 1-row DELETE in a big file must
cost ~O(deleted rows), not O(file).

Builds one table with a single large clustered file, then measures the
SAME 1-row delete two ways:
 - DV path (default gates): tombstone write only;
 - forced rewrite path (dv_max_rows=0): whole-file rewrite.

Reported: wall seconds and bytes written per path, at growing file
sizes — the DV cost must stay ~flat while the rewrite cost grows with
the file. Also verifies content equality between both paths.

Usage: PYTHONPATH=/root/repo python scripts/dv_stress.py [rows...]
"""
from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from end_to_end_azure_databricks_data_engineering_project_spark.session import get_spark
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

SIZES = [int(x) for x in sys.argv[1:]] or [200_000, 800_000, 3_200_000]

spark = get_spark("dv_stress", cpus=16, shuffle_partitions=16)


def _tree_bytes(p: Path) -> int:
    return sum(f.stat().st_size for f in p.rglob("*") if f.is_file())


def run(n: int) -> None:
    root = Path(tempfile.mkdtemp(prefix="dv_stress_"))
    try:
        base = spark.range(n).select(
            F.col("id").alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("a"),
            F.sha2(F.col("id").cast("string"), 256).alias("b"),
        )
        results = {}
        for mode in ("dv", "rewrite"):
            t = Catalog(spark, root).table(f"t_{mode}")
            t.overwrite(base.coalesce(1))
            if mode == "rewrite":
                t.dv_max_rows = 0  # force the old whole-file path
            bytes0 = _tree_bytes(t.dir)
            t0 = time.perf_counter()
            v = t.delete_where(f"k = {n // 2}")
            wall = time.perf_counter() - t0
            assert v is not None
            written = _tree_bytes(t.dir) - bytes0
            m = t._manifest(v)
            took_dv = bool(m.get("dv_added"))
            assert took_dv == (mode == "dv"), (mode, m)
            results[mode] = (wall, written)
            assert t.read().count() == n - 1
        dv_w, dv_b = results["dv"]
        rw_w, rw_b = results["rewrite"]
        print(
            f"rows={n:>9,}  dv: {dv_w:6.2f}s {dv_b:>12,}B   "
            f"rewrite: {rw_w:6.2f}s {rw_b:>12,}B   "
            f"bytes_ratio={rw_b / max(dv_b, 1):8.1f}x",
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


for n in SIZES:
    run(n)
print("content equality asserted per run; DV bytes must stay ~flat")
