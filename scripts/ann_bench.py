"""Controlled, committable ANN-family timing (r14; VERDICT r13 item 1).

One entry per PROCESS (cold JVM, like the driver's bench), with:
  - steal/load markers before and after (the r12/r13 contamination guard),
  - build time (DataFrame construction: py4j + analysis) vs run1 (cold
    execution) vs run2 (warm execution) split,
  - the Spark JOB COUNT of run1 via a job group + statusTracker — the
    fit-chain metric VERDICT r13 asked to track.

Usage:
  python scripts/ann_bench.py <entry> [sf_dir]     # one JSON line
  for e in ann_topk_ivf ann_topk_ivfpq ann_topk_pq ann_topk_srp; do
      python scripts/ann_bench.py $e; done

The timed region computes from the parquet inputs every run — no
cross-run caching; the noop sink forces full execution (guide §1.4).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from end_to_end_azure_databricks_data_engineering_project_spark.plans.queries import CATALOG
from end_to_end_azure_databricks_data_engineering_project_spark.session import get_spark


def _load_marker() -> dict:
    try:
        la1, _, _ = os.getloadavg()
    except OSError:
        la1 = -1.0
    steal_s = -1.0
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        if parts and parts[0] == "cpu" and len(parts) > 8:
            steal_s = int(parts[8]) / os.sysconf("SC_CLK_TCK")
    except (OSError, ValueError):
        pass
    return {"loadavg_1m": round(la1, 2), "steal_cum_s": round(steal_s, 1)}


def main() -> None:
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    q = CATALOG[name]
    spark = get_spark(f"ann_bench_{name}")
    sc = spark.sparkContext
    # warmup: JVM, codegen, parquet reader (same as bench.py — measures
    # the entry, not the JVM cold start)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    before = _load_marker()
    t0 = time.perf_counter()
    df = q.spark(spark, sf_dir)  # build: py4j calls + any driver-side fit
    t_build = time.perf_counter() - t0
    sc.setJobGroup(f"{name}_run1", f"ann_bench {name} run1")
    t0 = time.perf_counter()
    df.write.mode("overwrite").format("noop").save()
    t_run1 = time.perf_counter() - t0
    jobs_run1 = len(sc.statusTracker().getJobIdsForGroup(f"{name}_run1"))
    # NOTE: entries whose BUILD phase executes Spark jobs (the ANN fits
    # collect centroids/codebooks while constructing the DataFrame) do
    # that work under the default group; count it separately:
    sc.setJobGroup(f"{name}_build2", f"ann_bench {name} rebuild")
    t0 = time.perf_counter()
    df2 = q.spark(spark, sf_dir)  # warm rebuild (codegen/plan caches hot)
    t_build2 = time.perf_counter() - t0
    jobs_build2 = len(sc.statusTracker().getJobIdsForGroup(f"{name}_build2"))
    sc.setJobGroup(f"{name}_run2", f"ann_bench {name} run2")
    t0 = time.perf_counter()
    df2.write.mode("overwrite").format("noop").save()
    t_run2 = time.perf_counter() - t0
    jobs_run2 = len(sc.statusTracker().getJobIdsForGroup(f"{name}_run2"))
    after = _load_marker()

    print(json.dumps({
        "entry": name,
        "sf_dir": sf_dir,
        "build_s": round(t_build, 3),
        "run1_s": round(t_run1, 3),
        "build2_s": round(t_build2, 3),
        "run2_s": round(t_run2, 3),
        "total_cold_s": round(t_build + t_run1, 3),
        "total_warm_s": round(t_build2 + t_run2, 3),
        "jobs_run1": jobs_run1,
        "jobs_build2": jobs_build2,
        "jobs_run2": jobs_run2,
        "load_before": before,
        "load_after": after,
        "steal_delta_s": round(after["steal_cum_s"] - before["steal_cum_s"], 1)
        if before["steal_cum_s"] >= 0 and after["steal_cum_s"] >= 0 else -1.0,
    }))


if __name__ == "__main__":
    main()
