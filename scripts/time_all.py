"""Time EVERY catalog entry at a given SF with the noop sink (guide §1.4)
— the optimization round's full-coverage measurement pass. Unlike
bench.py (the driver-contract artifact, 11 headline + extended), this
times all 206 entries once each, labels jobs, and records the same
steal/load contamination markers so slow entries can be told apart from
a stolen box.

Usage: python scripts/time_all.py [sf_dir] [out_json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, ".")

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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/time_all.json"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    spark = get_spark("time_all")
    # warmup: JVM, codegen, parquet reader
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    results: dict[str, dict] = {}
    for q in CATALOG.values():
        if only and q.name not in only:
            continue
        spark.sparkContext.setJobDescription(f"time_all: {q.name}")
        before = _load_marker()
        t0 = time.perf_counter()
        try:
            q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
            sec = round(time.perf_counter() - t0, 3)
            err = None
        except Exception as exc:  # noqa: BLE001
            sec = round(time.perf_counter() - t0, 3)
            err = f"{type(exc).__name__}: {exc}"[:200]
        after = _load_marker()
        results[q.name] = {
            "sec": sec,
            "steal_delta_s": round(after["steal_cum_s"] - before["steal_cum_s"], 1)
            if before["steal_cum_s"] >= 0
            else -1.0,
        }
        if err:
            results[q.name]["err"] = err
        print(f"{q.name:32s} {sec:8.3f}s  steal+{results[q.name]['steal_delta_s']}", flush=True)
    total = round(sum(r["sec"] for r in results.values()), 3)
    out = {"sf_dir": sf_dir, "total": total, "entries": results}
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(f"TOTAL {total}s over {len(results)} entries -> {out_path}")


if __name__ == "__main__":
    main()
