"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": <total sec>, "unit": "sec",
   "queries": {"<name>": sec, ...}, "sf": <sf>}

Each query is forced end-to-end with a noop sink (full execution, no
driver collect cost). Headliners cover the engine's load-bearing plans:
scan+agg, star join, window, CDC/SCD shapes, text dedup, similarity.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from end_to_end_azure_databricks_data_engineering_project_spark.plans.queries import CATALOG
from end_to_end_azure_databricks_data_engineering_project_spark.session import get_spark

HEADLINE = [
    "pricing_summary",
    "star_join_revenue",
    "broadcast_dim_join",
    "topk_customers",
    "window_running_sum",
    "latest_per_key",
    "sessionize",
    "scd2_history",
    "doc_fingerprint_dedup",
    "minhash_signatures",
    "cosine_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("bench")

    # JVM/codegen/parquet-reader warmup (not a headline query)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # One bad query must not zero out the whole artifact: record the
    # per-query error, keep timing the survivors, still emit the JSON.
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for name in HEADLINE:
        q = CATALOG[name]
        t0 = time.perf_counter()
        try:
            q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001 — degrade, don't die
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline query suite wall-clock (noop sink, full execution)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    if errors:
        # Make a degraded artifact unmistakable: "value" sums only the
        # survivors, so flag partial coverage rather than letting a
        # broken round read as a speedup in round-over-round diffs.
        out["errors"] = errors
        out["partial"] = True
    print(json.dumps(out))


if __name__ == "__main__":
    main()
