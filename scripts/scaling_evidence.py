"""Core-scaling evidence at a LARGER scale factor (r14; VERDICT r13
item 7): run the 11 headline queries once on a ~sf1-sized input (built
by scripts/make_scale_data.py) at a given core count, with steal/load
markers and a count of single-partition-window warnings, so the
0.78-1.47 8-vs-32-core ratios measured at sf0.1 can be attributed to
per-query fixed cost rather than a hidden serial stage — and so the
"fixed ≤62-row window domains stay fixed" claim is checked on data 10x
larger.

Usage: SPARK_GRAFT_CPUS=32 python scripts/scaling_evidence.py /tmp/sfscale out.json
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from end_to_end_azure_databricks_data_engineering_project_spark.plans.queries import CATALOG
from end_to_end_azure_databricks_data_engineering_project_spark.session import get_spark

HEADLINE = [
    "pricing_summary", "star_join_revenue", "broadcast_dim_join",
    "topk_customers", "window_running_sum", "latest_per_key",
    "sessionize", "scd2_history", "doc_fingerprint_dedup",
    "minhash_signatures", "cosine_topk",
]


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
    sf_dir = sys.argv[1]
    out_path = sys.argv[2]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or 32)
    spark = get_spark("scaling_evidence")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # FULL-scan warmup (noop sink), not count(): parquet count() reads
    # only row-group metadata, so the first timed query would otherwise
    # pay the cold page-cache read of the whole table and the
    # core-count comparison would measure disk, not compute
    for t in ("lineitem", "orders", "customer", "events", "documents",
              "embeddings"):
        spark.read.parquet(f"{sf_dir}/{t}.parquet").write.mode(
            "overwrite"
        ).format("noop").save()
    before = _load_marker()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spark.sparkContext.setJobDescription(f"scaling: {name}")
        t0 = time.perf_counter()
        CATALOG[name].spark(spark, sf_dir).write.mode("overwrite").format(
            "noop"
        ).save()
        timings[name] = round(time.perf_counter() - t0, 3)
    after = _load_marker()
    out = {
        "sf_dir": sf_dir,
        "cpus": cpus,
        "queries": timings,
        "total": round(sum(timings.values()), 3),
        "load_before": before,
        "load_after": after,
        "steal_delta_s": round(after["steal_cum_s"] - before["steal_cum_s"], 1)
        if before["steal_cum_s"] >= 0 and after["steal_cum_s"] >= 0 else -1.0,
    }
    with open(out_path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
