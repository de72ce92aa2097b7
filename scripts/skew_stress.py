"""Adversarial skew stress (round-8 item: hot-key evidence).

Reference shape: FactStream's hot user (initial_load.sql:45-53 — a few
users generate most stream events). Two experiments at >= 10x the sf0.1
fact size, zipfian keys with ONE key owning 50% of all rows:

1. latest-per-key under window skew: plain single-phase window
   (transforms.dedup_keep_latest) vs the two-phase
   skew.salted_latest_per_key. FINDING (r8): on Spark >= 3.5 the plain
   form gets a Partial WindowGroupLimit below the exchange (asserted
   below), pre-reducing every map partition to 1 row/key — the hot key
   never concentrates on one reducer and plain BEATS salted (whose
   second shuffle is pure overhead). The harness verifies both the
   plan node and the identical surviving set; salted remains the
   documented two-phase pattern for window shapes pushdown can't
   pre-reduce.
2. skewed fact-fact equi-join with AQE skew-join splitting ON vs OFF
   (spark.sql.adaptive.skewJoin.enabled) — the join case AQE does
   cover. Same row counts either way.

Usage: PYTHONPATH=/root/repo python scripts/skew_stress.py [n_rows]
Default n_rows = 2,000,000 (~10x the sf0.1 lineitem row count).
"""
from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.skew import salted_latest_per_key
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.transforms import dedup_keep_latest
    from end_to_end_azure_databricks_data_engineering_project_spark.session import get_spark

    spark = get_spark("skew_stress")
    spark.range(1).count()

    # zipfian-ish keys: key 0 owns 50% of rows; the rest spread over 10k
    # keys (deterministic arithmetic, no RNG — same data every run)
    base = spark.range(n).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(10_000)) + 1)
        .alias("user_id"),
        F.col("id").alias("seq"),
        (F.col("id") % 97).alias("payload"),
    )
    base = base.persist()
    print(f"rows={base.count():,}  hot-key share=50%")

    # the reason plain survives the hot key: Partial WindowGroupLimit
    # below the exchange (map-side 1-row-per-key pre-reduction)
    plan = dedup_keep_latest(base, ["user_id"], "seq")._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan and "Partial" in plan, "rank-limit pushdown missing"
    print("plain plan has Partial WindowGroupLimit (map-side skew kill): OK")

    t0 = time.time()
    plain = dedup_keep_latest(base, ["user_id"], "seq").count()
    t1 = time.time()
    salted = salted_latest_per_key(base, ["user_id"], "seq", n_salt=32).count()
    t2 = time.time()
    print(f"latest_per_key plain-window  {t1 - t0:7.2f}s  n={plain}")
    print(f"latest_per_key salted(32)    {t2 - t1:7.2f}s  n={salted}")
    assert plain == salted, (plain, salted)

    # equality of the actual surviving rows, not just counts
    a = dedup_keep_latest(base, ["user_id"], "seq").select("user_id", "seq")
    b = salted_latest_per_key(base, ["user_id"], "seq").select("user_id", "seq")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    print("salted == plain surviving set: OK")

    # --- skewed fact-fact join, AQE skew split on vs off ---
    probe = spark.range(n // 4).select(
        F.when(F.col("id") % 2 == 0, F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id", F.lit(1)), F.lit(10_000)) + 1)
        .alias("user_id"),
        (F.col("id") % 31).alias("w"),
    ).persist()
    probe.count()

    def join_count() -> tuple[float, int]:
        t = time.time()
        c = (
            base.join(probe.groupBy("user_id").agg(F.sum("w").alias("tw")), "user_id")
            .groupBy("payload").agg(F.count(F.lit(1)).alias("c"), F.sum("tw").alias("s"))
            .count()
        )
        return time.time() - t, c

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    el_off, c_off = join_count()
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # force the skew splitter to see our sizes as skewed at local scale
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "8MB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
    el_on, c_on = join_count()
    print(f"skewed join AQE-skew OFF     {el_off:7.2f}s  groups={c_off}")
    print(f"skewed join AQE-skew ON      {el_on:7.2f}s  groups={c_on}")
    assert c_off == c_on

    base.unpersist()
    probe.unpersist()


if __name__ == "__main__":
    main()
