"""Scale stress for the round-13 second-session features:

§1 Identity allocation — must stay a pure map-side expression: the
   append's physical plan may not gain an Exchange from the id
   assignment, and wall-clock must scale ~linearly with rows.
§2 COPY INTO — first run loads N files; the no-op re-run must cost
   only the listing + ledger read (no Spark job over data).
§3 Full-scope merge (WHEN NOT MATCHED BY SOURCE) vs pruned merge —
   the pruned path stays O(touched files) while full-sync pays
   O(table) BY DESIGN (every target key is a deletion candidate);
   this section documents the measured gap so the trade is explicit.

Usage: python scripts/idgen_copy_stress.py
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.session import get_spark
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

spark = get_spark("feature_stress", cpus=16, shuffle_partitions=16,
                  extra_conf={"spark.driver.memory": "24g"})


def timed(fn):
    t0 = time.monotonic()
    out = fn()
    return time.monotonic() - t0, out


print("§1 identity allocation (map-side, shuffle-free)")
d = tempfile.mkdtemp()
cat = Catalog(spark, d + "/wh")
cat.sql(
    "CREATE TABLE ids (id BIGINT GENERATED ALWAYS AS IDENTITY, "
    "k BIGINT, x DOUBLE)"
)
t = cat.table("ids")
# plan probe: the policy-applied frame must add NO Exchange beyond the
# source's own shape
probe = spark.range(0, 1000).select(
    F.col("id").alias("k"), (F.col("id") * 1.0).alias("x")
)
applied, _fin = t._apply_column_policies(probe)
plan = applied._jdf.queryExecution().executedPlan().toString()
n_exch = plan.count("Exchange")
print(f"  plan Exchanges added by identity fill: {n_exch} (source had 0)")
assert n_exch == 0, plan
for n in (1_000_000, 4_000_000, 16_000_000):
    rows = spark.range(0, n).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("x")
    )
    secs, v = timed(lambda: t.append(rows))
    distinct = t.read().select(F.countDistinct("id")).collect()[0][0]
    total = t.read().count()
    assert distinct == total, (distinct, total)
    print(f"  rows={n:>12,}  append+allocate: {secs:6.2f}s  "
          f"ids distinct: {distinct:,} == rows: {total:,}")
shutil.rmtree(d)

print("§2 COPY INTO (file-level exactly-once; no-op re-run cost)")
d = tempfile.mkdtemp()
landing = d + "/landing"
spark.range(0, 2_000_000).select(
    F.col("id").alias("k"), (F.col("id") * 1.0).alias("x")
).repartition(256).write.parquet(landing)
cat = Catalog(spark, d + "/wh")
secs1, res1 = timed(lambda: cat.table("tgt").copy_into(landing))
secs2, res2 = timed(lambda: cat.table("tgt").copy_into(landing))
print(f"  first run : {secs1:6.2f}s  files={res1['num_files_loaded']} "
      f"rows={res1['num_rows_loaded']:,}")
print(f"  no-op run : {secs2:6.2f}s  files={res2['num_files_loaded']} "
      f"(listing + ledger only — no Spark job)")
assert res2["num_files_loaded"] == 0
shutil.rmtree(d)

print("§3 full-scope merge (BY SOURCE delete) vs pruned merge")
d = tempfile.mkdtemp()
cat = Catalog(spark, d + "/wh")
t = cat.table("dim")
t.overwrite(
    spark.range(0, 4_000_000).select(
        F.col("id").alias("k"), (F.col("id") * 1.0).alias("x")
    ).repartitionByRange(64, "k").sortWithinPartitions("k")
)
batch = spark.range(0, 1000).select(
    F.col("id").alias("k"), F.lit(-1.0).alias("x")
)
secs_pruned, _ = timed(lambda: t.merge_keyed(
    batch, ["k"],
    lambda cur, b: cur.join(b.select("k"), "k", "left_anti").unionByName(b),
))
full_src = spark.range(0, 3_900_000).select(
    F.col("id").alias("k"), (F.col("id") * 2.0).alias("x")
)
secs_full, _ = timed(lambda: t.merge_keyed(
    full_src, ["k"], lambda cur, b: b, full_scope=True,
))
n = t.read().count()
print(f"  pruned merge (1k keys of 4M): {secs_pruned:6.2f}s — O(touched)")
print(f"  full-sync merge (drop 100k) : {secs_full:6.2f}s — O(table), "
      f"inherent to NOT-MATCHED-BY-SOURCE; result rows={n:,}")
assert n == 3_900_000
shutil.rmtree(d)
print("FEATURE STRESS OK")
