"""Merge touched-file DISCOVERY at growing table size (round-11 item:
VERDICT r10 #1).

The r10 design flag: ``merge_keyed`` found touched files by scanning
EVERY file's key column through an input_file_name semi-join — correct,
column-pruned, but O(table) per incremental merge. Round 11 prunes the
candidate set first with the manifest's per-file min/max key stats
against the batch's key bounds (``_merge_candidate_files``), so on a
key-clustered table discovery opens only the files the batch's key
range intersects.

This harness grows a key-clustered dimension 32x in FILE COUNT (fixed
rows per file — the table itself grows 32x) while merging the same
narrow-key-range batch, and reports:

  files      — table file count before the merge
  candidates — files the stats pruning left for discovery to open
  touched    — files the semi-join then proved the batch actually hits
  merge_sec  — end-to-end merge_keyed wall (includes commit)

Pass criteria: candidates/touched stay ~constant while files grow 32x,
and merge wall stays ~flat (it tracks the BATCH + touched files, not
the table).

Usage: PYTHONPATH=/root/repo python scripts/merge_discovery_stress.py
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

from end_to_end_azure_databricks_data_engineering_project_spark.operators.cdc import scd1_merge
from end_to_end_azure_databricks_data_engineering_project_spark.session import get_spark
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

ROWS_PER_FILE = 20_000
BATCH_KEYS = 200  # narrow contiguous range: the clustered-layout sweet spot

spark = get_spark("merge_discovery_stress", cpus=16, shuffle_partitions=16)
root = Path(tempfile.mkdtemp(prefix="merge_disc_"))
results = []
try:
    for n_files in (64, 512, 2048):
        cat = Catalog(spark, root / f"wh{n_files}")
        t = cat.table("dim")
        n_rows = ROWS_PER_FILE * n_files
        base = spark.range(n_rows).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), (F.xxhash64("id") % 1000)).alias("val"),
            F.lit(0).alias("seq"),
        )
        t.overwrite(base.repartitionByRange(n_files, "k").sortWithinPartitions("k"))
        assert len(t.data_files()) == n_files
        batch = spark.range(BATCH_KEYS).select(
            (F.col("id") * 3).alias("k"),  # keys in [0, 600): ~1 file's range
            F.lit("updated").alias("val"),
            F.lit(1).alias("seq"),
        )
        res = t._resolve(t.current_version())
        cand = t._merge_candidate_files(res, batch, ["k"])
        t0 = time.perf_counter()
        t.merge_keyed(batch, ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"))
        wall = time.perf_counter() - t0
        m = t._manifest(t.current_version())
        assert t.read().filter("val = 'updated'").count() == BATCH_KEYS
        results.append({
            "files": n_files,
            "rows": n_rows,
            "candidates": len(cand) if cand is not None else n_files,
            "touched": len(m["removed"]),
            "merge_sec": round(wall, 3),
        })
        print(json.dumps(results[-1]), flush=True)
    # adversarial layout: HASH-clustered (every file spans the full key
    # range, min/max prunes nothing) + the bound per-file Bloom index —
    # blooms must pin discovery where ranges cannot. Bloom sizing rule:
    # ~bits/10 distinct values per file keeps FP ~1% per probed value
    # (a probe survives if ANY batch value false-positives, so undersized
    # blooms — bits << 10x rows/file — stop pruning); sized here for the
    # dimension-table shape the index targets.
    ROWS_PER_FILE_BLOOM = 2_000
    for n_files in (64, 512):
        cat = Catalog(spark, root / f"whb{n_files}")
        t = cat.table("dim")
        t.bind_bloom_filters(["k"], bits=65536)
        n_rows = ROWS_PER_FILE_BLOOM * n_files
        base = spark.range(n_rows).select(
            F.col("id").alias("k"),
            F.concat(F.lit("v"), (F.xxhash64("id") % 1000)).alias("val"),
            F.lit(0).alias("seq"),
        )
        t.overwrite(base.repartition(n_files, "k"))
        # FEW spread keys: hash routing puts each in a different file,
        # so the true touched set is ~n_bloom_keys of n_files — exactly
        # what blooms must recover and ranges cannot
        n_bloom_keys = 16
        batch = spark.range(n_bloom_keys).select(
            (F.col("id") * (n_rows // n_bloom_keys)).alias("k"),  # spread keys
            F.lit("updated").alias("val"),
            F.lit(1).alias("seq"),
        )
        res = t._resolve(t.current_version())
        t0 = time.perf_counter()
        cand = t._merge_candidate_files(res, batch, ["k"])
        disc = time.perf_counter() - t0
        t0 = time.perf_counter()
        t.merge_keyed(batch, ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"))
        wall = time.perf_counter() - t0
        m = t._manifest(t.current_version())
        assert t.read().filter("val = 'updated'").count() == n_bloom_keys
        results.append({
            "layout": "hash+bloom",
            "files": n_files,
            "rows": n_rows,
            "candidates": len(cand) if cand is not None else n_files,
            "touched": len(m["removed"]),
            "probe_sec": round(disc, 3),
            "merge_sec": round(wall, 3),
        })
        print(json.dumps(results[-1]), flush=True)
finally:
    shutil.rmtree(root, ignore_errors=True)

print("\nsummary:")
for r in results:
    print(f"  layout={r.get('layout', 'range-clustered'):15s} files={r['files']:5d} "
          f"rows={r['rows']:9d} candidates={r['candidates']:4d} "
          f"touched={r['touched']:4d} merge_sec={r['merge_sec']}")
