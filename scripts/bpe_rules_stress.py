"""bpe_encode at production rule counts (round-11 item: VERDICT r10 #7).

``SCALE_STRESS`` had only ever measured corpus scaling at ~4 learned
rules. Measuring the RULE-COUNT axis found a real scale bug: the
chunked native replace chain (``_APPLY_CHUNK`` stacked selects) gets
FUSED back into one generated evaluator by whole-stage codegen, so
runtime expression depth is ~n_rules regardless of plan structure —
java.lang.StackOverflowError in executor tasks at 1024 rules. The fix
(r11): past ``_NATIVE_APPLY_MAX`` (256) rules ``bpe_encode`` replays
the merges in ONE Arrow-batched ``mapInPandas`` pass over the
distinct-word relation (vocab-sized Python cost, byte-identical greedy
single-scan semantics — cross-path parity asserted in tests).

This harness measures encode wall at 64 → 8192 rules (first 8 rules
learned from the corpus so real merges happen; the tail synthetic
non-matching pairs, what a big vocabulary's long tail looks like to
the replay). Pass criteria: wall grows ~linearly in rules across the
strategy switch, token counts stable, no failures at 8192.

Usage: PYTHONPATH=/root/repo python scripts/bpe_rules_stress.py [sf_dir]
"""
from __future__ import annotations

import json
import sys
import time
from pathlib import Path

from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from end_to_end_azure_databricks_data_engineering_project_spark.operators.bpe import (
    bpe_encode,
    bpe_learn_merges,
)
from end_to_end_azure_databricks_data_engineering_project_spark.plans.queries import _t
from end_to_end_azure_databricks_data_engineering_project_spark.session import get_spark

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

spark = get_spark("bpe_rules_stress", cpus=16, shuffle_partitions=16)
docs = _t(spark, SF, "documents").select("doc_id", "text")
docs.cache().count()

learned = bpe_learn_merges(docs, n_merges=8).collect()
n_real = len(learned)


def rules_df(n: int):
    rows = [tuple(r) for r in learned[:n]]
    # synthetic long tail: boundary-padded pairs that never occur in the
    # corpus — each still costs one replace pass per word
    rows += [
        (i + 1, f"q{i}", f"z{i}", 1)
        for i in range(len(rows), n)
    ]
    return spark.createDataFrame(
        rows, "merge_rank int, lhs string, rhs string, pair_count bigint"
    )


results = []
for n in (64, 256, 1024, 8192):
    rules = rules_df(n)
    t0 = time.perf_counter()
    enc = bpe_encode(docs, rules)
    build = time.perf_counter() - t0
    t0 = time.perf_counter()
    enc.write.mode("overwrite").format("noop").save()
    run = time.perf_counter() - t0
    n_tokens = enc.count()
    results.append({
        "rules": n,
        "build_sec": round(build, 3),
        "exec_sec": round(run, 3),
        "total_sec": round(build + run, 3),
        "ms_per_rule": round(1000 * (build + run) / n, 2),
        "tokens": n_tokens,
    })
    print(json.dumps(results[-1]), flush=True)

print("\nsummary (real merges: %d):" % n_real)
for r in results:
    print(f"  rules={r['rules']:5d} build={r['build_sec']:7.2f}s "
          f"exec={r['exec_sec']:7.2f}s total={r['total_sec']:7.2f}s "
          f"({r['ms_per_rule']} ms/rule) tokens={r['tokens']}")
base = results[0]
top = results[-1]
ratio = (top["total_sec"] / top["rules"]) / (base["total_sec"] / base["rules"])
print(f"per-rule cost at {top['rules']} vs {base['rules']} rules: {ratio:.2f}x "
      "(~1 = linear; >2 = super-linear blowup)")
