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

# One representative per post-r6 operator family, timed and reported
# under "extended" WITHOUT entering "value": the headline total has
# been the same 11 queries since r1 and is what round-over-round (and
# the 2x-of-baseline bar) compares — growing it would read as a
# regression. Regressions in these families are now visible per-round
# instead of only in ad-hoc stress runs.
EXTENDED = [
    "ann_topk_ivfpq",      # ANN stack: IVF-PQ fit + ADC search
    "binary_auc_exact",    # eval metrics: bin-monoid AUC
    "bpe_learn_merges",    # tokenizer induction (4 merge rounds)
    "bpe_encode",          # tokenizer application (vocab replay + join-back)
    "interval_islands",    # interval algebra monoid
    # r10 table machinery: partitioned build + listing-time prune, and
    # the full delta-log round-trip (write ops + independent replay)
    "partition_prune_year",
    "delta_log_roundtrip",
    # r11 table machinery: bloom-index build + probe through a merge,
    # and the checkpoint-cadence + log-retention round-trip
    "merge_bloom_pruned",
    "delta_retention_roundtrip",
    # r11 predicate DML: stats-pruned DELETE+UPDATE rewrite + read-back
    "dml_delete_update",
]


def _drain_cycle_seconds(spark, sf_dir: str) -> float:
    """One full streaming-drain cycle (the r7/r8 exactly-once family):
    per-batch AUC bins -> run_auc_drain into a fresh ManagedTable ->
    finish auc_from_bins off the table. Temp-dir sandboxed; measures
    the drain protocol cost (OCC read, merge, overwrite, commit), not
    just the query plan."""
    import shutil
    import tempfile

    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import auc_from_bins
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import run_auc_drain

    root = tempfile.mkdtemp(prefix="bench_drain_")
    try:
        cat = Catalog(spark, root)
        batch = spark.read.parquet(f"{sf_dir}/embeddings.parquet").selectExpr(
            "CAST(floor(CAST(embedding[0] AS DOUBLE) * 1000) AS BIGINT) AS sbin",
            "label >= 5 AS is_pos",
        )
        t0 = time.perf_counter()
        run_auc_drain(cat, batch, epoch=1, score_bin_col="sbin",
                      positive_col="is_pos", binning="e1x1000")
        auc_from_bins(cat.table("auc_bins").read()).collect()
        return round(time.perf_counter() - t0, 3)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _ivfpq_split_seconds(spark, sf_dir: str) -> dict[str, float]:
    """Split the ivfpq chain's wall into what scale actually amortizes
    vs what every query pays (r11; verdict r10 #5): ``ann_topk_ivfpq``
    in EXTENDED stays the round-over-round comparable end-to-end
    number; this records
      ivfpq_fit          — coarse k-means + residual materialization +
                           PQ codebook fit (model TRAINING: one-time,
                           amortized across every later batch/query)
      ivfpq_encode_warm  — frozen-model corpus encode via
                           ``ivfpq_encode_with`` (the drain's
                           incremental-index path: the recurring
                           per-batch indexing cost)
      ivfpq_probe_warm   — ADC top-k against an already-materialized
                           index (the pure QUERY cost a serving
                           deployment pays)
    """
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.ivf import kmeans_fit
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.pq import (
        ivfpq_encode,
        ivfpq_encode_with,
        ivfpq_topk,
    )
    from end_to_end_azure_databricks_data_engineering_project_spark.plans.queries import _t

    emb = _t(spark, sf_dir, "embeddings")
    out: dict[str, float] = {}
    t0 = time.perf_counter()
    cents = kmeans_fit(emb, k=4, n_iter=2)
    encoded, cbs = ivfpq_encode(emb, cents, m=2, k_sub=4, n_iter=2, dim=64)
    out["ivfpq_fit"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    ivfpq_encode_with(emb, cents, cbs, dim=64).write.mode("overwrite").format(
        "noop"
    ).save()
    out["ivfpq_encode_warm"] = round(time.perf_counter() - t0, 3)
    index = encoded.localCheckpoint(eager=True)  # the persisted index stand-in
    t0 = time.perf_counter()
    ivfpq_topk(
        index, emb.filter("vec_id < 10"), cents, cbs, k=5, n_probe=2, dim=64
    ).write.mode("overwrite").format("noop").save()
    out["ivfpq_probe_warm"] = round(time.perf_counter() - t0, 3)
    return out


def _load_marker() -> dict:
    """Contamination guard for round-over-round comparisons: the r11
    headline drifted to 1.47x the r1 baseline on BYTE-IDENTICAL query
    code, i.e. ambient box load, not a regression. Recording loadavg
    and cpu count with every artifact lets a reviewer tell 'slow code'
    from 'busy box' without re-running."""
    try:
        la1, la5, la15 = os.getloadavg()
    except OSError:
        la1 = la5 = la15 = -1.0
    # CUMULATIVE host-steal seconds (/proc/stat field 8): on a VM the
    # guest's loadavg can't see hypervisor neighbors — a uniform
    # slowdown across byte-identical queries with low loadavg but a
    # large before→after steal DELTA is the box being throttled, not a
    # code regression (exactly the r11→r12 drift signature)
    steal_s = -1.0
    try:
        with open("/proc/stat") as fh:
            parts = fh.readline().split()
        if parts and parts[0] == "cpu" and len(parts) > 8:
            steal_s = int(parts[8]) / os.sysconf("SC_CLK_TCK")
    except (OSError, ValueError):
        pass
    return {
        "loadavg_1m": round(la1, 2),
        "loadavg_5m": round(la5, 2),
        "loadavg_15m": round(la15, 2),
        "cpus": os.cpu_count(),
        "steal_cum_s": round(steal_s, 1),
    }


def _measure(spark, sf_dir) -> tuple[dict, dict, dict]:
    """One full timing pass: (headline timings, extended timings,
    errors). One bad query must not zero out the whole artifact —
    record the per-query error, keep timing the survivors."""
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

    extended: dict[str, float] = {}
    for name in EXTENDED:
        q = CATALOG[name]
        t0 = time.perf_counter()
        try:
            q.spark(spark, sf_dir).write.mode("overwrite").format("noop").save()
            extended[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
    try:
        extended["auc_drain_cycle"] = _drain_cycle_seconds(spark, sf_dir)
    except Exception as exc:  # noqa: BLE001
        errors["auc_drain_cycle"] = f"{type(exc).__name__}: {exc}"[:300]
    try:
        extended.update(_ivfpq_split_seconds(spark, sf_dir))
    except Exception as exc:  # noqa: BLE001
        errors["ivfpq_split"] = f"{type(exc).__name__}: {exc}"[:300]
    return timings, extended, errors


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or 32)
    max_attempts = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RETRIES", "3")))
    # captured BEFORE the JVM starts: the only loadavg reading that is
    # not contaminated by the bench's own load
    load_initial = _load_marker()
    ambient_busy = load_initial["loadavg_1m"] > cpus / 4
    spark = get_spark("bench")

    # JVM/codegen/parquet-reader warmup (not a headline query)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    # quiet-box GATE (r13; the r12 artifact of record was a 23.8 s-steal
    # contaminated run): a pass whose before→after hypervisor-steal
    # delta exceeds ~2 s — or whose pre-JVM loadavg says the box was
    # already busy — is re-measured, up to max_attempts. Later attempts
    # gate on steal only: our own finished pass inflates loadavg_1m for
    # minutes, so it can't distinguish ambient load from self-load.
    attempt = 0
    # r14 (additions-only, VERDICT r13 item 3): record EVERY attempt's
    # headline/extended totals so round-over-round comparisons can match
    # protocol with protocol — r13 reported a 3rd warm pass while r12
    # reported a 1st, which inflated the apparent speedup. The gated
    # figure stays the artifact of record; "attempt_values" +
    # "first_attempt_value"/"first_attempt_queries" restore a
    # like-for-like first-pass comparison without changing the contract.
    attempt_values: list[dict] = []
    first_queries: dict[str, float] = {}
    while True:
        attempt += 1
        load_before = _load_marker() if attempt > 1 else load_initial
        timings, extended, errors = _measure(spark, sf_dir)
        load_after = _load_marker()
        sb, sa = load_before["steal_cum_s"], load_after["steal_cum_s"]
        steal_delta = round(sa - sb, 1) if sb >= 0 and sa >= 0 else -1.0
        quiet = 0 <= steal_delta <= 2.0 and not (attempt == 1 and ambient_busy)
        attempt_values.append({
            "value": round(sum(timings.values()), 3),
            "extended_total": round(sum(extended.values()), 3),
            "steal_delta_s": steal_delta,
            "quiet": quiet,
        })
        if attempt == 1:
            first_queries = dict(timings)
        if quiet or attempt >= max_attempts:
            break

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline query suite wall-clock (noop sink, full execution)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        # post-r6 family representatives: timed, NOT in "value" (the
        # headline total compares round-over-round; see EXTENDED note)
        "extended": extended,
        "extended_total": round(sum(extended.values()), 3),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # quiet-box protocol (r12/r13): the artifact of record is BY
        # CONSTRUCTION a gated quiet run (quiet=true) unless every
        # attempt measured steal — then quiet=false marks the total as
        # not comparable round-over-round
        "load_before": load_before,
        "load_after": load_after,
        "steal_delta_s": steal_delta,
        "quiet": quiet,
        "attempts": attempt,
        # additions-only (r14): per-attempt totals + the first attempt's
        # per-query timings, restoring cross-round first-pass
        # comparability (the gated figure above stays the artifact of
        # record; see the attempt loop comment)
        "attempt_values": attempt_values,
        "first_attempt_value": attempt_values[0]["value"],
        "first_attempt_queries": first_queries,
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
