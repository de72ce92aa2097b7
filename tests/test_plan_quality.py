"""Plan-shape regression tests for headline catalog queries: the scale
properties (pushdown, broadcast dims, no accidental cartesians) must
hold in CI, not just in the per-round explain-audit artifact."""

from __future__ import annotations

import re

import pytest

from end_to_end_azure_databricks_data_engineering_project_spark.plans.queries import CATALOG

SF_DIR = "/root/testdata/sf0.001"


def _plan(spark, name: str) -> str:
    df = CATALOG[name].spark(spark, SF_DIR)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


@pytest.mark.parametrize(
    "name", ["watermark_filter", "pricing_summary", "in_predicate", "like_filter"]
)
def test_filters_push_to_scan(spark, name):
    assert re.search(r"PushedFilters: \[(?!\])", _plan(spark, name)), (
        f"{name}: filter must reach the parquet scan"
    )


@pytest.mark.parametrize(
    "name", ["star_join_revenue", "broadcast_dim_join", "topk_customers",
             "null_safe_join"]
)
def test_dim_joins_broadcast(spark, name):
    plan = _plan(spark, name)
    assert "BroadcastHashJoin" in plan, f"{name}: dims must broadcast"
    assert "SortMergeJoin" not in plan, (
        f"{name}: a dim join fell back to SortMergeJoin"
    )


@pytest.mark.parametrize(
    "name",
    ["minhash_signatures", "doc_fingerprint_dedup", "sessionize",
     "latest_per_key", "feature_hash_tf", "lexical_diversity"],
)
def test_no_accidental_cartesian(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name}: unexpected cartesian"
    assert "BroadcastNestedLoopJoin" not in plan, f"{name}: unexpected BNLJ"


def test_projection_prunes_scan(spark):
    # project_drop drops columns: the scan must read the pruned schema,
    # not the table's full 11-column lineitem width
    plan = _plan(spark, "project_drop")
    m = re.search(r"ReadSchema: struct<([^>]*)>", plan)
    assert m, "scan should expose ReadSchema"
    read_cols = [c.split(":")[0] for c in m.group(1).split(",") if c]
    out_cols = CATALOG["project_drop"].spark(spark, SF_DIR).columns
    assert 0 < len(read_cols) <= len(out_cols), (read_cols, out_cols)


def test_srp_banding_keeps_vectors_out_of_explode(spark):
    # ann_topk_srp's banded explode must not carry the 64-float vector
    plan = _plan(spark, "ann_topk_srp")
    gen = [l for l in plan.splitlines() if "explode(" in l]
    assert gen, "expected an explode in the SRP plan"
    assert not any("embedding" in l for l in gen), (
        "the embedding vector must not ride the banded explode"
    )


@pytest.mark.parametrize(
    "name",
    ["sorted_neighborhood_pairs", "time_weighted_average",
     "divergent_tokens_chi2", "grouped_dataset_split"],
)
def test_round9_entries_no_cartesian(spark, name):
    plan = _plan(spark, name)
    assert "CartesianProduct" not in plan, f"{name}: unexpected cartesian"
    # divergent_tokens' 1-row totals relation rides an explicit
    # broadcast; anything else nested-loop-joining is a regression
    if name != "divergent_tokens_chi2":
        assert "BroadcastNestedLoopJoin" not in plan, f"{name}: unexpected BNLJ"


@pytest.mark.parametrize(
    "name", ["sorted_neighborhood_pairs", "time_weighted_average",
             "divergent_tokens_chi2"],
)
def test_round9_single_corpus_scan(spark, name):
    # these are one-pass operators: the input table must be scanned
    # exactly once (a second scan means a lost cache/reuse and doubles
    # the 100 TB bill)
    plan = _plan(spark, name)
    # formatted explain prints each node twice (tree line + detail
    # header) — count the numbered detail headers only
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.M)
    assert len(scans) == 1, f"{name}: input scanned more than once"


def test_integrity_fk_probes_broadcast(spark):
    # every FK orphan probe must broadcast the parent key set: the
    # child (fact) side may never shuffle for a referential check
    plan = _plan(spark, "integrity_report_tpch")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan, "an FK probe fell back to SortMergeJoin"


def test_retrieval_eval_broadcasts_eval_relations(spark):
    # ranked topk broadcasts queries; the relevance join broadcasts the
    # eval-sized relevance set — the corpus never shuffles
    plan = _plan(spark, "retrieval_eval_mrr")
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_bpe_encode_prunes_scan_and_avoids_cartesian(spark):
    # the encode slice's doc_id predicate must reach the parquet scan
    # (at 100 TB the tokenizer runs on a curated subset — the filter
    # must prune files, not rows post-scan), and nothing in the
    # vocab-replay join-back may degenerate to a cartesian
    plan = _plan(spark, "bpe_encode")
    assert re.search(r"PushedFilters: \[.*doc_id.*\]", plan), (
        "doc_id slice must push into the scan"
    )
    assert "CartesianProduct" not in plan


def test_pr_curve_single_scan_no_joins(spark):
    # PR finisher = one scan + bounded-relation windows; a join or a
    # second scan means the bin monoid was recomputed
    plan = _plan(spark, "pr_curve")
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.M)
    assert len(scans) == 1
    assert "Join" not in plan


def test_threshold_metrics_single_scan_no_joins(spark):
    plan = _plan(spark, "threshold_metrics")
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.M)
    assert len(scans) == 1
    assert "Join" not in plan


def test_grouped_auc_no_single_partition_funnel(spark):
    # the whole point of the grouped finisher: the cumulative window is
    # partitioned by segment — a SinglePartition exchange means sliced
    # eval funnels through one task like the global finisher
    plan = _plan(spark, "auc_by_segment")
    assert "SinglePartition" not in plan
    scans = re.findall(r"^\(\d+\) Scan parquet", plan, re.M)
    assert len(scans) == 1
