"""Plan-quality audit: dump the formatted physical plan of every catalog
query and check scale invariants mechanically:

 - filters on base columns appear as PushedFilters at the parquet scan;
 - dim joins (nation/region/customer/supplier/part vs a fact) are
   broadcast, never sort-merge;
 - scans read pruned schemas (no full-width reads when the query
   projects a subset);
 - no CartesianProduct except where the query is intentionally pairwise
   or a 1-row scalar broadcast — the ALLOW_CARTESIAN set below is the
   authoritative list.

Usage: python scripts/explain_audit.py [sf_dir]  (writes PLANS.md)
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from end_to_end_azure_databricks_data_engineering_project_spark.plans.queries import CATALOG
from end_to_end_azure_databricks_data_engineering_project_spark.session import get_spark

ALLOW_CARTESIAN = {
    "ngram_jaccard_pairs", "embedding_near_dup", "cosine_topk",
    "scalar_subquery", "ann_topk_srp",
    # 1-row broadcast relation carrying the SRP hyperplane set (r13:
    # similarity._with_tables — the ivf centroid pattern applied to
    # banding; the literal form cost a py4j call per plane element).
    "embedding_near_dup_srp",
    # 1-row scalar broadcasts (a global aggregate cross-joined onto the
    # plan as a single row), not scan cross products.
    "funnel_conversion",
    "tfidf_top_terms",
    # 1-row broadcast relations carrying model state: the k-means
    # centroid array (kept out of the expression tree on purpose — see
    # operators/ivf.py module docstring) and the bigram vocabulary size.
    "ann_topk_ivf",
    "semantic_dedup_pairs",
    "bigram_lm_score",
    # nodes x 1-row node-count relation in the PageRank teleport term.
    "neardup_graph_pagerank",
    # k-means centroid 1-row broadcast feeding the cluster quota.
    "cluster_balanced_sample",
    # corpus doc-count 1-row broadcast in the lift denominator.
    "token_cooccurrence_lift",
    # two 1-row aggregates (observed vs expected agreement) crossed to
    # finish kappa — scalar broadcast, not a scan product.
    "cohens_kappa",
    # the eval's ranked list comes from the cosine_topk shape: 10
    # broadcast queries non-equi-joined onto the corpus (the corpus
    # never shuffles) — same designed BNLJ as cosine_topk/ann_topk_srp.
    "retrieval_eval_mrr",
    "retrieval_eval_universe",  # same brute_force_topk scalar broadcast
    # 1-row bloom-bitmap relation broadcast onto the corpus scan.
    "bloom_decontaminate",
    # broadcast-queries pattern (tiny labeled query slice, same shape
    # as cosine_topk) — the corpus side never shuffles.
    "knn_label_predict",
    # 1-row max-weight scalar broadcast feeding the Bernoulli draw.
    "weighted_sample",
    # 1-row broadcasts: (n_rows, n_keys) totals onto the top-5 keys.
    "skew_key_report",
    # 1-row broadcasts: order count N in the lift denominator.
    "market_basket_pairs",
    # 1-row x 1-row assembly of the final report row (estimate,
    # merge-equality flag, exact distinct) — nothing corpus-sized.
    "hll_distinct_merge",
    # 1-row x 1-row assembly (quantile estimates + merge-equality flag).
    "quantile_hist_merge",
    # 1-row digit-count total broadcast onto the 9 digit rows.
    "benford_first_digit",
    # 1-row broadcast codebook attach (fit/encode) + broadcast-queries
    # ADC join (same shape as cosine_topk) — corpus never shuffles.
    "ann_topk_pq",
    # broadcast-anchors pattern with a label-inequality join condition
    # (same shape as cosine_topk/knn_label_predict).
    "hard_negative_mining",
    # 1-row broadcast coarse-centroid + codebook attaches on the QUERY
    # side; the candidate join itself is a broadcast hash equi-join on
    # the coarse cluster key.
    "ann_topk_ivfpq",
    # 1-row (n_src, n_tgt) totals broadcast onto the bucket stats.
    "dsir_importance_select",
    # 1-row (N, total-tokens) corpus stats broadcast onto the tf stream.
    "bm25_topk",
    # 1-row sqrt-weight denominator broadcast onto the n_sources quotas.
    "temperature_mixture_sample",
    # 1-row (cap, n_total) sketch-metadata broadcasts onto the retained
    # rows (build + merge recap + the in-query merged==union audit) —
    # the house model-state pattern, never corpus x corpus.
    "adaptive_quantile_sketch",
}
EXPECT_PUSHDOWN = {
    "watermark_filter", "in_predicate", "null_predicate", "pricing_summary",
    "rowcount_gate", "like_filter",
}
EXPECT_BROADCAST = {
    "star_join_revenue", "broadcast_dim_join", "topk_customers",
    "rollup_hierarchy", "topk_per_group", "date_arithmetic",
}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("explain-audit", cpus=8, shuffle_partitions=8,
                      extra_conf={"spark.driver.memory": "8g"})
    jvm_mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    failures: list[str] = []
    lines_out: list[str] = ["# PLANS — formatted physical plans (sf0.01)\n"]
    for name, q in sorted(CATALOG.items()):
        df = q.spark(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(jvm_mode)
        lines_out += [f"\n## {name}\n", "```", plan.rstrip(), "```"]
        if name in EXPECT_PUSHDOWN and not re.search(r"PushedFilters: \[(?!\])", plan):
            failures.append(f"{name}: expected non-empty PushedFilters")
        if name in EXPECT_BROADCAST and "BroadcastHashJoin" not in plan:
            failures.append(f"{name}: expected BroadcastHashJoin")
        if name in EXPECT_BROADCAST and "SortMergeJoin" in plan:
            failures.append(f"{name}: unexpected SortMergeJoin (dim should broadcast)")
        if "CartesianProduct" in plan and name not in ALLOW_CARTESIAN:
            failures.append(f"{name}: unexpected CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in ALLOW_CARTESIAN:
            failures.append(f"{name}: unexpected BroadcastNestedLoopJoin")

    with open("PLANS.md", "w") as f:
        f.write("\n".join(lines_out))
    if failures:
        print("PLAN AUDIT FAILURES:")
        for x in failures:
            print(" -", x)
        sys.exit(1)
    print(f"plan audit OK for {len(CATALOG)} queries → PLANS.md")


if __name__ == "__main__":
    main()
