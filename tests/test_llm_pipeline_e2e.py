"""End-to-end LLM training-data pipeline over the real testdata: the
composition a 100 TB data team would actually run —

    documents → exact dedup → near-dup dedup (MinHash+CC survivors)
              → quality gates (rule report + per-language adaptive)
              → decontamination vs a held-out eval slice
              → temperature mixture sampling → sequence packing
    embeddings → incremental IVF-PQ ANN index (two daily drains)
               → hard negatives mined from the indexed corpus

Each stage consumes the previous stage's OUTPUT (not a fresh copy), so
this catches interface drift between operators that individually-green
unit tests cannot."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_text_curation_pipeline_composes(spark, docs, tmp_path):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.curation import (
        sequence_packing,
        temperature_mixture_sample,
    )
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
        exact_dedup,
        minhash_dedup,
    )

    n0 = docs.count()

    # 1. exact dedup, then near-dup dedup on the survivors
    stage1 = exact_dedup(docs, text_col="text", id_col="doc_id")
    n1 = stage1.count()
    assert 0 < n1 <= n0
    stage2 = minhash_dedup(stage1, text_col="text", id_col="doc_id")
    n2 = stage2.count()
    assert 0 < n2 <= n1

    # 2. per-language adaptive quality gate on the deduped corpus
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.curation import (
        group_quantile_threshold,
    )

    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    scored = stage2.withColumn(
        "diversity",
        F.size(F.array_distinct(toks)).cast("double") / F.size(toks),
    )
    gated = group_quantile_threshold(scored, "lang", "diversity", "doc_id", q=0.25)
    n3 = gated.count()
    assert 0 < n3 <= n2
    # every language must survive its own gate (the point of ADAPTIVE)
    langs_in = {r.lang for r in stage2.select("lang").distinct().collect()}
    langs_out = {r.lang for r in gated.select("lang").distinct().collect()}
    assert langs_out == langs_in

    # 3. decontaminate against a held-out slice (5-gram equi-join)
    eval_slice = gated.filter("doc_id % 17 = 0").select("doc_id", "text")
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import tokens as tok_fn

    def grams(df, idc):
        t = df.select(F.col(idc).alias("_id"), tok_fn(F.col("text")).alias("_t"))
        return t.select(
            "_id",
            F.explode(
                F.when(
                    F.size("_t") >= 5,
                    F.transform(
                        F.sequence(F.lit(1), F.size("_t") - 4),
                        lambda i: F.concat_ws(" ", F.slice("_t", i, 5)),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("g"),
        )
    train_g = grams(gated.filter("doc_id % 17 != 0"), "doc_id")
    eval_g = grams(eval_slice, "doc_id")
    contaminated = (
        train_g.join(eval_g.select("g").distinct(), "g")
        .select("_id").distinct()
    )
    clean = (
        gated.filter("doc_id % 17 != 0")
        .join(contaminated.withColumnRenamed("_id", "doc_id"), "doc_id", "left_anti")
    )
    n4 = clean.count()
    assert 0 < n4 <= n3

    # 4. temperature mixture over sources, then pack sequences
    mixed = temperature_mixture_sample(clean, "source", target_total=60)
    n5 = mixed.count()
    assert 0 < n5 <= n4 + 1  # quotas are ceil'd per source
    packed = sequence_packing(
        clean.join(mixed.select("doc_id"), "doc_id"), budget=256
    )
    prows = packed.collect()
    assert sum(r.n_docs for r in prows) == n5
    assert all(r.pack_tokens > 0 for r in prows)


def test_embedding_index_pipeline_composes(spark, tmp_path):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.pq import ivfpq_topk
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import (
        hard_negatives,
    )
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import (
        ann_index_model,
        run_ann_index_drain,
    )

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    cat = Catalog(spark, tmp_path / "wh")

    # two "daily" drains build the persistent compressed index
    day1 = emb.filter("vec_id % 2 = 0")
    day2 = emb.filter("vec_id % 2 = 1")
    n1 = run_ann_index_drain(cat, day1, epoch=1, m=4, k_sub=8)
    n2 = run_ann_index_drain(cat, day2, epoch=2, m=4, k_sub=8)
    assert n1 + n2 == emb.count()

    # query the drained index with the bound model
    cents, cbs = ann_index_model(cat)
    queries = emb.filter("vec_id < 10")
    hits = ivfpq_topk(
        cat.table("ann_index").read(), queries, cents, cbs, k=5, n_probe=2
    )
    per_q = {r.query_id for r in hits.collect()}
    assert per_q == set(range(10))

    # mine hard negatives among each query's ANN candidates: join the
    # approximate hits back to labeled vectors and demand a different
    # label — the composed contrastive-mining path
    neg = hard_negatives(emb, queries, k=3)
    assert {r.anchor_id for r in neg.collect()} == set(range(10))
    assert all(r.anchor_label != r.neighbor_label for r in neg.collect())
