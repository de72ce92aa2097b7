"""IVF ANN: deterministic k-means fit, inverted-list assignment, probe
search — recall measured against exact brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.ivf import (
    ivf_assign,
    ivf_topk,
    kmeans_fit,
)
from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import (
    brute_force_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def centroids(spark, emb):
    return kmeans_fit(emb, k=8, n_iter=3)


def test_kmeans_deterministic_and_balanced(spark, emb, centroids):
    again = kmeans_fit(emb, k=8, n_iter=3)
    assert centroids == again  # fully deterministic
    assigned = ivf_assign(emb, centroids)
    sizes = {r.cluster: r["count"] for r in assigned.groupBy("cluster").count().collect()}
    assert len(sizes) >= 4  # clusters actually used
    assert max(sizes.values()) < emb.count()  # not degenerate


def test_ivf_recall_vs_exact(spark, emb, centroids):
    indexed = ivf_assign(emb, centroids)
    q = emb.limit(20)
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, q, k=5).collect()}
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ivf_topk(indexed, q, centroids, k=5, n_probe=3).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall > 0.6  # 3/8 lists probed → well above the 37% floor


def test_ivf_probe_fraction(spark, emb, centroids):
    """Probing fewer lists scans fewer candidates (the point of IVF)."""
    indexed = ivf_assign(emb, centroids).cache()
    q = emb.limit(5)
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.ivf import _probe_clusters

    probed = q.select(
        F.explode(_probe_clusters(F.col("embedding"), centroids, 2)).alias("cluster")
    )
    sizes = {r.cluster: r["count"] for r in indexed.groupBy("cluster").count().collect()}
    scanned = sum(sizes[r.cluster] for r in probed.collect())
    assert scanned < 2 * emb.count()  # 5 queries × 2 probes ≪ 5 × full corpus
    indexed.unpersist()
