"""IVF (inverted-file) approximate nearest neighbor — the coarse-
quantizer scale path for similarity search.

Pipeline:
 1. ``kmeans_fit`` — Lloyd iterations expressed as DataFrame ops:
    assignment is an argmin over broadcast centroid literals (codegen'd
    fold, no UDF); the update step is a (cluster, position) average via
    posexplode + two hash aggregations. Centroids (k×dim floats) are the
    only driver-side state. Deterministic: seeds are the k smallest ids,
    iteration count fixed — same clusters every run.
 2. ``ivf_assign`` — one pass tagging each corpus row with its nearest
    centroid (the inverted list key). Persist this next to the corpus:
    it is the index.
 3. ``ivf_topk`` — queries probe their ``n_probe`` nearest centroids and
    score ONLY rows in those inverted lists: candidate fraction ≈
    n_probe/k of the corpus, one equi-join on the list key — no corpus
    broadcast, no cross join.

At 100 TB: fit on a sample (``fit_fraction``), assign in one scan,
store `cluster` as a partition column so probes prune files. Recall
tunes with k and n_probe exactly like FAISS IVF-Flat.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import cosine


def _sq_dist(vec: Column, centroid: list[float]) -> Column:
    c = F.array(*[F.lit(float(x)) for x in centroid])
    diff = F.zip_with(vec, c, lambda a, b: a.cast("double") - b)
    return F.aggregate(diff, F.lit(0.0), lambda acc, d: acc + d * d)


def nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Argmin cluster id over broadcast centroid literals (pure expr).

    Implemented as array_position(ds, array_min(ds)) over the plain
    distance array — first occurrence of the minimum, i.e. min
    distance with ties broken by the smallest index (matching the SQL
    oracle's ORDER BY dist, cluster). Two deliberate non-choices:
    the obvious when(d < best_d, ...) running-argmin chain references
    its accumulator twice per step, doubling the expression tree per
    centroid (2^k nodes — k=8 × dim=64 made plan analysis + codegen
    the dominant cost of the whole IVF pipeline); and (d, i)-struct
    extraction by field name breaks when the caller's select also
    contains a generator (posexplode rewrites strip the struct
    aliases to col1/col2)."""
    ds = F.array(*[_sq_dist(vec, c) for c in centroids])
    # NULL vector → all distances NULL → array_position NULL; coalesce
    # to cluster 0 (the pre-rewrite when-chain behavior, and what the
    # SQL oracle's row_number-over-NULLS-LAST assignment produces).
    return F.coalesce(
        (F.array_position(ds, F.array_min(ds)) - 1).cast("int"), F.lit(0)
    )


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    n_iter: int = 4,
    fit_fraction: float | None = None,
) -> list[list[float]]:
    """Deterministic Lloyd k-means; returns k centroids (python lists).

    Empty clusters keep their previous centroid (stable k)."""
    data = df.select(id_col, vec_col)
    if fit_fraction:
        data = data.sample(fraction=fit_fraction, seed=42)
    seeds = data.orderBy(F.col(id_col).asc()).limit(k).collect()
    centroids = [list(map(float, r[vec_col])) for r in seeds]
    for _ in range(n_iter):
        assigned = data.select(
            F.col(id_col).alias("_mid"),
            nearest_centroid(F.col(vec_col), centroids).alias("cluster"),
            F.posexplode(vec_col).alias("pos", "x"),
        )
        # Mean = sequential fold over members ordered by id, / count —
        # the exact IEEE result is independent of partitioning AND
        # reproducible by the DuckDB oracle (list(x ORDER BY id) fold),
        # unlike F.avg whose partial-agg order is engine-defined. The
        # collect_list per (cluster, pos) is bounded by the fit sample.
        ordered_sum = F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("_mid"), F.col("x")))),
            F.lit(0.0),
            lambda acc, s: acc + s["x"].cast("double"),
        )
        means = (
            assigned.groupBy("cluster", "pos")
            .agg((ordered_sum / F.count(F.lit(1))).alias("m"))
            .groupBy("cluster")
            .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"))
            .collect()
        )
        new_centroids = list(centroids)  # empty clusters keep old centroid
        for r in means:
            new_centroids[r.cluster] = [float(p.m) for p in r.pm]
        centroids = new_centroids
    return centroids


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Tag every row with its inverted-list key (one scan, no shuffle)."""
    return df.withColumn("cluster", nearest_centroid(F.col(vec_col), centroids))


def _probe_clusters(vec: Column, centroids: list[list[float]], n_probe: int) -> Column:
    """Array of the n_probe nearest cluster ids (expression-only)."""
    pairs = F.array(
        *[
            F.struct(_sq_dist(vec, c).alias("d"), F.lit(i).alias("i"))
            for i, c in enumerate(centroids)
        ]
    )
    return F.slice(F.transform(F.array_sort(pairs), lambda p: p["i"]), 1, n_probe)


def ivf_topk(
    indexed_corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbors probing n_probe inverted lists per query.

    ``indexed_corpus`` must carry the ``cluster`` column from
    ``ivf_assign`` (at scale: a partition column → file pruning)."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        F.explode(_probe_clusters(F.col(vec_col), centroids, n_probe)).alias("cluster"),
    )
    c = indexed_corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"), "cluster"
    )
    cand = (
        c.join(q, "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cos_sim", cosine(F.col("qv"), F.col("cv")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
