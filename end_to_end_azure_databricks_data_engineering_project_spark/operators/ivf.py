"""IVF (inverted-file) approximate nearest neighbor — the coarse-
quantizer scale path for similarity search.

Pipeline:
 1. ``kmeans_fit`` — Lloyd iterations expressed as DataFrame ops:
    assignment is an argmin over a BROADCAST centroid relation (one-row
    cross join, no shuffle — centroids never enter the expression tree);
    the update step is a (cluster, position) average via posexplode +
    two hash aggregations. Centroids (k×dim floats) are the only
    driver-side state. Deterministic: seeds are the k smallest ids,
    iteration count fixed — same clusters every run.
 2. ``ivf_assign`` — one pass tagging each corpus row with its nearest
    centroid (the inverted list key). Persist this next to the corpus:
    it is the index.
 3. ``ivf_topk`` — queries probe their ``n_probe`` nearest centroids and
    score ONLY rows in those inverted lists: candidate fraction ≈
    n_probe/k of the corpus, one equi-join on the list key — no corpus
    broadcast, no cross join.

Why a broadcast relation and not centroid literals: PySpark's
``F.lit``/``F.array`` expand k×dim floats into k×dim expression nodes,
so every Lloyd iteration (fresh centroids → fresh plan) re-analyzes and
Janino-recompiles a codegen source that grows with k·dim — at k=64,
dim=64 that compile dominated the whole fit (~45 s/iteration for 2 000
rows). With the centroids riding a one-row broadcast DataFrame the
codegen source is constant-size in k and dim; k=1024 × dim=768 is a
6 MB broadcast value, not a megabyte-scale expression tree.

At 100 TB: fit on a sample (``fit_fraction``), assign in one scan,
store `cluster` as a partition column so probes prune files. Recall
tunes with k and n_probe exactly like FAISS IVF-Flat.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


_CENTS = "__ivf_cents"


def portable_fraction_filter(df: DataFrame, id_col: str, fraction: float, salt: str) -> DataFrame:
    """Deterministic ~``fraction`` subset keyed on a portable md5 draw
    over ``id_col`` — NOT ``df.sample``: Spark's seeded sample is
    per-partition, so the same data read with different parallelism
    yields a different subset, breaking the bit-identical-every-run
    contract fitted models (k-means centroids, PQ codebooks frozen into
    incremental ANN indexes) depend on. Shared by ``kmeans_fit`` and
    ``pq.pq_fit``; distinct salts keep their draws independent."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15
        ),
        16, 10,
    ).cast("bigint")
    return df.filter((h % 1_000_000) < int(fraction * 1_000_000))


def _with_centroids(df: DataFrame, centroids: list[list[float]]) -> DataFrame:
    """Attach all k centroids as one ``array<array<double>>`` column via
    a one-row broadcast cross join (BroadcastNestedLoopJoin — no
    shuffle, no literals in the plan). Callers drop the column after
    deriving what they need."""
    cdf = df.sparkSession.createDataFrame(
        [([[float(x) for x in c] for c in centroids],)],
        f"{_CENTS}: array<array<double>>",
    )
    return df.crossJoin(F.broadcast(cdf))


def _sq_dists_col(vec: Column, cents: Column) -> Column:
    """Array of squared distances to every centroid: a ``transform``
    over the centroid-array column. Per-element arithmetic (zip_with
    diff, sequential left-to-right fold) is bit-deterministic and
    replayed exactly by the DuckDB oracle."""
    return F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(vec, c, lambda a, b: a.cast("double") - b),
            F.lit(0.0),
            lambda acc, d: acc + d * d,
        ),
    )


def _argmin_cluster(ds: Column) -> Column:
    """Argmin cluster id from a distance array.

    array_position(ds, array_min(ds)) — first occurrence of the
    minimum, i.e. min distance with ties broken by the smallest index
    (matching the SQL oracle's ORDER BY dist, cluster). The obvious
    when(d < best_d, ...) running-argmin chain references its
    accumulator twice per step, doubling the expression tree per
    centroid (2^k nodes) — deliberately avoided.

    NULL vector → all distances NULL → array_position NULL; coalesce
    to cluster 0 (what the SQL oracle's row_number-over-NULLS-LAST
    assignment produces)."""
    return F.coalesce(
        (F.array_position(ds, F.array_min(ds)) - 1).cast("int"), F.lit(0)
    )


def _probe_pairs(ds: Column, cents: Column) -> Column:
    """(dist, idx) structs for every centroid; array_sort orders by dist
    then idx — same tie-break as the oracle's ORDER BY dist, cluster."""
    return F.zip_with(
        ds,
        F.transform(cents, lambda _, i: i),
        lambda d, i: F.struct(d.alias("d"), i.alias("i")),
    )


def nearest_centroid(vec: Column, centroids: list[list[float]]) -> Column:
    """Expression-only argmin over centroid literals — compat shim for
    small k (tests, ad-hoc use). The DataFrame paths (`kmeans_fit`,
    `ivf_assign`, `ivf_topk`) use the broadcast-relation form instead:
    F.lit expands k×dim literal nodes, which is fine at k≤16 but
    recompile-dominated beyond (see module docstring)."""
    ds = _sq_dists_col(vec, F.lit([[float(x) for x in c] for c in centroids]))
    return _argmin_cluster(ds)


def _probe_clusters(vec: Column, centroids: list[list[float]], n_probe: int) -> Column:
    """Expression-only n_probe nearest cluster ids — compat shim for
    small k (same caveat as `nearest_centroid`)."""
    cents = F.lit([[float(x) for x in c] for c in centroids])
    pairs = _probe_pairs(_sq_dists_col(vec, cents), cents)
    return F.slice(F.transform(F.array_sort(pairs), lambda p: p["i"]), 1, n_probe)


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 16,
    n_iter: int = 4,
    fit_fraction: float | None = None,
) -> list[list[float]]:
    """Deterministic Lloyd k-means; returns k centroids (python lists).

    Empty clusters keep their previous centroid (stable k).

    ONE Spark job end to end: the per-iteration centroid state is a
    chained k-row RELATION (not a collected list), so the whole loop is
    analyzed, codegen-compiled, and dispatched once, with a single
    final k-row collect — previously each iteration paid its own
    collect + full plan analysis, which dominated the cold path of the
    ANN composites (~2 s/round-trip). Two caches, both bounded:
      - ``data`` (the fit set): feeds every iteration's assignment scan;
        in IVF-PQ its lineage is the coarse-assign + residual HOF tree
        over the corpus, which would otherwise re-run per use;
      - each iteration's ``cents`` (k rows): referenced TWICE (the next
        assignment's broadcast side + the empty-cluster fallback join) —
        uncached, iteration i's full subtree would re-evaluate per
        reference, doubling work per chained level."""
    data = df.select(id_col, vec_col)
    if fit_fraction:
        # portable draw, not df.sample — see portable_fraction_filter
        # (r8 review: the seeded sample is per-partition and would make
        # frozen centroid models parallelism-dependent)
        data = portable_fraction_filter(data, id_col, fit_fraction, "kmeansfit|")
    data = data.cache()
    caches = [data]
    try:
        return _kmeans_iterate(data, caches, vec_col, id_col, k, n_iter)
    finally:
        # released on success AND error paths — a leaked fit cache pins
        # the coarse-assign/residual lineage in memory (r7 advisor)
        for c in caches:
            c.unpersist()


_POS_BASE = 1 << 20  # (cluster, pos) packed key base; any sane dim fits


def _kmeans_iterate(data, caches, vec_col, id_col, k, n_iter):
    # r14 fit-chain restructure (guide §2.4 — remove exchanges): the
    # per-iteration state is ONE ROW carrying the ordered centroid
    # array, not a k-row (cluster, cent) relation. Per iteration the
    # old shape paid 5 exchanges (centroid-array agg, its broadcast,
    # the (cluster,pos) means shuffle, the (cluster) array-reassembly
    # shuffle, and the empty-cluster fallback join's broadcast); the
    # 1-row form pays 4 — the means fold straight into a packed
    # (cluster·B+pos)→mean MAP in one global agg (no reassembly
    # shuffle), and the fallback is a per-position map probe on the
    # state row (no join). Values are bit-identical: the same ordered
    # fold produces each mean, and positions are read back in index
    # order (uniform-dimension vectors, which the distance fold already
    # assumes). Measured (scripts/ann_bench.py): ann_topk_ivf fit chain
    # 21 -> 15 jobs; see OPTIMIZATION_r14.md.
    #
    # seed state: the k smallest ids' vectors in id order (same
    # numbering as the previous row_number seeds and the oracle replay)
    state = (
        data.orderBy(F.col(id_col).asc())
        .limit(k)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col(id_col).alias("_mid"),
                            F.transform(
                                F.col(vec_col), lambda x: x.cast("double")
                            ).alias("cent"),
                        )
                    )
                ),
                lambda s: s["cent"],
            ).alias(_CENTS)
        )
    )
    for _ in range(n_iter):
        # each iteration's state row is referenced twice (next
        # assignment's broadcast + the fold's cross join) — uncached,
        # the full previous-iteration subtree would re-evaluate per
        # reference, doubling work per chained level
        state = state.cache()
        caches.append(state)
        # Two selects, deliberately: a generator in the SAME select as
        # the argmin would re-evaluate the O(k·dim) distance expression
        # once per exploded row (dim× per vector — the dominant cost at
        # k=64: ~45 s/iter for 2 000 rows). Projecting cluster below the
        # Generate evaluates it once per vector; Catalyst keeps the
        # projection under Generate (Generate only appends columns).
        pre = data.crossJoin(F.broadcast(state)).select(
            F.col(id_col).alias("_mid"),
            _argmin_cluster(
                _sq_dists_col(F.col(vec_col), F.col(_CENTS))
            ).alias("cluster"),
            F.col(vec_col).alias("_v"),
        )
        assigned = pre.select(
            "_mid", "cluster", F.posexplode("_v").alias("pos", "x")
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
        mrow = (
            assigned.groupBy("cluster", "pos")
            .agg((ordered_sum / F.count(F.lit(1))).alias("m"))
            .agg(
                F.map_from_entries(
                    F.collect_list(
                        F.struct(
                            (
                                F.col("cluster").cast("bigint") * _POS_BASE
                                + F.col("pos")
                            ).alias("k"),
                            F.col("m").alias("v"),
                        )
                    )
                ).alias("_mp")
            )
        )
        # fold: clusters the batch assigned get their new mean per
        # position; untouched (empty) clusters keep the previous
        # centroid. map_contains_key (not coalesce) so a NULL mean —
        # only possible from NULL vector elements — still overwrites,
        # exactly like the old whole-array replacement.
        key = lambda c, p: c.cast("bigint") * _POS_BASE + p  # noqa: E731
        state = state.crossJoin(F.broadcast(mrow)).select(
            F.transform(
                F.col(_CENTS),
                lambda cent, c: F.transform(
                    cent,
                    lambda x, p: F.when(
                        F.map_contains_key(F.col("_mp"), key(c, p)),
                        F.try_element_at(F.col("_mp"), key(c, p)),
                    ).otherwise(x),
                ),
            ).alias(_CENTS)
        )
    row = state.collect()[0]
    # fewer input rows than k: contiguous leading clusters only (the
    # previous collected-seeds behavior)
    return [[float(x) for x in c] for c in row[_CENTS]]


def ivf_assign(
    df: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
) -> DataFrame:
    """Tag every row with its inverted-list key (one scan, no shuffle —
    the centroid side is a one-row broadcast)."""
    j = _with_centroids(df, centroids)
    cluster = _argmin_cluster(_sq_dists_col(F.col(vec_col), F.col(_CENTS)))
    return j.withColumn("cluster", cluster).drop(_CENTS)


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
    jq = _with_centroids(queries, centroids)
    pairs = _probe_pairs(
        _sq_dists_col(F.col(vec_col), F.col(_CENTS)), F.col(_CENTS)
    )
    probe = F.slice(F.transform(F.array_sort(pairs), lambda p: p["i"]), 1, n_probe)
    # probe projected below the explode so the O(k·dim) distance sort
    # runs once per query, not once per probed cluster (see kmeans_fit).
    q = jq.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("qv"),
        probe.alias("_probe"),
    ).select("query_id", "qv", F.explode("_probe").alias("cluster"))
    # norms hoisted below the join: one sqrt-fold per ROW per side, not
    # two per candidate PAIR (same bit-exact cosine — the norms are the
    # identical folds wherever computed; ~3x less fold work on the
    # candidate hot path, matching brute_force_topk's shape)
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import (
        dot,
        norm,
    )

    q = q.withColumn("qn", norm(F.col("qv")))
    c = indexed_corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
        "cluster",
    )
    cand = (
        c.join(q, "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "cos_sim", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )
