"""Product quantization (PQ) ANN — compressed-domain similarity search.

Extends the similarity surface (brute-force `similarity.py`, SRP-LSH,
IVF `ivf.py`) with the memory-bound scale path: split each D-dim vector
into ``m`` subvectors, k-means-quantize each subspace to ``k_sub``
codes, and store each vector as ``m`` small ints (D×4 bytes of float32
→ m bytes at k_sub ≤ 256 — e.g. 64-dim/4-subspace = 256 B → 4 B, 64×
compression). Queries score candidates with the asymmetric distance
computation (ADC): one m×k_sub lookup table of exact query-to-centroid
subspace distances per query, then a code-indexed O(m) sum per corpus
row — no decompression, no corpus shuffle (Jégou, Douze, Schmid,
"Product Quantization for Nearest Neighbor Search", TPAMI 2011).

Physical shapes (the part that must survive 100 TB):
 - ``pq_fit`` — ONE joint Lloyd loop for all m subspaces: rows explode
   to (id, subspace, subvector) once, centroids ride a broadcast
   relation keyed by subspace (m×k_sub×(D/m) doubles — KBs), and each
   iteration is one scan + one hash-agg shuffle keyed (s, cluster,
   pos). Driver state is the m×k_sub codebook only. Deterministic:
   seeds are the k_sub smallest ids' subvectors, ordered-fold means —
   bit-identical every run, replayable in SQL by the DuckDB oracle.
 - ``pq_encode`` — expression-only: the codebook joins on as a one-row
   broadcast column and the m argmins run inside whole-stage codegen.
   One corpus scan, NO shuffle, no Python. At scale this writes the
   codes column next to the corpus once; queries touch only (id,
   codes).
 - ``pq_adc_topk`` — corpus scans its (id, codes) projection once and
   never shuffles; the query side (ids × m×k_sub distance tables) is
   broadcast. Per-row cost is O(m) element_at lookups + a fold vs the
   brute-force O(D) multiply-adds; only Q×k rows reach the final
   ranking shuffle, same as brute_force_topk.

Cross-engine determinism contract (same rules as ivf.py): every float
reduction is a sequential left-to-right double fold with a defined
order (subspace distances fold over positions; ADC folds over
subspaces in index order; means fold members ordered by id), so the
DuckDB oracle in plans/queries.py replays the whole pipeline — fit,
encode, ADC — bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.ivf import (
    _POS_BASE,
    _argmin_cluster,
    _probe_pairs,
    _sq_dists_col,
    _with_centroids,
    ivf_assign,
    portable_fraction_filter,
)

_CB = "__pq_codebooks"


def _check_geometry(dim: int, m: int) -> int:
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m} subspaces")
    return dim // m


def _with_codebooks(df: DataFrame, codebooks: list[list[list[float]]]) -> DataFrame:
    """Attach the full m×k_sub×sd codebook as ONE broadcast one-row
    column (array<array<array<double>>>) — constant-size codegen source
    regardless of m·k_sub·dim, same rationale as ivf._with_centroids."""
    cdf = df.sparkSession.createDataFrame(
        [([[list(map(float, c)) for c in cb] for cb in codebooks],)],
        f"{_CB}: array<array<array<double>>>",
    )
    return df.crossJoin(F.broadcast(cdf))


def _subvector(vec: Column, s: Column | int, sd: int) -> Column:
    """1-based slice of subspace ``s`` (0-based): elements
    [s·sd+1, (s+1)·sd]."""
    start = (s if isinstance(s, Column) else F.lit(s)) * sd + 1
    return F.slice(vec, start, sd)


def pq_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    k_sub: int = 8,
    n_iter: int = 2,
    dim: int = 64,
    fit_fraction: float | None = None,
    _input_materialized: bool = False,
) -> list[list[list[float]]]:
    """Deterministic per-subspace Lloyd k-means; returns m codebooks of
    k_sub centroids each (python lists — the only driver-side state).

    ``_input_materialized`` (internal, r14): the caller guarantees
    ``df`` is already an eagerly materialized relation (e.g. the
    ``ivfpq_encode`` residual localCheckpoint) — re-caching it would
    only copy checkpoint blocks into storage memory for zero replay
    saving, so the fit-set cache is skipped.

    All m subspaces train in the SAME scans: the input explodes once to
    (id, s, subvector) and every Lloyd iteration is one pass with a
    single (s, cluster, pos) hash aggregation — m never multiplies the
    number of jobs. Empty clusters keep their previous centroid.

    ONE Spark job end to end (the ``ivf.kmeans_fit`` r7 pattern, applied
    here in r8): per-iteration codebook state is a chained m-row
    RELATION (s, _cents) instead of a collected list, so the whole loop
    — seeds included — is analyzed and dispatched once with a single
    final m-row collect. Previously each of the n_iter+1 round-trips
    (seed collect + one per Lloyd iteration) paid its own plan analysis
    over the full input lineage (in IVF-PQ: the coarse-assign + residual
    HOF tree), which dominated the ANN composites' cold path."""
    sd = _check_geometry(dim, m)
    data = df.select(id_col, vec_col)
    if fit_fraction is not None:
        if not 0.0 < fit_fraction <= 1.0:
            raise ValueError(f"fit_fraction must be in (0, 1], got {fit_fraction}")
        if fit_fraction < 1.0:
            # portable md5 draw, NOT df.sample() — see
            # ivf.portable_fraction_filter. "pqfit|" salt is part of the
            # frozen-model contract: changing it changes every codebook.
            data = portable_fraction_filter(data, id_col, fit_fraction, "pqfit|")
    # cached: the fit input feeds n_iter+1 jobs (seeds + one per Lloyd
    # iteration); in the IVF-PQ composite its lineage is the coarse-
    # assign + residual HOF tree over the corpus, which would otherwise
    # re-evaluate per job. Bounded by the fit set; released at return.
    caches = []
    if not _input_materialized:
        data = data.cache()
        caches.append(data)
    try:
        return _pq_fit_chained(
            data, caches, id_col, vec_col, m, sd, k_sub, n_iter, fit_fraction
        )
    finally:
        # released on BOTH success and error paths (short-seed ValueError,
        # collect failure) — a leaked fit-set cache pins the whole coarse-
        # assign + residual lineage in executor memory (r7 advisor).
        for c in caches:
            c.unpersist()


def _explode_subs(frame: DataFrame, id_col: str, vec_col: str, m: int, sd: int) -> DataFrame:
    """(_mid, s, sv): every row sliced into its m subvectors — the one
    definition of subspace geometry shared by the assignment stream and
    the seed relation (they must never disagree on slicing)."""
    return frame.select(
        F.col(id_col).alias("_mid"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda s: _subvector(F.col(vec_col), s, sd),
            )
        ).alias("s", "sv"),
    )


def _short_seed_error(k_sub: int, fit_fraction) -> str:
    return (
        f"pq_fit: need >= k_sub={k_sub} rows to seed the codebooks"
        + (" after fit_fraction sampling" if fit_fraction else "")
        + " — lower k_sub or raise fit_fraction"
    )


def _pq_fit_chained(data, caches, id_col, vec_col, m, sd, k_sub, n_iter, fit_fraction):
    # r14 fit-chain restructure (guide §2.4; the ivf._kmeans_iterate
    # shape): per-iteration state is ONE ROW carrying the full m-deep
    # codebook array, not an m-row (s, _cents) relation. The old shape
    # paid 6 exchanges per iteration (codebook broadcast join, the
    # (s,cluster,pos) means shuffle, the (s,cluster) reassembly
    # shuffle, the per-s map shuffle, the fallback join's broadcast);
    # the 1-row form pays 4 — means fold straight into one packed
    # ((s·B+cluster)·B+pos)→mean map in a single global agg, and the
    # fallback is a per-position map probe on the state row. Values
    # bit-identical (same ordered folds, positions read in index
    # order; uniform subvector width sd, which _subvector guarantees
    # for well-formed dim-length vectors). Measured
    # (scripts/ann_bench.py): ann_topk_pq fit chain 18 -> 12 jobs.
    sub = _explode_subs(data, id_col, vec_col, m, sd)
    # seed state: per subspace, the k_sub smallest ids' subvectors in
    # id order (cluster = rank order — matches the previous collected-
    # seed numbering and the oracle's replay). The short-seed guard is
    # IN-PLAN (raise_error on a short centroid array) so a misuse fails
    # after ONE scan of the fit set — when the seed state first
    # evaluates, before any Lloyd-iteration work — while the success
    # path keeps the single-job shape (no separate validation collect).
    cents_raw = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("_mid"), F.col("sv")))),
        lambda st: F.transform(st["sv"], lambda x: x.cast("double")),
    )
    state = (
        _explode_subs(data.orderBy(F.col(id_col).asc()).limit(k_sub), id_col, vec_col, m, sd)
        .groupBy("s")
        .agg(cents_raw.alias("_cents_raw"))
        .select(
            "s",
            F.when(F.size("_cents_raw") >= k_sub, F.col("_cents_raw"))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(_short_seed_error(k_sub, fit_fraction) + " (got "),
                        F.size("_cents_raw").cast("string"),
                        F.lit(")"),
                    )
                )
            )
            .alias("_cents"),
        )
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("s", "_cents"))),
                lambda st: st["_cents"],
            ).alias(_CB)
        )
    )
    for _ in range(n_iter):
        # each iteration's state row is referenced twice: the next
        # assignment's broadcast side + the fold's cross join
        state = state.cache()
        caches.append(state)
        # assignment: the whole codebook rides the broadcast row; each
        # subvector reads its subspace's centroids by index — cluster
        # projected BELOW the posexplode so the O(k_sub·sd) distance
        # expr runs once per subvector (see ivf.kmeans_fit's
        # generator-placement note).
        pre = sub.crossJoin(F.broadcast(state)).select(
            "_mid",
            "s",
            _argmin_cluster(
                _sq_dists_col(
                    F.col("sv"), F.element_at(F.col(_CB), F.col("s") + 1)
                )
            ).alias("cluster"),
            "sv",
        )
        assigned = pre.select(
            "_mid", "s", "cluster", F.posexplode("sv").alias("pos", "x")
        )
        # ordered-fold mean (members sorted by id) — partitioning-
        # independent IEEE result, replayed by the oracle's
        # list(x ORDER BY id) fold. Bounded by the fit sample size.
        ordered_sum = F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("_mid"), F.col("x")))),
            F.lit(0.0),
            lambda acc, st: acc + st["x"].cast("double"),
        )
        mrow = (
            assigned.groupBy("s", "cluster", "pos")
            .agg((ordered_sum / F.count(F.lit(1))).alias("mu"))
            .agg(
                F.map_from_entries(
                    F.collect_list(
                        F.struct(
                            (
                                (
                                    F.col("s").cast("bigint") * _POS_BASE
                                    + F.col("cluster")
                                )
                                * _POS_BASE
                                + F.col("pos")
                            ).alias("k"),
                            F.col("mu").alias("v"),
                        )
                    )
                ).alias("_mp")
            )
        )
        # fold: assigned clusters take their new per-position mean,
        # empty clusters keep the previous centroid (map_contains_key,
        # not coalesce, so a NULL mean still overwrites — the old
        # whole-array replacement's behavior)
        key = lambda s_, c, p: (  # noqa: E731
            s_.cast("bigint") * _POS_BASE + c
        ) * _POS_BASE + p
        state = state.crossJoin(F.broadcast(mrow)).select(
            F.transform(
                F.col(_CB),
                lambda cb_s, s_: F.transform(
                    cb_s,
                    lambda cent, c: F.transform(
                        cent,
                        lambda x, p: F.when(
                            F.map_contains_key(F.col("_mp"), key(s_, c, p)),
                            F.try_element_at(F.col("_mp"), key(s_, c, p)),
                        ).otherwise(x),
                    ),
                ),
            ).alias(_CB)
        )
    try:
        row = state.collect()[0]
    except Exception as e:  # translate the in-plan guard to ValueError
        # a short codebook would freeze into an incremental ANN index
        # whose shape check then rejects every later drain with a
        # misleading cross-model error (r6 advisor) — fail loudly here
        if "pq_fit: need" in str(e):
            raise ValueError(_short_seed_error(k_sub, fit_fraction)) from None
        raise
    arr = row[_CB]
    if not arr:  # empty fit set: groupBy emitted nothing, guard never ran
        raise ValueError(_short_seed_error(k_sub, fit_fraction) + " (got 0)")
    return [[[float(x) for x in c] for c in cb_s] for cb_s in arr]


def pq_codes(vec: Column, cb: Column, m: int, sd: int) -> Column:
    """``array<int>`` of m code ids: per subspace, the argmin centroid
    of that subspace's codebook. Pure expression over the broadcast
    codebook column — runs in whole-stage codegen at scan stage."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: _argmin_cluster(
            _sq_dists_col(_subvector(vec, s, sd), F.element_at(cb, s + 1))
        ),
    )


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Corpus + ``codes`` column (array<int>, length m). One scan, no
    shuffle; at scale, persist (id, codes) as the compressed index."""
    m = len(codebooks)
    sd = _check_geometry(dim, m)
    j = _with_codebooks(df, codebooks)
    return j.withColumn(
        "codes", pq_codes(F.col(vec_col), F.col(_CB), m, sd)
    ).drop(_CB)


def residuals(
    assigned: DataFrame,
    centroids: list[list[float]],
    vec_col: str = "embedding",
    out_col: str = "residual",
) -> DataFrame:
    """``vec − centroid[cluster]`` as array<double> — the quantity IVF-PQ
    codes. ``assigned`` must carry ``cluster`` (from ``ivf_assign``).
    k-row broadcast equi-join + zip_with; scan-stage, no shuffle."""
    cdf = assigned.sparkSession.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
        "cluster: int, _cent: array<double>",
    )
    return (
        assigned.join(F.broadcast(cdf), "cluster")
        .withColumn(
            out_col,
            F.zip_with(
                F.col(vec_col),
                F.col("_cent"),
                lambda a, b: a.cast("double") - b,
            ),
        )
        .drop("_cent")
    )


def ivfpq_encode(
    df: DataFrame,
    coarse_centroids: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    k_sub: int = 8,
    n_iter: int = 2,
    dim: int = 64,
) -> tuple[DataFrame, list[list[list[float]]]]:
    """The FAISS-style IVF-PQ index: coarse-assign every vector, PQ-fit
    the RESIDUALS (vector − coarse centroid — much lower variance than
    raw vectors, so the same code budget quantizes far more finely),
    and encode. Returns (indexed DataFrame carrying ``cluster`` +
    ``codes``, residual codebooks).

    At 100 TB the indexed output persists partitioned by ``cluster``
    with ``codes`` as the only payload queries touch: file pruning from
    the probe list + m bytes per vector.

    The assign+residual relation is materialized ONCE
    (``localCheckpoint``) and shared by the codebook fit AND the
    returned encoded index: without it the O(k·dim) coarse-assign +
    residual HOF subtree is re-analyzed, re-codegen-compiled, and
    re-executed in the fit, then AGAIN inside every downstream search
    over ``encoded`` (r9 bench: the recompute+recompile was ~40% of
    the ivfpq chain's wall-clock). The checkpoint is the in-session
    analog of persisting the index table — which is what a real
    deployment does anyway (``ann_index_drain``)."""
    assigned = ivf_assign(df, coarse_centroids, vec_col=vec_col)
    res = residuals(assigned, coarse_centroids, vec_col=vec_col).localCheckpoint(
        eager=True
    )
    codebooks = pq_fit(
        res, vec_col="residual", id_col=id_col, m=m, k_sub=k_sub,
        n_iter=n_iter, dim=dim, _input_materialized=True,
    )
    return _encode_residuals(res, codebooks, dim), codebooks


def _encode_residuals(
    res: DataFrame, codebooks: list[list[list[float]]], dim: int
) -> DataFrame:
    """Code a prepared residual relation against fitted codebooks — the
    shared encode tail of ``ivfpq_encode`` (fit-time) and
    ``ivfpq_encode_with`` (frozen-model incremental), kept in ONE place
    so the two index paths cannot diverge."""
    m = len(codebooks)
    sd = _check_geometry(dim, m)
    j = _with_codebooks(res, codebooks)
    return j.withColumn(
        "codes", pq_codes(F.col("residual"), F.col(_CB), m, sd)
    ).drop(_CB, "residual")


def ivfpq_encode_with(
    df: DataFrame,
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Encode with a FROZEN model (no fitting) — the incremental-index
    path: new vectors are assigned + residual-coded against the stored
    centroids/codebooks so old codes never need recomputation. Same
    scan-stage, shuffle-free plan as ``pq_encode``."""
    assigned = ivf_assign(df, coarse_centroids, vec_col=vec_col)
    res = residuals(assigned, coarse_centroids, vec_col=vec_col)
    return _encode_residuals(res, codebooks, dim)


def ivfpq_topk(
    encoded: DataFrame,
    queries: DataFrame,
    coarse_centroids: list[list[float]],
    codebooks: list[list[list[float]]],
    k: int = 5,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Top-k by ADC over the n_probe nearest inverted lists. Per
    (query, probed cluster) the distance table is built from the QUERY
    RESIDUAL against that cluster's coarse centroid — the IVF-PQ
    asymmetric search. Returns (query_id, neighbor_id, adc_dist, rank).

    Plan: the query side (Q·n_probe rows + m×k_sub tables) broadcasts
    into a hash equi-join on ``cluster`` — candidates are only the
    probed lists' members; the corpus side never shuffles and reads
    only (id, cluster, codes)."""
    m = len(codebooks)
    sd = _check_geometry(dim, m)
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.ivf import _CENTS

    jq = _with_centroids(queries, coarse_centroids)
    pairs = _probe_pairs(
        _sq_dists_col(F.col(vec_col), F.col(_CENTS)), F.col(_CENTS)
    )
    probe = F.slice(
        F.transform(F.array_sort(pairs), lambda p: p["i"]), 1, n_probe
    )
    q = (
        jq.select(
            F.col(id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
            probe.alias("_probe"),
        )
        .select("query_id", "_qv", F.explode("_probe").alias("cluster"))
    )
    # query residual vs the probed centroid, then its distance tables
    qres = residuals(q, coarse_centroids, vec_col="_qv", out_col="_qr")
    jqd = _with_codebooks(qres, codebooks)
    dtab = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: _sq_dists_col(
            _subvector(F.col("_qr"), s, sd), F.element_at(F.col(_CB), s + 1)
        ),
    )
    qd = jqd.select("query_id", "cluster", dtab.alias("_dtab"))
    c = encoded.select(
        F.col(id_col).alias("neighbor_id"), "cluster", "codes"
    )
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("_dtab"),
            lambda code, row: F.element_at(row, code.cast("int") + 1),
        ),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )
    scored = (
        c.join(F.broadcast(qd), "cluster")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc_dist", adc)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def pq_adc_topk(
    encoded_corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Top-k approximate neighbors by ADC distance (sum over subspaces
    of exact query-to-centroid distance at the neighbor's code).

    Returns: query_id, neighbor_id, adc_dist, rank (1-based; ties by
    neighbor_id). Plan: broadcast(queries + distance tables) ⋈ one
    corpus scan of (id, codes); corpus never shuffles."""
    m = len(codebooks)
    sd = _check_geometry(dim, m)
    # per-query m×k_sub distance table, computed once on the tiny side
    jq = _with_codebooks(queries, codebooks)
    dtab = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: _sq_dists_col(
            _subvector(F.col(vec_col), s, sd), F.element_at(F.col(_CB), s + 1)
        ),
    )
    q = jq.select(
        F.col(id_col).alias("query_id"), dtab.alias("_dtab")
    )
    c = encoded_corpus.select(
        F.col(id_col).alias("neighbor_id"), "codes"
    )
    # ADC: fold subspaces in index order — zip the m codes with the m
    # table rows, element_at each, sequential sum (bit-deterministic).
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.col("_dtab"),
            lambda code, row: F.element_at(row, code.cast("int") + 1),
        ),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn("adc_dist", adc)
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "adc_dist", "rank")
    )


def _pack_bits(m: int, k_sub: int) -> int:
    if k_sub & (k_sub - 1) != 0:
        raise ValueError(f"k_sub must be a power of two, got {k_sub}")
    bits = k_sub.bit_length() - 1
    if m * bits > 62:
        raise ValueError(
            f"m={m} x log2(k_sub)={bits} = {m * bits} bits exceeds the 62 "
            "a signed BIGINT safely holds"
        )
    return bits


def pq_pack_codes(codes: Column, m: int, k_sub: int) -> Column:
    """Pack the m-element code array into ONE BIGINT (subspace 0 in the
    least-significant bits) — the storage form that makes a 100 TB code
    column a fixed-width integer instead of an array: denser parquet
    encoding, cheaper shuffles, and an equi-joinable exact-duplicate
    key (two vectors with identical codes collide on one bigint).
    Exact integer arithmetic only; requires power-of-two k_sub and
    m·log2(k_sub) ≤ 62 bits."""
    bits = _pack_bits(m, k_sub)
    packed = F.lit(0).cast("bigint")
    for s in range(m - 1, -1, -1):
        packed = F.shiftleft(packed, bits) + F.element_at(
            codes, s + 1
        ).cast("bigint")
    return packed


def pq_unpack_codes(packed: Column, m: int, k_sub: int) -> Column:
    """Inverse of ``pq_pack_codes``: the BIGINT back to the m-element
    int code array, subspace order restored."""
    bits = _pack_bits(m, k_sub)
    return F.array(
        *[
            F.shiftrightunsigned(packed, s * bits)
            .bitwiseAND(F.lit(k_sub - 1))
            .cast("int")
            for s in range(m)
        ]
    )
