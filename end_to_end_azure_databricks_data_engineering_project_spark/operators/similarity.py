"""Similarity search over embedding columns (`array<float>`).

Two paths:
 - **Brute-force cosine top-k** — the exact baseline. Dot products via
   `F.zip_with` + `F.aggregate` (sequential left-to-right fold →
   bit-deterministic, oracle-reproducible). The pairwise join is
   broadcast-on-the-query-side: fine for query batches up to ~10⁵ rows
   against any corpus size (corpus never shuffles; one scan).
 - **LSH-bucketed ANN (random hyperplane / SRP)** — the scale path:
   sign-of-projection bits bucket the corpus; candidates only within
   matching buckets (multi-probe via multiple tables). Hyperplanes are
   generated from a seeded md5 stream → fully deterministic, no
   Math.random, reproducible across engines.

At 100 TB: brute force is O(Q·N) dot products but only O(N) I/O with no
shuffle (query side broadcast); SRP reduces compute by the bucket
selectivity. The coarse-quantizer and compressed-domain paths live in
ivf.py (IVF) and pq.py (PQ, IVF-PQ); contrastive hard-negative mining
(hard_negatives) composes on the brute-force shape.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Deterministic sequential dot product (double accumulate)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str | None = None,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query row.

    Returns: query_id, neighbor_id, cos_sim, rank (1-based). Self-matches
    (same id) excluded when query ids share the corpus id space.
    Physical plan: broadcast(queries) ⋈ corpus scan → per-query top-k via
    window. Corpus is scanned once, never shuffled; only (Q×k) rows
    shuffle for the final ranking."""
    qid = query_id_col or id_col
    # Norms below the join: one sqrt-fold per ROW per side instead of
    # two per PAIR — same sequential fold, bit-identical cosine.
    q = queries.select(
        F.col(qid).alias("query_id"),
        F.col(vec_col).alias("qv"),
        norm(F.col(vec_col)).alias("qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
    )
    # Self-exclusion ONLY when query ids share the corpus id space
    # (query_id_col is None, per the docstring): with a separate query
    # id space, a coincidentally id-equal true neighbor must not be
    # silently dropped.
    if query_id_col is None:
        joined = c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
    else:
        joined = c.crossJoin(F.broadcast(q))
    scored = joined.withColumn(
        "cos_sim", dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def _seeded_hyperplanes(dim: int, n_planes: int, seed: str = "srp") -> list[list[float]]:
    """Deterministic pseudo-gaussian hyperplanes from an md5 counter
    stream (sum of 3 uniforms − 1.5 ≈ gaussian enough for SRP signs)."""
    planes: list[list[float]] = []
    for p in range(n_planes):
        row: list[float] = []
        for d in range(dim):
            u = []
            for r in range(3):
                h = hashlib.md5(f"{seed}|{p}|{d}|{r}".encode()).hexdigest()
                u.append(int(h[:15], 16) / float(1 << 60))
            row.append(sum(u) - 1.5)
        planes.append(row)
    return planes


def srp_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-of-projection bit bucket: int key from n_planes sign bits."""
    key = F.lit(0)
    for i, plane in enumerate(planes):
        proj = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(w) for w in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        key = key + F.when(proj >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return key


_TABLES = "__srp_tables"


def _with_tables(df: DataFrame, tables: list[list[list[float]]]) -> DataFrame:
    """Attach the full n_tables×n_planes×dim hyperplane set as ONE
    broadcast one-row column (array<array<array<double>>>) — the
    ivf._with_centroids pattern (r13 opt): the literal form expanded
    n_tables·n_planes·dim ``F.lit`` nodes (2 048 at the 8×4×64
    default), and BUILDING that expression tree (one py4j call per
    node) measured 3-6 s per SRP entry before a single task ran, plus
    a codegen source that grows with the table set. As a broadcast
    relation the plan is constant-size in n_tables·n_planes·dim."""
    tdf = df.sparkSession.createDataFrame(
        [([[[float(w) for w in plane] for plane in t] for t in tables],)],
        f"{_TABLES}: array<array<array<double>>>",
    )
    return df.crossJoin(F.broadcast(tdf))


def _proj(vec: Column, plane: Column) -> Column:
    """Sequential left-to-right projection fold — bit-identical to the
    literal-plane form in ``srp_bucket`` (same zip order, same IEEE
    ops), just reading the plane from a column."""
    return F.aggregate(
        F.zip_with(vec, plane, lambda x, w: x.cast("double") * w),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _bucket_from(vec: Column, table: Column, n_planes: int) -> Column:
    """Sign-bit bucket from a plane-array column: fold planes in index
    order, adding 2^i when the projection is non-negative — the same
    integer accumulation ``srp_bucket`` unrolls over literals,
    INCLUDING its type promotion: ≤31 planes accumulate in int (every
    2^i fits), 32–62 in bigint (the literal chain auto-promoted
    ``F.lit(1 << i)`` to long there; casting 2^31+ into array<int>
    would ANSI-overflow instead). >62 planes cannot fit a signed
    bigint bucket — fail loudly at build time (r13 advisor)."""
    if n_planes > 62:
        raise ValueError(
            f"SRP bucket needs n_planes <= 62 (signed bigint), got {n_planes}"
        )
    elem_t = "int" if n_planes <= 31 else "bigint"
    pow2 = F.lit([1 << i for i in range(n_planes)]).cast(f"array<{elem_t}>")
    indexed = F.zip_with(
        table,
        F.sequence(F.lit(0), F.lit(n_planes - 1)),
        lambda plane, i: F.struct(plane.alias("p"), i.alias("i")),
    )
    return F.aggregate(
        indexed,
        F.lit(0).cast(elem_t),
        lambda acc, s: acc
        + F.when(
            _proj(vec, s["p"]) >= 0, F.element_at(pow2, s["i"] + 1)
        ).otherwise(F.lit(0).cast(elem_t)),
    )


def _srp_banded(
    df: DataFrame,
    tables: list[list[list[float]]],
    idc: str,
    vc: str,
    out_id: str,
) -> DataFrame:
    """(id, table_idx, bucket) — one output row per hash table, IDS
    ONLY: the n_tables-way explode must not duplicate the embedding
    (n_tables x dim floats per row through every downstream shuffle is
    the dominant volume at scale); vectors are re-joined by id AFTER
    candidate dedup (see _with_vectors). The bucket array is projected
    BELOW the explode, so the O(n_tables·n_planes·dim) projection work
    runs once per input row, not once per exploded row. Hyperplanes
    ride a one-row broadcast relation (``_with_tables``), not literal
    expression nodes — bit-identical buckets, constant-size plan."""
    n_planes = len(tables[0])
    # uniform plane count is a precondition: zip_with null-pads a
    # shorter table, silently reading missing planes' sign bits as 0
    # (the literal form used each table's own length) — guard, don't
    # mis-bucket (r13 advisor; current generators are always uniform)
    if any(len(t) != n_planes for t in tables):
        raise ValueError(
            "SRP tables must all have the same plane count; got "
            f"{sorted({len(t) for t in tables})}"
        )
    vec = F.col(vc)
    buckets = F.transform(
        F.col(_TABLES),
        lambda tbl, ti: F.struct(
            ti.alias("table_idx"),
            _bucket_from(vec, tbl, n_planes).alias("bucket"),
        ),
    )
    # Loud dim check, per row (one F.size — negligible): with the wrong
    # ``dim``, zip_with NULL-pads the hyperplane products, the fold goes
    # NULL, every sign bit reads 0, and EVERY row lands in bucket 0 —
    # silently turning the bucketed ANN join into the full cross join
    # this module exists to avoid.
    n_dim = len(tables[0][0])
    guarded = F.when(F.size(F.col(vc)) == n_dim, buckets).otherwise(
        F.raise_error(
            F.concat(
                F.lit(f"SRP hyperplanes are {n_dim}-dim but got a vector of "),
                F.size(F.col(vc)).cast("string"),
                F.lit(" dims — pass the correct dim= to the SRP entry point"),
            )
        )
    )
    pre = _with_tables(df, tables).select(
        F.col(idc).alias(out_id), guarded.alias("_bk")
    )
    return pre.select(out_id, F.explode("_bk").alias("b")).select(
        out_id, "b.table_idx", "b.bucket"
    )


def _with_vectors(
    pairs: DataFrame,
    df: DataFrame,
    idc: str,
    vc: str,
    sides: tuple[str, str],
) -> DataFrame:
    """Join the (vec, norm) of both pair sides back by id. Norms are
    computed once per corpus ROW below the joins — same sequential
    fold, bit-identical cosine downstream."""
    vecs = df.select(
        F.col(idc).alias("_vid"),
        F.col(vc).alias("_v"),
        norm(F.col(vc)).alias("_n"),
    )
    out = pairs
    for side, tag in zip(sides, ("a", "b")):
        out = out.join(
            vecs.select(
                F.col("_vid").alias(side),
                F.col("_v").alias(f"v{tag}"),
                F.col("_n").alias(f"n{tag}"),
            ),
            side,
        )
    return out


def arrow_cosine_scores(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """(id_a, id_b, cos_sim) from a pair relation carrying ``va``/``na``
    /``vb``/``nb`` (the ``_with_vectors`` layout) — the vectorized twin
    of the HOF cosine for LARGE candidate volumes (r13 opt, guide §4.2).

    Bit-exactness contract: the kernel loops over DIMENSIONS in index
    order while vectorizing over ROWS (``acc += A[:, j] * B[:, j]`` in
    float64), so each pair's float64 accumulation SEQUENCE is identical
    to ``dot()``'s sequential left-to-right fold — same products, same
    addition order, same final division — and the result is
    bit-identical to the expression form (asserted by the oracle
    parity of every entry that uses it, and by
    tests/test_llm_ops.py::test_arrow_cosine_matches_hof). The HOF fold
    is interpreted (~µs per 64-dim pair); this runs the same arithmetic
    through NumPy at vector speed — worth the one Python boundary only
    when pair volume is large (candidate sets of corpus-scale near-dup
    joins). Small/latency-sensitive paths (the headline cosine_topk,
    query-batch ANN) keep the pure-JVM expression form: a Python worker
    spawn costs more than it saves there.

    Inputs must be dense fixed-dimension vectors (no NULL embeddings,
    no ragged rows) — violations raise loudly rather than mis-scoring.
    """
    import numpy as np
    import pyarrow as pa

    out_fields = [
        pairs.schema[id_a],
        pairs.schema[id_b],
    ]
    out_schema = (
        f"{id_a} {out_fields[0].dataType.simpleString()}, "
        f"{id_b} {out_fields[1].dataType.simpleString()}, "
        "cos_sim double"
    )

    def score(batches):
        for rb in batches:
            n = rb.num_rows
            ia, ib = rb.column(id_a), rb.column(id_b)
            if n == 0:
                yield pa.RecordBatch.from_arrays(
                    [ia, ib, pa.array([], type=pa.float64())],
                    [id_a, id_b, "cos_sim"],
                )
                continue
            va, vb = rb.column("va"), rb.column("vb")
            if va.null_count or vb.null_count:
                raise ValueError(
                    "arrow_cosine_scores: NULL embedding in the pair "
                    "relation — dense vectors are a precondition"
                )
            d = len(va[0])
            fa, fb = va.flatten(), vb.flatten()
            # top-level null_count misses NULL ELEMENTS inside an
            # embedding array, which would silently become NaN scores
            # — the docstring promises violations raise (r13 advisor)
            if fa.null_count or fb.null_count:
                raise ValueError(
                    "arrow_cosine_scores: NULL element inside an "
                    "embedding array — dense vectors are a precondition"
                )
            if len(fa) != n * d or len(fb) != n * d:
                raise ValueError(
                    "arrow_cosine_scores: ragged embedding lengths — "
                    f"expected {n}x{d} on both sides, got {len(fa)}/{len(fb)}"
                )
            A = np.asarray(fa, dtype=np.float64).reshape(n, d)
            B = np.asarray(fb, dtype=np.float64).reshape(n, d)
            acc = np.zeros(n, dtype=np.float64)
            for j in range(d):  # dim order == the HOF fold order
                acc += A[:, j] * B[:, j]
            cos = acc / (
                np.asarray(rb.column("na"), dtype=np.float64)
                * np.asarray(rb.column("nb"), dtype=np.float64)
            )
            yield pa.RecordBatch.from_arrays(
                [ia, ib, pa.array(cos, type=pa.float64())],
                [id_a, id_b, "cos_sim"],
            )

    return pairs.select(id_a, id_b, "va", "na", "vb", "nb").mapInArrow(
        score, out_schema
    )


def srp_ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
) -> DataFrame:
    """Approximate top-k: candidates = corpus rows sharing an SRP bucket
    with the query in ANY of ``n_tables`` hash tables; exact cosine +
    top-k within candidates. Returns query_id, neighbor_id, cos_sim, rank.

    Scale: corpus is bucketed once per table (narrow projection-only
    pass), the join key is (table_idx, bucket) — selectivity ~2^-n_planes
    per table — so the candidate set is ~n_tables/2^n_planes of N per
    query instead of N."""
    tables = [
        _seeded_hyperplanes(dim, n_planes, seed=f"srp{t}") for t in range(n_tables)
    ]

    cb = _srp_banded(corpus, tables, id_col, vec_col, "neighbor_id")
    qb = _srp_banded(queries, tables, id_col, vec_col, "query_id")
    cand_ids = (
        cb.join(qb, ["table_idx", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .dropDuplicates(["query_id", "neighbor_id"])
        .select("query_id", "neighbor_id")
    )
    qvecs = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("va"),
        norm(F.col(vec_col)).alias("na"),
    )
    cvecs = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("vb"),
        norm(F.col(vec_col)).alias("nb"),
    )
    cand = (
        cand_ids.join(qvecs, "query_id")
        .join(cvecs, "neighbor_id")
        .withColumn(
            "cos_sim",
            dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def near_dup_by_cosine(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (id_a < id_b, cos ≥ threshold)
    via the SRP band-bucket pair join — the embedding analogue of
    minhash_near_dup_pairs. NO top-k cap: a vector with thousands of
    near-dups keeps every qualifying pair (an earlier route through
    srp_ann_topk(k=50) silently dropped pairs past the cap). Join key is
    (table_idx, bucket) only; hot buckets fall to AQE skew handling."""
    tables = [
        _seeded_hyperplanes(dim, n_planes, seed=f"srp{t}") for t in range(n_tables)
    ]
    banded = _srp_banded(df, tables, id_col, vec_col, "id")
    a, b = banded.alias("a"), banded.alias("b")
    pair_ids = (
        a.join(
            b,
            (F.col("a.table_idx") == F.col("b.table_idx"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    # scoring via the vectorized same-order kernel (r13 opt): candidate
    # volume here is corpus-scale (every bucket-sharing pair), where the
    # interpreted HOF fold dominated — arrow_cosine_scores runs the
    # bit-identical arithmetic ~10x faster per pair
    return (
        arrow_cosine_scores(
            _with_vectors(pair_ids, df, id_col, vec_col, ("id_a", "id_b"))
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )


def quantize_int8(vec: Column) -> tuple[Column, Column]:
    """Per-vector symmetric int8 quantization: (scale, array<int> q).

    scale = max|v_i| / 127; q_i = floor(v_i/scale + 0.5) ∈ [-127, 127]
    (floor(x+0.5) instead of round(): identical half-up behavior in
    every engine, where round() ties differ — the oracle replays this
    bit-for-bit in DuckDB). max via an order-independent exact
    comparison fold; the one division per element is a single IEEE op.

    Why it matters at 100 TB: a float32 embedding column is 4 bytes/dim;
    int8 + one float scale is ~4× less scan I/O and shuffle for ANN
    candidate generation, with the float path kept only for re-ranking
    the survivors. The zero-vector guard (tiny floor on scale) keeps the
    expression NULL-free without changing any real embedding."""
    absd = F.transform(vec, lambda x: F.abs(x.cast("double")))
    scale = F.greatest(F.array_max(absd), F.lit(1e-30)) / F.lit(127.0)
    q = F.transform(
        vec,
        lambda x: F.floor(x.cast("double") / scale + F.lit(0.5)).cast("int"),
    )
    return scale, q


def hard_negatives(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive/embedding training: for
    every anchor, the k corpus rows MOST cosine-similar to it among
    those carrying a DIFFERENT label — the negatives that actually
    teach the margin (random negatives are trivially separable).

    Returns (anchor_id, anchor_label, neighbor_id, neighbor_label,
    cos_sim, rank). Plan: same broadcast-anchors shape as
    brute_force_topk — the corpus scans once and never shuffles, the
    label inequality rides the join condition so same-label pairs are
    dropped before any scoring; only A×k rows reach the ranking
    shuffle. At scale, pre-bucket candidates with SRP/IVF exactly like
    the ANN paths and apply the same label-exclusion join.

    NULL labels are excluded EXPLICITLY on both sides (an unlabeled
    anchor has no well-defined negatives; an unlabeled corpus row can't
    be proven a different class) — without the filters the NULL
    inequality would drop them silently inside the join condition."""
    anchors = anchors.filter(F.col(label_col).isNotNull())
    corpus = corpus.filter(F.col(label_col).isNotNull())
    a = anchors.select(
        F.col(id_col).alias("anchor_id"),
        F.col(vec_col).alias("av"),
        norm(F.col(vec_col)).alias("an"),
        F.col(label_col).alias("anchor_label"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("cv"),
        norm(F.col(vec_col)).alias("cn"),
        F.col(label_col).alias("neighbor_label"),
    )
    scored = c.join(
        F.broadcast(a), F.col("anchor_label") != F.col("neighbor_label")
    ).withColumn(
        "cos_sim", dot(F.col("av"), F.col("cv")) / (F.col("an") * F.col("cn"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "anchor_id", "anchor_label", "neighbor_id", "neighbor_label",
            "cos_sim", "rank",
        )
    )
