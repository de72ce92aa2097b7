"""Corpus-curation operators for training-data pipelines at scale:
sequence packing, per-source quota sampling, global token-budget
selection, and bigram language-model scoring.

Shared design rules (same as the rest of the engine):
 - Every ordering/selection decision keys off a PORTABLE md5 hash
   (`functions.scalars.portable_hash64` shape) so the result is
   identical on any engine, any partitioning, any rerun — and
   replayable by the DuckDB oracles.
 - Integer arithmetic everywhere a sum crosses partitions (token
   counts, pack sums) — exact regardless of combine order. The one
   float reduction (bigram score) is an ordered sequential fold.
 - No driver-side data: the heaviest driver state here is nothing at
   all — even the global prefix sum keeps its shard offsets in a
   broadcast-joined n_shards-row DataFrame.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.functions.scalars import portable_hash64
from end_to_end_azure_databricks_data_engineering_project_spark.operators.text import token_count


def _phash(prefix: str, col: Column) -> Column:
    """63-bit positive int from a salted id via scalars.portable_hash64
    — DuckDB twin:
    CAST(('0x' || substr(md5('<prefix>' || id), 1, 15)) AS BIGINT)."""
    return portable_hash64(F.concat(F.lit(prefix), col.cast("string")))


def sequence_packing(
    docs: DataFrame,
    budget: int = 256,
    n_shards: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Concat-and-chunk sequence packing: documents are laid out in a
    deterministic pseudo-random order (md5 hash, ties by id) and cut
    into packs of ``budget`` tokens; a document belongs to the pack
    where it STARTS (greedy concatenation — the standard pretraining
    layout). Returns one row per pack: (shard, pack_id, n_docs,
    pack_tokens).

    Scale shape: the running token sum is a window partitioned by an
    md5 shard — each of the ``n_shards`` streams packs independently,
    so no global sort and no single-partition window; parallelism =
    n_shards (size it to the cluster). All sums are integer → exact
    under any partial-agg order."""
    h = _phash("pack|", F.col(id_col))
    base = docs.select(
        F.col(id_col).alias("_id"),
        (h % n_shards).cast("int").alias("shard"),
        h.alias("_h"),
        token_count(F.col(text_col)).alias("_tok"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col("_id").asc())
    packed = base.withColumn(
        "pack_id",
        F.floor((F.sum("_tok").over(w) - F.col("_tok")) / F.lit(budget)).cast("bigint"),
    )
    return packed.groupBy("shard", "pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tok").cast("bigint").alias("pack_tokens"),
    )


def pack_segments(
    docs: DataFrame,
    budget: int = 256,
    shard_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    r"""Segment-level sequence packing — the dataloader's view of
    concat-and-chunk: lay each shard's documents out end to end in
    ``id_col`` order and cut the token stream every ``budget`` tokens;
    emit one row per (document × pack it crosses) with the
    DOC-RELATIVE token slice that lands in that pack. Where
    ``sequence_packing`` summarizes packs, this materializes the
    assignment a training job actually reads: packs are reassembled by
    grouping on (shard, seq_id) and slicing each doc's tokens
    [off_from, off_to).

    Scale shape: the running token sum is a window PARTITIONED BY the
    shard column (each shard packs independently — no global sort, no
    single-partition window), and a document's segment rows come from
    a bounded sequence-explode over the packs it spans (a doc of T
    tokens crosses at most T/budget + 1 packs). All arithmetic is
    exact integers. NULL/blank-text documents are excluded (nothing to
    pack — and a zero-length doc must not reach the explode, where an
    inverted sequence bound would fabricate phantom segments). Tokens
    are non-whitespace runs (``\S+`` extraction, NOT a split): a
    whitespace-only doc counts 0 — split-based counting sees 2 phantom
    boundary tokens on e.g. "\n" and would shift every later doc's
    prefix sum in the shard."""
    if budget < 1:
        raise ValueError(f"pack_segments: budget must be >= 1, got {budget}")
    base = (
        docs.filter(F.col(text_col).isNotNull())
        .select(
            F.col(shard_col).alias("shard"),
            F.col(id_col),
            F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(r"\S+"), 0)
            ).cast("bigint").alias("_cnt"),
        )
        .filter(F.col("_cnt") > 0)
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    laid = base.withColumn(
        "_start", F.coalesce(F.sum("_cnt").over(w), F.lit(0))
    )
    b = F.lit(budget)
    seg = laid.select(
        "shard",
        id_col,
        "_cnt",
        "_start",
        F.explode(
            F.sequence(
                F.floor(F.col("_start") / b).cast("bigint"),
                F.floor((F.col("_start") + F.col("_cnt") - 1) / b).cast("bigint"),
            )
        ).alias("seq_id"),
    )
    return seg.select(
        "shard",
        "seq_id",
        id_col,
        (
            F.greatest(F.col("_start"), F.col("seq_id") * b) - F.col("_start")
        ).cast("bigint").alias("off_from"),
        (
            F.least(F.col("_start") + F.col("_cnt"), (F.col("seq_id") + 1) * b)
            - F.col("_start")
        ).cast("bigint").alias("off_to"),
    )


def quota_per_group(
    docs: DataFrame,
    group_col: str = "source",
    quota: int = 15,
    id_col: str = "doc_id",
) -> DataFrame:
    """Domain-mix rebalancing: cap each group (source/domain/language)
    at ``quota`` documents, selected by portable md5 order — the
    deterministic analogue of "sample n per domain". Returns
    (doc_id, <group_col>, pick_rank).

    Scale shape: one hash-shuffle on the group key + window row_number
    — map-side nothing to combine, but the per-group state is a single
    counter. Skewed groups cost one fat partition; salt upstream if a
    single domain dominates (see skew.py)."""
    h = _phash("quota|", F.col(id_col))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.select(id_col, group_col)
        .withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= quota)
    )


def token_budget_head(
    docs: DataFrame,
    budget: int,
    n_shards: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Deterministic corpus subset under a GLOBAL token budget: lay all
    documents on one virtual line ordered by (shard, hash, id) and keep
    every document whose running total stays ≤ budget. Returns
    (doc_id, cum_tokens).

    Distributed prefix sum, no global sort: per-shard running sums via
    a shard-partitioned window, shard base offsets via an exclusive
    prefix sum over the n_shards-row totals (a window over a relation
    of n_shards rows — trivially tiny), broadcast-joined back. The
    driver never holds anything; the heaviest sequential structure is
    the n_shards-row offsets relation. All integer arithmetic → exact
    and partitioning-independent."""
    h = _phash("budget|", F.col(id_col))
    base = docs.select(
        F.col(id_col),
        (h % n_shards).cast("int").alias("shard"),
        h.alias("_h"),
        token_count(F.col(text_col)).cast("bigint").alias("_tok"),
    )
    w = Window.partitionBy("shard").orderBy(F.col("_h").asc(), F.col(id_col).asc())
    local = base.withColumn("_cum_in", F.sum("_tok").over(w))
    totals = base.groupBy("shard").agg(F.sum("_tok").alias("_stot"))
    woff = (
        Window.orderBy(F.col("shard").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "shard", F.coalesce(F.sum("_stot").over(woff), F.lit(0)).alias("_off")
    )
    return (
        local.join(F.broadcast(offsets), "shard")
        .withColumn("cum_tokens", (F.col("_off") + F.col("_cum_in")).cast("bigint"))
        .filter(F.col("cum_tokens") <= budget)
        .select(id_col, "cum_tokens")
    )


def dsir_select(
    docs: DataFrame,
    target_expr: str = "lang = 'en'",
    n_buckets: int = 1024,
    top_n: int = 50,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """DSIR-style importance resampling (Xie et al. 2023, "Data
    Selection for Language Models via Importance Resampling"): score
    every document by how target-like its hashed-unigram distribution
    is, then keep the ``top_n`` highest-scoring documents. Returns
    (doc_id, n_tokens, dsir_score, sel_rank).

    The importance signal per token is the smoothed probability ratio
    r(w) = p_target(bucket(w)) / p_corpus(bucket(w)) over ``n_buckets``
    hashed-unigram features (add-one smoothing both sides); a document
    scores the MEAN of its tokens' ratios, folded in position order.
    Deviation from the paper, on purpose: the paper sums log-ratios —
    ln() is the one primitive whose low bits differ across engines, so
    the engine stays in ratio space (every value is a quotient of
    exact-integer-valued doubles; cross-engine bit-exact, same rule as
    bigram_lm_score). Ranking by mean-ratio preserves the
    target-likeness ordering signal; swap in F.log at the cost of the
    oracle's hash equality if log-space is required.

    Scale shape: one explode to (doc, pos, bucket) tokens; the bucket
    statistics relation is ≤ n_buckets rows (counts from two map-side-
    partial aggregations + two 1-row totals) and BROADCASTS onto the
    token stream — the only wide exchange is the per-document fold's
    hash shuffle on doc_id. Final selection is TakeOrderedAndProject
    (orderBy + limit top_n), never a global single-partition window;
    the rank window runs over the top_n survivors only."""
    ws = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    toks = (
        docs.filter(F.trim(F.col(text_col)) != "")
        .select(
            F.col(id_col).alias("_id"),
            F.expr(target_expr).alias("_is_tgt"),
            F.posexplode(ws).alias("pos", "w"),
        )
        .select(
            "_id",
            "_is_tgt",
            (F.col("pos") + 1).alias("pos"),
            (_phash("dsir|", F.col("w")) % n_buckets).alias("bucket"),
        )
    ).cache()  # feeds FOUR consumers (src/tgt counts, totals, scoring
    # join) — without the cache the corpus re-tokenizes once per
    # consumer; LRU-evicted, same rationale as exact_jaccard_join
    src = toks.groupBy("bucket").agg(F.count(F.lit(1)).alias("_cs"))
    tgt = (
        toks.filter("_is_tgt")
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("_ct"))
    )
    totals = toks.agg(
        F.count(F.lit(1)).alias("_ns"),
        F.count_if(F.col("_is_tgt")).alias("_nt"),
    )
    # p_t / p_s with each probability evaluated as ONE double division
    # of exact integer counts — the division order is pinned so the
    # oracle replays it bit-for-bit.
    p_tgt = (F.coalesce(F.col("_ct"), F.lit(0)) + 1).cast("double") / (
        F.col("_nt") + n_buckets
    ).cast("double")
    p_src = (F.col("_cs") + 1).cast("double") / (
        F.col("_ns") + n_buckets
    ).cast("double")
    stats = (
        src.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select("bucket", (p_tgt / p_src).alias("_r"))
    )
    ordered_sum = F.aggregate(
        F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("_r")))),
        F.lit(0.0),
        lambda acc, s: acc + s["_r"],
    )
    scored = (
        toks.join(F.broadcast(stats), "bucket")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_tokens"),
            (ordered_sum / F.count(F.lit(1))).alias("dsir_score"),
        )
    )
    top = scored.orderBy(
        F.col("dsir_score").desc(), F.col("_id").asc()
    ).limit(top_n)
    w = Window.orderBy(F.col("dsir_score").desc(), F.col("_id").asc())
    return (
        top.withColumn("sel_rank", F.row_number().over(w).cast("int"))
        .withColumnRenamed("_id", id_col)
        .select(id_col, "n_tokens", "dsir_score", "sel_rank")
    )


def temperature_mixture_sample(
    docs: DataFrame,
    group_col: str = "source",
    target_total: int = 300,
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-flattened domain mixture at T=2 (the DoReMi /
    multilingual-sampling shape): per-group weights
    w_i = sqrt(n_i) / Σ_j sqrt(n_j) up-weight small domains relative to
    proportional sampling; each group contributes ceil(target·w_i)
    documents (naturally capped at n_i) picked in portable-md5 order.
    Returns (doc_id, <group_col>, pick_rank).

    T is fixed at 2 because n^(1/T) is then sqrt — IEEE
    correctly-rounded and therefore cross-engine bit-exact, unlike
    pow(x, 1/T) for general T (whose low bits vary by libm). The
    Σ sqrt(n_j) denominator folds in group order over the n_groups-row
    relation, so even the double total is deterministic.

    Scale shape: group counts are one map-side-combinable agg; the
    weight/quota relation is n_groups rows and broadcasts back; the
    only wide step is quota_per_group's window shuffle on the group
    key.

    NULL-group rows are excluded up front (they can neither receive a
    quota nor equi-join one) — without the filter they would inflate
    the weight denominator and silently push every real group under
    quota."""
    docs = docs.filter(F.col(group_col).isNotNull())
    n_rel = docs.groupBy(group_col).agg(F.count(F.lit(1)).alias("_n"))
    denom = n_rel.agg(
        F.aggregate(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(group_col),
                        F.sqrt(F.col("_n").cast("double")).alias("_s"),
                    )
                )
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["_s"],
        ).alias("_d")
    )
    quota = (
        n_rel.crossJoin(F.broadcast(denom))
        .select(
            group_col,
            F.ceil(
                F.lit(target_total)
                * (F.sqrt(F.col("_n").cast("double")) / F.col("_d"))
            ).cast("bigint").alias("_q"),
        )
    )
    h = _phash("mix|", F.col(id_col))
    w = Window.partitionBy(group_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        docs.select(id_col, group_col)
        .join(F.broadcast(quota), group_col)
        .withColumn("pick_rank", F.row_number().over(w))
        .filter(F.col("pick_rank") <= F.col("_q"))
        .select(id_col, group_col, F.col("pick_rank").cast("int").alias("pick_rank"))
    )


def group_quantile_threshold(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    q: float = 0.25,
) -> DataFrame:
    """Adaptive per-group quality gate: keep rows whose ``value_col`` is
    at or above their OWN group's exact discrete q-quantile (the value
    at rank ceil(q·n) in (value, id) order — percentile_disc semantics
    with a deterministic tie-break). Returns the surviving rows plus a
    ``threshold`` column.

    This is how per-language/per-domain quality filtering avoids one
    global cutoff penalizing whole languages: each group is filtered
    against its own distribution. Prefer q values that are exact binary
    fractions (0.25, 0.5, 0.125…) — q·n is then exactly representable
    and ceil() is engine-independent.

    Scale shape: one rank window per group (hash shuffle on the group
    key; n_groups-way parallelism) producing an n_groups-row threshold
    relation that broadcasts back. At 100 TB replace the exact rank
    pass with the mergeable fixed-bin quantile sketch (see the
    quantile_hist_merge entry) — same broadcast-back shape."""
    w = Window.partitionBy(group_col).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    wn = Window.partitionBy(group_col)
    ranked = (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(wn))
    )
    thr = ranked.filter(
        F.col("_rn") == F.ceil(F.lit(q) * F.col("_n"))
    ).select(group_col, F.col(value_col).alias("threshold"))
    return df.join(F.broadcast(thr), group_col).filter(
        F.col(value_col) >= F.col("threshold")
    )


def bigram_lm_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-trained bigram language-model score per document — the
    classic LM-based quality signal (high score ≈ text that looks like
    the corpus). The model is add-one-smoothed conditional probability
    p(w2|w1) = (c(w1 w2) + 1) / (c(w1·) + V) with counts trained on the
    WHOLE corpus in the same pass; a document's score is the mean of
    its bigram probabilities. Probability space (not log) on purpose:
    every value is a ratio of exact integers evaluated in IEEE double —
    bit-identical across engines, where ln() implementations differ.
    Returns (doc_id, n_bigrams, lm_score); documents with fewer than
    two tokens have no bigrams and are absent.

    Scale shape: one explode to bigram occurrences, two count
    aggregations (map-side partial), two equi-joins back on the bigram/
    prefix keys, one 1-row vocabulary broadcast, and a per-document
    ordered fold (collect_list bounded by tokens-per-doc). No all-pairs
    anything; hot bigrams ride AQE skew splitting."""
    ws = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    toks = docs.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("_id"), ws.alias("_ws")
    )
    # (w1, bigram) structs via zip_with over the two shifted slices —
    # ~5× faster than transform(sequence)+element_at (per-index array
    # access is the slow path in interpreted HOFs); the size<2 guard
    # keeps slice() from negative lengths on 1-token docs.
    pairs = F.when(
        F.size("_ws") >= 2,
        F.zip_with(
            F.expr("slice(_ws, 1, size(_ws) - 1)"),
            F.expr("slice(_ws, 2, size(_ws) - 1)"),
            lambda a, b: F.struct(
                a.alias("w1"), F.concat(a, F.lit(" "), b).alias("bg")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,bg:string>>"))
    bg = toks.select("_id", pairs.alias("_ps")).select(
        "_id", F.posexplode("_ps").alias("pos", "p")
    ).select("_id", (F.col("pos") + 1).alias("pos"), "p.w1", "p.bg")
    c2 = bg.groupBy("bg").agg(F.count(F.lit(1)).alias("_c2"))
    # c(w1·) = Σ_w2 c(w1 w2): derived from the ALREADY-AGGREGATED
    # bigram table (vocab² rows at most) instead of re-scanning the
    # bigram stream — exact integer identity, one fewer wide pass.
    c1 = (
        c2.withColumn("w1", F.substring_index(F.col("bg"), " ", 1))
        .groupBy("w1")
        .agg(F.sum("_c2").alias("_c1"))
    )
    vocab = (
        toks.select(F.explode("_ws").alias("w"))
        .agg(F.countDistinct("w").alias("_v"))
    )
    scored = (
        bg.join(c2, "bg")
        .join(c1, "w1")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "_p",
            (F.col("_c2") + 1).cast("double") / (F.col("_c1") + F.col("_v")).cast("double"),
        )
    )
    ordered_sum = F.aggregate(
        F.array_sort(F.collect_list(F.struct(F.col("pos"), F.col("_p")))),
        F.lit(0.0),
        lambda acc, s: acc + s["_p"],
    )
    return scored.groupBy("_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_bigrams"),
        (ordered_sum / F.count(F.lit(1))).alias("lm_score"),
    ).withColumnRenamed("_id", id_col)
