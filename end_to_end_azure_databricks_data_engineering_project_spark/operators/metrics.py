"""Distributed evaluation metrics for training pipelines.

A data engine that curates training corpora also has to SCORE the
models trained on them — and at 100 TB of eval predictions the metric
computation is itself a distributed problem. The operators here keep
every intermediate in exact integer/decimal space so results are
bit-identical across engines, partitionings, and runs (the same house
rule as the dedup/sketch families: the only floating-point op is one
final IEEE division of exact values).

The AUC state — per-bin (pos, neg) counts — is a MONOID (merge = sum
by bin), so the metric splits into ``per_bin_counts`` (mergeable,
bounded at |bins| rows) and ``auc_from_bins`` (the finisher). Batch
callers use ``binned_auc``; the streaming drain
(``streaming/flows.py::run_auc_drain``) maintains the bins table
incrementally and finishes on demand — same math, one definition.

Reference parity: the reference pipeline has no model-eval stage (its
gold layer ends at BI aggregates, gold_Facts.py), so this module is
part of the mandated LLM-pipeline extension surface, not a port.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "binned_auc",
    "per_bin_counts",
    "merge_bin_counts",
    "merge_grouped_bin_counts",
    "auc_from_bins",
    "grouped_per_bin_counts",
    "grouped_auc_from_bins",
    "pr_curve_from_bins",
    "average_precision_from_bins",
    "threshold_metrics_from_bins",
    "retrieval_eval",
    "cohens_kappa",
]

_DEC = "decimal(38,0)"


def per_bin_counts(
    df: DataFrame,
    score_bin_col: str | Column,
    positive_col: str | Column,
) -> DataFrame:
    """Per-score-bin (pos, neg) counts — the mergeable AUC state.

    ``score_bin_col`` must be integral (the caller quantizes a raw
    float score, e.g. ``floor(score * 1000)``); ``positive_col`` is a
    boolean. Rows whose bin or label is NULL are EXCLUDED (the standard
    metric semantic: a missing prediction can't be ranked — and NULL
    ordering diverges cross-engine: Spark windows put NULLS FIRST,
    DuckDB NULLS LAST, so a NULL bin would rank at opposite ends).

    One map-side-combinable groupBy onto ≤ |bins| rows; counts merge
    across batches/tables by summing per bin. Returns (bin, pos, neg).
    """
    return grouped_per_bin_counts(df, [], score_bin_col, positive_col)


def merge_bin_counts(*bins: DataFrame) -> DataFrame:
    """Merge per-bin count relations by summing per bin — the monoid
    op that makes AUC maintainable incrementally (state stays ≤ |bins|
    rows forever). GLOBAL state only: grouped (sliced) state must merge
    by (group…, bin) — use ``merge_grouped_bin_counts``, or this would
    silently pool every segment into one."""
    return merge_grouped_bin_counts([], *bins)


def merge_grouped_bin_counts(group_cols: list[str], *bins: DataFrame) -> DataFrame:
    """Merge grouped per-bin count relations by summing per
    (group…, bin) — the sliced-eval monoid op."""
    out = bins[0]
    for b in bins[1:]:
        out = out.unionByName(b)
    return out.groupBy(*group_cols, "bin").agg(
        F.sum("pos").alias("pos"), F.sum("neg").alias("neg")
    )


def auc_from_bins(bins: DataFrame) -> DataFrame:
    """Finish exact ROC-AUC from a (bin, pos, neg) relation via the
    Mann-Whitney rank-sum identity with average-rank ties.

    Math (all exact until the last line):
        neg_below_b = Σ_{b' < b} neg_b'
        2U = Σ_b pos_b * (2 * neg_below_b + neg_b)
        AUC = 2U / (2 * n_pos * n_neg)
    The ``+ neg_b`` term credits ties at half weight — identical to
    averaging ranks within a tie group. 2U and the denominator
    accumulate in decimal(38,0): the per-bin product is ~2·n², past
    int64 at ~2e9 rows of each class — exactly the scale this module
    claims (the connected_components digest rule). decimal(38,0)→double
    is a single correct rounding on both engines (scale 0, no /10^s
    second rounding), so the final division stays bit-identical.

    The single-partition window is safe because the input is the
    ALREADY-AGGREGATED bins relation, bounded by the caller's binning.
    Returns one row: n_pos (bigint), n_neg (bigint), u2 (decimal(38,0)),
    auc (double).
    """
    st = _auc_state(bins, [])
    return st.select(
        "n_pos",
        "n_neg",
        F.col("_u2").alias("u2"),
        # one-class input → AUC undefined → NULL on BOTH engines (an
        # unguarded division diverges: ANSI Spark throws DIVIDE_BY_ZERO,
        # DuckDB returns inf/nan)
        _auc_div().alias("auc"),
    )


def _auc_state(bins: DataFrame, group_cols: list[str]) -> DataFrame:
    """ONE home for the Mann-Whitney accumulation (global finisher =
    grouped finisher with no partition columns — the exact-arithmetic
    discipline lives here once). Returns (group…, n_pos, n_neg, _u2)."""
    w = (
        Window.partitionBy(*group_cols)
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = bins.withColumn(
        "_neg_below", F.coalesce(F.sum("neg").over(w), F.lit(0))
    )
    return scored.groupBy(*group_cols).agg(
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
        F.sum(
            F.col("pos").cast(_DEC)
            * (2 * F.col("_neg_below") + F.col("neg")).cast(_DEC)
        ).cast(_DEC).alias("_u2"),
    )


def _auc_div() -> Column:
    return F.when(
        (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
        F.col("_u2").cast("double")
        / (2 * F.col("n_pos").cast(_DEC) * F.col("n_neg").cast(_DEC)).cast("double"),
    )


def grouped_per_bin_counts(
    df: DataFrame,
    group_cols: list[str],
    score_bin_col: str | Column,
    positive_col: str | Column,
) -> DataFrame:
    """Per-(segment, score-bin) (pos, neg) counts — the mergeable state
    for SLICED evaluation (per-language / per-source / per-cohort AUC,
    the model-governance requirement that a global metric hides
    regressions in). Same NULL semantics as ``per_bin_counts`` — rows
    with a NULL bin, label, OR segment value are excluded (an
    unassignable row can't contribute to any slice, and NULL ordering
    diverges cross-engine). One map-side-combinable groupBy onto
    ≤ |segments|·|bins| rows; merge across batches with
    ``merge_grouped_bin_counts``."""
    bin_c = F.col(score_bin_col) if isinstance(score_bin_col, str) else score_bin_col
    pos_c = F.col(positive_col) if isinstance(positive_col, str) else positive_col
    out = df.select(
        *group_cols,
        bin_c.cast("bigint").alias("bin"),
        pos_c.cast("int").alias("_p"),
    ).filter(F.col("bin").isNotNull() & F.col("_p").isNotNull())
    for g in group_cols:
        out = out.filter(F.col(g).isNotNull())
    return out.groupBy(*group_cols, "bin").agg(
        F.sum("_p").alias("pos"),
        F.sum(F.lit(1) - F.col("_p")).alias("neg"),
    )


def grouped_auc_from_bins(bins: DataFrame, group_cols: list[str]) -> DataFrame:
    """Finish exact per-segment ROC-AUC from a grouped (group…, bin,
    pos, neg) relation — ``auc_from_bins``' math per segment, with the
    window PARTITIONED BY the segment columns: unlike the global
    finisher's single-partition window, this one parallelizes across
    segments, so sliced eval is actually CHEAPER per segment at scale
    than one global AUC. Same exact-arithmetic discipline
    (decimal(38,0) accumulation, one IEEE division per segment, NULL
    for one-class segments). Returns one row per segment:
    (group…, n_pos, n_neg, auc)."""
    return _auc_state(bins, group_cols).select(
        *group_cols, "n_pos", "n_neg", _auc_div().alias("auc")
    )


def pr_curve_from_bins(bins: DataFrame) -> DataFrame:
    """Precision-recall curve from the SAME (bin, pos, neg) monoid
    that backs AUC/ROC/calibration — one threshold per distinct score
    bin, predicting positive at ``score_bin >= bin``:

        tp(b) = Σ_{b' >= b} pos_b'     fp(b) = Σ_{b' >= b} neg_b'
        precision = tp / (tp + fp)     recall = tp / n_pos

    All cumulative sums are exact integers over the bounded bins
    relation (window over ≤ |bins| rows — raw predictions never sort);
    each output float is ONE IEEE division of exact values, so the
    curve is bit-identical across engines. ``tp + fp >= 1`` by
    construction (every bin row holds at least one example); recall is
    NULL when the slice has no positives (same one-class guard as
    ``auc_from_bins``). Maintained incrementally for streams by
    ``run_auc_drain``'s bins table — point this finisher at it.

    Returns (bin, tp, fp, precision, recall) ordered by any consumer's
    choice (bin DESC walks the curve from strictest threshold).
    """
    w = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tp, fp = F.sum("pos").over(w), F.sum("neg").over(w)
    n_pos = F.sum("pos").over(t)
    return bins.select(
        "bin",
        tp.cast("bigint").alias("tp"),
        fp.cast("bigint").alias("fp"),
        (tp.cast("double") / (tp + fp).cast("double")).alias("precision"),
        F.when(n_pos > 0, tp.cast("double") / n_pos.cast("double")).alias(
            "recall"
        ),
    )


def average_precision_from_bins(bins: DataFrame) -> DataFrame:
    """Exact average precision (the step-wise AP of scikit-learn's
    ``average_precision_score``, computed on the quantized bins) from
    the shared (bin, pos, neg) monoid:

        AP = Σ_b ΔR(b) · P(b) = (Σ_b pos_b · tp_b / (tp_b + fp_b)) / n_pos

    with tp/fp cumulative from the strictest threshold INCLUDING bin b.

    Float discipline (the module house rule): each per-bin term is one
    division of exact integers (``pos·tp`` accumulates in
    decimal(38,0) — past int64 at ~3e9 examples); the term SUM is a
    sequential fold in pinned bin-DESC order (``F.aggregate`` over a
    sorted array ↔ DuckDB ``list_reduce(list(... ORDER BY bin DESC))``)
    because float addition does not commute across partitionings. The
    fold's array is the BOUNDED bins relation — never raw predictions.
    NULL (not NaN/throw) when the slice is all-negative.

    Returns one row: n_pos, n_neg, ap (double).
    """
    w = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tp, fp = F.sum("pos").over(w), F.sum("neg").over(w)
    term = (F.col("pos").cast(_DEC) * tp.cast(_DEC)).cast("double") / (
        tp + fp
    ).cast("double")
    scored = bins.select("bin", "pos", "neg", term.alias("_term"))
    folded = scored.agg(
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
        F.aggregate(
            F.reverse(
                F.sort_array(F.collect_list(F.struct("bin", "_term")))
            ),
            F.lit(0.0),
            lambda acc, s: acc + s["_term"],
        ).alias("_num"),
    )
    return folded.select(
        "n_pos",
        "n_neg",
        F.when(
            F.col("n_pos") > 0, F.col("_num") / F.col("n_pos").cast("double")
        ).alias("ap"),
    )


def threshold_metrics_from_bins(bins: DataFrame) -> DataFrame:
    """Confusion-matrix metrics per score-bin threshold (predict
    positive at ``score_bin >= bin``) from the shared (bin, pos, neg)
    monoid: tp/fp/fn/tn as exact cumulative integers, then accuracy,
    precision, recall, and F1 — each ONE IEEE division of exact ints.
    F1 uses the single-division identity ``2·tp / (2·tp + fp + fn)``
    (algebraically 2PR/(P+R)) so it never composes two already-rounded
    doubles — the same bit-stability discipline as the rest of the
    family. Denominator-zero slices (no predicted positives for
    precision, no actual positives for recall/F1) yield NULL.
    Maintained incrementally for streams by ``run_auc_drain``'s bins
    table. Returns (bin, tp, fp, fn, tn, accuracy, precision_,
    recall_, f1) — metric columns suffixed to dodge reserved words.
    """
    w = Window.orderBy(F.col("bin").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    t = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    tp, fp = F.sum("pos").over(w), F.sum("neg").over(w)
    n_pos, n_neg = F.sum("pos").over(t), F.sum("neg").over(t)
    fn, tn = n_pos - tp, n_neg - fp
    total = n_pos + n_neg
    return bins.select(
        "bin",
        tp.cast("bigint").alias("tp"),
        fp.cast("bigint").alias("fp"),
        fn.cast("bigint").alias("fn"),
        tn.cast("bigint").alias("tn"),
        ((tp + tn).cast("double") / total.cast("double")).alias("accuracy"),
        F.when(
            tp + fp > 0, tp.cast("double") / (tp + fp).cast("double")
        ).alias("precision_"),
        F.when(n_pos > 0, tp.cast("double") / n_pos.cast("double")).alias(
            "recall_"
        ),
        F.when(
            (n_pos > 0) & ((2 * tp + fp + fn) > 0),
            (2 * tp).cast("double") / (2 * tp + fp + fn).cast("double"),
        ).alias("f1"),
    )


def binned_auc(
    df: DataFrame,
    score_bin_col: str | Column,
    positive_col: str | Column,
) -> DataFrame:
    """EXACT ROC-AUC over integer-binned scores: ``auc_from_bins`` ∘
    ``per_bin_counts`` (see both for the math, NULL semantics, and
    overflow discipline). AUC is exact for the quantized score.

    Scale shape: one map-side-combinable groupBy onto ≤ |bins| rows,
    then a window over that *aggregated* relation — the raw predictions
    never enter a global sort, which is what makes this exact-AUC
    formulation viable at 100 TB where a naive rank() over all
    predictions is not.
    """
    return auc_from_bins(per_bin_counts(df, score_bin_col, positive_col))


def brier_from_bins(bins: DataFrame, scale: int = 1000) -> DataFrame:
    """EXACT Brier score from the per-bin (pos, neg) monoid: for the
    quantized prediction p̂ = bin/scale, mean squared error vs the
    binary label is

        brier = [ Σ_b pos_b·(scale − b)² + neg_b·b² ] / (scale²·n)

    — a RATIONAL function of integer counts (module house rule), so
    everything accumulates exactly (decimal(38,0): pos·(scale−b)² can
    pass int64 at ~1e13 rows) and the ONLY float is one final IEEE
    division, bit-identical on any engine. Calibration's quadratic
    twin to ``auc_from_bins``'s ranking view, riding the SAME
    mergeable drain state (``run_auc_drain`` / ``metric_stream``) —
    one streaming accumulator funds both metrics.

    Returns one row: n, brier_num (decimal), brier (double; NULL when
    the state is empty)."""
    agg = bins.agg(
        F.coalesce(
            F.sum((F.col("pos") + F.col("neg")).cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("n"),
        F.coalesce(
            F.sum(
                # squares as DECIMAL multiplies, never F.pow: pow is an
                # IEEE double and rounds past 2^53, silently breaking
                # the exact-integer contract (and parity with the SQL
                # twin's exact product) for large quantized bins
                (
                    F.col("pos").cast("decimal(38,0)")
                    * (F.lit(scale) - F.col("bin")).cast("decimal(38,0)")
                    * (F.lit(scale) - F.col("bin")).cast("decimal(38,0)")
                    + F.col("neg").cast("decimal(38,0)")
                    * F.col("bin").cast("decimal(38,0)")
                    * F.col("bin").cast("decimal(38,0)")
                )
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("brier_num"),
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n"),
        F.col("brier_num"),
        F.when(
            F.col("n") > 0,
            F.col("brier_num").cast("double")
            / (F.lit(float(scale * scale)) * F.col("n").cast("double")),
        ).alias("brier"),
    )


def binned_brier(
    df: DataFrame,
    score_bin_col: str | Column,
    positive_col: str | Column,
    scale: int = 1000,
) -> DataFrame:
    """``brier_from_bins`` ∘ ``per_bin_counts`` — exact Brier score of
    a quantized score against a binary label in one map-side-
    combinable pass (NULL bins/labels excluded, same semantics as
    ``binned_auc``)."""
    return brier_from_bins(per_bin_counts(df, score_bin_col, positive_col), scale)


def _lcm_1_to(k: int) -> int:
    from math import gcd

    out = 1
    for i in range(2, k + 1):
        out = out * i // gcd(out, i)
    return out


def retrieval_eval(
    ranked: DataFrame,
    relevant: DataFrame,
    k: int,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
    rel_query_col: str = "query_id",
    rel_item_col: str = "item_id",
    query_universe: DataFrame | None = None,
) -> DataFrame:
    """Exact retrieval metrics (hits@k, micro precision@k, MRR@k) for a
    ranked result list against a relevance set — the QA gate for the
    ANN/search stack (``similarity``, ``ivf``, ``pq``): run the exact
    and the approximate retriever through the same scorer and read the
    recall cost of the index right off the report.

    Everything stays in exact-integer space (the module house rule):
    reciprocal ranks are scaled by ``lcm(1..k)`` so ``Σ scale/rank`` is
    an exact integer (``mrr_num``); the ONLY floats are two final IEEE
    divisions of exact values, bit-identical on any engine. Per-query
    reduction is a MIN (first relevant rank) — no float sums anywhere.

    Scale shape: one broadcast-sized join per ranked row (the relevance
    set for evaluated queries is eval-sized), one groupBy query, one
    global count — no windows over the corpus, no driver loops. Rows in
    ``ranked`` beyond rank k are ignored (callers may pass a deeper
    list). Queries with NO relevant item count toward the MRR/precision
    denominator with contribution 0 (the standard harsh-macro
    convention, stated so oracle replays agree).

    Denominator caveat: with the default ``query_universe=None``,
    ``n_queries`` counts DISTINCT queries present in ``ranked`` (at
    rank ≤ k) — a query for which the retriever returned zero rows, or
    only rows deeper than k, drops out and silently inflates
    precision@k and MRR. Pass ``query_universe`` (one query-id column,
    named ``query_col``; e.g. the evaluated query set, or
    ``relevant.select(...)``) to fix the denominator: universe queries
    absent from the ranked list contribute 0 to every numerator.

    Returns one row: n_queries, hits_at_k, mrr_num, mrr_scale,
    precision_at_k (double), mrr (double).
    """
    if not 1 <= k <= 40:
        # lcm(1..41) = 219060189739591200 > 2^53: the per-row
        # scale/_first division stops being exact in double (and past
        # int64 at k=43 the bigint cast overflows outright) — the
        # silent-wrong-mrr failure mode, so refuse loudly. For
        # recall@50/@100-style evals, run this scorer per cutoff <= 40
        # or use an unscaled float MRR variant.
        raise ValueError(
            f"retrieval_eval: k must be in [1, 40] (lcm(1..k) must stay "
            f"under 2^53 for the exact-integer rank scaling), got {k}"
        )
    scale = _lcm_1_to(k)
    r = ranked.select(
        F.col(query_col).alias("_q"),
        F.col(item_col).alias("_i"),
        F.col(rank_col).cast("bigint").alias("_r"),
    ).filter(F.col("_r") <= k)
    rel = relevant.select(
        F.col(rel_query_col).alias("_q"), F.col(rel_item_col).alias("_i")
    ).distinct()
    # ONE pass over the ranked list: LEFT join the broadcast relevance
    # set, then a single groupBy covers hit counting, first-relevant
    # rank, AND the query universe. (An inner hits-join plus a separate
    # distinct-queries branch would compute the ranked list — i.e. the
    # whole retrieval — twice, and their reconciliation join SMJ'd;
    # caught by test_retrieval_eval_broadcasts_eval_relations.)
    marked = r.join(
        F.broadcast(rel.withColumn("_rel", F.lit(1))), ["_q", "_i"], "left"
    )
    per_q = marked.groupBy("_q").agg(
        F.sum(F.when(F.col("_rel").isNotNull(), 1).otherwise(0)).alias("_hits"),
        F.min(F.when(F.col("_rel").isNotNull(), F.col("_r"))).alias("_first"),
    )
    if query_universe is not None:
        # fix the denominator: the universe DEFINES the evaluated query
        # set — universe queries the retriever returned nothing for (or
        # only rows past k) re-enter with 0 hits and no first-relevant
        # rank instead of silently dropping out, and ranked queries
        # outside the universe are excluded. Both sides are eval-sized
        # aggregated relations (per_q is post-groupBy); no hint needed.
        uni = query_universe.select(F.col(query_col).alias("_q")).distinct()
        per_q = uni.join(per_q, ["_q"], "left")
    joined = per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        F.sum(F.coalesce(F.col("_hits"), F.lit(0))).alias("hits_at_k"),
        # scale = lcm(1..k) and _first ≤ k, so scale/_first is an exact
        # integer — the cast happens per row BEFORE the sum, keeping the
        # accumulation in bigint (no float reduction to order).
        F.sum(
            F.coalesce(
                (F.lit(scale) / F.col("_first")).cast("bigint"), F.lit(0)
            )
        ).alias("mrr_num"),
    )
    return joined.select(
        "n_queries",
        "hits_at_k",
        "mrr_num",
        F.lit(scale).cast("bigint").alias("mrr_scale"),
        F.when(
            F.col("n_queries") > 0,
            F.col("hits_at_k").cast("double")
            / (F.col("n_queries") * F.lit(k)).cast("double"),
        ).alias("precision_at_k"),
        F.when(
            F.col("n_queries") > 0,
            F.col("mrr_num").cast("double")
            / (F.col("n_queries") * F.lit(scale)).cast("double"),
        ).alias("mrr"),
    )


def cohens_kappa(df: DataFrame, a_col: str | Column, b_col: str | Column) -> DataFrame:
    """Cohen's kappa — chance-corrected agreement between two
    categorical raters/classifiers, the standard QA statistic when two
    labeling pipelines (a rule filter and a model, two annotator
    cohorts) score the same corpus and you need to know whether they
    agree beyond what their marginals force.

    Kappa is a RATIONAL function of contingency counts, so the whole
    computation stays exact-integer (module house rule):
        kappa = (N·agree − Σ_c na_c·nb_c) / (N² − Σ_c na_c·nb_c)
    with one final IEEE division. Rows where either label is NULL are
    excluded (a missing label can't agree or disagree).

    Scale shape: ONE map-side-combinable groupBy(a, b) reduces the
    corpus to the |A|×|B| contingency table; marginals and the pe term
    are table-sized joins. Products accumulate in decimal(38,0) (N² is
    past int64 at ~3e9 rows — this module's claimed scale); the final
    decimal→double casts are scale-0 single roundings, bit-stable.

    Returns one row: n, agree, pe_num (decimal), kappa_num (decimal),
    kappa_den (decimal), kappa (double; NULL when the denominator is 0
    — both raters constant and identical, agreement is vacuous).
    """
    a = (F.col(a_col) if isinstance(a_col, str) else a_col).cast("string")
    b = (F.col(b_col) if isinstance(b_col, str) else b_col).cast("string")
    ct = (
        df.select(a.alias("_a"), b.alias("_b"))
        .filter(F.col("_a").isNotNull() & F.col("_b").isNotNull())
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    na = ct.groupBy("_a").agg(F.sum("_n").alias("_na"))
    nb = ct.groupBy("_b").agg(F.sum("_n").alias("_nb"))
    pe = (
        na.join(nb, na["_a"] == nb["_b"])
        .agg(
            F.coalesce(
                F.sum(F.col("_na").cast(_DEC) * F.col("_nb").cast(_DEC)), F.lit(0)
            ).cast(_DEC).alias("pe_num")
        )
    )
    tot = ct.agg(
        F.sum("_n").alias("n"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_n")).otherwise(0)).alias(
            "agree"
        ),
    )
    out = tot.crossJoin(pe).select(
        "n",
        "agree",
        "pe_num",
        (F.col("n").cast(_DEC) * F.col("agree").cast(_DEC) - F.col("pe_num"))
        .cast(_DEC)
        .alias("kappa_num"),
        (F.col("n").cast(_DEC) * F.col("n").cast(_DEC) - F.col("pe_num"))
        .cast(_DEC)
        .alias("kappa_den"),
    )
    return out.withColumn(
        "kappa",
        F.when(
            F.col("kappa_den") != 0,
            F.col("kappa_num").cast("double") / F.col("kappa_den").cast("double"),
        ),
    )
