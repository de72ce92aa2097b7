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

__all__ = ["binned_auc", "per_bin_counts", "merge_bin_counts", "auc_from_bins"]

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
    bin_c = F.col(score_bin_col) if isinstance(score_bin_col, str) else score_bin_col
    pos_c = F.col(positive_col) if isinstance(positive_col, str) else positive_col
    return (
        df.select(bin_c.cast("bigint").alias("bin"), pos_c.cast("int").alias("_p"))
        .filter(F.col("bin").isNotNull() & F.col("_p").isNotNull())
        .groupBy("bin")
        .agg(
            F.sum("_p").alias("pos"),
            F.sum(F.lit(1) - F.col("_p")).alias("neg"),
        )
    )


def merge_bin_counts(*bins: DataFrame) -> DataFrame:
    """Merge per-bin count relations by summing per bin — the monoid
    op that makes AUC maintainable incrementally (state stays ≤ |bins|
    rows forever)."""
    out = bins[0]
    for b in bins[1:]:
        out = out.unionByName(b)
    return out.groupBy("bin").agg(
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
    w = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, -1)
    scored = bins.withColumn(
        "_neg_below", F.coalesce(F.sum("neg").over(w), F.lit(0))
    )
    return scored.agg(
        F.sum("pos").alias("n_pos"),
        F.sum("neg").alias("n_neg"),
        F.sum(
            F.col("pos").cast(_DEC)
            * (2 * F.col("_neg_below") + F.col("neg")).cast(_DEC)
        ).cast(_DEC).alias("u2"),
    ).select(
        "n_pos",
        "n_neg",
        "u2",
        # one-class input → AUC undefined → NULL on BOTH engines (an
        # unguarded division diverges: ANSI Spark throws DIVIDE_BY_ZERO,
        # DuckDB returns inf/nan)
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.col("u2").cast("double")
            / (2 * F.col("n_pos").cast(_DEC) * F.col("n_neg").cast(_DEC)).cast("double"),
        ).alias("auc"),
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
