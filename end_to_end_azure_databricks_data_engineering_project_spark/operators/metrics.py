"""Distributed evaluation metrics for training pipelines.

A data engine that curates training corpora also has to SCORE the
models trained on them — and at 100 TB of eval predictions the metric
computation is itself a distributed problem. The operators here keep
every intermediate in exact integer space so results are bit-identical
across engines, partitionings, and runs (the same house rule as the
dedup/sketch families: the only floating-point op is one final IEEE
division of exact integers).

Reference parity: the reference pipeline has no model-eval stage (its
gold layer ends at BI aggregates, gold_Facts.py), so this module is
part of the mandated LLM-pipeline extension surface, not a port.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["binned_auc"]


def binned_auc(
    df: DataFrame,
    score_bin_col: str | Column,
    positive_col: str | Column,
) -> DataFrame:
    """EXACT ROC-AUC over integer-binned scores via the Mann-Whitney
    rank-sum identity, with the standard average-rank tie treatment.

    ``score_bin_col`` must be an integral column (the caller quantizes
    a raw float score, e.g. ``floor(score * 1000)`` — AUC is then exact
    for the quantized score). ``positive_col`` is a boolean.

    Math (all exact until the last line):
        per bin b (ascending): pos_b, neg_b
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

    Rows whose score bin or label is NULL are EXCLUDED (the standard
    metric semantic: a missing prediction can't be ranked). Counting
    them would also break cross-engine parity — Spark windows order
    NULLS FIRST, DuckDB NULLS LAST, so a NULL bin would rank at
    opposite ends. n_pos/n_neg count only scored rows; audit coverage
    upstream if NULL predictions matter.

    Scale shape: one map-side-combinable groupBy onto ≤ |bins| rows,
    then a window over that *aggregated* relation. The single-partition
    window is safe because the caller's binning bounds |bins| (e.g.
    1000 bins for a [0,1) score at 3 decimals) — the raw rows never
    enter a global sort, which is what makes this exact-AUC formulation
    viable at 100 TB where a naive rank() over all predictions is not.
    Returns one row: n_pos (bigint), n_neg (bigint), u2 (decimal(38,0)),
    auc (double).
    """
    bin_c = F.col(score_bin_col) if isinstance(score_bin_col, str) else score_bin_col
    pos_c = F.col(positive_col) if isinstance(positive_col, str) else positive_col
    per_bin = (
        df.select(bin_c.cast("bigint").alias("_bin"), pos_c.cast("int").alias("_p"))
        .filter(F.col("_bin").isNotNull() & F.col("_p").isNotNull())
        .groupBy("_bin")
        .agg(
            F.sum("_p").alias("_pos"),
            F.sum(F.lit(1) - F.col("_p")).alias("_neg"),
        )
    )
    w = Window.orderBy("_bin").rowsBetween(Window.unboundedPreceding, -1)
    scored = per_bin.withColumn(
        "_neg_below", F.coalesce(F.sum("_neg").over(w), F.lit(0))
    )
    dec = "decimal(38,0)"
    return scored.agg(
        F.sum("_pos").alias("n_pos"),
        F.sum("_neg").alias("n_neg"),
        F.sum(
            F.col("_pos").cast(dec)
            * (2 * F.col("_neg_below") + F.col("_neg")).cast(dec)
        ).cast(dec).alias("u2"),
    ).select(
        "n_pos",
        "n_neg",
        "u2",
        (
            F.col("u2").cast("double")
            / (2 * F.col("n_pos").cast(dec) * F.col("n_neg").cast(dec)).cast("double")
        ).alias("auc"),
    )
