"""Interval algebra: gaps-and-islands over per-key interval sets.

Merging overlapping/adjacent intervals ("islands") is the classic
time-coverage primitive — activity coverage from event pings, sensor
uptime, SLA windows, ad-exposure reach. The reference models sessions
only implicitly (FactStream's per-user event stream,
initial_load.sql:45-53); this generalizes the engine's ``sessionize``
to arbitrary intervals with exact integer arithmetic.

Scale shape: everything is per-key window work — one shuffle onto the
key, two window passes, one aggregation. No self-join (the naive
interval-overlap formulation is O(n²) per key); a key's rows stream
through its window sorted, so skewed keys degrade to a sort, never to
a cross product.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["merge_intervals", "interval_coverage", "coverage_from_islands"]


def merge_intervals(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    order_col: str,
    weight_col: str | None = None,
) -> DataFrame:
    """Merge each key's overlapping-or-touching integer intervals into
    islands. Returns one row per island: ``key_col, island_start,
    island_end, n_rows``.

    A new island begins where a row's start exceeds the running maximum
    end of all PRIOR rows (prior in (start, order_col) order —
    ``order_col`` must make the sort total, or island numbering is
    nondeterministic under ties; the OBSERVABLE output is tie-order
    independent either way, since equal starts always share an island).
    Touching intervals (start == prior end) merge: coverage semantics
    treat [a,b] ∪ [b,c] as one span. ``start_col``/``end_col`` must be
    integral (epoch seconds); exact integer comparisons only, so the
    island set is bit-stable across engines and partitionings.

    ``weight_col``: when the input rows are THEMSELVES islands (the
    incremental re-merge in ``streaming/flows.py::run_islands_drain``),
    pass their ``n_rows`` so the output's ``n_rows`` sums original rows
    instead of counting island fragments — this is what makes island
    merging an idempotent monoid: merge(islands(A) ∪ islands(B)) is
    row-identical to islands(A ∪ B), weights included.
    """
    w_ord = Window.partitionBy(key_col).orderBy(start_col, order_col)
    prior_max_end = F.max(end_col).over(
        w_ord.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = df.withColumn(
        "_new_island",
        F.when(prior_max_end.isNull() | (F.col(start_col) > prior_max_end), 1).otherwise(0),
    ).withColumn(
        "_island",
        F.sum("_new_island").over(w_ord.rowsBetween(Window.unboundedPreceding, 0)),
    )
    n_rows = (
        F.sum(weight_col) if weight_col is not None else F.count(F.lit(1))
    ).alias("n_rows")
    return (
        flagged.groupBy(key_col, "_island")
        .agg(
            F.min(start_col).alias("island_start"),
            F.max(end_col).alias("island_end"),
            n_rows,
        )
        .drop("_island")
    )


def interval_coverage(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
    order_col: str,
) -> DataFrame:
    """Per-key coverage stats over the merged islands: ``key_col,
    n_islands, covered, longest`` — total and max island length in the
    same integer units as the inputs. Pure integer aggregation over
    ``merge_intervals``; one extra groupBy on the key."""
    return coverage_from_islands(
        merge_intervals(df, key_col, start_col, end_col, order_col), key_col
    )


def coverage_from_islands(islands: DataFrame, key_col: str) -> DataFrame:
    """Finish per-key coverage from an islands relation (the shape
    ``merge_intervals`` emits and ``run_islands_drain`` persists):
    ``key_col, n_islands, covered, longest``."""
    span = F.col("island_end") - F.col("island_start")
    return islands.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum(span).alias("covered"),
        F.max(span).alias("longest"),
    )
