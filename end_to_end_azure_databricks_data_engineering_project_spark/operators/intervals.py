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

__all__ = ["merge_intervals", "interval_coverage", "coverage_from_islands", "resample_ffill"]


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


def resample_ffill(
    df: DataFrame,
    key_col: str,
    sec_col,
    value_col: str,
    step: int,
    order_col: str | None = None,
    out_sec: str = "grid_sec",
) -> DataFrame:
    """Per-key regular-grid resampling with forward fill — the as-of
    view of an irregular series: one row per ``step``-second grid
    point between the key's first and last observation (grid aligned
    to multiples of ``step``), carrying the MOST RECENT observation's
    ``value_col`` at or before that point. The time-series resample
    every feature pipeline needs before joining event-derived signals
    onto a fixed cadence.

    Scale shape: bounds = one map-side-combinable groupBy(key); the
    grid is a bounded sequence-explode (span/step rows per key); the
    fill is ONE window over the key partition ordered by (sec,
    is_grid, order) — the naive as-of formulation is a per-grid-point
    range join against the observations (quadratic per key); this is
    a union + single sort. Skewed keys degrade to a sort, never a
    cross product.

    Determinism: ties at the same second resolve by ``order_col``
    (REQUIRED if several observations can share a second — without it
    the carried value is partition-order-dependent). NULL observation
    values do not overwrite (last ignorenulls); a grid point before
    the key's first non-null observation is NULL.

    ``sec_col``: integral epoch seconds (column or Column expression —
    quantize timestamps with ``F.unix_micros(ts)/1e6`` floored).
    Returns (key_col, out_sec, value_col).
    """
    sec = F.col(sec_col) if isinstance(sec_col, str) else sec_col
    # NULL-second rows are DROPPED: Spark's ascending window puts NULLS
    # FIRST, so an unfiltered null-ts observation would forward-fill as
    # the "earliest" state (and diverge from NULLS LAST engines)
    obs = df.select(
        F.col(key_col),
        sec.cast("bigint").alias("__sec"),
        F.col(value_col).alias("__v"),
        F.lit(0).alias("__is_grid"),
        (F.col(order_col) if order_col else F.lit(0)).alias("__ord"),
    ).filter(F.col("__sec").isNotNull())
    # grid bounds: first grid point = ceil(min/step)*step (guaranteed
    # >= an observation, so it carries a value), last = floor(max/step)
    # *step; exact in double while sec < 2^53
    bounds = obs.groupBy(key_col).agg(
        (F.ceil(F.min("__sec") / F.lit(step)) * step).cast("bigint").alias("__lo"),
        (F.floor(F.max("__sec") / F.lit(step)) * step).cast("bigint").alias("__hi"),
    )
    grid = (
        bounds.filter(F.col("__hi") >= F.col("__lo"))
        .select(
            key_col,
            F.explode(
                F.sequence(F.col("__lo"), F.col("__hi"), F.lit(step).cast("bigint"))
            ).alias("__sec"),
        )
        .withColumn("__v", F.lit(None).cast(obs.schema["__v"].dataType))
        .withColumn("__is_grid", F.lit(1))
        .withColumn("__ord", F.lit(None).cast(obs.schema["__ord"].dataType))
    )
    # observations sort BEFORE the grid marker at the same second
    # (__is_grid 0 < 1), so a point-in-time grid row sees same-second
    # observations; __ord breaks same-second observation ties. NULL
    # ordering never decides anything: grid rows are unique per (key,
    # sec) and observation __ord is caller-guaranteed discriminating.
    w = (
        Window.partitionBy(key_col)
        .orderBy("__sec", "__is_grid", "__ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        obs.unionByName(grid)
        .withColumn("__f", F.last("__v", ignorenulls=True).over(w))
        .filter(F.col("__is_grid") == 1)
        .select(
            key_col,
            F.col("__sec").alias(out_sec),
            F.col("__f").alias(value_col),
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_sec_col: str,
    right_sec_col: str,
    value_cols: "list[str]",
    order_col: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """Backward as-of join: attach to every left row the LATEST right
    row with the same key and right time <= left time (inclusive) —
    the point-in-time lookup behind feature joins ("the user's last
    click before this purchase"), quote/trade alignment, and SCD
    state-at-event reads.

    Scale shape: the classic formulation is a per-row range join
    (quadratic per key); this is the union trick — tag both sides,
    ONE window over the key partition ordered by (sec, side, order)
    carrying the right payload forward — so each key streams through
    a single sort, exactly like ``resample_ffill``.

    Determinism: right rows sharing (key, sec) resolve by
    ``order_col`` (required when such ties are possible); right rows
    AT the left row's second count as "<=" (right sorts before left
    at the same second). Right rows where EVERY value column is NULL
    still advance the as-of state (they are a real observation).
    Returns the left rows plus ``<value_col><suffix>`` columns (NULL
    when no right row precedes).
    """
    clashes = [c for c in value_cols if f"{c}{suffix}" in left.columns]
    if clashes or len(set(value_cols)) != len(value_cols):
        # a silent duplicate column surfaces later as AMBIGUOUS_REFERENCE
        # far from the cause — fail at the call site instead
        raise ValueError(
            f"asof_join: output column(s) "
            f"{[f'{c}{suffix}' for c in clashes] or value_cols} collide; "
            "pass a different suffix"
        )
    payload = F.struct(*[F.col(c) for c in value_cols])
    # NULL-second rows are DROPPED on both sides: Spark's NULLS FIRST
    # window order would make a null-ts right row the baseline state
    # for EVERY left row ("<= any time"), and a null-ts left row's
    # result would be engine-ordering-dependent
    r = right.select(
        F.col(key_col),
        F.col(right_sec_col).cast("bigint").alias("__sec"),
        payload.alias("__p"),
        F.lit(0).alias("__side"),
        (F.col(order_col) if order_col else F.lit(0)).alias("__ord"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(f"__l_{c}")
            for c in left.columns
        ],
    ).filter(F.col("__sec").isNotNull())
    l = left.select(
        F.col(key_col),
        F.col(left_sec_col).cast("bigint").alias("__sec"),
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__ord"].dataType).alias("__ord"),
        *[F.col(c).alias(f"__l_{c}") for c in left.columns],
    ).filter(F.col("__sec").isNotNull())
    w = (
        Window.partitionBy(key_col)
        .orderBy("__sec", "__side", "__ord")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        r.unionByName(l)
        .withColumn("__state", F.last("__p", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    keep = [F.col(f"__l_{c}").alias(c) for c in left.columns]
    vals = [F.col("__state")[c].alias(f"{c}{suffix}") for c in value_cols]
    return out.select(*keep, *vals)
