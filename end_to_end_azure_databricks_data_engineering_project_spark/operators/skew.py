"""Skew- and layout-aware physical helpers.

At 100 TB the engine's enemies are (a) hot keys that serialize one
reducer and (b) repeated shuffles of the same fact table. Tools here:

 - ``salted_latest_per_key``: two-phase latest-row-per-key for heavily
   skewed keys — local (salted) top-1 per partition-slice, then global
   top-1 over the tiny survivor set. Same result as
   ``transforms.dedup_keep_latest`` but the hot key's rows split across
   ``n_salt`` reducers first.
 - ``salted_count_distinct``: two-phase exact count-distinct
   (key,value)-dedup then count — avoids the single-reducer expand of a
   global COUNT(DISTINCT) on a hot group.
 - ``write_bucketed`` / ``bucketed_join_ready``: persist a table
   bucketed by its join key so later equi-joins on that key are
   shuffle-free on both sides (co-located scan). This is the batch
   answer to "reuse a partitioning across stages".

AQE's skew-join splitting (enabled in session.py) covers the join case;
these helpers cover aggregation/window skew, which AQE does not split.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def salted_latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    sequence_col: str,
    *tiebreakers: str,
    n_salt: int = 16,
) -> DataFrame:
    """Deterministic latest-per-key that survives hot keys.

    Phase 1: row_number within (keys, salt) — the hot key's rows are
    spread over ``n_salt`` reducers; each slice keeps 1 row.
    Phase 2: row_number within (keys) over ≤ n_salt survivors.

    MEASURED CAVEAT (r8, scripts/skew_stress.py): on Spark >= 3.5 the
    plain ``transforms.dedup_keep_latest`` (row_number + rn=1 filter)
    already gets a PARTIAL ``WindowGroupLimit`` below the exchange —
    each map partition pre-reduces to 1 row per key, so a hot key ships
    at most #map-partitions rows and the plain form is skew-resistant
    BY PLAN (50M rows, one key = 50%: plain 3.4s vs salted 12.2s — the
    salt's second shuffle is pure overhead there). Keep this helper for
    window shapes rank-limit pushdown cannot pre-reduce (top-k with a
    data-dependent k, engines without the rule) and as the documented
    two-phase pattern; prefer ``dedup_keep_latest`` on Spark 4.

    Determinism REQUIRES (sequence_col, *tiebreakers) to be unique per
    key — include a unique id as the final tiebreaker. With ties, the
    all-column salt can route the tied rows to different slices and
    phase 2's row_number picks a partition-order-dependent winner
    (exactly one row still survives, but which one can vary run to run
    and differ from dedup_keep_latest's arbitrary pick)."""
    order = [F.col(sequence_col).desc()] + [F.col(c).desc() for c in tiebreakers]
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(n_salt))
    )
    w1 = Window.partitionBy(*keys, "__salt").orderBy(*order)
    survivors = (
        salted.withColumn("__rn", F.row_number().over(w1)).filter("__rn = 1").drop("__rn")
    )
    w2 = Window.partitionBy(*keys).orderBy(*order)
    return (
        survivors.withColumn("__rn", F.row_number().over(w2))
        .filter("__rn = 1")
        .drop("__rn", "__salt")
    )


def salted_count_distinct(
    df: DataFrame, group_cols: Sequence[str], distinct_col: str
) -> DataFrame:
    """Exact count(distinct x) per group as dedup-then-count — two
    ordinary hash aggregations (both with map-side partial combine)
    instead of one expand-based distinct aggregate."""
    return (
        df.select(*group_cols, distinct_col)
        .dropDuplicates([*group_cols, distinct_col])
        .groupBy(*group_cols)
        .agg(F.count(F.lit(1)).alias(f"n_distinct_{distinct_col}"))
    )


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 16,
    sort_col: str | None = None,
) -> None:
    """Persist bucketed (and optionally sorted) by the join key.

    Later equi-joins between two tables bucketed on the same key with
    the same bucket count run WITHOUT a shuffle on either side."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)


def bucketed_join_ready(spark: SparkSession, left: str, right: str, on: str) -> DataFrame:
    """Join two pre-bucketed saved tables on their bucket key."""
    return spark.table(left).join(spark.table(right), on)


def zorder_key(x: Column, y: Column, bits: int = 10) -> Column:
    """Morton (Z-order) interleave of two non-negative bucket ids.

    Multi-dimensional clustering for data layout: sorting by a Z-value
    keeps rows close in BOTH dimensions physically adjacent, so parquet
    row-group min/max stats prune scans filtered on EITHER column —
    single-column sort keys only prune the leading column. This is the
    open equivalent of Delta's OPTIMIZE ZORDER BY.

    Pure integer arithmetic (``(x // 2^i) % 2``, no engine bit
    intrinsics) so the exact value is replayable in any SQL engine —
    the ``zorder_cluster`` catalog oracle recomputes it in DuckDB.
    Inputs must already be reduced to ``bits``-wide buckets (use
    ``pmod``); 2*bits ≤ 62 keeps everything in int64. Two-column
    convenience wrapper over ``zorder_key_n`` (bit-identical layout:
    x at even positions, y at odd).
    """
    return zorder_key_n([x, y], bits)


def zorder_key_n(cols: "list[Column]", bits: int = 10) -> Column:
    """N-way Morton (Z-order) interleave of non-negative bucket ids —
    the general form behind Delta's OPTIMIZE ZORDER BY (col1, ..,
    colN): bit ``i`` of column ``j`` lands at position ``n*i + j``, so
    sorting by the Z-value keeps rows adjacent in EVERY dimension and
    per-file min/max stats prune on ANY of the columns.

    Replayable integer arithmetic (``(x >> i) % 2`` — DuckDB spells it
    ``(x // 2^i) % 2``; both are exact over the full int64 range).
    Inputs must already be reduced to ``bits``-wide buckets;
    ``len(cols) * bits`` must stay ≤ 62 to fit int64 — more dimensions
    trade depth per dimension (the usual Z-order curse: past ~4 columns
    each gets too few bits to prune well, exactly as Delta's docs warn).

    Bit extraction uses ``F.shiftright`` (exact 64-bit integer shift),
    NOT double division ``c / 2^i`` — IEEE doubles round past 2^53, so
    a single-column call with bits in 54..62 would silently compute
    wrong Z-values under the divide form. For bits ≤ 53 the two forms
    are bit-identical (the DuckDB oracles recompute via integer ``//``,
    which agrees with the shift everywhere).
    """
    n = len(cols)
    if n < 1:
        raise ValueError("zorder_key_n: need at least one column")
    if n * bits > 62:
        raise ValueError(
            f"zorder_key_n: {n} columns x {bits} bits = {n * bits} "
            "interleaved bits exceeds the int64 budget (62)"
        )
    z = F.lit(0).cast("bigint")
    for i in range(bits):
        for j, c in enumerate(cols):
            bit = F.shiftright(c.cast("bigint"), i) % 2
            z = z + bit * F.lit(2 ** (n * i + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    x_col: str,
    y_col: str,
    *,
    bits: int = 10,
    n_files: int = 32,
) -> None:
    """Write parquet range-partitioned and sorted by the Z-value of
    (x_col, y_col): each output file covers a tight rectangle in both
    dimensions, so min/max footer stats prune on either predicate.
    The Z column itself is dropped — it is a layout key, not data."""
    z = zorder_key(F.col(x_col), F.col(y_col), bits)
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )


def distributed_ranks(
    df: DataFrame,
    order_by: "Sequence[str | tuple[str, str]]",
    *,
    row_number_col: str | None = None,
    rank_col: str | None = None,
    dense_rank_col: str | None = None,
    ntile: "tuple[int, str] | None" = None,
    n_ranges: int = 32,
) -> DataFrame:
    """Global ``row_number`` / ``rank`` / ``dense_rank`` / ``ntile``
    over a total ORDER BY WITHOUT a single-partition window — the
    scale-safe form of ``Window.orderBy(...)`` (whose plan is one
    WindowExec partition holding the whole relation).

    ``order_by``: column names, optionally ``(name, 'desc')`` tuples.
    Each requested output names its column; ``ntile=(n, col)``.

    Physical shape: range-shuffle on the FULL order key (parallelism =
    ``n_ranges``), pin the draw with a ``localCheckpoint`` (the counts
    job and the ranking job must see the same boundaries — same rule
    as ``distributed_row_number``), per-range local windows, then add
    per-range offsets from a driver-side ``n_ranges``-row count list
    (model-sized). Exactness under ties: a range partitioner sends
    EQUAL keys to one partition, so a tie group of the full key never
    spans ranges — local rank + row offset and local dense_rank +
    distinct-key offset compose to the exact global values. ntile
    derives from the global row position and total count (SQL ntile:
    the first ``total % n`` buckets get one extra row). NULLs in the
    order key are refused (range partitioning on NULL is
    engine-defined)."""
    pairs = [
        (c, "asc") if isinstance(c, str) else (c[0], c[1].lower())
        for c in order_by
    ]
    if any(d not in ("asc", "desc") for _, d in pairs):
        raise ValueError("order_by directions must be 'asc' or 'desc'")
    out_cols = [
        c for c in (row_number_col, rank_col, dense_rank_col) if c
    ] + ([ntile[1]] if ntile else [])
    if not out_cols:
        raise ValueError("distributed_ranks: no output requested")
    reserved = {"__pid"} | set(out_cols)
    bad = sorted(c for c in df.columns if c in reserved)
    if bad:
        raise ValueError(
            f"distributed_ranks: column name(s) {bad} collide with the "
            "helper's working/output columns — rename before ranking"
        )
    sort_exprs = [
        F.col(c).desc() if d == "desc" else F.col(c).asc() for c, d in pairs
    ]
    parts = (
        df.repartitionByRange(n_ranges, *sort_exprs)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    key = F.struct(*[F.col(c) for c, _ in pairs])
    stats = {
        r["__pid"]: (r["n"], r["nd"])
        for r in parts.groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct(key).alias("nd"),
        )
        .collect()
    }
    row_off: dict[int, int] = {}
    key_off: dict[int, int] = {}
    acc_n = acc_d = 0
    for pid in sorted(stats):
        row_off[pid] = acc_n
        key_off[pid] = acc_d
        acc_n += stats[pid][0]
        acc_d += stats[pid][1]
    total = acc_n

    def _off_expr(offsets: dict[int, int]) -> Column:
        if not offsets:
            return F.lit(0)
        omap = F.create_map(
            *[x for pid, off in sorted(offsets.items())
              for x in (F.lit(pid), F.lit(off))]
        )
        # a pid absent from the map = the two jobs saw different
        # boundary draws (pinning broken): fail loudly, never rank wrong
        return F.when(
            omap[F.col("__pid")].isNotNull(), omap[F.col("__pid")]
        ).otherwise(
            F.raise_error(F.concat(
                F.lit("distributed_ranks: partition id absent from the "
                      "counts map (boundary draw changed between jobs?) "
                      "pid="),
                F.col("__pid").cast("string"),
            ))
        )

    w = Window.partitionBy("__pid").orderBy(*sort_exprs)
    out = parts
    pos = (F.row_number().over(w) + _off_expr(row_off)).cast("bigint")
    if row_number_col:
        out = out.withColumn(row_number_col, pos)
    if rank_col:
        out = out.withColumn(
            rank_col, (F.rank().over(w) + _off_expr(row_off)).cast("bigint")
        )
    if dense_rank_col:
        out = out.withColumn(
            dense_rank_col,
            (F.dense_rank().over(w) + _off_expr(key_off)).cast("bigint"),
        )
    if ntile:
        n, col = ntile
        size, extra = divmod(total, n)
        cut = extra * (size + 1)  # rows covered by the size+1 buckets
        p0 = pos - 1
        out = out.withColumn(
            col,
            F.when(p0 < cut, F.floor(p0 / (size + 1)) + 1)
            .otherwise(extra + F.floor((p0 - cut) / max(size, 1)) + 1)
            .cast("bigint"),
        )
    return out.drop("__pid")


def distributed_row_number(
    df: DataFrame,
    order_cols: "list[str]",
    out_col: str = "rank",
    n_ranges: int = 32,
) -> DataFrame:
    """Global 1-based ``row_number`` over ``order_cols`` WITHOUT a
    single-partition window: range-partition on the order columns,
    rank locally within each range, then add per-range offsets —
    parallelism = ``n_ranges`` instead of one fat sort task.

    The assigned ids are EXACTLY row_number() over a global orderBy —
    each row's position in the total order — independent of where the
    range sampler places its boundaries, because offsets accumulate
    partition counts in range order. The relation is pinned with a
    ``localCheckpoint`` first: the counts job and the ranking job must
    see the SAME boundary draw, or offsets would mismatch partitions.
    The only driver-side state is the ``n_ranges``-row count list
    (model-sized). ``order_cols`` must totally order the rows (ties →
    nondeterministic ids, same contract as a bare row_number) and must
    not contain NULLs (range partitioning on a NULL key is
    engine-defined).
    """
    reserved = {"__pid", out_col}
    bad = sorted(
        {c for c in df.columns if c in reserved}
        | ({out_col} if out_col in ("__pid", *order_cols) else set())
    )
    if bad:
        # a silent withColumn overwrite (then drop) would eat a user
        # column — a generic public helper must refuse instead
        raise ValueError(
            f"distributed_row_number: column name(s) {bad} collide with "
            "the helper's working/output columns — rename before ranking"
        )
    parts = (
        df.repartitionByRange(n_ranges, *[F.col(c).asc() for c in order_cols])
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["__pid"]: r["n"]
        for r in parts.groupBy("__pid").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    if offsets:
        omap = F.create_map(
            *[x for pid, off in sorted(offsets.items()) for x in (F.lit(pid), F.lit(off))]
        )
        # a pid MISSING from the map means the ranking job saw a
        # different boundary draw than the counts job — the pinned-
        # checkpoint invariant was broken. Coalescing to 0 would
        # silently duplicate range 0's ids; fail loudly instead.
        off_expr = F.when(
            omap[F.col("__pid")].isNotNull(), omap[F.col("__pid")]
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "distributed_row_number: partition id absent from "
                        "the counts map (boundary draw changed between "
                        "jobs?) pid="
                    ),
                    F.col("__pid").cast("string"),
                )
            )
        )
    else:  # empty relation: no offsets to attach
        off_expr = F.lit(0)
    w = Window.partitionBy("__pid").orderBy(*[F.col(c).asc() for c in order_cols])
    return (
        parts.withColumn(
            out_col, (F.row_number().over(w) + off_expr).cast("bigint")
        )
        .drop("__pid")
    )
