"""Frequency sketches for corpus statistics: count-min.

Why a sketch when exact group-by works: at 100 TB the exact token-count
relation is Heaps-law-sized (fine), but SHIPPING it to every consumer
is not — a count-min sketch is a fixed (depth × width) table
(depth·width rows, thousands, broadcastable) that answers point
frequency queries with one-sided error: est ≥ exact always,
est ≤ exact + εN with probability 1−δ for width = ⌈e/ε⌉,
depth = ⌈ln 1/δ⌉ (Cormode & Muthukrishnan, J.Alg 2005).

Hashes are the engine's portable md5 scheme (functions/scalars.
portable_hash64), so the whole sketch — build and probe — is
bit-replayable in any SQL engine: the catalog oracle rebuilds the
identical sketch in DuckDB and gets the identical estimates.

Scale shape: the build explodes each key row ×depth (map-side), then
ONE hash aggregation onto (depth, bucket) — partial aggregation caps
per-partition state at depth·width counters, so shuffle volume is
bounded by partitions·depth·width regardless of corpus size. Probes
broadcast the (small) key set against the (small) sketch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.functions.scalars import (
    portable_hash64,
)


def _bucket(key, d: int, width: int):
    """Row d's bucket for a key: portable md5 hash of 'cms{d}|{key}'."""
    return portable_hash64(F.concat(F.lit(f"cms{d}|"), key)) % width


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 1024
) -> DataFrame:
    """Count-min sketch of the ``key_col`` stream → (d, b, cnt) rows
    (at most depth·width of them; absent (d, b) cells are zero)."""
    key = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(F.lit(d).alias("d"), _bucket(key, d, width).alias("b"))
            for d in range(depth)
        ]
    )
    return (
        df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.d").alias("d"), F.col("c.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 1024,
) -> DataFrame:
    """Point-frequency estimates for ``keys`` (any other columns ride
    along): min over the depth rows of each key's bucket counts.
    Returns the input columns + ``est_n``. The key set and the sketch
    are both small — the probe is a broadcast equi-join, the corpus is
    never touched."""
    key = F.col(key_col).cast("string")
    cells = F.array(
        *[
            F.struct(F.lit(d).alias("d"), _bucket(key, d, width).alias("b"))
            for d in range(depth)
        ]
    )
    probes = (
        keys.select("*", F.explode(cells).alias("c"))
        .select("*", F.col("c.d").alias("d"), F.col("c.b").alias("b"))
        .drop("c")
    )
    joined = probes.join(F.broadcast(sketch), ["d", "b"], "left")
    return (
        joined.groupBy(*keys.columns)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_n"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge count-min sketches built with the SAME (depth, width,
    hash family): cell-wise sum. CMS is a linear sketch, so
    merge(sketch(A), sketch(B)) == sketch(A ⊎ B) exactly — the property
    that makes per-partition / per-day sketches maintainable
    incrementally (build on each micro-batch, merge into the running
    summary; never re-scan history)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("d", "b").agg(F.sum("cnt").alias("cnt"))
