"""Scalar expression helpers (reference §2.3 surface + portable hashing).

Everything returns a Column built from `pyspark.sql.functions` — JVM-side,
codegen'd, no Python in the hot path. The md5-based hash helpers are
*portable*: identical results are computable in any engine with md5()
(used so DuckDB oracles can replay MinHash/fingerprint logic exactly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def date_key(d: Column) -> Column:
    """yyyyMMdd integer key (≙ DimDate.date_key, initial_load.sql:36-43)."""
    return F.date_format(d, "yyyyMMdd").cast("int")


def calendar_decomposition(d: Column) -> dict[str, Column]:
    """≙ DimDate columns derived from `date` (F9 in SURVEY §2.3)."""
    return {
        "date_key": date_key(d),
        "day": F.dayofmonth(d),
        "month": F.month(d),
        "year": F.year(d),
        "weekday": F.date_format(d, "EEEE"),
    }


def bucket_expr(col: Column, edges: list[float], labels: list[str]) -> Column:
    """Chained when/otherwise bucketing (F4, silver_Dimensions.py:151-153)."""
    expr = None
    for edge, label in zip(edges, labels[:-1]):
        cond = col < F.lit(edge)
        expr = F.when(cond, label) if expr is None else expr.when(cond, label)
    return expr.otherwise(labels[-1]) if expr is not None else F.lit(labels[-1])


def distance_km(miles: Column) -> Column:
    """≙ the reference's one UDF (utils.py:5-8, miles→km) — expressed
    natively instead of a Python UDF (stays in codegen)."""
    return (miles * F.lit(1.60934)).cast("float")


def portable_hash64(col: Column) -> Column:
    """Deterministic 63-bit positive int from md5 — reproducible in DuckDB
    as ``(('x' || substr(md5(x),1,15))::bit(60))::bigint``-style logic.
    We use conv(substr(md5,1,15),16,10) → same value both engines."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def fingerprint(col: Column) -> Column:
    """Document fingerprint: md5 hex of whitespace-normalized lowercase
    text. Portable to any SQL engine with md5()."""
    return F.md5(F.regexp_replace(F.lower(F.trim(col)), r"\s+", " "))
