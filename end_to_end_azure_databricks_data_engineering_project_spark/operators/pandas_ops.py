"""Grouped-map Pandas operators (`applyInPandas`) — the Arrow batch
path for per-group logic that built-ins can't express cleanly.

Kept deterministic on purpose: anything order- or float-sensitive is
pinned (explicit sorts, integer outputs) so results are reproducible
and oracle-checkable. Used sparingly — the engine's default remains
JVM-side expressions (see the guide's "UDFs are the slow path").
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def rank_within_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    id_col: str,
    out_col: str = "rnk",
) -> DataFrame:
    """Per-group dense integer ranking via applyInPandas, ordered by
    (order_col DESC, id_col ASC) — deterministic under ties.

    Semantically identical to a row_number window (the oracle); exists
    to exercise/verify the grouped-map Arrow path with a per-group
    pandas computation."""
    schema = f"{group_col} string, {id_col} long, {out_col} int"

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [order_col, id_col], ascending=[False, True], kind="mergesort"
        )
        out = pdf[[group_col, id_col]].copy()
        out[out_col] = range(1, len(pdf) + 1)
        return out

    return df.groupBy(group_col).applyInPandas(per_group, schema)
