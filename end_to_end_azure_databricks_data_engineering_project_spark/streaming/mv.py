"""Incrementally-maintained aggregate tables (materialized views).

The reference's gold layer stops at dims + fact; its analytics are
ad-hoc SQL over them (readme.md:8,128). A complete engine also keeps
*standing* aggregates fresh without full recompute. ``IncrementalAgg``
maintains `groupBy(keys).agg(sum/count)` under **append-only** input
(the bronze/silver fact path is append-only by construction here):

    new_mv = re-agg( old_mv ∪ partial_agg(new_rows) )

Only the delta is scanned each run; the merge is an agg over
|groups| + |delta groups| rows — independent of total fact size. Sums
use exact decimal so the running MV equals a from-scratch recompute
bit-for-bit regardless of batch slicing (tested).

At 100 TB: the MV is orders of magnitude smaller than the fact; the
update shuffles only the delta's partial aggregates. avg/count-distinct
style measures decompose the same way (sum+count; HLL sketch merge for
approximate distinct) — sum/count/min/max are provided.
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog, ManagedTable

DEC = "decimal(28,2)"


@dataclass(frozen=True)
class Measure:
    name: str  # output column
    source_col: str
    kind: str  # sum | count | min | max | approx_distinct

    def partial(self):
        c = F.col(self.source_col)
        if self.kind == "sum":
            return F.sum(c.cast(DEC)).alias(self.name)
        if self.kind == "count":
            return F.count(F.lit(1)).alias(self.name)
        if self.kind == "min":
            return F.min(c).alias(self.name)
        if self.kind == "max":
            return F.max(c).alias(self.name)
        if self.kind == "approx_distinct":
            # mergeable Datasketches HLL — the MV stores the sketch
            # binary, so per-batch partials union exactly (estimate is
            # identical to a from-scratch sketch of the same rows)
            return F.hll_sketch_agg(c).alias(self.name)
        raise ValueError(self.kind)

    def merge(self):
        c = F.col(self.name)
        if self.kind in ("sum", "count"):
            return F.sum(c).alias(self.name)
        if self.kind == "min":
            return F.min(c).alias(self.name)
        if self.kind == "max":
            return F.max(c).alias(self.name)
        if self.kind == "approx_distinct":
            return F.hll_union_agg(c).alias(self.name)
        raise ValueError(self.kind)

    def finalize(self):
        """Reader-side rendering (sketch → estimate)."""
        c = F.col(self.name)
        if self.kind == "approx_distinct":
            return F.hll_sketch_estimate(c).alias(self.name)
        return c.alias(self.name)


class IncrementalAgg:
    """Standing aggregate over an append-only source ManagedTable."""

    def __init__(
        self,
        catalog: Catalog,
        name: str,
        source_table: str,
        keys: Sequence[str],
        measures: Sequence[Measure],
        cursor_col: str,
        state_root: str,
    ):
        self.catalog = catalog
        self.name = name
        self.source_table = source_table
        self.keys = list(keys)
        self.measures = list(measures)
        self.cursor_col = cursor_col
        self.marker = Path(state_root) / f"mv_{name}.cursor"
        self.marker.parent.mkdir(parents=True, exist_ok=True)

    def _delta(self) -> DataFrame | None:
        src = self.catalog.table(self.source_table)
        if not src.exists():
            return None
        df = src.read()
        if self.marker.exists():
            df = df.filter(F.col(self.cursor_col) > F.lit(self.marker.read_text().strip()))
        return df

    def refresh(self) -> int:
        """Fold any new source rows into the MV; returns delta row count."""
        delta = self._delta()
        if delta is None:
            return 0
        stats = delta.agg(
            F.count(F.lit(1)).alias("n"), F.max(self.cursor_col).alias("mx")
        ).first()
        if stats["n"] == 0:
            return 0
        partial = delta.groupBy(*self.keys).agg(*[m.partial() for m in self.measures])
        mv = self.catalog.table(f"mv_{self.name}")
        if mv.exists():
            merged = (
                mv.read()
                .unionByName(partial)
                .groupBy(*self.keys)
                .agg(*[m.merge() for m in self.measures])
            )
        else:
            merged = partial
        mv.overwrite(merged)
        mx = stats["mx"]
        self.marker.write_text(
            mx.isoformat(sep=" ") if hasattr(mx, "isoformat") else str(mx)
        )
        return stats["n"]

    def read(self) -> DataFrame:
        """MV contents with sketch measures rendered as estimates."""
        df = self.catalog.table(f"mv_{self.name}").read()
        return df.select(
            *self.keys, *[m.finalize() for m in self.measures]
        )
