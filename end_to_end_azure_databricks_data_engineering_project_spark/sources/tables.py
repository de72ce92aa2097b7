"""Versioned managed tables with atomic commits (Delta-style semantics
on plain parquet).

The reference stores silver/gold as Delta tables (reference
``silver_Dimensions.py:55`` ``format("delta")``) and relies on the Delta
transaction log for atomic, exactly-once sink commits. Delta OSS jars
are not on this classpath (gated behind an import-try below), so the
engine provides ``ManagedTable``: a directory of immutable versioned
snapshots plus a ``_latest`` pointer file that is swapped atomically
(``os.replace``). Readers always see a complete snapshot; a crashed
writer leaves an orphaned version directory, never a torn table.

Scale posture: full-snapshot rewrite is how Delta MERGE behaves in the
worst case (all files touched). For 100 TB tables the deployment answer
is Delta/Iceberg (file-level pruning of untouched files); the engine's
merge logic in ``operators/cdc.py`` is already expressed as a pure
DataFrame→DataFrame transform so swapping the sink for Delta MERGE is a
one-line change in ``write_merged``.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

try:  # Delta OSS if its jars are ever present; else versioned parquet.
    from delta.tables import DeltaTable  # type: ignore

    HAVE_DELTA = True
except Exception:  # pragma: no cover - image has no delta jars
    DeltaTable = None
    HAVE_DELTA = False


class ManagedTable:
    """A named table backed by immutable parquet snapshot versions.

    Layout::

        <root>/<name>/_latest          # {"version": N} — atomic pointer
        <root>/<name>/v00000N/         # parquet snapshot for version N
    """

    def __init__(self, spark: SparkSession, root: str | os.PathLike[str], name: str):
        self.spark = spark
        self.dir = Path(root) / name
        self.name = name
        self.dir.mkdir(parents=True, exist_ok=True)

    # -- pointer management -------------------------------------------------
    def _pointer(self) -> Path:
        return self.dir / "_latest"

    def current_version(self) -> int:
        p = self._pointer()
        if not p.exists():
            return -1
        return json.loads(p.read_text())["version"]

    def exists(self) -> bool:
        return self.current_version() >= 0

    def _version_dir(self, v: int) -> Path:
        return self.dir / f"v{v:06d}"

    def _commit(self, v: int) -> None:
        tmp = self.dir / f"_latest.tmp.{os.getpid()}.{time.monotonic_ns()}"
        tmp.write_text(json.dumps({"version": v}))
        os.replace(tmp, self._pointer())

    # -- read/write ----------------------------------------------------------
    def read(self) -> DataFrame:
        v = self.current_version()
        if v < 0:
            raise FileNotFoundError(f"table {self.name} has no committed version")
        return self.spark.read.parquet(str(self._version_dir(v)))

    def read_or_empty(self, like: DataFrame) -> DataFrame:
        """Current snapshot, or an empty frame with ``like``'s schema."""
        if self.exists():
            return self.read()
        return self.spark.createDataFrame([], like.schema)

    def overwrite(self, df: DataFrame) -> int:
        """Write a full new snapshot and atomically repoint ``_latest``."""
        v = self.current_version() + 1
        df.write.mode("overwrite").parquet(str(self._version_dir(v)))
        self._commit(v)
        return v

    def append(self, df: DataFrame) -> int:
        """Append = new snapshot directory reusing prior files is not
        possible with plain parquet dirs, so append writes into a fresh
        version dir via union-free file copy: new files land next to
        hardlinked prior files (cheap, no data rewrite)."""
        v = self.current_version()
        new_v = v + 1
        new_dir = self._version_dir(new_v)
        df.write.mode("overwrite").parquet(str(new_dir))
        if v >= 0:
            for f in self._version_dir(v).glob("*.parquet"):
                target = new_dir / f"prior_{f.name}"
                try:
                    os.link(f, target)
                except OSError:
                    shutil.copy2(f, target)
        self._commit(new_v)
        return new_v

    def compact(self, target_partitions: int | None = None) -> int:
        """Rewrite the current snapshot with bin-packed files (small-file
        compaction — appends accumulate one file set per batch; compaction
        restores scan efficiency). New snapshot version, atomic swap."""
        df = self.read()
        if target_partitions is None:
            n_files = len(list(self._version_dir(self.current_version()).glob("*.parquet")))
            target_partitions = max(1, n_files // 8)
        return self.overwrite(df.coalesce(target_partitions))

    def vacuum(self, keep: int = 2) -> None:
        """Drop snapshot dirs older than the newest ``keep`` versions."""
        cur = self.current_version()
        for d in sorted(self.dir.glob("v*")):
            v = int(d.name[1:])
            if v <= cur - keep:
                shutil.rmtree(d, ignore_errors=True)


class Catalog:
    """Tiny namespace of ManagedTables (≙ Unity Catalog schema binding,
    reference ``databricks.yml``/``spotify_dab.pipeline.yml`` catalog/schema)."""

    def __init__(self, spark: SparkSession, root: str | os.PathLike[str]):
        self.spark = spark
        self.root = Path(root)

    def table(self, name: str) -> ManagedTable:
        return ManagedTable(self.spark, self.root, name)

    def register_views(self) -> None:
        """Expose every committed table as a temp view for spark.sql()."""
        for d in sorted(self.root.iterdir()):
            t = ManagedTable(self.spark, self.root, d.name)
            if t.exists():
                t.read().createOrReplaceTempView(d.name)
