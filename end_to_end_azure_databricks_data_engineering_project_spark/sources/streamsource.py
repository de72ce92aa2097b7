"""ManagedTable as a TRUE Structured Streaming source.

``spark.readStream.format("managed_table")`` — the Delta-table
streaming-source analog (reference surface S7: DLT reads its upstream
Delta tables as streams, DimUser.py:7-12), built on PySpark 4's Python
Data Source API and consuming ONLY the table's public transaction log
(``_delta_log/`` — the same files a stock Delta reader uses; never the
engine's ``_latest`` pointer), so any conforming writer's commits are
streamable.

Two modes (option ``mode``):

- ``appends`` (default): each micro-batch yields the ROWS of append
  commits after the stream's offset — Delta's own table-stream
  semantics. A data UPDATE in range (merge/DML/overwrite/restore)
  raises, exactly like Delta's "Detected a data update … not
  supported" (set ``ignoreChanges=true`` to skip such commits'
  rewritten files instead, with Delta's same duplicate-delivery
  caveat: their ADDED files are then emitted raw).
- ``cdf``: yields row-level CHANGES (``_change_type`` column) from the
  materialized change-data files (``delta.enableChangeDataFeed``
  tables) — appends surface as ``insert`` rows read straight from the
  added data files; OPTIMIZE (dataChange=false) is transparent.

Offsets are DELTA LOG versions — contiguous by construction, immutable
once written — so a micro-batch (start, end] is deterministic forever:
Spark's checkpoint replays it bit-identically after a crash.
Exactly-once therefore needs nothing from the engine.

Scale shape: offset resolution and partition planning read only the
log (driver, metadata-sized); each data/cdc FILE becomes one input
partition, read executor-side with pyarrow and yielded as Arrow
RecordBatches — vectorized end-to-end, no per-row Python, parallelism
= files per batch. Schema-evolved old files are null-filled to the
stream schema per batch.

V1 limits (precise errors, not wrong answers): non-partitioned tables
only (partition values live in the log, not the files — a stream
schema that silently dropped them would be wrong), and ``appends``
mode refuses files carrying deletion vectors (a DV'd add is a data
update by definition).

Register once per session::

    spark.dataSource.register(ManagedTableDataSource)
    df = (spark.readStream.format("managed_table")
          .option("path", str(table.dir))   # the table DIRECTORY
          .option("mode", "cdf")
          .load())
"""

from __future__ import annotations

import json
import os
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from . import deltalog

_CHANGE_TYPE = "_change_type"


def _latest_meta(table_dir: Path) -> dict:
    """Latest metaData action from the public log (commit tail first,
    checkpoint fallback) — metadata-sized driver read."""
    files = deltalog.commit_files(table_dir)
    for p in reversed(files):
        meta = None
        for a in deltalog.read_actions(table_dir, int(p.stem)):
            if "metaData" in a:
                meta = a["metaData"]
        if meta is not None:
            return meta
    # tail had none (expired log): the checkpoint carries it
    ck = deltalog.latest_checkpoint_at_or_below(
        table_dir, int(files[-1].stem) if files else 0
    )
    if ck is not None:
        _, meta, _ = deltalog.read_checkpoint(table_dir, ck)
        if meta:
            return meta
    raise ValueError(f"no metaData found in delta log at {table_dir}")


class ManagedTableDataSource(DataSource):
    """See module docstring. Options: ``path`` (table directory),
    ``mode`` (``appends``/``cdf``), ``startingVersion`` (delta log
    version to begin AFTER; default -1 = the full existing table
    first, Delta's own default), ``ignoreChanges`` (appends mode)."""

    @classmethod
    def name(cls) -> str:
        return "managed_table"

    def _table_dir(self) -> Path:
        p = self.options.get("path")
        if not p:
            raise ValueError(
                "managed_table source requires .option('path', <table dir>)"
            )
        return Path(p)

    def schema(self) -> StructType:
        table_dir = self._table_dir()
        meta = _latest_meta(table_dir)
        full = StructType.fromJson(json.loads(meta["schemaString"]))
        if meta.get("partitionColumns"):
            raise ValueError(
                "managed_table streaming source: partitioned tables are "
                "not supported yet (partition values live in the log; "
                "use spark.read / the drain flows instead)"
            )
        if (self.options.get("mode") or "appends").lower() == "cdf":
            from pyspark.sql.types import StringType, StructField

            return StructType(
                list(full.fields)
                + [StructField(_CHANGE_TYPE, StringType(), False)]
            )
        return full

    def streamReader(self, schema: StructType) -> "ManagedTableStreamReader":
        return ManagedTableStreamReader(
            str(self._table_dir()),
            schema,
            mode=(self.options.get("mode") or "appends").lower(),
            starting_version=int(self.options.get("startingVersion", -1)),
            ignore_changes=(
                str(self.options.get("ignoreChanges", "false")).lower()
                == "true"
            ),
        )


class ManagedTableStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        table_dir: str,
        schema: StructType,
        mode: str,
        starting_version: int,
        ignore_changes: bool,
    ) -> None:
        if mode not in ("appends", "cdf"):
            raise ValueError(
                f"managed_table mode {mode!r}: expected 'appends' or 'cdf'"
            )
        self.table_dir = table_dir
        self.schema_json = schema.json()
        self.mode = mode
        self.starting_version = starting_version
        self.ignore_changes = ignore_changes

    # -- offsets -----------------------------------------------------------
    def initialOffset(self) -> dict:
        # versions ≤ offset are consumed; -1 = nothing yet, so the first
        # batch covers the whole existing table (Delta's default). An
        # expired log below a startingVersion older than the floor fails
        # in partitions() with the contiguity error, never silently.
        return {"version": self.starting_version}

    def latestOffset(self) -> dict:
        files = deltalog.commit_files(Path(self.table_dir))
        latest = int(files[-1].stem) if files else -1
        return {"version": max(latest, self.starting_version)}

    def commit(self, end: dict) -> None:
        pass  # offsets are immutable log versions: nothing to release

    # -- planning (driver, metadata-only) ------------------------------------
    def partitions(self, start: dict, end: dict):
        table_dir = Path(self.table_dir)
        lo, hi = start["version"], end["version"]
        versions = list(range(lo + 1, hi + 1))
        have = {int(p.stem) for p in deltalog.commit_files(table_dir)}
        missing = [v for v in versions if v not in have]
        if missing:
            raise ValueError(
                f"managed_table stream at {table_dir}: commit(s) {missing} "
                "expired from the log — restart the stream with "
                ".option('startingVersion', <retained version>)"
            )
        parts: list[InputPartition] = []
        for v in versions:
            adds: list[dict] = []
            removes = 0
            cdc: list[str] = []
            op = "WRITE"
            for a in deltalog.read_actions(table_dir, v):
                if "add" in a and a["add"].get("dataChange", True):
                    adds.append(a["add"])
                if "remove" in a and a["remove"].get("dataChange", True):
                    removes += 1
                if "cdc" in a:
                    cdc.append(a["cdc"]["path"])
                if "commitInfo" in a:
                    op = a["commitInfo"].get("operation", "WRITE")
            if not adds and not cdc:
                continue  # metadata-only / OPTIMIZE (dataChange=false)
            is_append = op == "WRITE" and removes == 0 and v > 0
            is_initial = v == 0
            if self.mode == "appends":
                if is_append or is_initial:
                    dv_files = [a["path"] for a in adds if a.get("dv")]
                    if dv_files:
                        raise ValueError(
                            f"managed_table stream: commit {v} adds "
                            f"deletion-vector'd file(s) {dv_files[:3]} — a "
                            "data update; stream in mode='cdf' instead"
                        )
                    parts.extend(
                        InputPartition((str(table_dir / a["path"]), None))
                        for a in adds
                    )
                elif self.ignore_changes:
                    continue  # Delta ignoreChanges: skip rewrite commits
                else:
                    raise ValueError(
                        f"managed_table stream at {table_dir}: commit {v} "
                        f"({op}) changed existing data — not supported in "
                        "appends mode (Delta raises here too); use "
                        "mode='cdf' on a CDF-enabled table, or "
                        "ignoreChanges=true to skip such commits"
                    )
            else:  # cdf
                if is_append or is_initial:
                    parts.extend(
                        InputPartition((str(table_dir / a["path"]), "insert"))
                        for a in adds
                    )
                elif cdc:
                    parts.extend(
                        InputPartition((str(table_dir / p), None))
                        for p in cdc
                    )
                else:
                    raise ValueError(
                        f"managed_table stream at {table_dir}: commit {v} "
                        f"({op}) carries no change-data files — enable "
                        "delta.enableChangeDataFeed on the table (CDF "
                        "materializes exact change rows at write time)"
                    )
        return parts

    # -- executor-side read (arrow-vectorized) --------------------------------
    def read(self, partition: InputPartition):
        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import to_arrow_schema

        path, change_type = partition.value
        out_schema = to_arrow_schema(
            StructType.fromJson(json.loads(self.schema_json))
        )
        tbl = pq.read_table(path)
        n = tbl.num_rows
        cols = []
        for field in out_schema:
            if field.name == _CHANGE_TYPE and change_type is not None:
                cols.append(pa.array([change_type] * n, field.type))
            elif field.name in tbl.column_names:
                cols.append(tbl.column(field.name).cast(field.type))
            else:
                # schema-evolved old file: the column reads as NULL,
                # same rule as the engine's pinned batch reads
                cols.append(pa.nulls(n, field.type))
        yield from pa.table(cols, schema=out_schema).to_batches()
