"""High-watermark (CDC) state store.

Re-expresses the reference's per-table ``cdc.json`` blob protocol
(reference ``Azure ADF/adf/pipeline/incremental_loop.json:94-131`` reads
it via Lookup; ``:235-314`` rewrites it with the new max; described at
``readme.md:30-36``): one tiny JSON document per table holding the last
successfully ingested CDC value. Driver-side scalar state — deliberately
NOT a Spark job; at 100 TB this is still a handful of bytes per table.

Values are stored as ISO strings and compared as their source type by
the ingest filter (Spark casts the literal back to the column type, so
timestamp/date/numeric watermarks all order correctly).
"""

from __future__ import annotations

import json
import os
import tempfile
from pathlib import Path

EPOCH = "1900-01-01 00:00:00"  # ≙ the reference's initial from_date backfill


class WatermarkStore:
    """Directory of ``{table}_cdc/cdc.json`` docs (mirrors the bronze layout)."""

    def __init__(self, state_dir: str | os.PathLike[str]):
        self.state_dir = Path(state_dir)
        self.state_dir.mkdir(parents=True, exist_ok=True)

    def _path(self, table: str) -> Path:
        return self.state_dir / f"{table}_cdc" / "cdc.json"

    def read(self, table: str, default: str = EPOCH) -> str:
        """≙ ADF Lookup of cdc.json (firstRow.cdc)."""
        p = self._path(table)
        if not p.exists():
            return default
        return json.loads(p.read_text())["cdc"]

    def write(self, table: str, value: str) -> None:
        """≙ ADF Copy empty.json→cdc.json with the additional `cdc` column.

        Atomic rename so a crashed run never leaves a torn watermark —
        the next run re-pulls from the old value (at-least-once pull,
        idempotent downstream via key/sequence merges).
        """
        p = self._path(table)
        p.parent.mkdir(parents=True, exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=p.parent, suffix=".tmp")
        with os.fdopen(fd, "w") as f:
            json.dump({"cdc": str(value)}, f)
        os.replace(tmp, p)

    def effective_watermark(self, table: str, from_date: str = "") -> str:
        """Backfill override: non-empty ``from_date`` wins over stored state
        (≙ ADF `if(empty(item().from_date), last_cdc, from_date)`,
        incremental_loop.json:45)."""
        return from_date if from_date else self.read(table)
