"""Native Delta transaction log (``_delta_log/``) for ManagedTable.

The reference's silver/gold storage contract IS Delta
(``silver_Dimensions.py:55`` ``format("delta")``; the DLT targets).
ManagedTable re-creates Delta's *semantics* (atomic commits, time
travel, merge, RESTORE) on versioned parquet snapshots; this module
closes the remaining *interop* gap by emitting the public Delta
transaction-log protocol (JSON actions, one NDJSON file per commit:
https://github.com/delta-io/delta/blob/master/PROTOCOL.md) alongside
every commit, so a stock Delta reader pointed at the table directory
sees a consistent table without going through this engine.

Design, and why it differs from delta-spark's own writer:

- **The ``_latest`` pointer stays the source of truth.** The Delta log
  is a derived, trailing view written AFTER the pointer moves, under
  the same commit lock. A crash between pointer write and log write
  leaves exactly ONE committed version lacking its log entry — the
  next commit (or an explicit ``heal``) re-derives and writes it,
  still under the lock, from data that is all immutable and still on
  disk: the snapshot dir, its ``_op`` marker and ``_schema.json``, and
  the previous commit's add-list (read back from the previous log
  file, so healing never depends on state a vacuum could have
  removed). Readers of the log can lag by one commit but can never
  see uncommitted data — the failure mode of the opposite order.

- **Delta versions are contiguous; ManagedTable versions are not.**
  An aborted writer leaves a claimed-but-never-committed ``vN`` dir,
  so MT version numbers have gaps, which the Delta protocol forbids.
  Log commits are therefore numbered by commit COUNT (0, 1, 2, …) and
  each ``commitInfo`` records the MT version it maps to; the pointer
  state carries ``{"delta": {"version": D, "mt_version": V, ...}}``.

- **Every commit re-adds the full snapshot** (``remove`` of all paths
  added by commit D-1 + ``add`` of every parquet file in the new
  version dir). ManagedTable snapshots hardlink carried-over files
  under new names (``prior_*`` in a new ``vN/`` dir), so there is no
  stable path an incremental encoding could keep referencing. The log
  is O(live files) per commit rather than O(changed files) — the same
  order as Delta's own periodic checkpoints — and stays exactly
  correct: replaying adds/removes yields precisely the current
  snapshot's file set. ``dataChange`` is false only for ``compact``
  (OPTIMIZE), mirroring delta-spark — RESTORE and CLONE change the
  visible data and must stay true for CDF-style consumers.

- **Pre-existing tables** (created before log emission) start their
  log at commit 0 = the table as-of enablement (protocol + metaData +
  full adds); earlier history stays reachable through ManagedTable
  time travel only.

Validated structurally in ``tests/test_deltalog.py`` (action schema,
version contiguity, add/remove accounting, schemaString round-trip,
crash-heal); full ``delta-spark`` read-back cannot run in this
offline environment — documented in README "Known integration gaps".
"""

from __future__ import annotations

import hashlib
import json
import os
import time
import uuid
from pathlib import Path

PROTOCOL = {"minReaderVersion": 1, "minWriterVersion": 2}

# ops that rearrange existing rows without changing table content.
# ONLY compaction qualifies: RESTORE changes the visible data (that is
# its purpose — delta-spark RESTORE emits dataChange=true, and a CDF /
# streaming consumer filtering on dataChange would otherwise skip the
# rollback and keep serving rolled-back rows), and a CLONE's initial
# adds are the new table's first visible data.
_NO_DATA_CHANGE_OPS = {"compact"}

# Delta commitInfo operation names for ManagedTable op markers
_OP_NAMES = {
    "snapshot": "WRITE",
    "append": "WRITE",
    "merge": "MERGE",
    "compact": "OPTIMIZE",
    "restore": "RESTORE",
    "clone": "CLONE",
}


def log_dir(table_dir: Path) -> Path:
    return Path(table_dir) / "_delta_log"


def commit_path(table_dir: Path, delta_version: int) -> Path:
    return log_dir(table_dir) / f"{delta_version:020d}.json"


def schema_fingerprint(schema_string: str | None) -> str | None:
    if schema_string is None:
        return None
    return hashlib.md5(schema_string.encode("utf-8")).hexdigest()


def read_actions(table_dir: Path, delta_version: int) -> list[dict]:
    p = commit_path(table_dir, delta_version)
    return [
        json.loads(line)
        for line in p.read_text().splitlines()
        if line.strip()
    ]


def read_adds(table_dir: Path, delta_version: int) -> list[dict]:
    """The ``add`` actions of commit D. Because every commit re-adds
    the full snapshot, this IS the live file set as of D."""
    return [a["add"] for a in read_actions(table_dir, delta_version) if "add" in a]


def build_commit(
    vdir: Path,
    delta_version: int,
    op: str,
    table_id: str,
    table_name: str,
    schema_string: str | None,
    emit_metadata: bool,
    prior_add_paths: list[str],
    mt_version: int,
) -> list[dict]:
    """Pure assembly of one commit's action list (no IO beyond statting
    the immutable snapshot files)."""
    now_ms = int(time.time() * 1000)
    data_change = op not in _NO_DATA_CHANGE_OPS
    actions: list[dict] = []
    if delta_version == 0:
        actions.append({"protocol": dict(PROTOCOL)})
    if emit_metadata and schema_string is not None:
        actions.append(
            {
                "metaData": {
                    "id": table_id,
                    "name": table_name,
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": schema_string,
                    "partitionColumns": [],
                    "configuration": {},
                    "createdTime": now_ms,
                }
            }
        )
    for p in prior_add_paths:
        actions.append(
            {
                "remove": {
                    "path": p,
                    "deletionTimestamp": now_ms,
                    "dataChange": data_change,
                }
            }
        )
    files = sorted(Path(vdir).glob("*.parquet"))
    for f in files:
        st = f.stat()
        actions.append(
            {
                "add": {
                    "path": f"{Path(vdir).name}/{f.name}",
                    "partitionValues": {},
                    "size": st.st_size,
                    "modificationTime": int(st.st_mtime * 1000),
                    "dataChange": data_change,
                }
            }
        )
    actions.append(
        {
            "commitInfo": {
                "timestamp": now_ms,
                "operation": _OP_NAMES.get(op, op.upper()),
                "operationParameters": {},
                "operationMetrics": {"numFiles": str(len(files))},
                "engineInfo": "managedtable-deltalog/1",
                "mtVersion": mt_version,
            }
        }
    )
    return actions


def write_commit(table_dir: Path, delta_version: int, actions: list[dict]) -> None:
    """Atomically publish one commit file (tmp + rename; a reader never
    sees a partial action list)."""
    d = log_dir(table_dir)
    d.mkdir(exist_ok=True)
    tmp = d / f".{delta_version:020d}.json.tmp.{os.getpid()}.{time.monotonic_ns()}"
    tmp.write_text("".join(json.dumps(a) + "\n" for a in actions))
    os.replace(tmp, commit_path(table_dir, delta_version))


def new_table_id() -> str:
    return str(uuid.uuid4())
