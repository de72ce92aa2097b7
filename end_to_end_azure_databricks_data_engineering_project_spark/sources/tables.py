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

Scale posture: ``merge_keyed`` gives Delta-MERGE-style file pruning on
plain parquet — an incremental batch rewrites ONLY the data files that
contain a touched key and hardlinks every other file into the new
snapshot unchanged. A daily 300-row CDC batch against a 100 TB fact
touches the few files holding those keys, not the table. Writer safety:
each version directory is claimed with an exclusive mkdir, so a losing
concurrent writer fails loudly instead of corrupting the snapshot, and
commits carry an optional (epoch_key, epoch) watermark making
at-least-once foreachBatch replays idempotent.
"""

from __future__ import annotations

import json
import os
import shutil
import threading
import time
from collections.abc import Callable, Sequence
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import deltalog

try:  # Delta OSS if its jars are ever present; else versioned parquet.
    from delta.tables import DeltaTable  # type: ignore

    HAVE_DELTA = True
except Exception:  # pragma: no cover - image has no delta jars
    DeltaTable = None
    HAVE_DELTA = False


class ConcurrentWriteError(RuntimeError):
    """Another writer claimed the version this writer was about to
    commit. The table is NOT corrupted — the losing writer's snapshot
    directory is an uncommitted orphan (remove with vacuum())."""


class SchemaMismatchError(ValueError):
    """An incoming batch's schema is incompatible with the table's
    committed schema (Delta-style schema ENFORCEMENT). Raised for type
    changes, for missing non-nullable columns, and for new columns
    unless the write opts into evolution (``evolve=True``)."""


#: Non-POSIX commit-lock fallback: one threading.Lock per resolved table
#: directory, shared by every ManagedTable instance pointing at it
#: (Catalog.table() builds a fresh instance per call, so per-instance
#: locks would not serialize anything). Guarded by _FALLBACK_LOCKS_GUARD
#: so two threads can't each install their own lock for the same dir.
_FALLBACK_LOCKS: dict[str, threading.Lock] = {}
_FALLBACK_LOCKS_GUARD = threading.Lock()


def _fallback_lock_for(table_dir: Path) -> threading.Lock:
    key = str(Path(table_dir).resolve())
    with _FALLBACK_LOCKS_GUARD:
        lock = _FALLBACK_LOCKS.get(key)
        if lock is None:
            lock = _FALLBACK_LOCKS[key] = threading.Lock()
        return lock


def _stat_value(v):
    """Normalize a parquet-footer statistic (or a query bound) to a
    JSON-safe, totally-ordered value. Returns None for types where
    pruning on stored stats would be unsafe (decimal — float rounding
    could move a min upward past a real value — bytes, bool, nested):
    those columns simply never prune, which is always correct."""
    import datetime as _dt

    if isinstance(v, bool):
        return None
    if isinstance(v, (int, float)):
        return v
    if isinstance(v, str):
        return v
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ")
    if isinstance(v, _dt.date):
        return v.isoformat()
    return None


class ManagedTable:
    """A named table backed by immutable parquet snapshot versions.

    Layout::

        <root>/<name>/_latest          # {"version": N} — atomic pointer
        <root>/<name>/v00000N/         # parquet snapshot for version N
    """

    # merge_keyed falls back to a full rewrite (no driver-side file
    # manifest, no hardlinks) once a batch touches more than this
    # fraction of the snapshot's files — or more than the absolute
    # manifest cap, which is what actually bounds driver memory on
    # million-file tables (the fraction alone would still collect
    # O(table) rows).
    merge_full_rewrite_fraction = 0.8
    merge_manifest_max_files = 100_000

    def __init__(self, spark: SparkSession, root: str | os.PathLike[str], name: str):
        self.spark = spark
        self.dir = Path(root) / name
        self.name = name
        self.dir.mkdir(parents=True, exist_ok=True)

    # -- pointer management -------------------------------------------------
    def _pointer(self) -> Path:
        return self.dir / "_latest"

    def _pointer_state(self) -> dict:
        p = self._pointer()
        if not p.exists():
            return {"version": -1, "epochs": {}}
        state = json.loads(p.read_text())
        state.setdefault("epochs", {})
        return state

    def current_version(self) -> int:
        return self._pointer_state()["version"]

    def applied_epoch(self, epoch_key: str):
        """Last (epoch_key, epoch) recorded by a committed write, or None."""
        return self._pointer_state()["epochs"].get(epoch_key)

    def _epoch_already_applied(self, epoch, epoch_key) -> bool:
        if epoch is None or epoch_key is None:
            return False
        stored = self.applied_epoch(epoch_key)
        return stored is not None and epoch <= stored

    def exists(self) -> bool:
        return self.current_version() >= 0

    def _version_dir(self, v: int) -> Path:
        return self.dir / f"v{v:06d}"

    def _claim_next_version(self) -> int:
        """Allocate + exclusively claim the next version directory.

        Candidate = max(committed pointer, any existing version dir) + 1,
        so an orphan left by a crashed writer never blocks progress; the
        atomic mkdir guarantees exactly one writer owns each version —
        a concurrent loser raises instead of clobbering files mid-write."""
        existing = [int(d.name[1:]) for d in self.dir.glob("v*") if d.name[1:].isdigit()]
        v = max([self.current_version(), *existing, -1]) + 1
        try:
            self._version_dir(v).mkdir(parents=False, exist_ok=False)
        except FileExistsError as exc:  # pragma: no cover - race window
            raise ConcurrentWriteError(
                f"table {self.name}: version {v} already claimed by another writer"
            ) from exc
        return v

    def _acquire_commit_lock(self) -> int:
        """Advisory flock serializing pointer read-modify-write:
        without it, two concurrent _commits could each read a stale
        state and the second os.replace would drop the first writer's
        ledger entry / epoch watermark (lost update). The critical
        section is microseconds of JSON I/O.

        flock (not exclusive-create) because the kernel releases it
        automatically when the holder crashes or is killed — no stale
        locks, no steal heuristics, no ownership tokens, and release
        cannot race another holder. The zero-byte lock file persists in
        the table dir by design. Requires a local filesystem with
        advisory-lock support (ManagedTable's documented deployment for
        the pointer dir); a filesystem error other than contention
        (ENOLCK, EOPNOTSUPP, …) surfaces immediately instead of
        spinning the wait budget."""
        try:
            import fcntl
        except ImportError:  # pragma: no cover - non-POSIX fallback
            # best-effort single-process serialization (threading only);
            # cross-process safety needs the POSIX path. Keyed by resolved
            # table dir in a module-level registry: Catalog.table()
            # constructs a fresh ManagedTable per call, so an instance
            # attribute would hand each writer its own lock and serialize
            # nothing.
            lock = _fallback_lock_for(self.dir)
            lock.acquire()
            return -1

        fd = os.open(self.dir / "_latest.lock", os.O_CREAT | os.O_RDWR)
        deadline = time.monotonic() + 15.0
        while True:
            try:
                fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
                return fd
            except BlockingIOError:  # held by another process: wait
                if time.monotonic() >= deadline:
                    os.close(fd)
                    raise ConcurrentWriteError(
                        f"table {self.name}: could not acquire commit lock"
                    )
                time.sleep(0.01)
            except OSError:
                os.close(fd)  # ENOLCK/EOPNOTSUPP etc: not contention
                raise

    def _release_commit_lock(self, fd: int) -> None:
        if fd == -1:  # pragma: no cover - non-POSIX fallback
            _fallback_lock_for(self.dir).release()
            return
        import fcntl

        fcntl.flock(fd, fcntl.LOCK_UN)
        os.close(fd)

    def _write_pointer_locked(self, state: dict) -> None:
        """Atomic pointer publish — call only while holding the commit
        lock (single home for the tmp-write + rename protocol)."""
        tmp = self.dir / f"_latest.tmp.{os.getpid()}.{time.monotonic_ns()}"
        tmp.write_text(json.dumps(state))
        os.replace(tmp, self._pointer())

    def table_prop(self, key: str):
        """A committed table property (bound via ``_commit(set_props=…)``,
        atomic with the commit that established it), or None."""
        return self._pointer_state().get("props", {}).get(key)

    def migrate_prop(self, key: str, old, new) -> bool:
        """One-time property REBIND under the commit lock: if ``key``
        is currently bound to exactly ``old``, rebind it to ``new``
        (pointer write, no version bump). For format upgrades of an
        identity property — e.g. a stream binding whose encoding
        changed between engine revisions — where the normal
        first-binder-wins guard would otherwise refuse the table's own
        still-valid state forever. Returns True iff the rebind
        happened (False: key unbound or already ``new``); raises if
        the key is bound to some THIRD value — that is a genuine
        identity conflict the migration must not paper over."""
        fd = self._acquire_commit_lock()
        try:
            state = self._pointer_state()
            have = state.get("props", {}).get(key)
            if have is None or have == new:
                return False
            if have != old:
                raise ConcurrentWriteError(
                    f"table {self.name}: property {key}={have!r} matches "
                    f"neither the migration source {old!r} nor target "
                    f"{new!r}; refusing to rebind a foreign identity"
                )
            state["props"][key] = new
            self._write_pointer_locked(state)
            return True
        finally:
            self._release_commit_lock(fd)

    def _commit(
        self,
        v: int,
        epoch=None,
        epoch_key=None,
        expected_version: int | None = None,
        set_props: dict | None = None,
        expect_props: dict | None = None,
    ) -> bool:
        """Atomically publish version ``v``. Returns False (commit
        skipped, ``v`` becomes a never-committed orphan the ledger
        excludes) when the epoch watermark shows this epoch already
        applied — re-checked INSIDE the lock, because the caller's
        check-then-act guard races: two concurrent replays of the same
        micro-batch could both pass it and double-apply.

        ``expected_version``: optimistic-concurrency check — raise if
        the pointer moved since the caller read its inputs at that
        version (a read-merge-overwrite over stale state must fail
        loudly, not silently drop the interleaved commit's rows).

        ``expect_props`` / ``set_props``: commit-atomic table
        properties. Each expected key must be unbound or equal to the
        expected value (first binder wins); ``set_props`` are then
        recorded in the pointer state. Check and bind ride the SAME
        locked commit, so invariants like 'all committed sketch
        registers share one m' hold with no sidecar-file races."""
        # resolve the committing version's Delta schemaString BEFORE
        # taking the lock: the legacy fallback (no _schema.json) runs a
        # Spark job, which must never sit inside the flock critical
        # section — concurrent writers would spin out their lock
        # deadline on a busy cluster
        schema_string = self._schema_string_for(v)
        fd = self._acquire_commit_lock()
        try:
            state = self._pointer_state()  # read INSIDE the lock
            # heal first: if the previous committer crashed between its
            # pointer write and its _delta_log write, exactly one
            # committed version lacks its log entry — rewriting it is
            # safe regardless of whether THIS commit proceeds
            self._heal_delta_log(state)
            if epoch is not None and epoch_key is not None:
                applied = state["epochs"].get(epoch_key)
                if applied is not None and epoch <= applied:
                    return False
            if (
                expected_version is not None
                and state["version"] != expected_version
            ):
                raise ConcurrentWriteError(
                    f"table {self.name}: optimistic concurrency check failed "
                    f"(read at v{expected_version}, pointer now at "
                    f"v{state['version']}) — re-read and retry"
                )
            if expect_props:
                props = state.get("props", {})
                for k, want in expect_props.items():
                    have = props.get(k)
                    if have is not None and have != want:
                        raise ConcurrentWriteError(
                            f"table {self.name}: committed property {k}={have} "
                            f"conflicts with this write's {k}={want}"
                        )
            if state["version"] >= v:
                raise ConcurrentWriteError(
                    f"table {self.name}: pointer already at v{state['version']} "
                    f">= v{v}; refusing to move the table backwards"
                )
            if epoch is not None and epoch_key is not None:
                state["epochs"][epoch_key] = epoch
            if set_props:
                state.setdefault("props", {}).update(set_props)
            # ledger of every version that actually committed: a claimed
            # dir whose writer lost the race (ConcurrentWriteError) or
            # crashed never appears here, so version-range readers can
            # tell real history from aborted-writer leftovers even BELOW
            # the pointer. First commit on a PRE-ledger table seeds the
            # ledger with its existing history (every marker-bearing dir
            # at/below the old pointer — the legacy heuristic) so old
            # committed snapshots stay readable.
            if "committed" not in state:
                self._seed_ledger(state)
            state["committed"].append(v)
            state["version"] = v
            # Delta-log record rides the SAME pointer write (delta
            # versions are contiguous commit counts; MT versions can
            # gap). Pointer first — it is the source of truth — then
            # the log file; the crash window in between is healed by
            # the next commit (see _heal_delta_log).
            emit_meta, prior_paths = self._prepare_delta(state, v, schema_string)
            self._write_pointer_locked(state)
            self._write_delta_commit(
                state["delta"], v, emit_meta, schema_string, prior_paths
            )
            return True
        finally:
            self._release_commit_lock(fd)

    def _seed_ledger(self, state: dict) -> None:
        """Seed the committed-version ledger on a pre-ledger table from
        its surviving marker-bearing dirs (the legacy heuristic), AND
        record ``committed_floor = min(seeded)`` (pointer+1 when nothing
        survives). The floor is what keeps vacuumed pre-ledger history
        honest: if vacuum already removed old committed dirs, the seeded
        list starts ABOVE the vacuum horizon — without a floor,
        ``_committed_in_range`` would treat a cursor range crossing that
        gap as fully derivable and silently drop the vacuumed versions'
        rows from appended_since/changes_since instead of returning None
        to force the rebuild fallback. Call only under the commit lock."""
        seeded = sorted(
            int(d.name[1:])
            for d in self.dir.glob("v*")
            if d.name[1:].isdigit()
            and int(d.name[1:]) <= state["version"]
            and (d / "_op").exists()
        )
        state["committed"] = seeded
        state["committed_floor"] = max(
            state.get("committed_floor", 0),
            seeded[0] if seeded else state["version"] + 1,
        )

    # -- Delta transaction-log emission (see sources/deltalog.py) -----------
    def _schema_string_for(self, v: int) -> str | None:
        """Delta ``schemaString`` for version ``v``: the committed
        ``_schema.json`` (already Spark StructType JSON — the exact
        format Delta's metaData uses); derived by a one-off parquet
        read only for legacy pre-schema-tracking versions."""
        p = self._version_dir(v) / "_schema.json"
        if p.exists():
            return p.read_text()
        try:
            return self.spark.read.parquet(str(self._version_dir(v))).schema.json()
        except Exception:
            return None

    def _prepare_delta(self, state: dict, v: int, schema_string: str | None):
        """Advance ``state['delta']`` for the commit of MT version ``v``
        (call under the commit lock, before the pointer write;
        ``schema_string`` is resolved by the caller OUTSIDE the lock —
        the legacy fallback runs a Spark job). Returns what the
        post-pointer log write needs: whether to emit metaData and the
        previous commit's add paths (read back from the previous log
        file — self-contained, vacuum-proof)."""
        prior = state.get("delta")
        md5 = deltalog.schema_fingerprint(schema_string)
        if prior is None:
            state["delta"] = {
                "version": 0,
                "mt_version": v,
                "table_id": deltalog.new_table_id(),
                "schema_md5": md5,
            }
            return schema_string is not None, []
        emit_meta = schema_string is not None and md5 != prior.get("schema_md5")
        prior_paths = [
            a["path"] for a in deltalog.read_adds(self.dir, prior["version"])
        ]
        state["delta"] = {
            "version": prior["version"] + 1,
            "mt_version": v,
            "table_id": prior["table_id"],
            "schema_md5": md5 if md5 is not None else prior.get("schema_md5"),
        }
        return emit_meta, prior_paths

    def _write_delta_commit(
        self, rec: dict, v: int, emit_meta: bool,
        schema_string: str | None, prior_paths: list[str],
    ) -> None:
        actions = deltalog.build_commit(
            self._version_dir(v), rec["version"], self._op(v),
            rec["table_id"], self.name, schema_string, emit_meta,
            prior_paths, v,
        )
        deltalog.write_commit(self.dir, rec["version"], actions)

    def _heal_delta_log(self, state: dict) -> None:
        """Repair ``_delta_log/`` to match the pointer (call under the
        commit lock). Two cases:

        1. Only the LATEST commit file is missing (crash between
           pointer write and log write — the designed window): rewrite
           it from immutable on-disk state — the snapshot dir (it is
           the pointer version, never vacuumed), its ``_op`` /
           ``_schema.json``, and the previous commit's adds. Healed
           commits always re-emit metaData (harmless — replay takes
           the latest).

        2. Any EARLIER commit file is missing too (user-deleted log
           dir or files): a log with holes is unreadable by a stock
           Delta reader no matter what we append, so RESTART it —
           reset the pointer's delta record to version 0 (fresh table
           id: to a Delta reader this IS a new table) and write commit
           0 as protocol + metaData + the current snapshot's full
           adds, exactly like first-time enablement on a pre-existing
           table. The reset pointer is persisted here, under the lock,
           so a subsequent abort of the enclosing commit cannot leave
           the pointer pointing past the restarted log."""
        rec = state.get("delta")
        if rec is None:
            return
        latest_missing = not deltalog.commit_path(self.dir, rec["version"]).exists()
        # one readdir, not O(history) stats per commit: commits 0..D are
        # complete iff exactly D+1 (- the possibly-missing latest) files
        # exist — any deletion shrinks the count. Counted over VALIDATED
        # commit filenames (20-digit stems) only: a stray .json dropped
        # in the log dir must not mask a genuinely missing commit.
        n_log_files = len(deltalog.commit_files(self.dir))
        history_missing = n_log_files < rec["version"] + (0 if latest_missing else 1)
        if not latest_missing and not history_missing:
            return
        v = rec["mt_version"]
        schema_string = self._schema_string_for(v)
        if history_missing:
            # clear every surviving old file FIRST: a stale commit left
            # above the restart point would replay on top of the fresh
            # log (and a stale checkpoint/_last_checkpoint would be
            # PREFERRED by readers), corrupting the reconstructed
            # snapshot
            ld = deltalog.log_dir(self.dir)
            for pattern in ("*.json", "*.checkpoint.parquet", "_last_checkpoint"):
                for stale in ld.glob(pattern):
                    stale.unlink()
            rec = {
                "version": 0,
                "mt_version": v,
                "table_id": deltalog.new_table_id(),
                "schema_md5": deltalog.schema_fingerprint(schema_string),
            }
            state["delta"] = rec
            self._write_pointer_locked(state)
            self._write_delta_commit(
                rec, v, schema_string is not None, schema_string, []
            )
            return
        prior_paths: list[str] = []
        if rec["version"] > 0:
            prior_paths = [
                a["path"]
                for a in deltalog.read_adds(self.dir, rec["version"] - 1)
            ]
        self._write_delta_commit(
            rec, v, schema_string is not None, schema_string, prior_paths
        )

    def heal_delta_log(self) -> None:
        """Public heal entry point (takes the commit lock) — run after a
        suspected crash to bring ``_delta_log/`` current without waiting
        for the next commit."""
        fd = self._acquire_commit_lock()
        try:
            self._heal_delta_log(self._pointer_state())
        finally:
            self._release_commit_lock(fd)

    def history(self) -> DataFrame:
        """Delta ``DESCRIBE HISTORY`` analog: one row per delta commit,
        read from the transaction log's commitInfo actions (version,
        timestamp, operation, the ManagedTable version it maps to, and
        file count). Metadata-sized driver read — the log is bounded by
        commit count, never by data."""
        rows = []
        for p in deltalog.commit_files(self.dir):
            v = int(p.stem)
            for a in deltalog.read_actions(self.dir, v):
                if "commitInfo" in a:
                    ci = a["commitInfo"]
                    rows.append((
                        v, ci["timestamp"], ci["operation"],
                        ci.get("mtVersion"),
                        int(ci.get("operationMetrics", {}).get("numFiles", -1)),
                    ))
        return self.spark.createDataFrame(
            rows,
            "version long, timestamp long, operation string,"
            " mt_version long, num_files int",
        )

    def detail(self) -> dict:
        """Delta ``DESCRIBE DETAIL`` analog: current-snapshot facts as a
        plain dict (no Spark job — stats come from the committed
        manifest and file stats)."""
        v = self.current_version()
        if v < 0:
            raise FileNotFoundError(f"table {self.name} has no committed version")
        vdir = self._version_dir(v)
        files = list(vdir.glob("*.parquet"))
        stats = self.file_stats(v) or {}
        schema = self.table_schema(v)
        rec = self._pointer_state().get("delta") or {}
        return {
            "name": self.name,
            "location": str(self.dir),
            "mt_version": v,
            "delta_version": rec.get("version"),
            "table_id": rec.get("table_id"),
            "num_files": len(files),
            "size_bytes": sum(f.stat().st_size for f in files),
            "num_rows": (
                sum(e.get("rows", 0) for e in stats.values())
                if self.file_stats(v) is not None else None
            ),
            "schema": schema.json() if schema is not None else None,
        }

    def write_delta_checkpoint(self) -> Path:
        """Opt-in maintenance (call like ``compact``/``vacuum``): write
        a classic Delta checkpoint for the current delta commit so a
        stock reader replays checkpoint + tail commits instead of the
        whole log (which grows O(commits x files) here — every commit
        re-adds the full snapshot). Heals first, and holds the commit
        lock so the checkpointed version is stable. See
        ``deltalog.write_checkpoint`` for the offline-validation
        caveat that keeps this out of the automatic commit path."""
        fd = self._acquire_commit_lock()
        try:
            state = self._pointer_state()
            if state.get("delta") is None:
                raise ValueError(
                    f"table {self.name} has no delta log to checkpoint"
                )
            self._heal_delta_log(state)
            return deltalog.write_checkpoint(
                self.dir, state["delta"]["version"]
            )
        finally:
            self._release_commit_lock(fd)

    # -- schema enforcement / evolution -------------------------------------
    def _write_schema(self, vdir: Path, schema) -> None:
        (vdir / "_schema.json").write_text(schema.json())

    def table_schema(self, v: int | None = None):
        """The committed canonical schema for version ``v`` (default
        current), or None for versions predating schema tracking."""
        from pyspark.sql.types import StructType

        if v is None:
            v = self.current_version()
        p = self._version_dir(v) / "_schema.json"
        if not p.exists():
            return None
        return StructType.fromJson(json.loads(p.read_text()))

    def _align(self, df: DataFrame, evolve: bool):
        """Enforce the committed schema on an incoming batch (Delta-style).

        Returns ``(aligned_df, schema_to_commit)``. Same-name columns
        must match types exactly; missing nullable columns are
        null-filled; missing non-nullable columns raise; NEW columns
        raise unless ``evolve=True``, which widens the canonical schema
        (old files need no rewrite — ``read()`` pins the stored schema,
        so the parquet reader null-fills them per file)."""
        stored = self.table_schema()
        if stored is None:
            return df, df.schema
        by_name = {f.name: f for f in df.schema.fields}
        stored_names = {f.name for f in stored.fields}
        extras = [f for f in df.schema.fields if f.name not in stored_names]
        for f in stored.fields:
            got = by_name.get(f.name)
            if got is not None and got.dataType != f.dataType:
                raise SchemaMismatchError(
                    f"table {self.name}: column {f.name} is {f.dataType.simpleString()}, "
                    f"batch has {got.dataType.simpleString()} (cast before writing)"
                )
            if got is None and not f.nullable:
                raise SchemaMismatchError(
                    f"table {self.name}: batch is missing non-nullable column {f.name}"
                )
        if extras and not evolve:
            raise SchemaMismatchError(
                f"table {self.name}: batch adds column(s) "
                f"{[f.name for f in extras]} not in the table schema; "
                f"pass evolve=True to widen it"
            )
        cols = [
            (F.col(f.name) if f.name in by_name else F.lit(None).cast(f.dataType)).alias(f.name)
            for f in stored.fields
        ] + [F.col(f.name) for f in extras]
        out = df.select(*cols)
        # Commit schema nullability is derived, NOT taken from out.schema:
        # a single batch built from non-nullable expressions must not
        # rewrite a nullable canonical column to non-nullable (the next
        # legitimately-omitting batch would then be rejected, and read()
        # would pin a wrong optimizer-visible invariant over old files
        # holding NULLs). Stored nullability only ever WIDENS; evolved
        # columns are forced nullable because pre-evolution files
        # null-fill them.
        from pyspark.sql.types import StructField, StructType

        commit_schema = StructType(
            [
                StructField(
                    f.name,
                    f.dataType,
                    f.nullable
                    or (f.name in by_name and by_name[f.name].nullable),
                )
                for f in stored.fields
            ]
            + [StructField(f.name, f.dataType, True) for f in extras]
        )
        return out, commit_schema

    # -- read/write ----------------------------------------------------------
    def read(self) -> DataFrame:
        v = self.current_version()
        if v < 0:
            raise FileNotFoundError(f"table {self.name} has no committed version")
        schema = self.table_schema(v)
        reader = self.spark.read.schema(schema) if schema is not None else self.spark.read
        return reader.parquet(str(self._version_dir(v)))

    def read_or_empty(self, like: DataFrame) -> DataFrame:
        """Current snapshot, or an empty frame with ``like``'s schema."""
        if self.exists():
            return self.read()
        return self.spark.createDataFrame([], like.schema)

    def _write_op_marker(self, v: int, op: str) -> None:
        (self._version_dir(v) / "_op").write_text(op)

    # -- file statistics / data skipping ------------------------------------
    def _collect_stats(self, vdir: Path, prior_stats: dict | None = None) -> dict:
        """Record per-file min/max column stats in ``_stats.json``.

        Metadata-only: stats come from parquet FOOTERS (pyarrow), no data
        scan — the same information Delta keeps in its transaction log.
        Hardlinked ``prior_*`` files inherit the previous version's entry
        (zero IO); only freshly written files read a footer. A column
        with any stats-less row group (or an unsafe type, see
        ``_stat_value``) gets no entry and therefore never prunes."""
        import pyarrow.parquet as pq

        stats: dict[str, dict] = {}
        for f in sorted(vdir.glob("*.parquet")):
            if prior_stats is not None and f.name.startswith("prior_"):
                src = prior_stats.get(f.name[len("prior_"):])
                if src is not None:
                    stats[f.name] = src
                    continue
            try:
                md = pq.ParquetFile(str(f)).metadata
            except Exception:  # unreadable footer → file never prunes
                continue
            cols: dict[str, dict | None] = {}
            for rg_i in range(md.num_row_groups):
                rg = md.row_group(rg_i)
                for c_i in range(rg.num_columns):
                    col = rg.column(c_i)
                    name = col.path_in_schema
                    if "." in name or (name in cols and cols[name] is None):
                        continue
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        cols[name] = None
                        continue
                    mn, mx = _stat_value(st.min), _stat_value(st.max)
                    if mn is None or mx is None:
                        cols[name] = None
                        continue
                    if name not in cols:
                        cols[name] = {"min": mn, "max": mx}
                    else:
                        e = cols[name]
                        e["min"] = min(e["min"], mn)
                        e["max"] = max(e["max"], mx)
            stats[f.name] = {
                "rows": md.num_rows,
                "cols": {k: v for k, v in cols.items() if v is not None},
            }
        (vdir / "_stats.json").write_text(json.dumps(stats))
        return stats

    def file_stats(self, v: int | None = None) -> dict | None:
        """The committed per-file stats map for version ``v`` (default
        current), or None when the version predates stats collection."""
        if v is None:
            v = self.current_version()
        p = self._version_dir(v) / "_stats.json"
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def pruned_files(self, predicates: dict) -> list[Path]:
        """Data skipping: the subset of current-snapshot files that can
        contain a row satisfying ``{col: (lo, hi)}`` range predicates
        (either bound may be None). Files without usable stats are kept
        — pruning is always a superset of the true answer."""
        vdir = self._version_dir(self.current_version())
        stats = self.file_stats()
        norm = {
            c: (_stat_value(lo), _stat_value(hi)) for c, (lo, hi) in predicates.items()
        }
        keep: list[Path] = []
        for f in sorted(vdir.glob("*.parquet")):
            entry = stats.get(f.name) if stats else None
            if entry is None:
                keep.append(f)
                continue
            drop = False
            for c, (lo, hi) in norm.items():
                ci = entry["cols"].get(c)
                if ci is None:
                    continue
                if (lo is not None and ci["max"] < lo) or (
                    hi is not None and ci["min"] > hi
                ):
                    drop = True
                    break
            if not drop:
                keep.append(f)
        return keep

    def read_pruned(self, predicates: dict) -> DataFrame:
        """Range-predicate read through the file-stats index: opens only
        files whose [min, max] overlaps every bound, then applies the
        exact predicate. At 100 TB / millions of files this is the
        difference between a manifest lookup and opening every footer;
        cluster the table (``compact(cluster_by=...)``) to make the
        ranges disjoint and the skipping sharp."""
        files = self.pruned_files(predicates)
        schema = self.table_schema()
        if not files:
            df = self.spark.createDataFrame([], schema or self.read().schema)
        else:
            # pin the committed schema like read()/read_at: after
            # evolution the surviving set mixes pre- and post-evolution
            # files, and an unpinned reader takes an arbitrary footer —
            # evolved columns would nondeterministically vanish (and the
            # exact-predicate filter below would throw on them)
            reader = (
                self.spark.read.schema(schema)
                if schema is not None
                else self.spark.read
            )
            df = reader.parquet(*[str(f) for f in files])
        for c, (lo, hi) in predicates.items():
            if lo is not None:
                df = df.filter(F.col(c) >= F.lit(lo))
            if hi is not None:
                df = df.filter(F.col(c) <= F.lit(hi))
        return df

    def _op(self, v: int) -> str:
        p = self._version_dir(v) / "_op"
        return p.read_text() if p.exists() else "unknown"

    def _committed_in_range(self, lo: int, hi: int) -> list[int] | None:
        """Committed versions in (lo, hi], in order — or None when the
        range is not derivable because vacuum pruned ledger entries
        inside it (their dirs are gone too; silently skipping them
        would drop deltas instead of forcing the rebuild fallback).

        With the pointer ledger this EXCLUDES losing-writer orphan dirs
        sitting below the pointer (complete data + _op marker, but
        never committed) — without the filter, appended_since/
        changes_since would fold such phantom rows into incremental
        deltas. Legacy tables (no ledger yet) fall back to the dense
        range, which was correct for them because every pre-ledger
        consumer also assumed density (vacuumed dirs fail the _op probe
        and return None downstream)."""
        state = self._pointer_state()
        committed = state.get("committed")
        if committed is not None:
            if state.get("committed_floor", 0) > lo + 1:
                return None  # pruned entries may fall inside (lo, hi]
            return sorted(x for x in committed if lo < x <= hi)
        return list(range(lo + 1, hi + 1))

    def appended_since(
        self, v: int | None, until: int | None = None
    ) -> DataFrame | None:
        """The append-only delta: rows added by append commits strictly
        after version ``v``. Returns None when the delta is not
        derivable — ``v`` is None (no cursor yet) or some commit in
        (v, current] was a snapshot rewrite/merge — in which case the
        caller must fall back to a full read or rebuild.

        This is what makes a ManagedTable usable as a delta LOG: each
        append's own files (the non-``prior_`` ones) are exactly that
        commit's new rows, so a consumer can fold increments by version
        cursor with no data-column watermark (and none of the strict-'>'
        boundary losses a value watermark has).

        ``until``: optional INCLUSIVE upper bound — pass the version you
        read BEFORE deriving your cursor so a commit landing between
        that read and this call is left for the next fold instead of
        being folded now AND re-folded later (double-count)."""
        cur = self.current_version() if until is None else min(
            until, self.current_version()
        )
        if v is None:
            return None
        if v >= cur:
            return self.spark.createDataFrame([], self.read().schema)
        versions = self._committed_in_range(v, cur)
        if versions is None:
            return None
        files: list[str] = []
        for vv in versions:
            if self._op(vv) != "append":
                return None
            files.extend(
                str(f)
                for f in self._version_dir(vv).glob("*.parquet")
                if not f.name.startswith("prior_")
            )
        if not files:
            return self.spark.createDataFrame([], self.read().schema)
        schema = self.table_schema(cur)
        reader = self.spark.read.schema(schema) if schema is not None else self.spark.read
        return reader.parquet(*sorted(files))

    def changes_since(
        self,
        v: int | None,
        keys: Sequence[str] | None = None,
        until: int | None = None,
    ) -> DataFrame | None:
        """Delta-CDF-style change feed: the row-level changes committed
        strictly after version ``v``, as the table's columns plus
        ``_change_type`` ('insert' / 'delete', or 'update_pre' /
        'update_post' when ``keys`` lets a delete+insert of the same key
        be recognized as an update).

        Where ``appended_since`` gives up on any non-append commit, this
        feed also spans MERGE commits — computed by diffing only the
        files the merge touched (small, thanks to file-pruned merges),
        never the whole table. Returns None when the delta is not
        derivable (no cursor, or a full-snapshot rewrite/compaction in
        the range — those are rewrites of everything, so a diff would
        cost a full table comparison anyway; rebuild instead).

        Exactly-once consumption: fold the result, then store ``v`` =
        ``current_version()`` read BEFORE calling (same cursor contract
        as ``appended_since``; ``until`` pins that same pre-read version
        as the inclusive upper bound against concurrent commits)."""
        cur = self.current_version() if until is None else min(until, self.current_version())
        if v is None:
            return None
        schema = self.table_schema(cur)

        def _read(paths):
            if not paths:
                return self.spark.createDataFrame([], schema or self.read().schema)
            reader = self.spark.read.schema(schema) if schema is not None else self.spark.read
            return reader.parquet(*sorted(paths))

        if v >= cur:
            return _read([]).withColumn("_change_type", F.lit("insert")).limit(0)
        versions = self._committed_in_range(v, cur)
        if versions is None:
            return None
        inserts: list[DataFrame] = []
        deletes: list[DataFrame] = []
        for i, vv in enumerate(versions):
            op = self._op(vv)
            vdir = self._version_dir(vv)
            new_files = [str(f) for f in vdir.glob("*.parquet") if not f.name.startswith("prior_")]
            if op == "append":
                inserts.append(_read(new_files))
            elif op == "merge":
                # touched files = prior-version data files NOT hardlinked
                # in. "Prior" = the previous COMMITTED version (what the
                # merge read as current) — with the ledger that is NOT
                # necessarily vv-1, which could be an orphan dir.
                linked = {
                    f.name[len("prior_"):] for f in vdir.glob("prior_*.parquet")
                }
                prev_v = versions[i - 1] if i > 0 else v
                prev_dir = self._version_dir(prev_v)
                if not prev_dir.exists():
                    # the diff base (often the caller's cursor version)
                    # was vacuumed — an empty old side would turn every
                    # rewritten row into a phantom 'insert' and drop the
                    # deletes; not derivable, rebuild instead
                    return None
                touched_old = [
                    str(f) for f in prev_dir.glob("*.parquet") if f.name not in linked
                ]
                old_rows, new_rows = _read(touched_old), _read(new_files)
                deletes.append(old_rows.exceptAll(new_rows))
                inserts.append(new_rows.exceptAll(old_rows))
            else:  # snapshot rewrite / compaction / unknown → not derivable
                return None
        import functools

        empty = _read([])
        ins = functools.reduce(DataFrame.unionAll, inserts, empty)
        dels = functools.reduce(DataFrame.unionAll, deletes, empty)
        ins = ins.withColumn("_change_type", F.lit("insert"))
        dels = dels.withColumn("_change_type", F.lit("delete"))
        if not keys:
            return ins.unionAll(dels)
        # pair delete+insert on the same key into update_pre/update_post
        key_cols = list(keys)
        upd_keys = (
            ins.select(*key_cols).intersect(dels.select(*key_cols))
        )
        b = F.broadcast(upd_keys)
        upd_post = ins.join(b, key_cols, "left_semi").withColumn(
            "_change_type", F.lit("update_post")
        )
        upd_pre = dels.join(b, key_cols, "left_semi").withColumn(
            "_change_type", F.lit("update_pre")
        )
        pure_ins = ins.join(b, key_cols, "left_anti")
        pure_del = dels.join(b, key_cols, "left_anti")
        return pure_ins.unionAll(pure_del).unionAll(upd_pre).unionAll(upd_post)

    def _link_prior(self, src_dir: Path, new_dir: Path, skip: set[str] | None = None) -> None:
        """Hardlink prior snapshot files into the new version (no data
        rewrite; copy fallback for filesystems without hardlinks)."""
        for f in src_dir.glob("*.parquet"):
            if skip and f.name in skip:
                continue
            target = new_dir / f"prior_{f.name}"
            try:
                os.link(f, target)
            except OSError:
                shutil.copy2(f, target)

    def overwrite(
        self, df: DataFrame, epoch=None, epoch_key=None,
        expected_version: int | None = None,
        set_props: dict | None = None,
        expect_props: dict | None = None,
        op: str = "snapshot",
    ) -> int | None:
        """Write a full new snapshot and atomically repoint ``_latest``.

        ``(epoch, epoch_key)``: optional idempotence watermark — if a
        committed write already recorded epoch >= this one under the
        same key (an at-least-once foreachBatch replay after a crash
        between sink write and checkpoint), the write is skipped.

        ``expected_version``: optimistic concurrency — raise
        ``ConcurrentWriteError`` (checked atomically inside the commit
        lock) if the pointer moved since the caller read the table at
        that version; for read-modify-overwrite patterns where silently
        replacing an interleaved commit's data would lose it.

        Returns the committed version, or **None when nothing was
        committed** (the epoch was already applied — caught by the
        pre-check or the in-lock recheck). Callers observing a write
        via ``Observation`` MUST check for None before ``obs.get``: a
        pre-check skip never executes the observed plan, so the get
        would block forever."""
        if self._epoch_already_applied(epoch, epoch_key):
            return None
        cur = self.current_version()
        if expected_version is not None and cur != expected_version:
            # fast-fail before burning the snapshot write; the
            # authoritative (locked) check still runs in _commit
            raise ConcurrentWriteError(
                f"table {self.name}: optimistic concurrency check failed "
                f"(read at v{expected_version}, pointer now at v{cur}) — "
                "re-read and retry"
            )
        v = self._claim_next_version()
        df.write.mode("overwrite").parquet(str(self._version_dir(v)))
        self._write_op_marker(v, op)
        self._write_schema(self._version_dir(v), df.schema)
        self._collect_stats(self._version_dir(v))
        if not self._commit(
            v, epoch, epoch_key, expected_version, set_props, expect_props
        ):
            return None  # lost the replay race: nothing committed
        return v

    def append(
        self,
        df: DataFrame,
        epoch=None,
        epoch_key=None,
        evolve: bool = False,
        set_props: dict | None = None,
        expect_props: dict | None = None,
    ) -> int | None:
        """Append = new snapshot directory: new files land next to
        hardlinked prior files (cheap, no data rewrite). Epoch watermark
        as in ``overwrite`` — replaying the same micro-batch is a no-op,
        making checkpoint + append genuinely exactly-once.

        ``set_props`` / ``expect_props``: commit-atomic table properties
        (same contract as ``overwrite`` / ``_commit`` — expectation
        checked inside the locked commit; first binder wins).

        Schema is ENFORCED against the committed one (aligned order,
        null-filled missing nullable columns, exact types); new columns
        require ``evolve=True``, which widens the canonical schema
        without rewriting old files.

        Returns the committed version, or **None when nothing was
        committed** (epoch already applied — pre-check or in-lock
        recheck). Same Observation caveat as ``overwrite``.

        Concurrency: the commit carries ``expected_version`` = the
        version whose files this append hardlinked as priors, so a
        writer that raced past another's commit raises
        ``ConcurrentWriteError`` (re-read and retry) instead of
        silently publishing a snapshot that omits the interleaved
        commit's rows — appends must be additive, never lossy."""
        if self._epoch_already_applied(epoch, epoch_key):
            return None
        v = self.current_version()
        df, schema = self._align(df, evolve)
        new_v = self._claim_next_version()
        new_dir = self._version_dir(new_v)
        df.write.mode("overwrite").parquet(str(new_dir))
        if v >= 0:
            self._link_prior(self._version_dir(v), new_dir)
        self._write_op_marker(new_v, "append")
        self._write_schema(new_dir, schema)
        self._collect_stats(new_dir, self.file_stats(v) if v >= 0 else None)
        if not self._commit(
            new_v, epoch, epoch_key, expected_version=v,
            set_props=set_props, expect_props=expect_props,
        ):  # lost the replay race
            return None
        return new_v

    def merge_keyed(
        self,
        batch: DataFrame,
        keys: Sequence[str],
        merge_fn: Callable[[DataFrame, DataFrame], DataFrame],
        epoch=None,
        epoch_key=None,
    ) -> int | None:
        """File-pruned keyed merge (Delta-MERGE-style on plain parquet).

        Returns the committed version, or None when nothing was
        committed (epoch already applied). The commit carries
        ``expected_version`` = the version whose files were read/
        hardlinked, so a merge racing past an interleaved commit fails
        loudly (ConcurrentWriteError) instead of silently dropping that
        commit's rows.

        ``merge_fn(current_subset, batch) -> merged`` must be key-local
        (the result for key k depends only on rows of key k — true for
        scd1_merge / scd2_apply). Only data files containing a batch key
        are read back and rewritten; every untouched file is hardlinked
        into the new snapshot byte-identical. Untouched keys co-located
        in touched files flow through ``merge_fn`` unchanged.

        Physical shape: one semi-join of the current snapshot against
        the (broadcast) distinct batch keys to find touched files, then
        the merge itself over just those files' rows. At 100 TB with the
        table clustered by key this touches a handful of files per
        incremental batch instead of the whole table.

        The driver-side touched-file manifest is BOUNDED: it is
        collected through a ``limit(cap + 1)`` where cap =
        min(``merge_full_rewrite_fraction`` × the snapshot's file
        count, ``merge_manifest_max_files``) — the absolute term keeps
        driver memory constant even on million-file tables. A batch
        touching more than the cap has no pruning value left — the
        merge falls back to a full rewrite (subset = whole snapshot,
        nothing hardlinked) without ever materializing the manifest."""
        if self._epoch_already_applied(epoch, epoch_key):
            return None
        if not self.exists():
            empty = self.spark.createDataFrame([], batch.schema)
            return self.overwrite(merge_fn(empty, batch), epoch, epoch_key)
        v = self.current_version()
        vdir = self._version_dir(v)
        cur = self.read()
        bkeys = batch.select(*keys).distinct()
        n_files = sum(1 for _ in vdir.glob("*.parquet"))
        cap = max(
            1,
            min(
                int(self.merge_full_rewrite_fraction * n_files),
                self.merge_manifest_max_files,
            ),
        )
        touched = (
            cur.withColumn("__file", F.input_file_name())
            .join(F.broadcast(bkeys), list(keys), "left_semi")
            .select("__file")
            .distinct()
            .limit(cap + 1)
            .collect()
        )
        full_rewrite = len(touched) > cap
        touched_files = (
            set() if full_rewrite
            else {os.path.basename(r["__file"]) for r in touched}
        )
        new_v = self._claim_next_version()
        new_dir = self._version_dir(new_v)
        if full_rewrite:
            subset = cur
        elif touched_files:
            stored = self.table_schema(v)
            reader = self.spark.read.schema(stored) if stored is not None else self.spark.read
            subset = reader.parquet(*[str(vdir / f) for f in sorted(touched_files)])
        else:
            subset = self.spark.createDataFrame([], cur.schema)
        # Schema is enforced on the merge OUTPUT (the batch legitimately
        # differs — e.g. CDC batches lack the SCD bookkeeping columns
        # that merge_fn itself adds).
        merged, schema = self._align(merge_fn(subset, batch), evolve=False)
        merged.write.mode("overwrite").parquet(str(new_dir))
        if not full_rewrite:
            self._link_prior(vdir, new_dir, skip=touched_files)
        self._write_op_marker(new_v, "merge")
        self._write_schema(new_dir, schema)
        self._collect_stats(new_dir, self.file_stats(v) if not full_rewrite else None)
        if not self._commit(new_v, epoch, epoch_key, expected_version=v):
            return None  # lost the replay race: nothing committed
        return new_v

    def compact(
        self,
        target_partitions: int | None = None,
        cluster_by: Sequence[str] | None = None,
        zorder_by: Sequence[str] | None = None,
        zorder_bits: int = 10,
    ) -> int:
        """Rewrite the current snapshot with bin-packed files (small-file
        compaction — appends accumulate one file set per batch; compaction
        restores scan efficiency). New snapshot version, atomic swap.

        ``cluster_by``: range-cluster the rewrite on these columns
        (``repartitionByRange`` + in-file sort) so per-file min/max
        ranges become disjoint — this is what turns the ``_stats.json``
        index into sharp data skipping (``read_pruned``) and keeps
        ``merge_keyed`` touching few files per incremental batch.

        ``zorder_by``: the open equivalent of Delta's OPTIMIZE ZORDER
        BY — exactly TWO numeric columns, each range-bucketed to
        ``zorder_bits`` and Morton-interleaved
        (``operators/skew.py::zorder_key``), then range-partitioned +
        sorted by the Z-value so every file covers a tight rectangle in
        BOTH dimensions: ``read_pruned`` skips files on EITHER
        predicate, where ``cluster_by`` only prunes its leading column.
        The per-column min/max come from one model-sized aggregate over
        the snapshot (compaction is maintenance — the extra scan is the
        point). Mutually exclusive with ``cluster_by``.

        Content-preserving by contract, so the commit carries
        ``expected_version`` = the snapshot it read: a concurrent append
        landing mid-compaction raises ConcurrentWriteError (re-run the
        compaction) instead of being silently discarded by the rewrite."""
        if cluster_by and zorder_by:
            raise ValueError("compact: cluster_by and zorder_by are mutually exclusive")
        v = self.current_version()
        df = self.read()
        if target_partitions is None:
            n_files = len(list(self._version_dir(v).glob("*.parquet")))
            target_partitions = max(1, n_files // 8)
        if cluster_by:
            df = df.repartitionByRange(target_partitions, *cluster_by).sortWithinPartitions(
                *cluster_by
            )
        elif zorder_by:
            from end_to_end_azure_databricks_data_engineering_project_spark.operators.skew import zorder_key

            if len(zorder_by) != 2:
                raise ValueError(
                    f"compact: zorder_by takes exactly two columns, got {list(zorder_by)}"
                )
            if not 1 <= zorder_bits <= 31:
                # zorder_key interleaves into int64: 2*bits must stay
                # <= 62 — fail at the API boundary, not deep in the
                # expression builder with a literal-overflow error
                raise ValueError(
                    f"compact: zorder_bits must be in [1, 31], got {zorder_bits}"
                )
            reserved = ("__z", "__zx_lo", "__zx_hi", "__zy_lo", "__zy_hi")
            clash = [c for c in reserved if c in df.columns]
            if clash:
                # withColumn would silently OVERWRITE a user column and
                # drop it — a content-preserving op must refuse instead
                raise ValueError(
                    f"compact: zorder_by reserves column name(s) {clash}; "
                    "rename them before z-ordering"
                )
            xc, yc = zorder_by
            # bounds ride the plan as a 1-row broadcast aggregate — no
            # driver round-trip, and an empty or all-NULL column simply
            # yields NULL bounds (bucket()'s otherwise-0 branch)
            b = df.agg(
                F.min(xc).alias("__zx_lo"), F.max(xc).alias("__zx_hi"),
                F.min(yc).alias("__zy_lo"), F.max(yc).alias("__zy_hi"),
            )
            n_buckets = F.lit(2 ** zorder_bits - 1)

            def bucket(c, lo, hi):
                # span 0 (constant column) or NULL bounds → bucket 0
                span = F.col(hi) - F.col(lo)
                return F.when(span > 0,
                              F.floor((F.col(c) - F.col(lo)).cast("double")
                                      / span.cast("double")
                                      * n_buckets.cast("double"))
                              .cast("bigint")).otherwise(F.lit(0))

            df = (
                df.crossJoin(F.broadcast(b))
                .withColumn(
                    "__z",
                    zorder_key(bucket(xc, "__zx_lo", "__zx_hi"),
                               bucket(yc, "__zy_lo", "__zy_hi"), zorder_bits),
                )
                .repartitionByRange(target_partitions, "__z")
                .sortWithinPartitions("__z")
                .drop(*reserved)
            )
        else:
            df = df.coalesce(target_partitions)
        return self.overwrite(df, expected_version=v, op="compact")

    def vacuum(self, keep: int = 2) -> None:
        """Drop snapshot dirs older than the newest ``keep`` versions,
        and prune their ledger entries (recording the prune point in
        ``committed_floor``) — otherwise a long-lived streaming sink
        table would re-parse an ever-growing committed list on every
        pointer read."""
        cur = self.current_version()
        for d in sorted(self.dir.glob("v*")):
            v = int(d.name[1:])
            if v <= cur - keep:
                shutil.rmtree(d, ignore_errors=True)
        fd = self._acquire_commit_lock()
        try:
            state = self._pointer_state()
            keep_from = cur - keep + 1
            if state.get("committed") is None:
                # Ledger-less table: seed NOW (from the surviving dirs) so
                # the prune point is recorded. Deferring to the next
                # _commit would seed a list starting above the vacuum
                # horizon; _seed_ledger's min(seeded) floor covers that
                # too, but recording keep_from here keeps the floor exact
                # even if later commits tighten the heuristic.
                self._seed_ledger(state)
                state["committed_floor"] = max(
                    state["committed_floor"], keep_from
                )
                self._write_pointer_locked(state)
            committed = state["committed"]
            if any(x < keep_from for x in committed):
                state["committed"] = [x for x in committed if x >= keep_from]
                state["committed_floor"] = max(
                    state.get("committed_floor", 0), keep_from
                )
                self._write_pointer_locked(state)
        finally:
            self._release_commit_lock(fd)

    def vacuum_uncommitted(self) -> None:
        """Remove orphan version dirs left by crashed or losing writers
        (claimed-but-never-committed dirs above the pointer). Only call
        when no writer is active on this table."""
        cur = self.current_version()
        for d in sorted(self.dir.glob("v*")):
            if int(d.name[1:]) > cur:
                shutil.rmtree(d, ignore_errors=True)

    def _require_complete(self, version: int) -> None:
        """Reject version dirs that are not committed history. Primary
        check: the pointer's ``committed`` ledger (only ``_commit``
        appends to it, so losing-race or crashed writers never appear —
        even when their dir sits BELOW the pointer with complete data
        and an ``_op`` marker). Legacy tables committed before the
        ledger existed fall back to pointer-bound + ``_op``-marker
        checks."""
        state = self._pointer_state()
        committed = state.get("committed")
        if committed is not None:
            # entries below committed_floor were pruned by vacuum — for
            # those (whose dirs vacuum also removed) fall through to the
            # dir/marker checks instead of the membership test
            if version >= state.get("committed_floor", 0) and version not in committed:
                raise FileNotFoundError(
                    f"table {self.name}: version {version} is not committed "
                    "history (aborted/losing-writer dir, or never existed) — "
                    "not a readable snapshot"
                )
        elif version > state["version"]:
            raise FileNotFoundError(
                f"table {self.name}: version {version} is not committed "
                f"(pointer at v{state['version']}) — an orphan dir from "
                "a crashed writer is not a readable snapshot"
            )
        vdir = self._version_dir(version)
        if not vdir.exists():
            raise FileNotFoundError(
                f"table {self.name}: version {version} missing (vacuumed?)"
            )
        if not (vdir / "_op").exists():
            raise FileNotFoundError(
                f"table {self.name}: version {version} has no _op marker — "
                "a crashed writer's partial dir is not a readable snapshot"
            )

    def read_at(self, version: int) -> DataFrame:
        """Time travel: the committed snapshot at ``version`` (must not
        have been vacuumed), read under ITS schema — reads are pinned to
        the schema as of that version, so post-evolution columns don't
        appear retroactively."""
        self._require_complete(version)
        vdir = self._version_dir(version)
        schema = self.table_schema(version)
        reader = self.spark.read.schema(schema) if schema is not None else self.spark.read
        return reader.parquet(str(vdir))

    def _link_snapshot_into(self, src: Path, dst: Path) -> None:
        """Hardlink every data file of snapshot ``src`` into ``dst``
        under its ORIGINAL name (copy fallback), carrying the schema and
        the per-file stats manifest along — stats keys are file names,
        which are preserved, so skipping keeps working with zero IO."""
        for f in src.glob("*.parquet"):
            try:
                os.link(f, dst / f.name)
            except OSError:
                shutil.copy2(f, dst / f.name)
        for meta in ("_schema.json", "_stats.json"):
            if (src / meta).exists():
                shutil.copy2(src / meta, dst / meta)

    def restore(self, version: int) -> int:
        """Delta-RESTORE semantics: commit a NEW version whose content
        is snapshot ``version``. History only moves forward — the
        versions being rolled past stay readable for audit/time travel
        until vacuumed — and no data is rewritten (hardlinks).

        The restore commit is a snapshot barrier for ``appended_since``
        (op marker != append), so incremental consumers correctly fall
        back to a rebuild instead of silently missing the rollback."""
        self._require_complete(version)
        src = self._version_dir(version)
        new_v = self._claim_next_version()
        self._link_snapshot_into(src, self._version_dir(new_v))
        self._write_op_marker(new_v, "restore")
        self._commit(new_v)
        return new_v

    def clone_to(self, target: "ManagedTable") -> int:
        """Shallow clone (Delta SHALLOW CLONE): commit the current
        snapshot's files into ``target`` by hardlink — zero data copy,
        stats and schema carried over, and the clone's history starts
        fresh at its own v0+. Writers to either table never interfere:
        version dirs are never mutated in place, so shared inodes are
        safe. Target must be empty (a clone is a create, not a merge)."""
        if target.exists():
            raise ValueError(
                f"clone target {target.name} already has committed versions"
            )
        cur = self.current_version()
        if cur < 0:
            raise FileNotFoundError(f"table {self.name} has no committed version")
        new_v = target._claim_next_version()
        self._link_snapshot_into(self._version_dir(cur), target._version_dir(new_v))
        target._write_op_marker(new_v, "clone")
        target._commit(new_v)
        return new_v


class Catalog:
    """Tiny namespace of ManagedTables (≙ Unity Catalog schema binding,
    reference ``databricks.yml``/``spotify_dab.pipeline.yml`` catalog/schema)."""

    def __init__(self, spark: SparkSession, root: str | os.PathLike[str]):
        self.spark = spark
        self.root = Path(root)

    def table(self, name: str) -> ManagedTable:
        return ManagedTable(self.spark, self.root, name)

    def register_views(self) -> None:
        """Expose every committed table as a temp view for spark.sql().

        Non-directory entries in the root (editor backups, stray
        manifests) are skipped — constructing a ManagedTable on one
        would hit mkdir(FileExistsError) and abort every registration."""
        for d in sorted(self.root.iterdir()):
            if not d.is_dir():
                continue
            t = ManagedTable(self.spark, self.root, d.name)
            if t.exists():
                t.read().createOrReplaceTempView(d.name)
