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

Scale posture — STABLE FILE IDENTITIES: data files are immutable,
globally-unique-named parquet in a shared per-table store
(``_data/``); each version directory holds only METADATA (an
``_op`` marker, the committed ``_schema.json``, and a
``_manifest.json`` recording this commit's added/removed store files
plus footer stats for the added ones). A snapshot's member list is
the manifest chain resolved back to the nearest full manifest
(rewrites are natural full manifests; long append chains rebase every
``manifest_rebase_depth`` commits), so:

- ``append`` costs O(new files) in metadata — no per-file hardlink
  syscalls, no O(live files) anything. A streaming sink committing
  every micro-batch into a million-file table pays for its own files
  only.
- ``merge_keyed`` gives Delta-MERGE-style file pruning — an
  incremental batch rewrites ONLY the data files containing a touched
  key; every untouched file is carried by reference (same store path,
  zero IO). A daily 300-row CDC batch against a 100 TB fact touches
  the few files holding those keys, not the table.
- the Delta transaction log (``sources/deltalog.py``) emits TRUE
  incremental add/remove actions, since paths are stable across
  versions.
- ``restore`` and shallow ``clone_to`` are pure metadata.

Writer safety: each version directory is claimed with an exclusive
mkdir, so a losing concurrent writer fails loudly instead of
corrupting the snapshot, and commits carry an optional (epoch_key,
epoch) watermark making at-least-once foreachBatch replays
idempotent. Tables written by pre-manifest engine revisions (data
files inside version dirs, carried files hardlinked as ``prior_*``)
stay readable everywhere; the first new write upgrades them by
linking the prior snapshot into the store once.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import threading
import time
from collections.abc import Callable, Mapping, Sequence
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


class OptimisticConcurrencyError(ConcurrentWriteError):
    """The pointer moved past the version this writer read its inputs
    at (``expected_version`` mismatch). Subclass so ``append`` can
    RESOLVE the conflict logically (Delta semantics: two blind appends
    don't conflict — rebase and re-commit) while every other
    ``ConcurrentWriteError`` stays a hard loud failure."""


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


def _relink_store_files(
    src_store: Path,
    names: Sequence[str],
    stats: dict,
    dst_store: Path,
    new_v: int,
) -> tuple[list[str], dict]:
    """Hardlink store files under fresh names embedding ``new_v``
    (``f{new_v}-{i}-{token}``, hive subdirs preserved, stats rekeyed)
    — the shared rename-and-link step of shallow CLONE and the
    concurrent-append REBASE. The name rewrite is what keeps
    ``_gc_store``'s in-flight guard honest (it keys off the
    name-embedded claim version); the ``copy2`` fallback covers
    filesystems without hardlink support, same as the legacy upgrade
    path."""
    import uuid as _uuid

    token = _uuid.uuid4().hex[:8]
    new_names: list[str] = []
    new_stats: dict[str, dict] = {}
    for i, n in enumerate(names):
        sub = str(Path(n).parent)  # keep the hive partition dirs
        base = f"f{new_v:06d}-{i:05d}-{token}.parquet"
        nn = base if sub == "." else f"{sub}/{base}"
        dst = dst_store / nn
        dst.parent.mkdir(parents=True, exist_ok=True)
        try:
            os.link(src_store / n, dst)
        except OSError:
            shutil.copy2(src_store / n, dst)
        new_names.append(nn)
        if n in stats:
            new_stats[nn] = stats[n]
    return new_names, new_stats


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
    # manifest, no carried references) once a batch touches more than
    # this fraction of the snapshot's files — or more than the absolute
    # manifest cap, which is what actually bounds driver memory on
    # million-file tables (the fraction alone would still collect
    # O(table) rows).
    merge_full_rewrite_fraction = 0.8
    merge_manifest_max_files = 100_000

    # Incremental manifests record only added/removed store files and
    # chain to the previous committed version; a chain longer than this
    # is REBASED (the commit writes the resolved full member list too),
    # bounding snapshot resolution to O(rebase_depth) small JSON reads
    # while keeping the per-commit metadata O(changed files) amortized.
    manifest_rebase_depth = 32

    # Classic Delta checkpoint cadence: every Nth delta commit also
    # writes <v>.checkpoint.parquet + _last_checkpoint (Delta's own
    # default is 10), so a stock reader replays checkpoint + tail
    # instead of the whole log, and vacuum can expire pre-checkpoint
    # commit files (log retention). 0 disables automatic checkpoints
    # (write_delta_checkpoint stays available for manual cadence).
    delta_checkpoint_interval = 10

    def __init__(self, spark: SparkSession, root: str | os.PathLike[str], name: str):
        self.spark = spark
        self.dir = Path(root) / name
        self.name = name
        self.dir.mkdir(parents=True, exist_ok=True)
        # shared immutable data-file store; version dirs only reference it
        self.store = self.dir / "_data"

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
        atomic mkdir guarantees exactly one writer owns each version.
        Two writers racing for the same candidate is a SUPPORTED pattern
        (concurrent appends rebase-commit since r11), so the loser
        simply claims the next number — never clobbering the winner's
        files, and bounded against a pathological claim storm."""
        existing = [int(d.name[1:]) for d in self.dir.glob("v*") if d.name[1:].isdigit()]
        v = max([self.current_version(), *existing, -1]) + 1
        for _ in range(1000):
            try:
                self._version_dir(v).mkdir(parents=False, exist_ok=False)
                return v
            except FileExistsError:  # lost the claim race: next number
                v += 1
        raise ConcurrentWriteError(  # pragma: no cover - claim storm
            f"table {self.name}: could not claim a version after 1000 "
            "attempts"
        )

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
        ckpt_v: int | None = None
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
                raise OptimisticConcurrencyError(
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
            emit_meta, adds, removes, n_live, cfg, upgrade = self._prepare_delta(
                state, v, schema_string
            )
            self._write_pointer_locked(state)
            self._write_delta_commit(
                state["delta"], v, emit_meta, schema_string, adds, removes,
                n_live, cfg, upgrade,
            )
            dv = state["delta"]["version"]
            if (
                self.delta_checkpoint_interval > 0
                and dv > 0
                and dv % self.delta_checkpoint_interval == 0
            ):
                ckpt_v = dv
        finally:
            self._release_commit_lock(fd)
        if ckpt_v is not None:
            # Automatic checkpoint cadence (Delta writes one every 10th
            # commit). The PARQUET build runs OUTSIDE the lock — it
            # reads only already-written immutable log files, and
            # building it while holding the flock would stall every
            # concurrent writer into the 15s lock deadline on large
            # tables (the O(live files) parquet write). The
            # _last_checkpoint POINTER publish then takes the lock
            # briefly: the monotonicity guard (never point readers at
            # an older checkpoint — vacuum's expiry floor keys off the
            # newest FILE and would delete the one a regressed pointer
            # names) is check-then-replace, race-free only when every
            # engine writer serializes it. Atomic tmp+rename, so
            # nothing partial is ever visible. Failure is TOLERATED by
            # design: the commit above is already durable (pointer +
            # log published), so raising here would make a succeeded
            # write look failed and an at-least-once caller would
            # double-apply; a missed cadence hit just means the next
            # one (or write_delta_checkpoint) writes the checkpoint
            # instead. This is what lets a long-lived streaming sink's
            # log be EXPIRED below the checkpoint floor (vacuum)
            # instead of growing one commit file per micro-batch
            # forever.
            try:
                _, n_rows = deltalog.write_checkpoint_file(self.dir, ckpt_v)
                fd2 = self._acquire_commit_lock()
                try:
                    deltalog.publish_last_checkpoint(self.dir, ckpt_v, n_rows)
                finally:
                    self._release_commit_lock(fd2)
            except Exception as exc:
                # tolerated, but never SILENT: a systematically failing
                # checkpoint (permissions, missing pyarrow) would also
                # freeze vacuum's log-retention floor — surface why
                import warnings

                warnings.warn(
                    f"table {self.name}: cadence checkpoint at delta "
                    f"commit {ckpt_v} failed ({type(exc).__name__}: "
                    f"{exc}); the commit itself is durable and the "
                    "next cadence hit will retry",
                    RuntimeWarning,
                    stacklevel=2,
                )
        return True

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

    def _delta_file_entries(self, mt_v: int) -> dict[str, Path]:
        """{log-relative path: filesystem path} for snapshot ``mt_v``:
        stable ``_data/<name>`` paths for manifest versions,
        version-local paths for legacy ones."""
        res = self._resolve(mt_v)
        if res is not None:
            return {f"_data/{n}": self.store / n for n in res[0]}
        vdir = self._version_dir(mt_v)
        return {f"{vdir.name}/{f.name}": f for f in sorted(vdir.glob("*.parquet"))}

    def _dv_map_cached(self, mt_v: int) -> dict:
        """Resolved DV map for ``mt_v``, memoized per version (the map
        is immutable once committed; the delta diff asks per-path)."""
        cache = self.__dict__.setdefault("_dv_maps", {})
        if mt_v not in cache:
            if len(cache) > 8:
                cache.clear()
            try:
                cache[mt_v] = self._resolve_dv(mt_v)
            except FileNotFoundError:
                cache[mt_v] = {}
        return cache[mt_v]

    def _dv_log_names(self, mt_v: int, log_path: str) -> list[str]:
        """Sorted tombstone-file names for a LOG path (``_data/<name>``)
        at version ``mt_v`` — the delta diff's per-path DV state."""
        key = (
            log_path[len("_data/"):]
            if log_path.startswith("_data/")
            else log_path
        )
        entries = self._dv_map_cached(mt_v).get(key)
        return sorted({d for d, _ in entries}) if entries else []

    def _prepare_delta(self, state: dict, v: int, schema_string: str | None):
        """Advance ``state['delta']`` for the commit of MT version ``v``
        (call under the commit lock, before the pointer write;
        ``schema_string`` is resolved by the caller OUTSIDE the lock —
        the legacy fallback runs a Spark job). Returns what the
        post-pointer log write needs: (emit metaData?, adds {path:
        fs path}, remove paths, live file count) — a TRUE incremental
        delta, diffed against the superseded snapshot (the pointer
        version, which can never have been vacuumed at commit time)."""
        prior = state.get("delta")
        cfg = self._delta_configuration(state)
        # the metaData fingerprint covers schema + table configuration
        # (CDF flag, CHECK constraints): a constraint add/drop re-emits
        # metaData on the NEXT data commit, so a stock reader sees
        # delta.constraints.* keys current as of that commit (Delta
        # emits a metadata-only commit immediately; our delta versions
        # are 1:1 with table commits, so the re-emission is deferred —
        # documented in add_constraint)
        md5 = self._meta_fingerprint(schema_string, cfg)
        required_wv = deltalog.required_writer_version(cfg, schema_string)
        new_entries = self._delta_file_entries(v)
        # DV protocol gate (PROTOCOL.md table features): the first
        # commit whose snapshot carries deletion vectors must bump the
        # protocol to reader v3 / writer v7 with the DV extension named
        # in readerFeatures, so a stock reader-v1 client refuses the
        # table instead of silently returning tombstoned (possibly
        # GDPR-erased) rows. Once on, never downgraded — protocol
        # upgrades are monotonic even after compaction folds every DV.
        has_dv = bool(self._dv_map_cached(v))
        if prior is None:
            state["delta"] = {
                "version": 0,
                "mt_version": v,
                "table_id": deltalog.new_table_id(),
                "schema_md5": md5,
                "writer_version": required_wv,
                "dv_protocol": has_dv,
            }
            return (
                schema_string is not None, new_entries, [], len(new_entries),
                cfg, None,
            )
        emit_meta = schema_string is not None and md5 != prior.get("schema_md5")
        prior_paths = set(self._delta_file_entries(prior["mt_version"]))
        # a path whose DELETION-VECTOR state changed is re-added
        # (remove + add of the same path in one commit — the protocol's
        # DV encoding): a new tombstone (DML), a dropped one (restore to
        # a pre-delete snapshot), each must reach replaying readers
        changed = {
            p
            for p in new_entries
            if p in prior_paths
            and self._dv_log_names(v, p) != self._dv_log_names(
                prior["mt_version"], p
            )
        }
        adds = {
            p: fp
            for p, fp in new_entries.items()
            if p not in prior_paths or p in changed
        }
        removes = sorted((prior_paths - set(new_entries)) | changed)
        # protocol upgrade: a configuration change that RAISED the
        # writer requirement (constraint added to a v2 table, CDF
        # enabled later) ships a protocol action in this commit so a
        # stock writer that can't enforce the new feature refuses to
        # write instead of silently violating it
        prior_wv = prior.get("writer_version", deltalog.PROTOCOL["minWriterVersion"])
        prior_dv = bool(prior.get("dv_protocol"))
        new_wv = max(required_wv, prior_wv)
        dv_protocol = prior_dv or has_dv
        upgrade: int | dict | None = None
        if dv_protocol and (
            not prior_dv
            # an already-upgraded table whose writer requirement rose
            # (constraint/CDF added later) re-emits the feature
            # protocol so writerFeatures lists the new capability
            or (new_wv > prior_wv)
        ):
            upgrade = deltalog.feature_protocol(new_wv)
        elif new_wv > prior_wv:
            upgrade = new_wv
        state["delta"] = {
            "version": prior["version"] + 1,
            "mt_version": v,
            "table_id": prior["table_id"],
            "schema_md5": md5 if md5 is not None else prior.get("schema_md5"),
            "writer_version": new_wv,
            "dv_protocol": dv_protocol,
            # lowest retained commit file (raised by vacuum's log
            # retention) — the heal completeness check counts from here
            "log_floor": prior.get("log_floor", 0),
        }
        return emit_meta, adds, removes, len(new_entries), cfg, upgrade

    @staticmethod
    def _meta_fingerprint(schema_string: str | None, cfg: dict) -> str | None:
        """One fingerprint formula for every writer of ``schema_md5``
        (commit path AND log-restart heal): schema + configuration."""
        if schema_string is None:
            return None
        return deltalog.schema_fingerprint(
            schema_string + json.dumps(cfg, sort_keys=True)
        )

    def _write_delta_commit(
        self, rec: dict, v: int, emit_meta: bool, schema_string: str | None,
        adds: dict[str, Path], removes: list[str], n_live: int,
        cfg: dict | None = None, protocol_upgrade: int | dict | None = None,
    ) -> None:
        # ONE manifest read for partition columns, cdc list, and row
        # metrics — this runs inside the flock critical section, so no
        # repeated JSON parses and no pointer re-read (``cfg`` comes
        # from the caller's in-memory state, the same source the
        # emit_meta fingerprint used)
        m = self._manifest(v) or {}
        op = self._op(v)
        pcols = m.get("partition_columns", [])
        # deletion vectors (r12): the log mirrors Delta's DV shape —
        # any (re-)added path carries its CURRENT ``dv`` tombstone list
        # (the diff in _prepare_delta/_heal re-adds paths whose DV state
        # changed: remove + add of one path in one commit, the
        # protocol's own DV encoding)
        def _dv_names(p: str) -> list[str] | None:
            return self._dv_log_names(v, p) or None

        def _add_dict(p: str, fp: Path) -> dict:
            st = fp.stat()
            vals = self._partition_values(p)
            d = {
                "path": p,
                "size": st.st_size,
                "modificationTime": int(st.st_mtime * 1000),
                # Delta encodes a null partition value as JSON null
                "partitionValues": {
                    c: (None if vals[c] == "__HIVE_DEFAULT_PARTITION__"
                        else vals[c])
                    for c in pcols if c in vals
                },
            }
            names = _dv_names(p)
            if names:
                d["dv"] = names
            return d

        add_dicts = [_add_dict(p, fp) for p, fp in adds.items()]
        cdc_dicts = []
        for name in m.get("cdc", ()):
            fp = self.dir / "_change_data" / name
            cdc_dicts.append({
                "path": f"_change_data/{name}",
                "size": fp.stat().st_size if fp.exists() else 0,
            })
        actions = deltalog.build_commit(
            rec["version"], op, rec["table_id"], self.name,
            schema_string, emit_meta, add_dicts, removes, v, n_live,
            partition_columns=pcols,
            cdc=cdc_dicts,
            configuration=cfg or None,
            extra_metrics=self._row_metrics(m, op),
            protocol_upgrade=protocol_upgrade,
        )
        deltalog.write_commit(self.dir, rec["version"], actions)

    def _delta_configuration(self, state: dict) -> dict:
        """The table configuration the Delta metaData action carries:
        the CDF flag plus one ``delta.constraints.<name>`` entry per
        CHECK constraint (Delta's ALTER TABLE ADD CONSTRAINT storage)."""
        props = state.get("props", {})
        cfg: dict = {}
        if props.get("enable_cdf") == "true":
            cfg["delta.enableChangeDataFeed"] = "true"
        for cname, cexpr in sorted((props.get("constraints") or {}).items()):
            cfg[f"delta.constraints.{cname}"] = cexpr
        return cfg

    def _row_metrics(self, m: dict, op: str) -> dict:
        """Delta-style row-count operationMetrics, derived ENTIRELY
        from the manifest's per-file stats (no Spark job, no file IO
        beyond the already-written metadata). The manifest describes
        the manifest CHAIN, not always the log diff, so this is
        op-aware — metrics are a courtesy, never wrong:

        - restore/clone manifests carry no added/removed diff → {};
        - compact is content-identical → removed rows = added rows;
        - a base-less manifest (first write OR overwrite replacement)
          can't distinguish 'nothing existed' from 'everything was
          replaced' → numAddedRows only;
        - incremental manifests (append/merge/DML) report both, plus
          ``numDeletedRows`` for DELETE commits."""
        if not m or op in ("restore", "clone"):
            return {}

        def _rows(names, smap):
            total = 0
            for n in names:
                r = (smap.get(n) or {}).get("rows")
                if r is None:
                    return None
                total += r
            return total

        out: dict = {}
        added = _rows(m.get("added", []), m.get("stats") or {})
        if added is not None:
            out["numAddedRows"] = added
        removed_names = m.get("removed", [])
        base = m.get("base")
        if op == "compact":
            removed = added  # content-identical by contract
        elif m.get("upgrade") or base is None:
            # upgrade: removed lists pre-store identities (unknowable);
            # base-less: first write vs snapshot replacement ambiguous
            removed = None
        elif removed_names:
            base_stats = self.file_stats(base)
            removed = _rows(removed_names, base_stats or {})
        else:
            removed = 0
        dv_rows = sum(
            r
            for entries in (m.get("dv_added") or {}).values()
            for _, r in entries
        )
        if removed is not None:
            out["numRemovedRows"] = removed
            if op == "delete" and added is not None:
                # a rewritten file may have carried PRIOR deletion
                # vectors: the rewrite folds those T tombstoned rows
                # away, so removed - added = T + D — subtract T (already
                # reported deleted by the earlier DV commit) or this
                # commit's numDeletedRows double-counts them
                prior_dv = (
                    self._dv_map_cached(base) if base is not None else {}
                )
                folded = sum(
                    r
                    for n in removed_names
                    for _, r in (prior_dv.get(n) or ())
                )
                out["numDeletedRows"] = removed - added + dv_rows - folded
        elif op == "delete" and dv_rows:
            out["numDeletedRows"] = dv_rows
        if dv_rows:
            out["numDeletionVectorRows"] = dv_rows
        return out

    def _heal_delta_log(self, state: dict) -> None:
        """Repair ``_delta_log/`` to match the pointer (call under the
        commit lock). Two cases:

        1. Only the LATEST commit file is missing (crash between
           pointer write and log write — the designed window): rewrite
           it from immutable on-disk state — the snapshot's manifest
           (it is the pointer version, never vacuumed), its ``_op`` /
           ``_schema.json``, and the prior live set replayed from the
           surviving commits 0..D-1. Healed commits always re-emit
           metaData (harmless — replay takes the latest).

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
        # one readdir, not O(history) stats per commit: commits F..D
        # (F = the retention floor vacuum recorded when it expired the
        # pre-checkpoint files) are complete iff exactly D-F+1 (- the
        # possibly-missing latest) files exist at/above F — any deletion
        # shrinks the count. Counted over VALIDATED commit filenames
        # (20-digit stems) only: a stray .json dropped in the log dir
        # must not mask a genuinely missing commit, and a stale
        # sub-floor leftover must not inflate the count.
        floor = rec.get("log_floor", 0)
        n_log_files = sum(
            1 for p in deltalog.commit_files(self.dir) if int(p.stem) >= floor
        )
        history_missing = n_log_files < rec["version"] - floor + (
            0 if latest_missing else 1
        )
        if not latest_missing and not history_missing:
            return
        # a heal is a significant event (crashed writer, deleted log):
        # surface it — silent heals make the next forensic impossible
        import warnings as _warnings

        _warnings.warn(
            f"table {self.name}: delta log heal engaged "
            f"(latest_missing={latest_missing}, "
            f"history_missing={history_missing}, delta={rec['version']}, "
            f"retained_files={n_log_files})",
            RuntimeWarning,
            stacklevel=3,
        )
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
            cfg = self._delta_configuration(state)
            rec = {
                "version": 0,
                "mt_version": v,
                "table_id": deltalog.new_table_id(),
                # SAME fingerprint formula as _prepare_delta — a
                # divergent formula would spuriously re-emit metaData
                # on the first data commit after every restart
                "schema_md5": self._meta_fingerprint(schema_string, cfg),
                "writer_version": deltalog.required_writer_version(
                    cfg, schema_string
                ),
                # restart commit 0 opens with the feature protocol when
                # the current snapshot carries DVs (build_commit emits
                # it from the adds); record it so later commits don't
                # downgrade
                "dv_protocol": bool(self._dv_map_cached(v)),
            }
            state["delta"] = rec
            self._write_pointer_locked(state)
            entries = self._delta_file_entries(v)
            self._write_delta_commit(
                rec, v, schema_string is not None, schema_string,
                entries, [], len(entries), cfg,
            )
            return
        new_entries = self._delta_file_entries(v)
        prior_live = (
            deltalog.replay_live(self.dir, rec["version"] - 1)
            if rec["version"] > 0
            else {}
        )
        changed = {
            p
            for p in new_entries
            if p in prior_live
            and sorted(prior_live[p].get("dv") or []) != self._dv_log_names(v, p)
        }
        adds = {
            p: fp
            for p, fp in new_entries.items()
            if p not in prior_live or p in changed
        }
        removes = sorted((set(prior_live) - set(new_entries)) | changed)
        cfg = self._delta_configuration(state)
        required_wv = deltalog.required_writer_version(cfg, schema_string)
        # the crashed commit may have been the one carrying a protocol
        # upgrade: re-emit whenever the configuration demands more than
        # the base protocol — and ALWAYS in the feature form when the
        # table has (ever had) DVs (idempotent — replay takes the
        # latest protocol action)
        upgrade: int | dict | None = None
        if rec.get("dv_protocol") or self._dv_map_cached(v):
            upgrade = deltalog.feature_protocol(required_wv)
        elif required_wv > deltalog.PROTOCOL["minWriterVersion"]:
            upgrade = required_wv
        self._write_delta_commit(
            rec, v, schema_string is not None, schema_string,
            adds, removes, len(new_entries), cfg, upgrade,
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
        files = self.data_files(v)
        stats = self.file_stats(v)
        schema = self.table_schema(v)
        rec = self._pointer_state().get("delta") or {}
        dv_rows = sum(
            r for entries in self._resolve_dv(v).values() for _, r in entries
        )
        return {
            "name": self.name,
            "location": str(self.dir),
            "mt_version": v,
            "delta_version": rec.get("version"),
            "table_id": rec.get("table_id"),
            "num_files": len(files),
            "size_bytes": sum(f.stat().st_size for f in files),
            "num_rows": (
                sum(e.get("rows", 0) for e in stats.values()) - dv_rows
                if stats is not None else None
            ),
            "num_deletion_vector_rows": dv_rows,
            "schema": schema.json() if schema is not None else None,
            "analyze_stats": (
                json.loads(self.table_prop("analyze_stats"))
                if self.table_prop("analyze_stats") else None
            ),
        }

    def analyze(self, columns: Sequence[str] | None = None) -> dict:
        """Spark/Databricks ``ANALYZE TABLE t COMPUTE STATISTICS [FOR
        COLUMNS a, b | FOR ALL COLUMNS]``: table-level stats (row count
        and bytes — FREE, from the committed manifest metadata, no
        Spark job) plus optional per-column stats (min / max / null
        count / approximate distinct count, avg+max length for
        strings — Spark's own ANALYZE column set) computed in ONE
        map-side-combinable aggregation pass: the shuffle is a
        partial-aggregate merge of one row per partition regardless of
        table size. Binds the result as the ``analyze_stats`` table
        property (advisory optimizer/operator metadata, surfaced by
        ``detail()`` / DESCRIBE DETAIL; ``computed_at_version`` records
        staleness) and returns the stats dict.

        ``columns=None`` computes table-level stats only; complex-typed
        columns (array/map/struct/binary) are rejected like Spark's
        ANALYZE."""
        d = self.detail()
        out: dict = {
            "computed_at_version": d["mt_version"],
            "num_rows": (
                d["num_rows"] if d["num_rows"] is not None
                else self.read().count()
            ),
            "size_bytes": d["size_bytes"],
            "columns": {},
        }
        if columns:
            from pyspark.sql.types import (
                ArrayType, BinaryType, MapType, StringType, StructType,
            )

            schema = self.table_schema() or self.read().schema
            fields = {f.name: f for f in schema.fields}
            unknown = [c for c in columns if c not in fields]
            if unknown:
                raise ValueError(
                    f"ANALYZE {self.name}: unknown column(s) {unknown}"
                )
            bad = [
                c for c in columns
                if isinstance(
                    fields[c].dataType,
                    (ArrayType, MapType, StructType, BinaryType),
                )
            ]
            if bad:
                raise ValueError(
                    f"ANALYZE {self.name}: column(s) {bad} have complex "
                    "types — Spark column statistics support atomic "
                    "types only"
                )
            aggs = []
            for c in columns:
                aggs += [
                    F.min(c).alias(f"{c}__min"),
                    F.max(c).alias(f"{c}__max"),
                    F.count(F.when(F.col(c).isNull(), 1)).alias(
                        f"{c}__nulls"
                    ),
                    F.approx_count_distinct(c).alias(f"{c}__ndv"),
                ]
                if isinstance(fields[c].dataType, StringType):
                    aggs += [
                        F.avg(F.length(c)).alias(f"{c}__avglen"),
                        F.max(F.length(c)).alias(f"{c}__maxlen"),
                    ]
            row = self.read().agg(*aggs).collect()[0].asDict()
            for c in columns:
                st = {
                    "min": row[f"{c}__min"],
                    "max": row[f"{c}__max"],
                    "null_count": row[f"{c}__nulls"],
                    "approx_ndv": row[f"{c}__ndv"],
                }
                if f"{c}__avglen" in row:
                    st["avg_len"] = row[f"{c}__avglen"]
                    st["max_len"] = row[f"{c}__maxlen"]
                out["columns"][c] = st
        fd = self._acquire_commit_lock()
        try:
            state = self._pointer_state()
            state.setdefault("props", {})["analyze_stats"] = json.dumps(
                out, default=str
            )
            self._write_pointer_locked(state)
        finally:
            self._release_commit_lock(fd)
        return out

    def write_delta_checkpoint(self) -> Path:
        """Write a classic Delta checkpoint for the current delta
        commit so a stock reader replays checkpoint + tail commits
        instead of the whole log. Checkpoints are also written
        AUTOMATICALLY every ``delta_checkpoint_interval`` commits by
        ``_commit``; this explicit entry point remains for manual
        cadence (e.g. right before handing the directory to an
        external reader, or with the automatic interval disabled).
        Heals first, and holds the commit lock so the checkpointed
        version is stable."""
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
                    # stored per-field metadata (identity/generated
                    # definitions, Delta's delta.identity.* keys) must
                    # survive every append — batches never carry it
                    f.metadata,
                )
                for f in stored.fields
            ]
            + [StructField(f.name, f.dataType, True) for f in extras]
        )
        return out, commit_schema

    def column_policies(self) -> tuple[dict, dict]:
        """The table's declared column policies, read from the
        committed schema's per-field metadata (Delta's own storage —
        ``delta.generationExpression`` for generated columns,
        ``delta.identity.start/step/allowExplicitInsert`` for identity
        columns): ``(generated {col: expr}, identity {col: {start,
        step, always}})``. Empty dicts when the table has none (or no
        committed schema yet — policies bind at CREATE TABLE and apply
        from the next write on)."""
        schema = self.table_schema()
        gen: dict = {}
        ident: dict = {}
        if schema is None:
            return gen, ident
        for f in schema.fields:
            md = f.metadata or {}
            if "delta.generationExpression" in md:
                gen[f.name] = md["delta.generationExpression"]
            if "delta.identity.start" in md:
                ident[f.name] = {
                    "start": int(md["delta.identity.start"]),
                    "step": int(md["delta.identity.step"]),
                    "always": not md.get(
                        "delta.identity.allowExplicitInsert", False
                    ),
                }
        return gen, ident

    def _identity_hw_key(self, col: str) -> str:
        return f"identity_high_water_{col}"

    def _apply_column_policies(self, df: DataFrame):
        """Enforce the table's generated/identity column policies on an
        incoming batch (Delta write semantics, applied by ``append`` /
        ``overwrite`` before schema alignment):

        - a missing GENERATED column is computed from its expression
          (a provided one is validated by the auto-bound CHECK
          constraint riding the write projection — Delta fails writes
          whose explicit values break the generation expression);
        - a missing IDENTITY column is allocated as ``high_water +
          step * (monotonically_increasing_id() + 1)`` — unique and
          step-respecting with GAPS, exactly Delta's identity contract
          ("values are unique but not guaranteed consecutive"): the
          per-partition id offsets make allocation a pure map-side
          expression (zero extra jobs, zero shuffle at any scale);
        - providing explicit values for a GENERATED ALWAYS AS IDENTITY
          column raises (BY DEFAULT accepts them and advances the high
          water mark past their max).

        Returns ``(df, finalize)``. ``finalize(set_props,
        expect_props)`` must be called AFTER the write job ran: the
        realized max id rides the write via ``observe`` (no second
        pass), becomes the new ``identity_high_water_<col>`` in
        ``set_props``, and the OLD high water is pinned in
        ``expect_props`` — two concurrent appends allocating from the
        same high water then conflict in the locked commit (Delta's
        identity metadata conflict) instead of silently publishing
        duplicate ids; the loser re-reads and retries. ``finalize`` is
        None when the table has no policies."""
        gen, ident = self.column_policies()
        if not gen and not ident:
            return df, None
        stored = self.table_schema()
        type_of = {f.name: f.dataType for f in stored.fields}
        for col, expr in gen.items():
            if col not in df.columns:
                df = df.withColumn(col, F.expr(expr).cast(type_of[col]))
        from pyspark.sql import Observation

        tracked: list[tuple[str, int, int, object]] = []
        expects: dict = {}
        # a zero-partition batch (empty LocalRelation) runs no tasks, so
        # an Observation on it would never resolve — skip instrumenting:
        # nothing is allocated, the high water stays put
        observable = not ident or df.rdd.getNumPartitions() > 0
        for col, spec in ident.items():
            key = self._identity_hw_key(col)
            raw = self.table_prop(key)
            hw = int(raw) if raw is not None else spec["start"] - spec["step"]
            step = spec["step"]
            if col in df.columns:
                if spec["always"]:
                    raise ValueError(
                        f"table {self.name}: column {col} is GENERATED "
                        "ALWAYS AS IDENTITY — explicit values are not "
                        "allowed (declare it GENERATED BY DEFAULT to "
                        "permit them)"
                    )
            else:
                df = df.withColumn(
                    col,
                    (
                        F.lit(hw)
                        + F.lit(step) * (F.monotonically_increasing_id() + 1)
                    ).cast("long"),
                )
            obs = None
            if observable:
                obs = Observation()
                agg = (F.max(col) if step > 0 else F.min(col)).alias("hw")
                df = df.observe(obs, agg)
            tracked.append((key, hw, step, obs))
            if raw is not None:
                expects[key] = raw

        def finalize(set_props: dict | None, expect_props: dict | None):
            sp = dict(set_props or {})
            for key, hw, step, obs in tracked:
                got = obs.get.get("hw") if obs is not None else None
                if got is None:  # empty batch: high water unchanged
                    new_hw = hw
                elif step > 0:
                    new_hw = max(hw, int(got))
                else:
                    new_hw = min(hw, int(got))
                sp[key] = str(new_hw)
            ep = {**(expect_props or {}), **expects}
            return (sp or None), (ep or None)

        return df, finalize

    # -- read/write ----------------------------------------------------------
    def _read_version(self, v: int, names: list[str] | None) -> DataFrame:
        """Read snapshot ``v`` pinned to its committed schema. ``names``
        = resolved store members, or None for a legacy version (read
        the version dir directly, exactly as before manifests)."""
        schema = self.table_schema(v)
        if names is None:
            reader = (
                self.spark.read.schema(schema) if schema is not None else self.spark.read
            )
            return reader.parquet(str(self._version_dir(v)))
        # basePath (inside _read_members) reconstructs hive partition
        # columns from the store paths (Delta-style: partitioned data
        # files omit the partition columns); deletion vectors fold here
        return self._read_members(names, schema, self._resolve_dv(v))

    def _schema_order(self, df: DataFrame, schema) -> DataFrame:
        """Restore committed column ORDER: Spark relocates path-derived
        partition columns to the END of the frame even under an
        explicit user schema, so a partitioned read would break every
        positional consumer (tuple compares, unionAll, exceptAll) and
        the 'pinned to its committed schema' contract. No-op select
        for unpartitioned layouts."""
        if schema is None:
            return df
        want = [f.name for f in schema.fields]
        return df if df.columns == want else df.select(*want)

    def read(self) -> DataFrame:
        v, names, _ = self._resolve_current()
        if v < 0:
            raise FileNotFoundError(f"table {self.name} has no committed version")
        return self._read_version(v, names)

    def read_or_empty(self, like: DataFrame) -> DataFrame:
        """Current snapshot, or an empty frame with ``like``'s schema."""
        if self.exists():
            return self.read()
        return self.spark.createDataFrame([], like.schema)

    def _write_op_marker(self, v: int, op: str) -> None:
        (self._version_dir(v) / "_op").write_text(op)

    # -- per-version manifests over the shared file store --------------------
    #
    # _manifest.json per version dir:
    #   base:       previous committed version this delta chains to (or None)
    #   depth:      chain hops to the nearest full manifest (0 when full)
    #   added:      store file names NEW in this commit (commit order)
    #   removed:    store file names this commit drops vs base
    #   stats:      footer stats for ADDED files only
    #   files:      full member list — present on rewrites and rebases
    #   stats_full: full stats map — present iff files is
    #   upgrade:    True when this commit migrated a legacy snapshot into
    #               the store (changes_since treats it as a barrier)
    def _manifest_path(self, v: int) -> Path:
        return self._version_dir(v) / "_manifest.json"

    def _manifest(self, v: int) -> dict | None:
        p = self._manifest_path(v)
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def _write_manifest_file(self, v: int, manifest: dict) -> None:
        tmp = self._version_dir(v) / f"._manifest.tmp.{os.getpid()}"
        tmp.write_text(json.dumps(manifest))
        os.replace(tmp, self._manifest_path(v))

    def _resolve(self, v: int) -> tuple[list[str], dict] | None:
        """Snapshot membership for version ``v``: (store file names in
        commit order, full per-file stats map). None when ``v``
        predates manifests (legacy layout: data files live inside the
        version dir). Walks the base chain to the nearest full
        manifest — bounded by ``manifest_rebase_depth``."""
        m = self._manifest(v)
        if m is None:
            return None
        chain = [m]
        while "files" not in chain[-1]:
            base = chain[-1]["base"]
            bm = self._manifest(base) if base is not None else None
            if bm is None:
                raise FileNotFoundError(
                    f"table {self.name}: version {v}'s manifest chain "
                    f"needs version {base}, which is missing (vacuumed "
                    "mid-read? re-read the current version) "
                )
            chain.append(bm)
        files = dict.fromkeys(chain[-1]["files"])  # ordered set
        stats = dict(chain[-1].get("stats_full") or {})
        for m in reversed(chain[:-1]):
            for r in m.get("removed", ()):
                files.pop(r, None)
                stats.pop(r, None)
            for a in m.get("added", ()):
                files[a] = None
            stats.update(m.get("stats", {}))
        return list(files), stats

    # -- deletion vectors (r12): small-delete path ----------------------------
    #
    # A 1-row DELETE in a 1 GB file must not rewrite the GB. The engine's
    # DV analog (Delta's deletionVectors feature re-expressed for this
    # store): the matched rows are materialized as TOMBSTONE parquet in
    # ``_deletion_vectors/`` (full rows + a ``__dv_file`` column naming
    # the data file each row belongs to), the manifest maps data file →
    # [(dv name, rows)], and every read subtracts a file's tombstones
    # from its rows (multiset-exact ``exceptAll``, scoped per file so a
    # later re-insert of an identical row elsewhere is never eaten).
    # Write cost is O(matched rows); the rewrite path remains for large
    # deletes, and compaction folds tombstones away (the rewritten file
    # drops its DV entry). Delta's real DVs are roaring bitmaps over row
    # indexes — the tombstone-row analog keeps the SAME read semantics
    # with plain parquet machinery, at O(deleted-row bytes) instead of
    # O(deleted-row bits) storage; fine while DV'd fractions stay small,
    # which the write-side gate enforces.
    DV_COL = "__dv_file"
    DV_POS = "__dv_pos"  # raw in-file row position (_metadata.row_index)
    dv_max_fraction = 0.1  # DV only when matched <= fraction * file rows
    dv_max_rows = 10_000  # absolute cap per file per delete

    def _dv_dir(self) -> Path:
        return self.dir / "_deletion_vectors"

    def _resolve_dv(self, v: int) -> dict[str, list]:
        """Resolved deletion-vector map for version ``v``:
        ``{store file name: [[dv name, rows], ...]}``. Walks the same
        manifest chain as ``_resolve``: depth-0 manifests carry the
        full map (``dv_full``; absent = none), children contribute
        their commit's ``dv_added`` and drop entries for removed
        files. Empty for legacy versions."""
        m = self._manifest(v)
        if m is None:
            return {}
        chain = [m]
        while "files" not in chain[-1]:
            base = chain[-1]["base"]
            bm = self._manifest(base) if base is not None else None
            if bm is None:
                raise FileNotFoundError(
                    f"table {self.name}: version {v}'s manifest chain "
                    f"needs version {base}, which is missing"
                )
            chain.append(bm)
        dv: dict[str, list] = {
            k: list(v_) for k, v_ in (chain[-1].get("dv_full") or {}).items()
        }
        for m in reversed(chain[:-1]):
            for r in m.get("removed", ()):
                dv.pop(r, None)
            for f, entries in (m.get("dv_added") or {}).items():
                dv.setdefault(f, []).extend(entries)
        return dv

    def _materialize_dv(self, v: int, tomb_df: DataFrame) -> str:
        """Write one commit's tombstone positions (``DV_COL`` file
        basename + ``DV_POS`` raw row position — the positional DV
        encoding, r13; Delta's own DVs are roaring bitmaps of the same
        positions) into ``_deletion_vectors/``; returns the dv file
        name. Single file — a small-delete's tombstones are small by
        the write-side gate."""
        import uuid as _uuid

        stage = self._version_dir(v) / "_dv_stage"
        tomb_df.coalesce(1).write.mode("overwrite").parquet(str(stage))
        out_dir = self._dv_dir()
        out_dir.mkdir(exist_ok=True)
        name = f"dv-{v:06d}-{_uuid.uuid4().hex[:8]}.parquet"
        part = next(iter(sorted(stage.glob("*.parquet"))))
        os.replace(part, out_dir / name)
        shutil.rmtree(stage, ignore_errors=True)
        return name

    def _dv_deleted_rows(self, dv_added: dict, schema) -> DataFrame:
        """The full content of the rows a DV commit tombstoned —
        positions semi-joined back onto the raw files (the inverse of
        the read path's anti-join). Used by the change feed (a DV
        commit's deletes) — one column-complete pass over the
        tombstoned FILES only."""
        dv_names = sorted({
            d for entries in dv_added.values() for d, _ in entries
        })
        cols = [f.name for f in schema.fields]
        tag = F.element_at(F.split(F.input_file_name(), "/"), -1)
        raw = (
            self.spark.read.schema(schema)
            .option("basePath", str(self.store))
            .parquet(*[str(self.store / n) for n in sorted(dv_added)])
            .withColumn(self.DV_COL, tag)
            .withColumn(self.DV_POS, F.col("_metadata.row_index"))
        )
        return raw.join(
            F.broadcast(self._read_dv_files(dv_names)),
            [self.DV_COL, self.DV_POS],
            "left_semi",
        ).select(*cols)

    def _read_dv_files(self, dv_names: Sequence[str]) -> DataFrame:
        """Tombstone (file basename, row position) pairs from the named
        ``_deletion_vectors/`` files — the positional DV encoding
        (r13): O(deleted rows × 2 narrow columns), never full rows."""
        return self.spark.read.schema(
            f"{self.DV_COL} string, {self.DV_POS} bigint"
        ).parquet(*[str(self._dv_dir() / d) for d in dv_names])

    def _read_members(
        self,
        names: Sequence[str],
        schema,
        dv_map: dict | None = None,
        keep_tag: bool = False,
        keep_pos: bool = False,
    ) -> DataFrame:
        """Read store members pinned to ``schema``, folding deletion
        vectors: files with tombstones are read with their (globally
        unique) basename tag and the parquet ``_metadata.row_index``,
        and the tombstoned POSITIONS are removed by a broadcast
        anti-join on (file, position) — a scan-stage filter, no
        exchange on the data side (r13; the r12 fold was a full-row
        ``exceptAll``, a shuffle over every dirty file's rows on every
        read). Tombstones are small by the write-side gate
        (``dv_max_fraction``/``dv_max_rows``), so the broadcast is
        bounded. THE one read path for every consumer that touches
        file content — read, merge discovery/subset, DML rewrite,
        compaction, change feed.

        ``keep_tag=True`` returns the frame WITH the ``DV_COL``
        basename tag on every row (DML discovery groups on it; the tag
        must be derived at SCAN time — ``input_file_name`` evaluated
        after a shuffle would come back empty). ``keep_pos=True`` also
        keeps ``DV_POS`` (the raw in-file row position) — the DML
        write path records NEW tombstones by position, and positions
        must refer to the RAW file so stacked DVs on one file compose."""
        names = list(names)
        reader = (
            self.spark.read.schema(schema) if schema is not None else self.spark.read
        ).option("basePath", str(self.store))
        tag = F.element_at(F.split(F.input_file_name(), "/"), -1)
        pos = F.col("_metadata.row_index")

        def _decorate(df):
            if keep_tag:
                df = df.withColumn(self.DV_COL, tag)
            if keep_pos:
                df = df.withColumn(self.DV_POS, pos)
            return df

        def _plain(ns):
            return _decorate(self._schema_order(
                reader.parquet(*[str(self.store / n) for n in ns]), schema
            ))

        dv_map = dv_map or {}
        dirty = [n for n in names if dv_map.get(n)]
        if not dirty or schema is None:
            if not names:
                if schema is None:
                    from pyspark.sql.types import StructType

                    schema = StructType([])
                return self.spark.createDataFrame([], schema)
            return _plain(names)
        clean = [n for n in names if not dv_map.get(n)]
        out_cols = [f.name for f in schema.fields]
        if keep_tag:
            out_cols.append(self.DV_COL)
        if keep_pos:
            out_cols.append(self.DV_POS)
        tagged = (
            self._schema_order(
                reader.parquet(*[str(self.store / n) for n in dirty]), schema
            )
            .withColumn(self.DV_COL, tag)
            .withColumn(self.DV_POS, pos)
        )
        dv_names = sorted({d for n in dirty for d, _ in dv_map[n]})
        tombs = self._read_dv_files(dv_names)
        folded = tagged.join(
            F.broadcast(tombs), [self.DV_COL, self.DV_POS], "left_anti"
        ).select(*out_cols)
        if not clean:
            return folded
        return _plain(clean).unionByName(folded)

    def _resolve_current(self) -> tuple[int, list[str], dict] | tuple[int, None, None]:
        """(version, names, stats) for the current snapshot, retrying
        once if a concurrent vacuum rebased/pruned the chain mid-walk
        (the retry re-reads the pointer — the new head resolves)."""
        v = self.current_version()
        try:
            res = self._resolve(v)
        except FileNotFoundError:
            v = self.current_version()
            res = self._resolve(v)
        if res is None:
            return v, None, None
        return v, res[0], res[1]

    def data_files(self, v: int | None = None) -> list[Path]:
        """Absolute paths of the snapshot's data files (store paths for
        manifest versions; version-dir parquet for legacy ones)."""
        if v is None:
            v = self.current_version()
        res = self._resolve(v)
        if res is None:
            return sorted(self._version_dir(v).glob("*.parquet"))
        return [self.store / n for n in res[0]]

    def _materialize(
        self, v: int, df: DataFrame, partition_by: Sequence[str] | None = None
    ) -> list[str]:
        """Write ``df`` through the claimed version dir, then move the
        part files into the shared store under globally-unique names
        (``f{version}-{index}-{token}``: the exclusive version claim
        makes the prefix unique per table; the random token keeps
        names unique across clones and reclaimed orphan versions).
        With ``partition_by``, the hive directory layout
        (``col=value/``) is PRESERVED inside the store — exactly like
        Delta, the data files then omit the partition columns and
        readers reconstruct them from the path (``basePath``).
        Returns store-relative names in deterministic part order."""
        df = self._constraint_guard(df, partition_by)
        vdir = self._version_dir(v)
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(str(vdir))
        self.store.mkdir(exist_ok=True)
        import uuid as _uuid

        token = _uuid.uuid4().hex[:8]
        names: list[str] = []
        for i, f in enumerate(sorted(vdir.rglob("*.parquet"))):
            rel = f.relative_to(vdir).parent
            name = f"f{v:06d}-{i:05d}-{token}.parquet"
            if rel.parts:
                (self.store / rel).mkdir(parents=True, exist_ok=True)
                names.append(str(rel / name))
            else:
                names.append(name)
            os.replace(f, self.store / names[-1])
        if partition_by:  # clear the emptied hive dirs (metadata-only dir)
            for d in sorted(
                (p for p in vdir.rglob("*") if p.is_dir()), reverse=True
            ):
                try:
                    d.rmdir()
                except OSError:
                    pass
        return names

    def cdf_enabled(self) -> bool:
        """Whether this table records a change data feed (bound at
        creation via ``overwrite(enable_cdf=True)``, Delta's
        ``delta.enableChangeDataFeed``)."""
        return self.table_prop("enable_cdf") == "true"

    def _materialize_cdc(self, v: int, cdc_df: DataFrame) -> list[str]:
        """Write a commit's change-data rows into ``_change_data/``
        (Delta CDF layout: files referenced by ``cdc`` actions, never
        part of the snapshot). Returns the change-file names."""
        import uuid as _uuid

        stage = self._version_dir(v) / "_cdc_stage"
        cdc_df.write.mode("overwrite").parquet(str(stage))
        out_dir = self.dir / "_change_data"
        out_dir.mkdir(exist_ok=True)
        token = _uuid.uuid4().hex[:8]
        names: list[str] = []
        for i, f in enumerate(sorted(stage.glob("*.parquet"))):
            name = f"cdc-{v:06d}-{i:05d}-{token}.parquet"
            os.replace(f, out_dir / name)
            names.append(name)
        shutil.rmtree(stage, ignore_errors=True)
        return names

    @staticmethod
    def _partition_values(name: str) -> dict[str, str]:
        """Hive partition values encoded in a store-relative name
        (``a=1/b=x/file.parquet`` → {'a': '1', 'b': 'x'}), URL-decoded
        the way Spark/Hive escape them."""
        from urllib.parse import unquote

        out: dict[str, str] = {}
        for part in Path(name).parent.parts:
            if "=" in part:
                k, _, val = part.partition("=")
                out[unquote(k)] = unquote(val)
        return out

    def _partition_stat_entries(
        self, name: str, partition_by: Sequence[str], schema
    ) -> dict:
        """min==max stats entries for a file's partition values, typed
        through the table schema so ``pruned_files`` prunes partition
        columns with the SAME machinery as footer stats — partition
        pruning at file-listing time. Unparseable or null values get
        no entry (the file is simply never pruned on that column)."""
        import datetime as _dt

        from pyspark.sql.types import (
            ByteType, DateType, DoubleType, FloatType, IntegerType,
            LongType, ShortType, StringType,
        )

        vals = self._partition_values(name)
        types = {f.name: f.dataType for f in schema.fields} if schema else {}
        out: dict[str, dict] = {}
        for c in partition_by:
            raw = vals.get(c)
            if raw is None or raw == "__HIVE_DEFAULT_PARTITION__":
                continue
            t = types.get(c)
            try:
                if isinstance(t, (ByteType, ShortType, IntegerType, LongType)):
                    val = int(raw)
                elif isinstance(t, (FloatType, DoubleType)):
                    val = float(raw)
                elif isinstance(t, DateType):
                    val = _dt.date.fromisoformat(raw).isoformat()
                elif isinstance(t, StringType):
                    val = raw
                else:  # timestamps/decimals/etc: never prune (safe)
                    continue
            except ValueError:
                continue
            out[c] = {"min": val, "max": val}
        return out

    def _collect_stats_for(
        self,
        names: list[str],
        partition_by: Sequence[str] | None = None,
        schema=None,
    ) -> dict:
        """Footer min/max stats for the given store files (pyarrow
        metadata only — no data scan; same information Delta keeps in
        its log). A column with any stats-less row group or an unsafe
        type (see ``_stat_value``) gets no entry and never prunes.
        For partitioned tables, each file's partition values join the
        map as exact (min==max) entries — listing-time partition
        pruning through the same index."""
        import pyarrow.parquet as pq

        stats: dict[str, dict] = {}
        for name in names:
            f = self.store / name
            try:
                md = pq.ParquetFile(str(f)).metadata
            except Exception:  # unreadable footer → file never prunes
                continue
            cols: dict[str, dict | None] = {}
            for rg_i in range(md.num_row_groups):
                rg = md.row_group(rg_i)
                for c_i in range(rg.num_columns):
                    col = rg.column(c_i)
                    cname = col.path_in_schema
                    if "." in cname or (cname in cols and cols[cname] is None):
                        continue
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        cols[cname] = None
                        continue
                    mn, mx = _stat_value(st.min), _stat_value(st.max)
                    if mn is None or mx is None:
                        cols[cname] = None
                        continue
                    if cname not in cols:
                        cols[cname] = {"min": mn, "max": mx}
                    else:
                        e = cols[cname]
                        e["min"] = min(e["min"], mn)
                        e["max"] = max(e["max"], mx)
            entry_cols = {k: val for k, val in cols.items() if val is not None}
            if partition_by:
                entry_cols.update(
                    self._partition_stat_entries(name, partition_by, schema)
                )
            stats[name] = {"rows": md.num_rows, "cols": entry_cols}
        return stats

    def _link_legacy_into_store(self, v: int) -> tuple[list[str], dict]:
        """One-time upgrade of a legacy snapshot: hardlink version
        ``v``'s data files into the store under unique names (copy
        fallback), remapping its stats entries to the new names.
        O(files) ONCE per table — every later commit is O(changed)."""
        import uuid as _uuid

        vdir = self._version_dir(v)
        self.store.mkdir(exist_ok=True)
        token = _uuid.uuid4().hex[:8]
        old_stats = self.file_stats(v) or {}
        names: list[str] = []
        stats: dict[str, dict] = {}
        legacy = sorted(vdir.glob("*.parquet"))
        for i, f in enumerate(legacy):
            name = f"u{v:06d}-{i:05d}-{token}.parquet"
            try:
                os.link(f, self.store / name)
            except OSError:
                shutil.copy2(f, self.store / name)
            names.append(name)
            if f.name in old_stats:
                stats[name] = old_stats[f.name]
        if not stats and legacy:
            # legacy version predating stats collection: read footers
            # now so skipping keeps working after the upgrade
            stats = self._collect_stats_for(names)
        return names, stats

    def _snapshot_members(self, v: int) -> tuple[list[str], dict, bool]:
        """(names, stats, upgraded) for building a child manifest on top
        of version ``v``: the resolved manifest members, or — legacy —
        the snapshot linked into the store once (upgraded=True)."""
        res = self._resolve(v)
        if res is not None:
            return res[0], res[1], False
        names, stats = self._link_legacy_into_store(v)
        return names, stats, True

    def _manifest_depth(self, v: int) -> int:
        m = self._manifest(v)
        return m.get("depth", 0) if m is not None else 0

    def _build_child_manifest(
        self,
        base_v: int,
        added: list[str],
        removed: list[str],
        stats: dict,
        base_names: list[str] | None = None,
        base_stats: dict | None = None,
        upgrade: bool = False,
        dv_added: dict | None = None,
    ) -> dict:
        """An incremental manifest on ``base_v`` — rebased to a full one
        when the chain would exceed ``manifest_rebase_depth`` or when
        the base was just upgraded from legacy (its members exist only
        in ``base_names``, not in any base manifest).

        ``dv_added``: this commit's NEW deletion-vector entries
        ``{file: [[dv name, rows]]}`` (see ``_resolve_dv``); removed
        files always drop their DV entries (the rewrite folded them)."""
        depth = self._manifest_depth(base_v) + 1
        m: dict = {
            "base": base_v,
            "depth": depth,
            "added": added,
            "removed": removed,
            "stats": stats,
        }
        if dv_added:
            m["dv_added"] = dv_added
        if upgrade or depth > self.manifest_rebase_depth:
            if base_names is None:
                base_names, base_stats = self._resolve(base_v)
            files = dict.fromkeys(base_names)
            full_stats = dict(base_stats or {})
            for r in removed:
                files.pop(r, None)
                full_stats.pop(r, None)
            for a in added:
                files[a] = None
            full_stats.update(stats)
            m["files"] = list(files)
            m["stats_full"] = full_stats
            # full manifests pin the RESOLVED dv map (upgraded legacy
            # bases have none)
            dv_full = {} if upgrade else self._resolve_dv(base_v)
            for r in removed:
                dv_full.pop(r, None)
            for f, entries in (dv_added or {}).items():
                dv_full.setdefault(f, []).extend(entries)
            if dv_full:
                m["dv_full"] = dv_full
            m["depth"] = 0
            if upgrade:
                m["upgrade"] = True
        return m

    # -- file statistics / data skipping ------------------------------------
    def file_stats(self, v: int | None = None) -> dict | None:
        """The committed per-file stats map for version ``v`` (default
        current), or None when the version predates stats collection.
        Manifest versions resolve it through the manifest chain; legacy
        versions read their ``_stats.json``."""
        if v is None:
            v = self.current_version()
        res = self._resolve(v)
        if res is not None:
            return res[1]
        p = self._version_dir(v) / "_stats.json"
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def pruned_files(self, predicates: dict) -> list[Path]:
        """Data skipping: the subset of current-snapshot files that can
        contain a row satisfying ``{col: (lo, hi)}`` range predicates
        (either bound may be None). Files without usable stats are kept
        — pruning is always a superset of the true answer."""
        v, names, stats = self._resolve_current()
        if names is None:  # legacy layout (stats keyed by basename)
            pairs = [
                (f.name, f)
                for f in sorted(self._version_dir(v).glob("*.parquet"))
            ]
            stats = self.file_stats(v)
        else:  # manifest layout (stats keyed by store-relative name)
            pairs = [(n, self.store / n) for n in names]
        norm = {
            c: (_stat_value(lo), _stat_value(hi)) for c, (lo, hi) in predicates.items()
        }
        survivors = [
            (key, f)
            for key, f in pairs
            if self._stats_overlap(stats.get(key) if stats else None, norm)
        ]
        # EQUALITY predicates additionally probe the per-file key
        # blooms when bound (Delta's delta.bloomFilter read-side use):
        # point lookups on high-cardinality columns prune where ranges
        # can't (hash/unclustered layouts)
        points = {
            c: lo
            for c, (lo, hi) in predicates.items()
            if lo is not None and lo == hi
        }
        if points and stats:
            survivors = self._bloom_point_prune(survivors, stats, points)
        return [f for _, f in survivors]

    def _bloom_point_prune(
        self, survivors: list, stats: dict, points: dict
    ) -> list:
        """Drop files whose Bloom filter proves an equality predicate's
        value absent. The literal's k bit positions come from ONE
        k-column, 1-row Spark job per probed column — the hash MUST be
        computed engine-side with the value cast to the COMMITTED
        column type, because xxhash64 hashes by type and the build side
        hashed the stored type (the merge-probe lesson). The literal is
        probed ONLY when its Python type belongs to the column's own
        family (int→integral, float→fractional, str→string, date/
        datetime→date/timestamp): a cross-family literal that merely
        CASTS (e.g. int 777 on a string column) can hash differently
        from stored values the exact filter's COERCION would still
        match ('0777' = 777 is true numerically) — probing it would
        silently drop matching files. Files without a bloom (or with
        foreign parameters), unprobeable/uncastable literals, and NULL
        literals never prune — always a superset."""
        raw = self.table_prop("bloom_columns")
        if not raw or not survivors:
            return survivors
        bloom_cols = [c for c in json.loads(raw) if c in points]
        if not bloom_cols:
            return survivors
        tschema = self.table_schema()
        ttypes = (
            {f.name: f.dataType for f in tschema.fields}
            if tschema is not None else {}
        )
        import datetime as _dt
        import decimal as _decimal

        def _same_family(value, tt) -> bool:
            tn = tt.simpleString()
            if isinstance(value, bool):  # bool is an int subclass: first
                return False
            if isinstance(value, int):
                return tn in ("tinyint", "smallint", "int", "bigint")
            if isinstance(value, float):
                return tn in ("float", "double")
            if isinstance(value, str):
                # varchar/char are string-family (stored as string)
                return tn == "string" or tn.startswith(("varchar", "char"))
            if isinstance(value, _dt.datetime):  # datetime is a date: first
                return tn.startswith("timestamp")
            if isinstance(value, _dt.date):
                return tn == "date"
            if isinstance(value, _decimal.Decimal):
                # a literal representable at the column's scale casts
                # exactly (so hashes match); one that isn't matches no
                # stored value anyway — safe either way
                return tn.startswith("decimal")
            if isinstance(value, (bytes, bytearray)):
                return tn == "binary"
            return False

        for c in bloom_cols:
            tt = ttypes.get(c)
            if tt is None or not _same_family(points[c], tt):
                continue
            mk = None
            for key, _ in survivors:
                b = (stats.get(key) or {}).get("blooms", {}).get(c)
                if b is not None:
                    if mk is None:
                        mk = (b["m"], b["k"])
                    elif mk != (b["m"], b["k"]):
                        mk = None  # mixed parameters: refuse to probe
                        break
            if mk is None:
                continue
            m, k = mk
            try:
                row = self.spark.range(1).select(*[
                    F.pmod(
                        F.xxhash64(F.lit(points[c]).cast(tt), F.lit(i)),
                        F.lit(m),
                    ).cast("int").alias(f"p{i}")
                    for i in range(k)
                ]).first()
            except Exception:  # uncastable literal: cannot prune safely
                continue
            positions = [row[f"p{i}"] for i in range(k)]
            if any(p is None for p in positions):
                continue  # NULL literal never equi-matches; range pass rules
            kept = []
            for key, f in survivors:
                b = (stats.get(key) or {}).get("blooms", {}).get(c)
                if b is None or (b["m"], b["k"]) != (m, k):
                    kept.append((key, f))
                    continue
                h = b["hex"]
                if all(
                    (int(h[(p >> 6) * 16:(p >> 6) * 16 + 16], 16) >> (p & 63)) & 1
                    for p in positions
                ):
                    kept.append((key, f))
            survivors = kept
        return survivors

    @staticmethod
    def _stats_overlap(entry: dict | None, norm: dict) -> bool:
        """Whether a file's stats entry can contain a row satisfying the
        NORMALIZED ``{col: (lo, hi)}`` range predicates — False only on
        a provable miss (missing entry/column stats never prune; always
        a superset of the true answer)."""
        if entry is None:
            return True
        for c, (lo, hi) in norm.items():
            ci = entry["cols"].get(c)
            if ci is None:
                continue
            try:
                if (lo is not None and ci["max"] < lo) or (
                    hi is not None and ci["min"] > hi
                ):
                    return False
            except TypeError:
                # cross-type bound (e.g. a string-keyed batch against
                # numeric footer stats): Python refuses the order —
                # pruning on it would be a guess, so don't (conservative)
                continue
        return True

    # -- per-file key Bloom filters (optional data-skipping index) ----------
    # probe hash count; fixed per binding (recorded in each entry so a
    # future default change cannot silently mis-probe old files)
    bloom_hash_count = 5
    # candidate-bloom broadcast bound for the probe join: past this the
    # broadcast would dominate (~2 KB/file at the default 16384 bits),
    # so the probe is skipped and range candidates stand (conservative)
    bloom_probe_max_files = 65536

    def bind_bloom_filters(self, columns: Sequence[str], bits: int = 16384) -> None:
        """Opt-in per-file Bloom index — the engine's analog of Delta's
        ``delta.bloomFilter.<col>`` table properties. Once bound, every
        later write also records, per NEW data file, a Bloom filter of
        each listed column's non-null values in the manifest stats
        (one extra column-pruned pass over the new files only), and
        ``merge_keyed``'s touched-file discovery probes them with the
        batch's keys — pruning candidates on HIGH-CARDINALITY keys
        whose min/max ranges don't prune (hash-clustered or unclustered
        layouts, where range intersection keeps every file).

        Files written before binding carry no bloom and stay
        conservative candidates; rewrite them (``compact``) to index
        the whole table. ``bits`` sizes each filter (multiple of 64;
        with k=5 hashes, ~1% false positives at ~bits/10 distinct
        values per file — false positives cost discovery IO, never
        correctness). First binder wins: rebinding with a different
        column set or size raises (a mixed-parameter index would
        probe incorrectly)."""
        if bits < 64 or bits % 64 or bits > (1 << 24):
            raise ValueError(
                f"bind_bloom_filters: bits={bits} must be a multiple of "
                "64 in [64, 2^24]"
            )
        cols = json.dumps(sorted(set(columns)))
        fd = self._acquire_commit_lock()
        try:
            state = self._pointer_state()
            props = state.setdefault("props", {})
            have_cols, have_bits = props.get("bloom_columns"), props.get("bloom_bits")
            if have_cols is None:
                props["bloom_columns"] = cols
                props["bloom_bits"] = bits
                self._write_pointer_locked(state)
            elif have_cols != cols or int(have_bits) != bits:
                raise ConcurrentWriteError(
                    f"table {self.name}: bloom filters already bound to "
                    f"{have_cols}/{have_bits} bits; refusing to rebind to "
                    f"{cols}/{bits} (a mixed index would mis-probe)"
                )
        finally:
            self._release_commit_lock(fd)

    def _attach_blooms(self, names: list[str], stats: dict, schema) -> None:
        """Record per-file Bloom filters for the bound columns in the
        NEW files' stats entries (mutated in place before the manifest
        is written, so the blooms ride the same chain ``_resolve``
        already carries). One column-pruned Spark pass over the new
        files; the driver receives at most ``len(names) × cols × m``
        distinct bit positions — O(new files), like the stats walk.
        A file whose column is all-NULL gets an EMPTY bloom (provably
        matches no key — NULL never equi-joins); files predating the
        binding simply lack the entry and never prune."""
        raw = self.table_prop("bloom_columns")
        if not raw or not names:
            return
        pset = set(self.partition_columns())
        fields = {f.name for f in schema.fields}
        # partition values ride the path, not the file, and their
        # min==max stats entries already prune exactly
        cols = [c for c in json.loads(raw) if c in fields and c not in pset]
        if not cols:
            return
        bits = int(self.table_prop("bloom_bits") or 16384)
        k = self.bloom_hash_count
        reader = self.spark.read.schema(schema).option("basePath", str(self.store))
        df = reader.parquet(*[str(self.store / n) for n in names])
        entries = F.array(*[
            F.struct(
                F.lit(c).alias("col"),
                F.when(
                    F.col(c).isNotNull(),
                    # seed literal is an INT (matches the probe SQL's
                    # bare {i} literal — xxhash64 hashes by type)
                    F.pmod(F.xxhash64(F.col(c), F.lit(i)), F.lit(bits)).cast("int"),
                ).alias("pos"),
            )
            for c in cols
            for i in range(k)
        ])
        rows = (
            df.select(F.input_file_name().alias("__f"), F.explode(entries).alias("e"))
            .select("__f", "e.col", "e.pos")
            .where(F.col("pos").isNotNull())
            .distinct()
            .groupBy("__f", "col")
            .agg(F.collect_set("pos").alias("ps"))
            .collect()
        )
        by_base = {os.path.basename(n): n for n in names}
        got: dict[tuple[str, str], list[int]] = {}
        for r in rows:
            name = by_base.get(os.path.basename(r["__f"]))
            if name is not None:
                got[(name, r["col"])] = r["ps"]
        n_words = bits // 64
        for n in names:
            e = stats.get(n)
            if e is None:  # unreadable footer: stays conservative
                continue
            blooms = {}
            for c in cols:
                words = [0] * n_words
                for p in got.get((n, c), ()):
                    words[p >> 6] |= 1 << (p & 63)
                blooms[c] = {
                    "m": bits,
                    "k": k,
                    "hex": "".join(f"{w:016x}" for w in words),
                }
            e["blooms"] = blooms

    def _bloom_prune(
        self, cand: list[str], stats: dict, batch: DataFrame, keys: Sequence[str]
    ) -> list[str]:
        """Shrink the range-pruned candidate set with the per-file key
        blooms: a candidate survives a bloom'd key column only if SOME
        batch value hits all k bit positions of its filter (files
        without a bloom for the column always survive — conservative).
        One broadcast probe join per bloom'd key column: |distinct
        batch values| × |candidates| pure-compute combinations, no IO;
        skipped entirely past ``bloom_probe_max_files`` candidates."""
        raw = self.table_prop("bloom_columns")
        if not raw or not cand or len(cand) > self.bloom_probe_max_files:
            return cand
        bloom_cols = [c for c in json.loads(raw) if c in keys]
        # xxhash64 hashes BY TYPE: the build side hashed the committed
        # column type (the files were written under it), so the probe
        # must hash the batch value as that SAME type. A width-
        # compatible batch (int batch on a bigint column — the joins
        # coerce it everywhere else) would otherwise hash to different
        # positions and FALSE-NEGATIVE-prune truly touched files —
        # a silent duplicate-key merge (r11 review, reproduced). Safe
        # lossless widenings are cast up; anything else skips the
        # probe for that column (conservative, never wrong).
        tschema = self.table_schema()
        ttypes = (
            {f.name: f.dataType for f in tschema.fields}
            if tschema is not None else {}
        )
        btypes = {f.name: f.dataType for f in batch.schema.fields}
        _INT_W = {"tinyint": 0, "smallint": 1, "int": 2, "bigint": 3}
        _FRAC_W = {"float": 0, "double": 1}

        def _probe_type(c):
            bt, tt = btypes.get(c), ttypes.get(c)
            if bt is None or tt is None:
                return None
            if bt == tt:
                return tt
            bn, tn = bt.simpleString(), tt.simpleString()
            if bn in _INT_W and tn in _INT_W and _INT_W[bn] <= _INT_W[tn]:
                return tt
            if bn in _FRAC_W and tn in _FRAC_W and _FRAC_W[bn] <= _FRAC_W[tn]:
                return tt
            return None  # not a lossless widening: don't probe

        survivors = set(cand)
        for c in bloom_cols:
            probe_t = _probe_type(c)
            if probe_t is None:
                continue
            rows, passing = [], set()
            mk: tuple[int, int] | None = None
            for n in sorted(survivors):
                b = (stats.get(n) or {}).get("blooms", {}).get(c)
                if b is None:
                    passing.add(n)  # pre-binding file: always a candidate
                    continue
                if mk is None:
                    mk = (b["m"], b["k"])
                elif mk != (b["m"], b["k"]):
                    return cand  # mixed parameters: refuse to probe
                h = b["hex"]
                words = [
                    (w - (1 << 64) if (w := int(h[j * 16:(j + 1) * 16], 16))
                     >= (1 << 63) else w)
                    for j in range(len(h) // 16)
                ]
                rows.append((n, words))
            if not rows:
                continue
            m, k = mk
            blooms_df = self.spark.createDataFrame(
                rows, "name string, words array<bigint>"
            )
            # SQL shiftright accepts a COLUMN shift amount (the Python
            # wrapper doesn't); seeds are bare INT literals to hash
            # identically to the build side's F.lit(i)
            conds = []
            for i in range(k):
                pos = f"pmod(xxhash64(__v, {i}), {m})"
                conds.append(
                    f"(shiftright(element_at(words, cast(shiftright({pos}, 6)"
                    f" as int) + 1), cast(pmod({pos}, 64) as int)) % 2) != 0"
                )
            vals = (
                batch.select(F.col(c).cast(probe_t).alias("__v"))
                .where(F.col("__v").isNotNull())
                .distinct()
            )
            hits = {
                r["name"]
                for r in vals.crossJoin(F.broadcast(blooms_df))
                .where(F.expr(" AND ".join(conds)))
                .select("name")
                .distinct()
                .collect()
            }
            survivors = passing | hits
        return [n for n in cand if n in survivors]

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
        elif self.store in files[0].parents:
            # store layout: pin the committed schema like read()/
            # read_at (mixed pre/post-evolution files) and fold
            # deletion vectors — a DV'd file's stats are a superset, so
            # pruning stays correct, but its tombstoned rows must not
            # surface
            df = self._read_members(
                [str(f.relative_to(self.store)) for f in files],
                schema,
                self._resolve_dv(self.current_version()),
            )
        else:
            reader = (
                self.spark.read.schema(schema)
                if schema is not None
                else self.spark.read
            )
            # legacy version-dir paths: no store prefix, no basePath
            df = self._schema_order(
                reader.parquet(*[str(f) for f in files]), schema
            )
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
        caller must fall back to a full read or rebuild. COMPACTION
        commits are transparent (skipped, zero delta): they are
        content-identical by contract and dataChange=false in the
        Delta log, so routine OPTIMIZE maintenance never breaks the
        incremental chain.

        This is what makes a ManagedTable usable as a delta LOG: each
        append's own files (the manifest's ``added`` list) are exactly
        that commit's new rows, so a consumer can fold increments by
        version cursor with no data-column watermark (and none of the
        strict-'>' boundary losses a value watermark has).

        ``until``: optional INCLUSIVE upper bound — pass the version you
        read BEFORE deriving your cursor so a commit landing between
        that read and this call is left for the next fold instead of
        being folded now AND re-folded later (double-count)."""
        cur = self.current_version() if until is None else min(
            until, self.current_version()
        )
        if v is None:
            return None

        def _empty() -> DataFrame:
            # committed schema directly: building the full-snapshot
            # frame just for .schema costs an O(table) driver file
            # listing (legacy pre-schema tables still fall back)
            s = self.table_schema(cur)
            return self.spark.createDataFrame(
                [], s if s is not None else self.read().schema
            )

        if v >= cur:
            return _empty()
        versions = self._committed_in_range(v, cur)
        if versions is None:
            return None
        files: list[str] = []
        for vv in versions:
            op = self._op(vv)
            if op == "compact":
                # dataChange=false (Delta OPTIMIZE semantics): content-
                # identical by compact()'s contract, so it contributes
                # no delta — routine maintenance must NOT break the
                # append chain and force consumers into a full re-read.
                # The skipped-past appends' own files stay readable:
                # compaction removes nothing from the store (only
                # vacuum does, and vacuum's ledger floor forces the
                # rebuild fallback for ranges it pruned).
                continue
            if op != "append":
                return None
            m = self._manifest(vv)
            if m is not None:
                files.extend(str(self.store / n) for n in m["added"])
            else:  # legacy layout: new rows = the non-carried files
                files.extend(
                    str(f)
                    for f in self._version_dir(vv).glob("*.parquet")
                    if not f.name.startswith("prior_")
                )
        if not files:
            return _empty()
        schema = self.table_schema(cur)
        reader = self.spark.read.schema(schema) if schema is not None else self.spark.read
        store_prefix = str(self.store) + os.sep
        if all(f.startswith(store_prefix) for f in files):
            # partitioned store files need the partition columns
            # reconstructed from their hive paths (legacy files never
            # do — legacy tables predate partitioning)
            reader = reader.option("basePath", str(self.store))
        return self._schema_order(reader.parquet(*sorted(files)), schema)

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
        never the whole table — and is TRANSPARENT across COMPACTION
        commits (content-identical, dataChange=false: zero row-level
        changes, same skip as ``appended_since``). Returns None when
        the delta is not derivable (no cursor, or a full-snapshot
        rewrite/restore in the range — those replace everything, so a
        diff would cost a full table comparison anyway; rebuild
        instead).

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
            store_prefix = str(self.store) + os.sep
            if all(p.startswith(store_prefix) for p in paths):
                reader = reader.option("basePath", str(self.store))
            return self._schema_order(reader.parquet(*sorted(paths)), schema)

        if v >= cur:
            return _read([]).withColumn("_change_type", F.lit("insert")).limit(0)
        versions = self._committed_in_range(v, cur)
        if versions is None:
            return None
        inserts: list[DataFrame] = []
        deletes: list[DataFrame] = []
        for i, vv in enumerate(versions):
            op = self._op(vv)
            if op == "compact":
                # dataChange=false: content-identical rearrangement —
                # zero row-level changes (same skip as appended_since)
                continue
            m = self._manifest(vv)
            if m is not None:
                new_files = [str(self.store / n) for n in m["added"]]
                if op == "append":
                    inserts.append(_read(new_files))
                elif op in ("merge", "delete", "update"):
                    # predicate DML commits carry the same incremental
                    # manifest shape as merge (added/removed/cdc), so
                    # the change feed spans them identically — a silver
                    # DELETE/UPDATE reaches gold as row-level changes
                    if m.get("upgrade"):
                        # legacy→store upgrade commit: its removed list
                        # names pre-store identities — not derivable
                        return None
                    if m.get("cdc"):
                        # CDF fast path: the merge MATERIALIZED its
                        # row-level changes (_change_data/, Delta cdc
                        # actions) — read them instead of re-diffing
                        # the touched files; raw delete/insert rows
                        # feed the shared pairing below so the
                        # caller's `keys` semantics stay identical
                        from pyspark.sql.types import StringType, StructField, StructType

                        base_schema = schema or self.read().schema
                        cs = StructType(
                            list(base_schema.fields)
                            + [StructField("_change_type", StringType(), True)]
                        )
                        cdc_rows = self.spark.read.schema(cs).parquet(
                            *[str(self.dir / "_change_data" / n) for n in m["cdc"]]
                        )
                        cols = [f.name for f in base_schema.fields]
                        deletes.append(
                            cdc_rows.filter(
                                F.col("_change_type").isin("delete", "update_preimage")
                            ).select(*cols)
                        )
                        inserts.append(
                            cdc_rows.filter(
                                F.col("_change_type").isin("insert", "update_postimage")
                            ).select(*cols)
                        )
                        continue
                    # removed store files stay on disk (vacuum's GC
                    # keeps files referenced by retained manifests'
                    # removed lists) — the touched-file diff reads them
                    # directly, no prior-version reconstruction needed.
                    # The OLD side folds the PRIOR version's deletion
                    # vectors (rows a previous small delete already
                    # tombstoned were not live before this commit, so
                    # they must not re-surface as phantom deletes).
                    prev_v = versions[i - 1] if i > 0 else v
                    try:
                        prev_dv = self._resolve_dv(prev_v)
                    except FileNotFoundError:
                        return None  # diff base vacuumed: rebuild instead
                    old_rows = self._read_members(
                        m["removed"], schema, prev_dv
                    )
                    new_rows = _read(new_files)
                    deletes.append(old_rows.exceptAll(new_rows))
                    inserts.append(new_rows.exceptAll(old_rows))
                    # a DV commit's tombstoned rows ARE its deletes —
                    # exact, no diff needed. Positional encoding (r13):
                    # recover the deleted rows' content by semi-joining
                    # the (file, position) pairs back onto the raw
                    # tombstoned files (broadcast — tombstones are
                    # small by the write gate)
                    if m.get("dv_added"):
                        base_schema = schema or self.read().schema
                        deletes.append(
                            self._dv_deleted_rows(m["dv_added"], base_schema)
                        )
                else:  # snapshot rewrite / compaction / unknown
                    return None
                continue
            # legacy layout (pre-manifest commits)
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

    def _delta_commit_index(self) -> list[tuple[int, int | None, str, int]]:
        """``[(delta_version, mtVersion, operation, adjusted_ts_ms)]``
        for every RETAINED commit in the public log, in order,
        timestamps monotonically adjusted exactly like Delta's reader
        (a commit stamped earlier than its predecessor reads as
        predecessor + 1 ms) — the shared resolution base for
        ``table_changes`` version/timestamp boundaries."""
        out: list[tuple[int, int | None, str, int]] = []
        adjusted = -1
        for p in deltalog.commit_files(self.dir):
            dv = int(p.stem)
            for a in deltalog.read_actions(self.dir, dv):
                ci = a.get("commitInfo")
                if ci is None:
                    continue
                adjusted = max(ci["timestamp"], adjusted + 1)
                out.append(
                    (dv, ci.get("mtVersion"), ci.get("operation", ""), adjusted)
                )
                break
        return out

    def table_changes(self, start, end=None) -> DataFrame:
        """Databricks' ``table_changes(t, start [, end])`` CDF
        table-valued read (the SQL surface over the change data feed;
        `Catalog.sql` rewrites the function call onto this): row-level
        changes of every commit in the INCLUSIVE Delta log version
        range ``[start, end]`` (``end`` defaults to the latest commit),
        as the table's columns plus Databricks' three CDF metadata
        columns — ``_change_type`` ('insert' / 'delete' /
        'update_preimage' / 'update_postimage'), ``_commit_version``
        (the Delta LOG version ``DESCRIBE HISTORY`` shows) and
        ``_commit_timestamp``.

        ``start``/``end`` accept Delta versions (int) or commit
        timestamps (str / datetime / epoch-ms) — a start timestamp
        resolves to the FIRST commit at-or-after the instant, an end
        timestamp to the LAST commit at-or-before it (Databricks'
        boundary rules).

        Commits whose merge/DML materialized change rows (CDF enabled
        at creation) serve their exact pre/post-image rows straight
        from ``_change_data``; appends, deletion-vector deletes, and
        Delta-log version 0 (the table's creation snapshot) derive
        exactly; a NON-CDF merge/DML commit derives delete+insert by
        diffing only its touched files (updates appear as
        delete+insert — Databricks requires CDF for pre/post images at
        all, so this is strictly more derivable). An overwrite /
        restore inside the range raises — those replace the table, a
        row-level delta would cost a full-table diff (Delta's CDF
        errors on them too).

        Scale: per-commit work is bounded by that commit's own files
        (manifests name them); nothing here scans the table, and the
        union is a pure no-shuffle concatenation."""
        index = self._delta_commit_index()
        if not index:
            raise ValueError(f"table {self.name}: no transaction log")

        def _resolve(bound, *, is_start: bool):
            import datetime as _dt

            if isinstance(bound, bool) or bound is None:
                raise ValueError(f"table_changes: bad boundary {bound!r}")
            if isinstance(bound, int):
                return bound
            if isinstance(bound, str):
                bound = _dt.datetime.fromisoformat(bound)
            if isinstance(bound, _dt.datetime):
                if bound.tzinfo is None:
                    bound = bound.astimezone()
                ms = int(bound.timestamp() * 1000)
            else:
                ms = int(bound)
            if is_start:  # first commit at-or-after the instant
                for dv, _, _, ts in index:
                    if ts >= ms:
                        return dv
                raise ValueError(
                    f"table {self.name}: no commit at or after {ms} ms "
                    "(start timestamp past the latest commit)"
                )
            hit = None  # last commit at-or-before the instant
            for dv, _, _, ts in index:
                if ts <= ms:
                    hit = dv
            if hit is None:
                raise ValueError(
                    f"table {self.name}: no commit at or before {ms} ms"
                )
            return hit

        lo = _resolve(start, is_start=True)
        hi = (
            index[-1][0] if end is None else _resolve(end, is_start=False)
        )
        if lo > index[-1][0]:
            raise ValueError(
                f"table {self.name}: start version {lo} is past the "
                f"latest commit {index[-1][0]}"
            )
        if hi < lo:
            raise ValueError(
                f"table {self.name}: empty range [start {lo}, end {hi}]"
            )

        latest_schema = self.table_schema() or self.read().schema
        meta_cols = ["_change_type", "_commit_version", "_commit_timestamp"]

        def _tag(df: DataFrame, dv: int, ts: int) -> DataFrame:
            return df.withColumn(
                "_commit_version", F.lit(dv).cast("long")
            ).withColumn(
                "_commit_timestamp", F.timestamp_millis(F.lit(ts))
            )

        parts: list[DataFrame] = []
        prev_mv: int | None = None
        for pos, (dv, mv, op, ts) in enumerate(index):
            if dv > hi:
                break
            if dv < lo:
                prev_mv = mv
                continue
            if mv is None:
                raise ValueError(
                    f"table {self.name}: commit {dv} carries no snapshot "
                    "mapping — change feed not derivable"
                )
            m = self._manifest(mv)
            if m is not None and m.get("cdc"):
                # CDF fast path: exact materialized change rows, with
                # Databricks' own pre/post-image change types intact
                from pyspark.sql.types import StringType, StructField, StructType

                base = self.table_schema(mv) or latest_schema
                cs = StructType(
                    list(base.fields)
                    + [StructField("_change_type", StringType(), True)]
                )
                cdc_rows = self.spark.read.schema(cs).parquet(
                    *[str(self.dir / "_change_data" / n) for n in m["cdc"]]
                )
                parts.append(_tag(cdc_rows, dv, ts))
                prev_mv = mv
                continue
            if pos == 0 and dv == 0:
                # creation commit: the initial snapshot rows ARE its
                # inserts (Databricks serves version 0 the same way)
                parts.append(_tag(
                    self.read_at(mv).withColumn(
                        "_change_type", F.lit("insert")
                    ),
                    dv, ts,
                ))
                prev_mv = mv
                continue
            if prev_mv is None:
                raise ValueError(
                    f"table {self.name}: commit {dv} has no retained "
                    "predecessor (log retention expired the diff base) — "
                    "start the range later"
                )
            delta = self.changes_since(prev_mv, until=mv)
            if delta is None:
                raise ValueError(
                    f"table {self.name}: commit {dv} ({op or self._op(mv)}) "
                    "replaces the table snapshot — row-level changes are "
                    "not derivable across it; start the range after it"
                )
            parts.append(_tag(delta, dv, ts))
            prev_mv = mv

        out = None
        for p in parts:
            out = p if out is None else out.unionByName(
                p, allowMissingColumns=True
            )
        if out is None:
            from pyspark.sql.types import (
                LongType, StringType, StructField, StructType, TimestampType,
            )

            empty = StructType(
                list(latest_schema.fields)
                + [
                    StructField("_change_type", StringType(), True),
                    StructField("_commit_version", LongType(), True),
                    StructField("_commit_timestamp", TimestampType(), True),
                ]
            )
            return self.spark.createDataFrame([], empty)
        data_cols = [c for c in out.columns if c not in meta_cols]
        return out.select(*data_cols, *meta_cols)

    def partition_columns(self) -> list[str]:
        """The table's bound partition columns (fixed at creation,
        Delta-style), or [] when unpartitioned."""
        raw = self.table_prop("partition_columns")
        return json.loads(raw) if raw else []

    def _nudge_cdf_for_dml(self) -> dict | None:
        """Once-per-table advisory when row-mutating DML (merge /
        delete / update) lands on a table WITHOUT the change data feed:
        downstream incremental drains (``changes_since``) then pay an
        exceptAll diff over the commit's touched files instead of
        reading materialized exact change rows — correct either way,
        but at 100 TB the CDF costs one extra pass over the TOUCHED
        scope at write time versus a diff per CONSUMER per drain.
        Returns ``set_props`` for the committing write so the warning
        fires exactly once per table (the marker rides the same atomic
        commit); CDF itself stays a CREATION-time choice
        (``overwrite(enable_cdf=True)``) because the log's commit-0
        writer protocol must carry it — auto-flipping it mid-history
        would rewrite protocol expectations under live readers."""
        if self.cdf_enabled() or self.table_prop("dml_cdf_warned"):
            return None
        import logging

        logging.getLogger(__name__).warning(
            "table %s: DML (merge/delete/update) on a table without the "
            "change data feed — incremental consumers will diff touched "
            "files per drain; consider creating the table with "
            "overwrite(enable_cdf=True) to materialize exact change rows "
            "once at write time (warned once per table)",
            self.name,
        )
        return {"dml_cdf_warned": "true"}

    def overwrite(
        self, df: DataFrame, epoch=None, epoch_key=None,
        expected_version: int | None = None,
        set_props: dict | None = None,
        expect_props: dict | None = None,
        op: str = "snapshot",
        partition_by: Sequence[str] | None = None,
        enable_cdf: bool = False,
        _apply_policies: bool = True,
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

        ``partition_by``: hive-partition the table on these columns
        (Delta semantics: fixed at creation — bound as a commit-atomic
        table property that later writes must match; omitted, the
        bound partitioning applies automatically). Data files land
        under ``_data/col=value/...`` WITHOUT the partition columns
        (readers reconstruct them from the path), partition values
        join the stats index as exact entries (listing-time partition
        pruning through ``read_pruned``), and the Delta log carries
        ``partitionValues``/``partitionColumns``. Mirrors the
        reference's directory-layout pruning (``readme.md:27``,
        folder-per-table/file-per-run bronze).

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
        if enable_cdf:
            # Delta's delta.enableChangeDataFeed: set at CREATION so the
            # log's commit-0 protocol (writer v4) and metaData
            # configuration carry it; merges then materialize cdc files
            set_props = {**(set_props or {}), "enable_cdf": "true"}
        policy_done = None
        if _apply_policies:
            df, policy_done = self._apply_column_policies(df)
        pcols = list(partition_by) if partition_by else self.partition_columns()
        if pcols:
            missing = [c for c in pcols if c not in df.columns]
            if missing:
                raise ValueError(
                    f"table {self.name}: partition column(s) {missing} "
                    "not in the batch"
                )
            pj = json.dumps(pcols)
            set_props = {**(set_props or {}), "partition_columns": pj}
            expect_props = {**(expect_props or {}), "partition_columns": pj}
        v = self._claim_next_version()
        try:
            names = self._materialize(v, df, pcols)
        except Exception:
            # a failed write (constraint guard, ANSI cast, executor
            # loss) must not leave its claim dir: vacuum deliberately
            # SPARES non-empty uncommitted claims (in-flight writers),
            # so rejected batches would otherwise accumulate forever
            self._discard_claim(v)
            raise
        try:
            stats = self._collect_stats_for(names, pcols, df.schema)
            self._attach_blooms(names, stats, df.schema)
            self._write_manifest_file(v, {
                "base": None, "depth": 0, "added": names, "removed": [],
                "stats": stats, "files": names, "stats_full": stats,
                "partition_columns": pcols,
            })
            self._write_op_marker(v, op)
            self._write_schema(self._version_dir(v), df.schema)
        except Exception:
            # post-materialize bookkeeping (stats/Blooms/CDF/manifest/
            # schema) failing must not leave a vacuum-immune orphan
            # claim any more than the data write itself failing does
            self._discard_claim(v)
            raise
        if policy_done is not None:
            # realized identity high water rode the write via observe
            set_props, expect_props = policy_done(set_props, expect_props)
        try:
            committed = self._commit(
                v, epoch, epoch_key, expected_version, set_props, expect_props
            )
        except ConcurrentWriteError:
            self._discard_claim(v)  # loser cleans its own staging
            raise
        if not committed:
            self._discard_claim(v)
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
        partition_by: Sequence[str] | None = None,
        _apply_policies: bool = True,
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
        if v < 0:
            # first write: a full manifest; expected_version=-1 keeps
            # the old loud-failure contract if a concurrent writer
            # commits v0 in between (an append must never replace it).
            # partition_by only matters here — it is a CREATION-time
            # declaration (Delta semantics); the bound property drives
            # every later append automatically.
            return self.overwrite(
                df, epoch, epoch_key, expected_version=-1,
                set_props=set_props, expect_props=expect_props, op="append",
                partition_by=partition_by, _apply_policies=_apply_policies,
            )
        if partition_by is not None and list(partition_by) != self.partition_columns():
            raise ValueError(
                f"table {self.name}: declared partition_by "
                f"{list(partition_by)} conflicts with the table's bound "
                f"partitioning {self.partition_columns()} (fixed at "
                "creation)"
            )
        policy_done = None
        if _apply_policies:
            df, policy_done = self._apply_column_policies(df)
        df, schema = self._align(df, evolve)
        new_v = self._claim_next_version()
        new_dir = self._version_dir(new_v)
        pcols = self.partition_columns()  # bound partitioning applies
        try:
            names = self._materialize(new_v, df, pcols)
        except Exception:
            # see overwrite: a rejected batch (constraint guard, cast)
            # cleans its own claim instead of leaving a vacuum-immune
            # orphan per retry
            self._discard_claim(new_v)
            raise
        try:
            stats = self._collect_stats_for(names, pcols, schema)
            self._attach_blooms(names, stats, schema)
            # O(new files) metadata: an incremental manifest chaining to v.
            # No per-file syscalls over the carried snapshot — the one
            # exception is the FIRST write over a legacy (pre-manifest)
            # table, which links its snapshot into the store once.
            if self._manifest(v) is not None:
                manifest = self._build_child_manifest(v, names, [], stats)
            else:
                base_names, base_stats, _ = self._snapshot_members(v)
                manifest = self._build_child_manifest(
                    v, names, [], stats,
                    base_names=base_names, base_stats=base_stats, upgrade=True,
                )
            manifest["partition_columns"] = pcols
            self._write_manifest_file(new_v, manifest)
            self._write_op_marker(new_v, "append")
            self._write_schema(new_dir, schema)
        except Exception:
            # post-materialize bookkeeping (stats/Blooms/CDF/manifest/
            # schema) failing must not leave a vacuum-immune orphan
            # claim any more than the data write itself failing does
            self._discard_claim(new_v)
            raise
        # Logical conflict resolution (Delta write-serializable
        # semantics): a BLIND append has no read dependency, so an
        # interleaved append/compact commit doesn't actually conflict —
        # instead of raising, REBASE: re-resolve the head, verify the
        # interleave is append/compact-only with an identical schema,
        # relink this append's already-materialized files under the new
        # claim, and re-commit atop. Anything else in the interleave
        # (merge/overwrite/restore — real content changes this append
        # never saw) keeps the loud failure.
        if policy_done is not None:
            # realized identity high water rode the write via observe;
            # the OLD high water pins as expect_props so a rebase over a
            # concurrent identity-allocating append conflicts loudly
            # (duplicate ids) instead of silently double-allocating
            set_props, expect_props = policy_done(set_props, expect_props)
        base_v = v
        for _ in range(5):
            try:
                if not self._commit(
                    new_v, epoch, epoch_key, expected_version=base_v,
                    set_props=set_props, expect_props=expect_props,
                ):  # lost the replay race
                    self._discard_claim(new_v)
                    return None
                return new_v
            except OptimisticConcurrencyError:
                try:
                    new_v, base_v = self._rebase_commit(new_v, base_v, schema)
                except ConcurrentWriteError:
                    # rebase refused (real conflict / pruned history /
                    # vanished claim): this append is dead — free its
                    # staging before surfacing the conflict
                    self._discard_claim(new_v)
                    raise
            except ConcurrentWriteError:
                self._discard_claim(new_v)  # non-rebaseable conflict
                raise
        self._discard_claim(new_v)
        raise ConcurrentWriteError(
            f"table {self.name}: append could not commit after 5 rebases "
            "(sustained concurrent write pressure) — retry"
        )

    def _discard_claim(self, v: int) -> None:
        """Remove a never-committed claim's staging: ITS OWN store
        files (the manifest's ``added`` — carried members belong to
        committed history), its change-data files, and the claim dir.
        Losing writers call this on every no-commit exit (replay-race
        loss, conflict raise), so contention does not accrete orphan
        snapshots that only ``vacuum_uncommitted`` (no-active-writer
        contract) could reclaim — the r11 vacuum guard spares staged
        dirs precisely because live ones are indistinguishable from
        dead ones, which makes self-cleanup the only leak-free
        discipline. Crashed processes still leak until
        ``vacuum_uncommitted``; that is the unavoidable residue."""
        m = self._manifest(v)
        if m is not None:
            for n in m.get("added", ()):
                (self.store / n).unlink(missing_ok=True)
            for n in m.get("cdc", ()):
                (self.dir / "_change_data" / n).unlink(missing_ok=True)
            for entries in (m.get("dv_added") or {}).values():
                for n, _ in entries:
                    (self._dv_dir() / n).unlink(missing_ok=True)
        shutil.rmtree(self._version_dir(v), ignore_errors=True)

    def _commit_or_rebase(
        self,
        new_v: int,
        base_v: int,
        schema,
        op: str,
        epoch=None,
        epoch_key=None,
        set_props: dict | None = None,
    ) -> int | None:
        """Commit a staged incremental version, REBASING over disjoint
        interleaved commits instead of failing (the Delta write-
        serializable rule — see ``_rebase_commit``); a genuinely
        conflicting interleave still raises, and the loser always
        cleans its own staging. Returns the committed version, or None
        when the epoch was already applied."""
        for _ in range(5):
            try:
                committed = self._commit(
                    new_v, epoch, epoch_key, expected_version=base_v,
                    set_props=set_props,
                )
                if not committed:
                    self._discard_claim(new_v)
                    return None  # lost the replay race: nothing committed
                return new_v
            except OptimisticConcurrencyError:
                try:
                    new_v, base_v = self._rebase_commit(
                        new_v, base_v, schema, op
                    )
                except ConcurrentWriteError:
                    self._discard_claim(new_v)
                    raise
            except ConcurrentWriteError:
                self._discard_claim(new_v)  # non-rebaseable conflict
                raise
        self._discard_claim(new_v)
        raise ConcurrentWriteError(
            f"table {self.name}: {op} could not commit after 5 rebases "
            "(sustained concurrent write pressure) — retry"
        )

    def _rebase_commit(
        self, claimed_v: int, base_v: int, schema, op: str = "append"
    ) -> tuple[int, int]:
        """Move an already-materialized commit (append / merge / DML /
        compact) from ``base_v`` onto the current head — the general
        Delta write-serializable conflict rule (r12; the r11 rebase
        covered blind appends only): the loser re-commits iff its READ
        SET (the files it removed or tombstoned) is DISJOINT from every
        file the interleaved commits removed or tombstoned, the
        interleave contains no snapshot replacement (overwrite /
        restore / clone / legacy upgrade), and the schema is unchanged.
        A blind append's read set is empty, so it rebases over ANY
        disjoint content commit — merge and DML included; two merges or
        DMLs on disjoint files both land; maintenance (compact) rebases
        over anything it didn't pack. Intersecting read sets keep the
        loud ``OptimisticConcurrencyError`` — the loser's staged output
        was derived from content the winner replaced.

        Additionally (r13, Delta's ConcurrentAppendException rule): a
        read-dependent loser (merge/DELETE/UPDATE) rebasing over an
        interleaved merge/DML winner must also prove the winner's ADDED
        files could not contain rows its read predicate matches — the
        staged manifest's ``read_bounds`` envelope against the winner's
        per-file stats. No envelope, or any overlap → conflict.

        Like Delta's default WriteSerializable isolation, the rebased
        loser serializes BEFORE interleaved BLIND appends it never
        read: a merge landing after an interleaved append does not fold
        the appended rows (they remain, untouched — exactly the state
        the serial order loser-then-append produces).

        Mechanics: claim a fresh version, HARDLINK the staged store
        files under names embedding it (the in-flight GC guard keys off
        the name-embedded claim — under the old names a concurrent
        vacuum could collect them the moment the pointer passed the
        dead claim), rewrite the manifest as a child of the new head
        (carrying removed / dv_added / cdc), and drop the dead claim
        dir. Returns (new claimed version, new base). Pure metadata +
        O(new files) link syscalls — the data is never rewritten."""
        head = self.current_version()
        interleaved = self._committed_in_range(base_v, head)
        if interleaved is None:
            raise OptimisticConcurrencyError(
                f"table {self.name}: interleaved history (v{base_v}, "
                f"v{head}] was vacuumed mid-append; cannot prove the "
                "rebase safe — retry the append"
            )
        old_m = self._manifest(claimed_v)
        if old_m is not None and ("files" in old_m or old_m.get("upgrade")):
            # full-rewrite / legacy-upgrade manifests replace the whole
            # snapshot: their read set is everything — never rebaseable
            raise OptimisticConcurrencyError(
                f"table {self.name}: staged commit v{claimed_v} is a "
                "snapshot replacement; re-read and retry"
            )
        read_set = (
            set(old_m.get("removed", ())) | set(old_m.get("dv_added") or {})
            if old_m is not None
            else set()
        )
        rebaseable_ops = ("append", "compact", "merge", "delete", "update")
        # Delta's WriteSerializable ConcurrentAppendException rule: a
        # read-dependent loser (merge / DELETE / UPDATE) may serialize
        # before interleaved BLIND appends and compactions, but NOT
        # before an interleaved merge/DML whose ADDED files may contain
        # rows the loser's read predicate should have seen — example:
        # winner MERGE inserts k=5, loser DELETE WHERE k=5 touched other
        # files; rebasing the DELETE would let the k=5 rows survive (a
        # silent under-delete matching no serial order). The loser's
        # staged manifest records its read-predicate envelope
        # (``read_bounds``); a winner add overlapping it — or a loser
        # with no provable envelope — keeps the loud conflict.
        read_dependent = op in ("merge", "delete", "update")
        loser_bounds = (old_m.get("read_bounds") or {}) if old_m else {}
        for vv in interleaved:
            iop = self._op(vv)
            im = self._manifest(vv)
            if iop not in rebaseable_ops or im is None or im.get("upgrade"):
                raise OptimisticConcurrencyError(
                    f"table {self.name}: interleaved commit v{vv} ({iop}) "
                    "replaced the snapshot — a content change this commit "
                    "never saw; re-read and retry"
                )
            itouched = set(im.get("removed", ())) | set(im.get("dv_added") or {})
            clash = read_set & itouched
            if clash:
                raise OptimisticConcurrencyError(
                    f"table {self.name}: interleaved commit v{vv} ({iop}) "
                    f"rewrote file(s) {sorted(clash)[:3]} this commit also "
                    "read/rewrote — re-read and retry"
                )
            if read_dependent and iop in ("merge", "delete", "update"):
                iadded = list(im.get("added", ()))
                if iadded and not loser_bounds:
                    raise OptimisticConcurrencyError(
                        f"table {self.name}: interleaved commit v{vv} "
                        f"({iop}) added files this {op}'s unbounded read "
                        "predicate may have matched — re-read and retry"
                    )
                istats = im.get("stats") or {}
                hit = [
                    n for n in iadded
                    if self._stats_overlap(istats.get(n), loser_bounds)
                ]
                if hit:
                    raise OptimisticConcurrencyError(
                        f"table {self.name}: interleaved commit v{vv} "
                        f"({iop}) added file(s) {sorted(hit)[:3]} whose "
                        f"rows may match this {op}'s read predicate — "
                        "re-read and retry"
                    )
        head_schema = self.table_schema(head)
        # compare names + types, NOT nullability: a parquet read is
        # always nullable, so a content-identical compact widens the
        # committed nullability — benign for a blind append (its files
        # were written under the stricter schema)
        if head_schema is None or [
            (f.name, f.dataType) for f in head_schema.fields
        ] != [(f.name, f.dataType) for f in schema.fields]:
            raise OptimisticConcurrencyError(
                f"table {self.name}: schema changed by an interleaved "
                "commit; re-align and retry the append"
            )
        res = self._resolve(head)
        if res is None:  # legacy head: no manifest chain to rebase onto
            raise OptimisticConcurrencyError(
                f"table {self.name}: head v{head} predates manifests; "
                "cannot rebase — retry the append"
            )
        if old_m is None:
            # the staged claim dir vanished underneath us (an external
            # vacuum_uncommitted run violating its no-active-writer
            # contract, or manual cleanup) — the staged files are gone
            # too; nothing to rebase
            raise ConcurrentWriteError(
                f"table {self.name}: staged claim v{claimed_v} vanished "
                "mid-commit (external cleanup?) — retry"
            )
        # the loser's removed files must still be head members (an
        # interleave touching them was caught above; this also guards
        # exotic cases like the same file removed twice)
        head_members = set(res[0])
        gone = read_set - head_members
        if gone:
            raise OptimisticConcurrencyError(
                f"table {self.name}: file(s) {sorted(gone)[:3]} this "
                "commit read are no longer snapshot members — re-read "
                "and retry"
            )
        nv = self._claim_next_version()
        new_names, new_stats = _relink_store_files(
            self.store, old_m["added"], old_m["stats"], self.store, nv
        )
        manifest = self._build_child_manifest(
            head, new_names, list(old_m.get("removed", ())), new_stats,
            base_names=res[0], base_stats=res[1],
            dv_added=old_m.get("dv_added"),
        )
        manifest["partition_columns"] = old_m.get("partition_columns", [])
        if old_m.get("read_bounds"):
            # carry the read envelope: a SECOND rebase (another writer
            # landing during this one) must keep the same precision
            manifest["read_bounds"] = old_m["read_bounds"]
        if old_m.get("cdc"):
            # the cdc rows were computed from files the interleave
            # provably did not touch: still exact under the new order
            manifest["cdc"] = old_m["cdc"]
        self._write_manifest_file(nv, manifest)
        self._write_op_marker(nv, op)
        self._write_schema(self._version_dir(nv), schema)
        # drop the dead claim only after the new one is fully staged
        for n in old_m["added"]:
            (self.store / n).unlink(missing_ok=True)
        shutil.rmtree(self._version_dir(claimed_v), ignore_errors=True)
        return nv, head

    def _merge_candidate_files(
        self,
        res: tuple[list[str], dict] | None,
        batch: DataFrame,
        keys: Sequence[str],
        key_bounds: Mapping[str, tuple] | None = None,
    ) -> tuple[list[str] | None, dict]:
        """Stats-pruned candidate set for ``merge_keyed``'s touched-file
        discovery: store-relative names whose per-file min/max stats
        (the same manifest index behind ``read_pruned``) intersect the
        BATCH's key bounds on every key column — a file outside the
        bounds provably contains no batch key and need never be opened.
        Returns ``(candidates, bounds)``: candidates is None when
        pruning has nothing to offer (legacy layout, no normalizable
        bound on any key, or nothing pruned), in which case discovery
        scans the full snapshot as before; ``bounds`` is the batch's
        normalized key-range envelope ``{key: (lo, hi)}`` — the merge's
        READ-PREDICATE bounds, recorded in the staged manifest so a
        rebase can prove an interleaved writer's added files could not
        have matched this merge's keys (see ``_rebase_commit``).

        The bounds ride ONE model-sized aggregate over the batch (a
        1-row driver read, like the touched-file cap manifest); the
        intersection itself is a driver-side walk of the already-
        resolved stats map — O(files) dict lookups, no IO. Sharp when
        the table is key-clustered (``compact(cluster_by=keys)``) —
        exactly the layout the merge docstring prescribes at scale —
        and conservatively a superset otherwise (files lacking stats
        on a key column are always kept)."""
        if res is None:
            return None, {}
        if key_bounds is None:
            aggs = [
                a
                for i, k in enumerate(keys)
                for a in (
                    F.min(F.col(k)).alias(f"__lo{i}"),
                    F.max(F.col(k)).alias(f"__hi{i}"),
                )
            ]
            bounds = batch.agg(*aggs).first()
            raw = {
                k: (bounds[f"__lo{i}"], bounds[f"__hi{i}"])
                for i, k in enumerate(keys)
            }
        else:
            # r14 (guide §2.4 — remove a pass): a caller that already
            # aggregated the batch (e.g. gold_flow's gated-count) hands
            # the raw per-key min/max down, so the bounds ride THAT job
            # instead of a second full batch pass per apply.
            raw = {k: key_bounds.get(k, (None, None)) for k in keys}
        norm = {}
        for k in keys:
            lo, hi = _stat_value(raw[k][0]), _stat_value(raw[k][1])
            if lo is not None or hi is not None:
                norm[k] = (lo, hi)
        names, stats = res
        if norm:
            cand = [n for n in names if self._stats_overlap(stats.get(n), norm)]
        else:  # no normalizable bound (all-NULL / unsafe key type):
            cand = list(names)  # ranges can't prune — blooms still may
        cand = self._bloom_prune(cand, stats, batch, keys)
        return (cand if len(cand) < len(names) else None), norm

    def merge_keyed(
        self,
        batch: DataFrame,
        keys: Sequence[str],
        merge_fn: Callable[[DataFrame, DataFrame], DataFrame],
        epoch=None,
        epoch_key=None,
        evolve: bool = False,
        full_scope: bool = False,
        key_bounds: Mapping[str, tuple] | None = None,
    ) -> int | None:
        """File-pruned keyed merge (Delta-MERGE-style on plain parquet).

        ``key_bounds`` (r14, optional): raw ``{key: (min, max)}`` the
        caller already aggregated over the batch — skips the merge's
        own bounds pass (one job per apply saved; the values MUST come
        from a plain min/max over exactly the rows of ``batch``).

        ``full_scope=True`` skips key discovery entirely and hands
        ``merge_fn`` the WHOLE table (a full rewrite, nothing carried
        by reference) — for merge semantics whose output depends on
        target rows the batch does NOT touch, like Delta's ``WHEN NOT
        MATCHED BY SOURCE THEN DELETE`` (every target key is a
        candidate for deletion, so pruning to batch-key files would be
        wrong; Delta reads the whole target for this clause too). The
        commit still records removed = the prior snapshot, so the
        change feed diffs it exactly.

        ``evolve=True`` ≙ Delta's MERGE WITH SCHEMA EVOLUTION: new
        nullable columns in the merge OUTPUT widen the committed schema
        (additive only, like append's evolve); untouched files carry by
        reference under the old schema and reads pin the evolved one
        (missing columns read as NULL).

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

        Physical shape: discovery first PRUNES the candidate file set
        with the manifest's per-file min/max key stats against the
        batch's key bounds (``_merge_candidate_files`` — on a key-
        clustered table the incremental batch's bounds intersect a
        handful of files, so discovery OPENS only those instead of
        reading every file's key column), then one semi-join of the
        candidates against the (broadcast) distinct batch keys finds
        the truly touched files, and the merge itself runs over just
        those files' rows. At 100 TB this makes the whole merge —
        discovery included — O(touched), not O(table).

        The driver-side touched-file manifest is BOUNDED: it is
        collected through a ``limit(cap + 1)`` where cap =
        min(``merge_full_rewrite_fraction`` × the snapshot's file
        count, ``merge_manifest_max_files``) — the absolute term keeps
        driver memory constant even on million-file tables. A batch
        touching more than the cap has no pruning value left — the
        merge falls back to a full rewrite (subset = whole snapshot,
        nothing carried) without ever materializing the manifest."""
        if self._epoch_already_applied(epoch, epoch_key):
            return None
        if not self.exists():
            empty = self.spark.createDataFrame([], batch.schema)
            return self.overwrite(merge_fn(empty, batch), epoch, epoch_key)
        v = self.current_version()
        res = self._resolve(v)
        legacy_base = res is None
        bkeys = batch.select(*keys).distinct()
        n_files = (
            len(res[0]) if res is not None
            else sum(1 for _ in self._version_dir(v).glob("*.parquet"))
        )
        cap = max(
            1,
            min(
                int(self.merge_full_rewrite_fraction * n_files),
                self.merge_manifest_max_files,
            ),
        )
        if full_scope:
            # whole-table merge semantics: no discovery, no pruning —
            # and no read_bounds envelope, so a concurrent-writer rebase
            # conservatively conflicts (the read set IS the table)
            read_bounds = None
            touched: list = [None] * (cap + 1)  # > cap ⇒ full-rewrite path
        else:
            cand, read_bounds = self._merge_candidate_files(
                res, batch, keys, key_bounds
            )
            if cand is not None and not cand:
                # bounds exclude every file: provably nothing touched —
                # no discovery job at all
                touched = []
            else:
                # NOTE the full-snapshot frame (self.read()) is built
                # only on the unpruned path: constructing it lists every
                # member path into the driver's file index, an O(table)
                # cost the pruned path must not pay just for an unused
                # plan branch
                if cand is None and legacy_base:  # legacy: scan it all
                    discover = self.read().withColumn(
                        "__file", F.input_file_name()
                    )
                else:
                    # DV-folding tagged read (r12): a row a small delete
                    # tombstoned must not re-touch its file — and must
                    # never re-surface through the merge rewrite
                    scan = sorted(cand) if cand is not None else res[0]
                    discover = self._read_members(
                        scan, self.table_schema(v), self._resolve_dv(v),
                        keep_tag=True,
                    ).withColumnRenamed(self.DV_COL, "__file")
                touched = (
                    discover
                    .join(F.broadcast(bkeys), list(keys), "left_semi")
                    .select("__file")
                    .distinct()
                    .limit(cap + 1)
                    .collect()
                )
        full_rewrite = len(touched) > cap
        touched_base = (
            set() if full_rewrite
            else {os.path.basename(r["__file"]) for r in touched}
        )
        # store names may be nested (hive partition dirs): map the
        # input_file_name basenames — globally unique — back to the
        # manifest's store-relative names
        if res is not None:
            by_base = {os.path.basename(n): n for n in res[0]}
            touched_files = {by_base[b] for b in touched_base}
        else:
            touched_files = touched_base
        new_v = self._claim_next_version()
        new_dir = self._version_dir(new_v)
        src_dir = self.store if not legacy_base else self._version_dir(v)
        pcols = self.partition_columns()
        if full_rewrite:
            subset = self.read()
        elif touched_files and not legacy_base:
            # DV-folded subset (r12): rewriting a touched file from raw
            # content would RESURRECT its tombstoned rows
            subset = self._read_members(
                sorted(touched_files), self.table_schema(v), self._resolve_dv(v)
            )
        elif touched_files:
            stored = self.table_schema(v)
            reader = self.spark.read.schema(stored) if stored is not None else self.spark.read
            subset = self._schema_order(
                reader.parquet(*[str(src_dir / f) for f in sorted(touched_files)]),
                stored,
            )
        else:
            stored = self.table_schema(v)
            subset = self.spark.createDataFrame(
                [], stored if stored is not None else self.read().schema
            )
        # Schema is enforced on the merge OUTPUT (the batch legitimately
        # differs — e.g. CDC batches lack the SCD bookkeeping columns
        # that merge_fn itself adds). The whole merge_fn→align→write
        # span discards the claim on ANY failure — a schema rejection
        # (the probe-then-retry-with-evolve flow) must not accrete one
        # orphan staging dir per attempt.
        try:
            merged, schema = self._align(merge_fn(subset, batch), evolve=evolve)
            names = self._materialize(new_v, merged, pcols)
        except Exception:
            self._discard_claim(new_v)  # see overwrite: no orphan per retry
            raise
        try:
            stats = self._collect_stats_for(names, pcols, schema)
            self._attach_blooms(names, stats, schema)
            if full_rewrite:
                prior_names = res[0] if res is not None else []
                manifest = {
                    "base": v, "depth": 0, "added": names,
                    # removed = the whole prior snapshot, so the change feed
                    # can still diff a full-rewrite merge (legacy base: the
                    # upgrade flag below forces the rebuild fallback instead)
                    "removed": prior_names,
                    "stats": stats, "files": names, "stats_full": stats,
                }
                if legacy_base:
                    manifest["upgrade"] = True
            elif legacy_base:
                # one-time upgrade: link the UNTOUCHED legacy files into the
                # store; the touched ones were rewritten above. Marked
                # upgrade=True — removed refers to pre-store identities, so
                # changes_since must rebuild across this commit.
                base_names, base_stats, _ = self._snapshot_members(v)
                legacy_order = [
                    f.name for f in sorted(self._version_dir(v).glob("*.parquet"))
                ]
                kept = [
                    n for n, lf in zip(base_names, legacy_order)
                    if lf not in touched_files
                ]
                manifest = {
                    "base": v, "depth": 0, "added": names,
                    "removed": sorted(touched_files),
                    "stats": stats,
                    "files": kept + names,
                    "stats_full": {
                        **{n: base_stats[n] for n in kept if n in base_stats},
                        **stats,
                    },
                    "upgrade": True,
                }
            else:
                manifest = self._build_child_manifest(
                    v, names, sorted(touched_files), stats,
                    base_names=res[0], base_stats=res[1],
                )
                # the merge's read-predicate envelope (batch key min/max
                # per key column): a rebase over an interleaved merge/DML
                # winner is provably safe only when the winner's ADDED
                # files fall outside it (WriteSerializable's
                # ConcurrentAppendException rule — see _rebase_commit)
                if read_bounds:
                    manifest["read_bounds"] = {
                        c: list(b) for c, b in read_bounds.items()
                    }
            if self.cdf_enabled() and not (legacy_base and not full_rewrite):
                # Delta change data feed: materialize this commit's row-
                # level changes into _change_data/ (referenced by cdc log
                # actions). Old = the touched files' pre-merge rows, new =
                # the freshly written files — both immutable, so the diff
                # is deterministic and costs one extra pass over the
                # TOUCHED scope only. _change_type uses Delta's protocol
                # naming (update_preimage/update_postimage); for
                # partitioned tables the partition columns ride INLINE in
                # the cdc files (actions carry empty partitionValues).
                reader = self.spark.read.schema(schema).option(
                    "basePath", str(self.store)
                )
                new_rows = (
                    self._schema_order(
                        reader.parquet(*[str(self.store / n) for n in names]),
                        schema,
                    )
                    if names else self.spark.createDataFrame([], schema)
                )
                # align the OLD side to the (possibly evolved) committed
                # schema: after merge_keyed(evolve=True) the pre-merge
                # subset lacks the new columns — they read as NULL, exactly
                # what pinned reads of the carried files report
                subset_cols = set(subset.columns)
                old_rows = subset.select(*[
                    F.col(f.name) if f.name in subset_cols
                    else F.lit(None).cast(f.dataType).alias(f.name)
                    for f in schema.fields
                ])
                dels = old_rows.exceptAll(new_rows)
                ins = new_rows.exceptAll(old_rows)
                key_cols = list(keys)
                upd = F.broadcast(
                    ins.select(*key_cols).intersect(dels.select(*key_cols))
                )
                cdc_df = (
                    ins.join(upd, key_cols, "left_anti")
                    .withColumn("_change_type", F.lit("insert"))
                    .unionByName(
                        dels.join(upd, key_cols, "left_anti")
                        .withColumn("_change_type", F.lit("delete"))
                    )
                    .unionByName(
                        dels.join(upd, key_cols, "left_semi")
                        .withColumn("_change_type", F.lit("update_preimage"))
                    )
                    .unionByName(
                        ins.join(upd, key_cols, "left_semi")
                        .withColumn("_change_type", F.lit("update_postimage"))
                    )
                )
                manifest["cdc"] = self._materialize_cdc(new_v, cdc_df)
            manifest["partition_columns"] = pcols
            self._write_manifest_file(new_v, manifest)
            self._write_op_marker(new_v, "merge")
            self._write_schema(new_dir, schema)
        except Exception:
            # post-materialize bookkeeping (stats/Blooms/CDF/manifest/
            # schema) failing must not leave a vacuum-immune orphan
            # claim any more than the data write itself failing does
            self._discard_claim(new_v)
            raise
        return self._commit_or_rebase(
            new_v, v, schema, "merge", epoch, epoch_key,
            set_props=self._nudge_cdf_for_dml(),
        )

    # -- predicate DML: DELETE / UPDATE (Delta's remaining DML verbs) --------
    @staticmethod
    def _dml_bounds(condition: str) -> dict:
        """Conservative data-skipping bounds implied by a SQL condition
        string: ``{col: (lo, hi)}`` usable by the same stats index as
        ``read_pruned`` (Delta derives its DELETE/UPDATE file-skipping
        predicates the same way). Only a TOP-LEVEL conjunction of
        ``col <op> literal`` comparisons contributes — any ``OR`` /
        ``NOT`` / parenthesis / function call makes implication
        unprovable by inspection, so the parse bails to {} (no pruning:
        always a superset, never wrong). ``<`` / ``>`` widen to their
        inclusive bound (supersets again); ``=`` binds an exact point,
        which additionally unlocks the per-file key Blooms."""
        # quote-aware pre-pass: bail tokens and the AND split must only
        # see text OUTSIDE single-quoted literals — a value like
        # 'x AND k = 5' must neither split the conjunction nor feed the
        # comparison parser (bounds derived from literal content would
        # NOT be implied by the condition: silent wrong-file pruning).
        # Spark's parser ALSO accepts double-quoted string literals and
        # (by default) backslash escapes inside literals — syntax the
        # scanner below doesn't model, so their mere presence bails the
        # whole parse: a mis-detected literal boundary would leak
        # literal content into the AND splitter and derive bounds NOT
        # implied by the condition (wrong-file pruning = wrong DML).
        if '"' in condition or "\\" in condition:
            return {}
        conjuncts: list[str] = []
        cur: list[str] = []
        quoted = False
        i = 0
        n_chars = len(condition)
        while i < n_chars:
            ch = condition[i]
            if quoted:
                cur.append(ch)
                if ch == "'":
                    if i + 1 < n_chars and condition[i + 1] == "'":
                        cur.append("'")
                        i += 2
                        continue
                    quoted = False
                i += 1
                continue
            if ch == "'":
                quoted = True
                cur.append(ch)
                i += 1
                continue
            if ch in "()|":
                return {}  # sub-expressions / OR syntax: unprovable
            m = re.match(r"(?i)(or|not|in|and)\b", condition[i:])
            if m and (i == 0 or not (condition[i - 1].isalnum() or condition[i - 1] == "_")):
                word = m.group(1).lower()
                if word != "and":
                    return {}
                conjuncts.append("".join(cur))
                cur = []
                i += m.end()
                continue
            cur.append(ch)
            i += 1
        if quoted:
            return {}  # unterminated literal: parse nothing
        conjuncts.append("".join(cur))
        cmp_pat = re.compile(
            r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(<=|>=|==|=|<|>)\s*"
            r"('(?:[^']|'')*'|-?\d+(?:\.\d+)?)\s*$"
        )
        rev_pat = re.compile(
            r"^\s*('(?:[^']|'')*'|-?\d+(?:\.\d+)?)\s*(<=|>=|==|=|<|>)\s*"
            r"([A-Za-z_][A-Za-z0-9_]*)\s*$"
        )
        _FLIP = {"<": ">", "<=": ">=", ">": "<", ">=": "<=", "=": "=", "==": "=="}

        def _lit(tok: str):
            if tok.startswith("'"):
                return tok[1:-1].replace("''", "'")
            return float(tok) if "." in tok else int(tok)

        bounds: dict = {}
        for conjunct in conjuncts:
            m = cmp_pat.match(conjunct)
            if m:
                col, op, tok = m.group(1), m.group(2), m.group(3)
            else:
                m = rev_pat.match(conjunct)
                if not m:
                    continue  # unparseable conjunct: no constraint (safe)
                tok, op, col = m.group(1), _FLIP[m.group(2)], m.group(3)
            val = _stat_value(_lit(tok))
            if val is None:
                continue
            lo, hi = bounds.get(col, (None, None))
            try:
                if op in ("=", "=="):
                    lo = val if lo is None else max(lo, val)
                    hi = val if hi is None else min(hi, val)
                elif op in (">", ">="):
                    lo = val if lo is None else max(lo, val)
                else:  # < / <= → inclusive upper bound (superset)
                    hi = val if hi is None else min(hi, val)
            except TypeError:
                continue  # mixed-type bounds: drop this conjunct (safe)
            bounds[col] = (lo, hi)
        return bounds

    def _dml_rewrite(
        self,
        condition,
        op: str,
        rewrite_fn: Callable[[DataFrame], DataFrame],
        cdc_fn: Callable[[DataFrame], DataFrame],
        prune: dict | None,
        epoch,
        epoch_key,
    ) -> int | None:
        """Shared predicate-DML core for ``delete_where``/``update_where``
        (Delta DELETE/UPDATE semantics on the manifest layout). Physical
        shape mirrors ``merge_keyed``: candidate files are PRUNED by the
        manifest's per-file min/max stats (+ point Blooms) against the
        bounds the condition implies, one bounded discovery scan over
        the candidates finds the files actually holding a matching row,
        only those are rewritten, and every untouched file is carried by
        reference — O(matching), not O(table), on a clustered layout.

        NULL three-valued logic matches Delta/SQL: a row whose condition
        evaluates to NULL is NOT matched (kept by DELETE, left unchanged
        by UPDATE). Zero matching rows anywhere → returns None with NO
        commit (the table version is unchanged). Concurrency: commits
        with ``expected_version`` like merge — an interleaved commit
        raises ``ConcurrentWriteError`` instead of silently dropping it.
        """
        if self._epoch_already_applied(epoch, epoch_key):
            return None
        if not self.exists():
            raise ValueError(f"table {self.name} does not exist")
        cond_col = F.expr(condition) if isinstance(condition, str) else condition
        cond_true = F.coalesce(cond_col.cast("boolean"), F.lit(False))
        v = self.current_version()
        res = self._resolve(v)
        if res is None:
            # legacy (pre-manifest) layout: one-time full-snapshot
            # rewrite (which also upgrades the table into the store);
            # change-feed derivability across it is forfeit, like any
            # snapshot op. Op marker stays "snapshot" by design.
            return self.overwrite(
                rewrite_fn(self.read()), epoch, epoch_key,
                expected_version=v,
                # rewrite of existing rows: their identity/generated
                # values carry through, policies must not re-fire
                _apply_policies=False,
            )
        names, stats = res
        bounds = dict(self._dml_bounds(condition)) if isinstance(condition, str) else {}
        if prune:
            for c, (lo, hi) in prune.items():
                plo, phi = _stat_value(lo), _stat_value(hi)
                blo, bhi = bounds.get(c, (None, None))
                bounds[c] = (
                    plo if blo is None else (blo if plo is None else max(blo, plo)),
                    phi if bhi is None else (bhi if phi is None else min(bhi, phi)),
                )
        norm = {c: b for c, b in bounds.items() if b != (None, None)}
        cand = (
            [n for n in names if self._stats_overlap(stats.get(n), norm)]
            if norm
            else list(names)
        )
        points = {
            c: lo for c, (lo, hi) in norm.items() if lo is not None and lo == hi
        }
        if points and stats:
            survivors = self._bloom_point_prune(
                [(n, self.store / n) for n in cand], stats, points
            )
            cand = [k for k, _ in survivors]
        stored = self.table_schema(v)
        cap = max(
            1,
            min(
                int(self.merge_full_rewrite_fraction * len(names)),
                self.merge_manifest_max_files,
            ),
        )
        if not cand:
            return None  # stats prove no file holds a matching row
        dv_map = self._resolve_dv(v)
        # discovery reads tagged with the file's (globally unique)
        # basename, DVs FOLDED with the tag preserved — a row a prior
        # small delete already tombstoned must neither re-touch its
        # file nor be tombstoned twice (a double tombstone would
        # over-subtract duplicate-valued rows)
        discover = self._read_members(sorted(cand), stored, dv_map, keep_tag=True)
        touched = (
            discover.filter(cond_true)
            .groupBy(self.DV_COL)
            .count()
            .limit(cap + 1)
            .collect()
        )
        if not touched:
            return None  # condition matches no row: no-op, no commit
        full_rewrite = len(touched) > cap
        by_base = {os.path.basename(n): n for n in names}
        match_counts = {
            by_base[r[self.DV_COL]]: r["count"] for r in touched
        }
        if full_rewrite:
            touched_files = sorted(names)
        else:
            touched_files = sorted(match_counts)
        # small-delete DV gate: a DELETE matching a tiny fraction of a
        # file tombstones it (O(matched rows)) instead of rewriting the
        # file (O(file)); UPDATE always rewrites (its matched rows
        # change in place — Delta's DV-update would tombstone + append,
        # a shape this engine routes through merge instead)
        dv_files: list[str] = []
        if op == "delete" and not full_rewrite and stored is not None:
            for n, cnt in match_counts.items():
                rows = (stats.get(n) or {}).get("rows")
                if rows and cnt <= min(
                    self.dv_max_rows, max(1, int(self.dv_max_fraction * rows))
                ):
                    dv_files.append(n)
        dv_set = set(dv_files)
        rewrite_files = [n for n in touched_files if n not in dv_set]
        new_v = self._claim_next_version()
        try:
            pcols = self.partition_columns()
            dv_added: dict | None = None
            if dv_files:
                # positional tombstones (r13): (file, raw row position)
                # of the matched rows — positions are taken at scan
                # time on the RAW file (prior DVs folded by position,
                # so a previously tombstoned row can't re-match), and
                # the written vector is O(matched) narrow rows
                tombs = (
                    self._read_members(
                        sorted(dv_files), stored, dv_map,
                        keep_tag=True, keep_pos=True,
                    )
                    .filter(cond_true)
                    .select(self.DV_COL, self.DV_POS)
                )
                dv_name = self._materialize_dv(new_v, tombs)
                dv_added = {
                    n: [[dv_name, match_counts[n]]] for n in sorted(dv_files)
                }
            if rewrite_files:
                subset = self._read_members(rewrite_files, stored, dv_map)
                out, schema = self._align(rewrite_fn(subset), evolve=False)
                new_names = self._materialize(new_v, out, pcols)
            else:
                new_names, schema = [], stored
        except Exception:
            # a failed rewrite (e.g. ANSI cast overflow in a SET expr)
            # must not leave its claim dir for vacuum to age out
            self._discard_claim(new_v)
            raise
        try:
            new_stats = self._collect_stats_for(new_names, pcols, schema)
            self._attach_blooms(new_names, new_stats, schema)
            if full_rewrite:
                manifest = {
                    "base": v, "depth": 0, "added": new_names,
                    "removed": touched_files,
                    "stats": new_stats, "files": new_names,
                    "stats_full": new_stats,
                }
            else:
                manifest = self._build_child_manifest(
                    v, new_names, rewrite_files, new_stats,
                    base_names=names, base_stats=stats,
                    dv_added=dv_added,
                )
                # the condition's implied range envelope (same bounds
                # the pruning used — caller-supplied ``prune`` hints are
                # contractually implied by the condition too): lets a
                # rebase prove an interleaved merge/DML winner's added
                # files could not match this DML's predicate
                if norm:
                    manifest["read_bounds"] = {
                        c: list(b) for c, b in norm.items()
                    }
            if self.cdf_enabled():
                # EXACT change rows straight from the predicate — no
                # exceptAll diff needed (unlike merge, the matched set IS
                # the change set), costing one extra pass over the touched
                # scope only (DV'd files included: their matched rows are
                # deletes all the same)
                cdc_subset = self._read_members(touched_files, stored, dv_map)
                manifest["cdc"] = self._materialize_cdc(new_v, cdc_fn(cdc_subset))
            manifest["partition_columns"] = pcols
            self._write_manifest_file(new_v, manifest)
            self._write_op_marker(new_v, op)
            self._write_schema(self._version_dir(new_v), schema)
        except Exception:
            # post-materialize bookkeeping (stats/Blooms/CDF/manifest/
            # schema) failing must not leave a vacuum-immune orphan
            # claim any more than the data write itself failing does
            self._discard_claim(new_v)
            raise
        return self._commit_or_rebase(
            new_v, v, schema, op, epoch, epoch_key,
            set_props=self._nudge_cdf_for_dml(),
        )

    def delete_where(
        self, condition, prune: dict | None = None, epoch=None, epoch_key=None
    ) -> int | None:
        """Delta-style ``DELETE FROM t WHERE condition`` (reference gold
        DML surface, `DimUser.py:20-29` apply-changes deletes, here as a
        direct verb). Rewrites ONLY the files containing a matching row
        (stats/Bloom-pruned discovery, untouched files carried by
        reference), emits exact CDF ``delete`` rows when the table is
        CDF-enabled, and logs a Delta ``DELETE`` commit (remove+add
        actions, dataChange=true). Rows whose condition is NULL are
        KEPT (SQL three-valued logic). Returns the committed version or
        None when nothing matched (no commit).

        ``condition``: SQL string (data-skipping bounds auto-derived
        from top-level AND-ed comparisons) or a Column.
        ``prune``: optional explicit ``{col: (lo, hi)}`` skipping bounds
        intersected with the derived ones — for conditions whose
        selectivity the parser can't see (UDFs, ORs) but the caller can
        bound."""

        def _rewrite(df: DataFrame) -> DataFrame:
            cond_col = F.expr(condition) if isinstance(condition, str) else condition
            return df.filter(~F.coalesce(cond_col.cast("boolean"), F.lit(False)))

        def _cdc(df: DataFrame) -> DataFrame:
            cond_col = F.expr(condition) if isinstance(condition, str) else condition
            return df.filter(
                F.coalesce(cond_col.cast("boolean"), F.lit(False))
            ).withColumn("_change_type", F.lit("delete"))

        return self._dml_rewrite(
            condition, "delete", _rewrite, _cdc, prune, epoch, epoch_key
        )

    def update_where(
        self,
        condition,
        set: dict,
        prune: dict | None = None,
        epoch=None,
        epoch_key=None,
    ) -> int | None:
        """Delta-style ``UPDATE t SET ... WHERE condition``. ``set`` maps
        column name → SQL expression string or Column, each evaluated
        against the row's PRE-update values (all assignments are
        simultaneous, one projection) and implicitly cast to the
        column's committed type (Delta UPDATE cast semantics; a cast
        that can't hold the value fails loudly at write). Unknown SET
        columns raise — UPDATE never evolves the schema. File pruning,
        NULL handling, CDF (``update_preimage``/``update_postimage``
        pairs), concurrency, and the no-match no-op match
        ``delete_where``. Updating a partition column is allowed: the
        rewrite re-partitions touched rows into their new directories
        (Delta row-movement semantics)."""
        stored = self.table_schema() if self.exists() else None
        types = {f.name: f.dataType for f in stored.fields} if stored is not None else {}
        unknown = [c for c in set if types and c not in types]
        if unknown:
            raise ValueError(
                f"UPDATE SET on unknown column(s) {unknown} of table {self.name}"
            )
        set_cols = {
            c: (F.expr(e) if isinstance(e, str) else e) for c, e in set.items()
        }
        if types:
            set_cols = {c: e.cast(types[c]) for c, e in set_cols.items()}
        # generated columns not explicitly assigned recompute from the
        # POST-update row (Delta UPDATE semantics — leaving them stale
        # would trip their own CHECK constraint); a second projection in
        # the same scan stage, evaluated after the user assignments
        gen_exprs, _ = self.column_policies() if self.exists() else ({}, {})
        gen_sets = {
            c: (F.expr(e).cast(types[c]) if types else F.expr(e))
            for c, e in gen_exprs.items() if c not in set
        }

        def _cond_true():
            cond_col = F.expr(condition) if isinstance(condition, str) else condition
            return F.coalesce(cond_col.cast("boolean"), F.lit(False))

        def _rewrite(df: DataFrame) -> DataFrame:
            # the condition must bind to PRE-update values even when an
            # assignment changes a column it references — tag first
            out = df.withColumn("__upd", _cond_true()).withColumns(
                {
                    c: F.when(F.col("__upd"), e).otherwise(F.col(c))
                    for c, e in set_cols.items()
                }
            )
            if gen_sets:
                out = out.withColumns(
                    {
                        c: F.when(F.col("__upd"), e).otherwise(F.col(c))
                        for c, e in gen_sets.items()
                    }
                )
            return out.drop("__upd")

        def _cdc(df: DataFrame) -> DataFrame:
            pre = df.filter(_cond_true())
            post = pre.withColumns(set_cols)
            if gen_sets:
                post = post.withColumns(gen_sets)
            return pre.withColumn(
                "_change_type", F.lit("update_preimage")
            ).unionByName(
                post.withColumn("_change_type", F.lit("update_postimage"))
            )

        return self._dml_rewrite(
            condition, "update", _rewrite, _cdc, prune, epoch, epoch_key
        )

    def compact_small(
        self,
        max_file_bytes: int = 128 << 20,
        epoch=None,
        epoch_key=None,
        min_small_files: int = 2,
    ) -> int | None:
        """Incremental bin-packing OPTIMIZE (Delta's default compaction
        semantics): rewrite ONLY the current snapshot's files smaller
        than ``max_file_bytes``, coalesced into ~target-sized files,
        and carry every already-right-sized file by reference. Where
        ``compact()`` rewrites the whole table (the right tool when
        re-CLUSTERING), this is the routine maintenance verb — cost is
        O(small files), so a streaming sink accumulating one small file
        per micro-batch can compact continuously without ever paying an
        O(table) rewrite. At 100 TB that is the difference between a
        nightly maintenance job and an impossible one.

        Content-identical by contract → op marker ``compact``:
        dataChange=false in the Delta log, transparent to
        ``appended_since``/``changes_since`` (zero delta), so routine
        bin-packing never breaks a downstream incremental drain.
        ``min_small_files``: don't bother packing fewer than this many
        small files (Delta autoCompact's minNumFiles gate, default 50
        there). Without it a CONTINUOUS caller (auto_maintenance_hook
        after every run) pays a rewrite of ALL accumulated small bytes
        per run — the previous pack's output is itself sub-threshold,
        so each run would repack it plus the one new file, quadratic
        I/O over the table's life. With the gate, each byte is
        repacked at most once per ``min_small_files`` accumulation
        cycle, and stops being repacked at all once its packed file
        crosses ``max_file_bytes``.

        Commits with ``expected_version`` like compact(); returns the
        committed version, or None when fewer than ``min_small_files``
        small files exist (nothing to pack — no commit)."""
        if self._epoch_already_applied(epoch, epoch_key):
            return None
        v = self.current_version()
        res = self._resolve(v)
        if res is None:
            # legacy layout: no per-file reference-carry possible —
            # full compact() is the upgrade path
            return self.compact()
        names, stats = res
        dv_map = self._resolve_dv(v)
        sizes = {n: (self.store / n).stat().st_size for n in names}
        small = sorted(n for n in names if sizes[n] < max_file_bytes)
        # DV purge (r12): a file whose deletion vectors tombstone >= 10%
        # of its rows joins the rewrite set regardless of size — the
        # rewrite folds the tombstones away (the Delta OPTIMIZE rule:
        # compaction is where DVs get purged). Content-identical at the
        # TABLE level, so the dataChange=false contract holds.
        purge = sorted(
            n for n in names
            if n not in set(small) and dv_map.get(n)
            and (stats.get(n) or {}).get("rows")
            and sum(r for _, r in dv_map[n]) >= 0.1 * stats[n]["rows"]
        )
        if len(small) < max(2, min_small_files) and not purge:
            return None
        small = sorted(set(small) | set(purge))
        if len(small) < 1:
            return None
        total = sum(sizes[n] for n in small)
        n_out = max(1, -(-total // max_file_bytes))  # ceil
        if n_out >= len(small) and not purge:
            # CONVERGENCE guard: packing can't reduce the file count —
            # the small set is already ~target-sized chunks (its own
            # outputs are always sub-threshold, so without this check
            # every later call would re-pack the same bytes into the
            # same number of files forever: O(sub-threshold bytes) of
            # useless churn per maintenance cycle plus a no-progress
            # commit each time)
            return None
        stored = self.table_schema(v)
        pcols = self.partition_columns()
        # DV-folded read: the pack output must not resurrect tombstoned
        # rows (and folding is how the DVs get purged)
        subset = self._read_members(small, stored, dv_map)
        if not pcols:
            # coalesce: pure bin-packing needs no shuffle at all
            subset = subset.coalesce(int(n_out))
        else:
            # hive layout: co-locate each partition value's rows so the
            # writer emits ~one packed file per value per task instead
            # of re-fragmenting (one shuffle over the SMALL files only)
            subset = subset.repartition(int(n_out), *pcols)
        new_v = self._claim_next_version()
        try:
            out, schema = self._align(subset, evolve=False)
            new_names = self._materialize(new_v, out, pcols)
        except Exception:
            self._discard_claim(new_v)
            raise
        try:
            new_stats = self._collect_stats_for(new_names, pcols, schema)
            self._attach_blooms(new_names, new_stats, schema)
            manifest = self._build_child_manifest(
                v, new_names, small, new_stats, base_names=names, base_stats=stats
            )
            manifest["partition_columns"] = pcols
            self._write_manifest_file(new_v, manifest)
            self._write_op_marker(new_v, "compact")
            self._write_schema(self._version_dir(new_v), schema)
        except Exception:
            # post-materialize bookkeeping (stats/Blooms/CDF/manifest/
            # schema) failing must not leave a vacuum-immune orphan
            # claim any more than the data write itself failing does
            self._discard_claim(new_v)
            raise
        return self._commit_or_rebase(
            new_v, v, schema, "compact", epoch, epoch_key
        )

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
        BY — N numeric columns (N ≥ 1; N × ``zorder_bits`` ≤ 62), each
        range-bucketed to ``zorder_bits`` and Morton-interleaved
        (``operators/skew.py::zorder_key_n``), then range-partitioned +
        sorted by the Z-value so every file covers a tight hyper-box in
        EVERY dimension: ``read_pruned`` skips files on ANY of the
        predicates, where ``cluster_by`` only prunes its leading
        column. More columns trade pruning depth per dimension (the
        usual Z-order trade-off — Delta's docs make the same warning).
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
            target_partitions = max(1, len(self.data_files(v)) // 8)
        if cluster_by:
            df = df.repartitionByRange(target_partitions, *cluster_by).sortWithinPartitions(
                *cluster_by
            )
        elif zorder_by:
            from end_to_end_azure_databricks_data_engineering_project_spark.operators.skew import zorder_key_n

            n = len(zorder_by)
            if n < 1:
                raise ValueError("compact: zorder_by needs at least one column")
            if zorder_bits < 1 or n * zorder_bits > 62:
                # zorder_key_n interleaves into int64: n*bits must stay
                # <= 62 — fail at the API boundary, not deep in the
                # expression builder with a literal-overflow error
                raise ValueError(
                    f"compact: {n} zorder columns x zorder_bits="
                    f"{zorder_bits} = {n * zorder_bits} interleaved bits; "
                    "must be >= 1 and <= 62"
                )
            reserved = ("__z",) + tuple(
                f"__zb{j}_{side}" for j in range(n) for side in ("lo", "hi")
            )
            clash = [c for c in reserved if c in df.columns]
            if clash:
                # withColumn would silently OVERWRITE a user column and
                # drop it — a content-preserving op must refuse instead
                raise ValueError(
                    f"compact: zorder_by reserves column name(s) {clash}; "
                    "rename them before z-ordering"
                )
            # bounds ride the plan as a 1-row broadcast aggregate — no
            # driver round-trip, and an empty or all-NULL column simply
            # yields NULL bounds (bucket()'s otherwise-0 branch)
            b = df.agg(*[
                agg for j, c in enumerate(zorder_by)
                for agg in (F.min(c).alias(f"__zb{j}_lo"),
                            F.max(c).alias(f"__zb{j}_hi"))
            ])
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
                    zorder_key_n(
                        [bucket(c, f"__zb{j}_lo", f"__zb{j}_hi")
                         for j, c in enumerate(zorder_by)],
                        zorder_bits,
                    ),
                )
                .repartitionByRange(target_partitions, "__z")
                .sortWithinPartitions("__z")
                .drop(*reserved)
            )
        else:
            df = df.coalesce(target_partitions)
        # content-identical rearrangement of EXISTING rows: column
        # policies must not fire (the frame legitimately carries the
        # identity/generated columns it is rewriting)
        return self.overwrite(
            df, expected_version=v, op="compact", _apply_policies=False
        )

    def _rebase_manifest(self, v: int) -> None:
        """Rewrite version ``v``'s manifest with its resolved full
        member list (content-identical — pure metadata), so its chain
        no longer crosses versions a vacuum is about to delete. Atomic
        replace; concurrent readers mid-walk retry via
        ``_resolve_current``."""
        m = self._manifest(v)
        if m is None or "files" in m:
            return
        names, stats = self._resolve(v)
        dv = self._resolve_dv(v)
        m["files"] = names
        m["stats_full"] = stats
        if dv:
            m["dv_full"] = dv  # resolved BEFORE files lands: chain intact
        m["depth"] = 0
        self._write_manifest_file(v, m)

    def vacuum(
        self,
        keep: int = 2,
        prune_epoch_prefixes: Sequence[str] = (),
        keep_epochs: int = 64,
    ) -> None:
        """Drop snapshot dirs older than the newest ``keep`` versions,
        prune their ledger entries (recording the prune point in
        ``committed_floor``), and garbage-collect store files no
        surviving version references — otherwise a long-lived streaming
        sink table would re-parse an ever-growing committed list on
        every pointer read and the shared store would grow forever.

        Store GC keeps every file referenced by a surviving version's
        resolved member list OR its ``removed`` list (the change feed
        reads removed files of retained merge commits), plus any file
        whose name embeds a version above the pointer — those belong
        to an in-flight writer whose commit hasn't landed yet, so GC
        is safe to run alongside active writers.

        ``prune_epoch_prefixes``: bound per-event epoch-key namespaces
        (e.g. ``("alert:",)`` — ``alert_hook`` records one write-once
        key per (run_id, flow), so a long-lived alerts table's pointer
        state would otherwise grow without bound and every pointer read
        would reparse it). For each prefix, all matching keys EXCEPT
        the ``keep_epochs`` most recently recorded ones are dropped
        from the pointer's epochs map. Replays of runs older than the
        retained window lose their idempotence guard (vacuum declares
        them settled) — the same durability contract as the snapshot
        prune itself. Cursor-style epoch keys (one monotonic watermark
        per stream) are naturally bounded and must NOT be pruned —
        never pass their prefixes here."""
        cur = self.current_version()
        keep_from_rebase = cur - keep + 1
        # retained manifests must not chain below the deletion horizon
        for d in sorted(self.dir.glob("v*")):
            v = int(d.name[1:])
            if v >= keep_from_rebase:
                m = self._manifest(v)
                if m is not None and "files" not in m and (
                    m["base"] is None or m["base"] < keep_from_rebase
                ):
                    try:
                        self._rebase_manifest(v)
                    except FileNotFoundError:
                        # an old aborted writer's orphan whose chain was
                        # already pruned — never readable; GC falls back
                        # to its raw added/files keys
                        pass
        # Deletion scope: committed history at/below the horizon, plus
        # EMPTY uncommitted claims (bare dirs from writers that died
        # right after claiming — they age out here as always). A
        # claimed-but-uncommitted dir with CONTENT (a staged manifest,
        # or write leftovers mid-materialize) is spared: it may be an
        # IN-FLIGHT append racing interleaved commits — its claim
        # number is below the pointer precisely because others outran
        # it (the r11 rebase-commit path) — and rmtree'ing it (then
        # GC'ing its staged store files, which only its presence
        # protects) would crash that writer mid-rebase. Dead-but-staged
        # orphans are vacuum_uncommitted's job, which requires the
        # no-active-writer contract for exactly this reason. Legacy
        # tables (no ledger) keep the old behavior.
        committed_set = self._pointer_state().get("committed")
        for d in sorted(self.dir.glob("v*")):
            v = int(d.name[1:])
            if v <= cur - keep and (
                committed_set is None
                or v in committed_set
                or not any(d.iterdir())
            ):
                shutil.rmtree(d, ignore_errors=True)
        self._gc_store(cur)
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
            dirty = False
            if any(x < keep_from for x in committed):
                state["committed"] = [x for x in committed if x >= keep_from]
                state["committed_floor"] = max(
                    state.get("committed_floor", 0), keep_from
                )
                dirty = True
            # bound namespaced per-event epoch keys: JSON object order is
            # insertion order and these keys are write-once, so the tail
            # of the iteration order IS the most recently recorded set
            for prefix in prune_epoch_prefixes:
                matching = [k for k in state["epochs"] if k.startswith(prefix)]
                drop = matching[:-keep_epochs] if keep_epochs > 0 else matching
                for k in drop:
                    del state["epochs"][k]
                    dirty = True
            # Delta log retention: expire commit JSONs below the newest
            # checkpoint (readers replay checkpoint + tail — that is
            # what _last_checkpoint already points them at), recording
            # the new floor for the heal completeness check. With the
            # automatic cadence this bounds a streaming sink's log at
            # ~checkpoint_interval commit files instead of one per
            # micro-batch forever.
            rec = state.get("delta")
            if rec is not None:
                self._heal_delta_log(state)  # never expire around a hole
                rec = state["delta"]  # heal may have restarted the log
                ck = deltalog.latest_checkpoint_at_or_below(
                    self.dir, rec["version"]
                )
                if ck is not None and ck >= rec.get("log_floor", 0):
                    # floor durable BEFORE any deletion: a crash in
                    # between leaves harmless sub-floor leftovers (the
                    # heal count ignores them; the >= guard lets the
                    # next vacuum finish sweeping), never a hole the
                    # heal would misread as corruption
                    if ck > rec.get("log_floor", 0):
                        rec["log_floor"] = ck
                        self._write_pointer_locked(state)
                        dirty = False
                    deltalog.expire_log(self.dir, ck)
            if dirty:
                self._write_pointer_locked(state)
        finally:
            self._release_commit_lock(fd)

    def _gc_store(self, pointer: int) -> None:
        """Delete store files no surviving version references. Safe
        alongside active writers: a file whose name embeds a version
        ABOVE the pointer belongs to a writer whose commit hasn't
        landed (its manifest may not exist yet) and is skipped — and so
        is a file whose embedded version matches a claimed dir that has
        no manifest YET even when the pointer has already moved past it
        (interleaved commits outrunning a slow writer between its
        store move and its manifest write — the rebase-commit pattern
        makes sub-pointer claims a live state, not just dead orphans).
        Once the commit lands its files are referenced; if the writer
        lost its race or crashed, a later pass (after vacuum aged out
        the manifest-less claim dir) collects them."""
        if not self.store.exists():
            return
        claimed_unmanifested: set[int] = set()
        referenced: set[str] = set()
        for d in self.dir.glob("v*"):
            m = self._manifest(int(d.name[1:]))
            if m is None:
                claimed_unmanifested.add(int(d.name[1:]))
                continue
            try:
                names, _ = self._resolve(int(d.name[1:]))
                referenced.update(names)
            except FileNotFoundError:  # unresolvable orphan: raw keys
                referenced.update(m.get("files", ()))
                referenced.update(m.get("added", ()))
            # the change feed reads RETAINED merge commits' removed
            # files — keep them until their version is vacuumed
            referenced.update(m.get("removed", ()))
        cdc_referenced: set[str] = set()
        dv_referenced: set[str] = set()
        for d in self.dir.glob("v*"):
            m = self._manifest(int(d.name[1:]))
            if m is not None:
                cdc_referenced.update(m.get("cdc", ()))
                for entries in (m.get("dv_added") or {}).values():
                    dv_referenced.update(n for n, _ in entries)
                for entries in (m.get("dv_full") or {}).values():
                    dv_referenced.update(n for n, _ in entries)
        for f in self.store.rglob("*.parquet"):
            if str(f.relative_to(self.store)) in referenced:
                continue
            try:
                # f/u/c prefix up to the first '-' (NOT a fixed-width
                # slice: past version 999,999 the zero-padding widens
                # and a 6-char slice would misparse LOW, defeating the
                # in-flight guard and deleting a live writer's files)
                embedded_v = int(f.name.split("-", 1)[0][1:])
            except ValueError:
                continue  # foreign file: never ours to delete
            if embedded_v > pointer or embedded_v in claimed_unmanifested:
                continue  # in-flight writer's file
            f.unlink(missing_ok=True)
        # change-data files age out with the version that recorded them
        cdir = self.dir / "_change_data"
        if cdir.exists():
            for f in cdir.glob("cdc-*.parquet"):
                if f.name in cdc_referenced:
                    continue
                try:
                    embedded_v = int(f.name.split("-")[1])
                except (ValueError, IndexError):
                    continue
                if embedded_v > pointer:
                    continue
                f.unlink(missing_ok=True)
        # deletion-vector tombstones age out when no retained manifest
        # references them (same contract as cdc files)
        dvdir = self._dv_dir()
        if dvdir.exists():
            for f in dvdir.glob("dv-*.parquet"):
                if f.name in dv_referenced:
                    continue
                try:
                    embedded_v = int(f.name.split("-")[1])
                except (ValueError, IndexError):
                    continue
                if embedded_v > pointer:
                    continue
                f.unlink(missing_ok=True)
        # sweep hive partition dirs the GC emptied
        for d in sorted(
            (p for p in self.store.rglob("*") if p.is_dir()), reverse=True
        ):
            try:
                d.rmdir()
            except OSError:
                pass

    def vacuum_uncommitted(self) -> None:
        """Remove orphan version dirs left by crashed or losing writers
        (claimed-but-never-committed dirs above the pointer), then
        sweep the store files only they referenced. Only call when no
        writer is active on this table."""
        cur = self.current_version()
        for d in sorted(self.dir.glob("v*")):
            if int(d.name[1:]) > cur:
                shutil.rmtree(d, ignore_errors=True)
        # with the orphan manifests gone their files are unreferenced;
        # pointer bound = +inf because the no-active-writer contract
        # makes every above-pointer leftover garbage by definition
        self._gc_store(float("inf"))

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
        res = self._resolve(version)
        return self._read_version(version, res[0] if res is not None else None)

    def read_delta_version(self, dv: int) -> DataFrame:
        """Delta ``VERSION AS OF dv`` time travel: ``dv`` is a DELTA
        LOG version (the contiguous commit count ``history()`` /
        DESCRIBE HISTORY show — NOT the engine's internal snapshot
        number, which can gap across aborted writers), resolved through
        the commit's recorded mtVersion. Raises when the commit is
        unknown or expired below the checkpoint floor (log retention —
        same contract as ``read_at``)."""
        try:
            for a in deltalog.read_actions(self.dir, dv):
                ci = a.get("commitInfo")
                if ci is not None and ci.get("mtVersion") is not None:
                    return self.read_at(ci["mtVersion"])
        except FileNotFoundError:
            pass
        raise ValueError(
            f"table {self.name}: no readable delta commit {dv} (never "
            "committed, or expired by log retention below the checkpoint "
            "floor)"
        )

    def read_as_of(self, ts) -> DataFrame:
        """Delta ``TIMESTAMP AS OF`` time travel: the snapshot of the
        latest commit whose (monotonically adjusted) commit timestamp
        is <= ``ts``. Accepts a ``datetime``, an ISO-8601 string, or
        epoch milliseconds. Commit timestamps come from the transaction
        log's commitInfo actions and are adjusted exactly like Delta's
        reader — a commit stamped earlier than its predecessor (clock
        skew) is treated as predecessor+1ms, so the mapping from time
        to version is always monotone. Raises when ``ts`` predates the
        earliest RETAINED commit (log files below the checkpoint floor
        are expired by vacuum — same retention contract as
        ``read_at``)."""
        return self.read_at(self._version_as_of(ts))

    def restore_as_of(self, ts) -> int:
        """Delta ``RESTORE TABLE t TO TIMESTAMP AS OF``: roll the table
        back to the snapshot live at instant ``ts`` (same resolution
        rules as ``read_as_of``) — committed as a NEW forward version
        like ``restore(v)``, zero rewrite."""
        return self.restore(self._version_as_of(ts))

    def _version_as_of(self, ts) -> int:
        """Resolve an instant (datetime / ISO string / epoch ms) to the
        ManagedTable version of the latest commit whose monotonically
        adjusted commitInfo timestamp is <= ``ts``."""
        import datetime as _dt

        if isinstance(ts, str):
            ts = _dt.datetime.fromisoformat(ts)
        if isinstance(ts, _dt.datetime):
            if ts.tzinfo is None:
                # naive instants are LOCAL wall-clock (Delta resolves a
                # naive TIMESTAMP AS OF in the session timezone; a UTC
                # reinterpretation would silently shift the target by
                # the zone offset)
                ts = ts.astimezone()
            target_ms = int(ts.timestamp() * 1000)
        else:
            target_ms = int(ts)
        candidate = None
        adjusted = -1
        earliest = None
        for p in deltalog.commit_files(self.dir):
            v = int(p.stem)
            for a in deltalog.read_actions(self.dir, v):
                ci = a.get("commitInfo")
                if ci is None:
                    continue
                adjusted = max(ci["timestamp"], adjusted + 1)
                if earliest is None:
                    earliest = adjusted
                if adjusted <= target_ms:
                    candidate = ci.get("mtVersion")
                break
        if candidate is None:
            raise ValueError(
                f"table {self.name}: no commit at or before {target_ms} ms"
                + (
                    f" (earliest retained commit is at {earliest} ms)"
                    if earliest is not None
                    else " (no transaction log)"
                )
            )
        return candidate

    # -- CHECK constraints (Delta ALTER TABLE ADD CONSTRAINT) ---------------
    def constraints(self) -> dict:
        """The table's committed CHECK constraints, ``{name: sql_expr}``."""
        return dict(self.table_prop("constraints") or {})

    def add_constraint(self, name: str, expr: str) -> None:
        """Delta ``ALTER TABLE ADD CONSTRAINT name CHECK (expr)``: first
        VALIDATES the current snapshot (one scan; any row where ``expr``
        is FALSE fails the add — NULL passes, SQL CHECK semantics), then
        binds the constraint as a committed table property under the
        commit lock. Every subsequent write (append / overwrite / merge
        / DML rewrite) enforces it IN the write itself — a per-row
        guard expression rides the output projection (no extra pass),
        raising before any violating file can land.

        The Delta log surfaces the constraint as
        ``delta.constraints.<name>`` in metaData.configuration — on the
        NEXT data commit (delta versions here are 1:1 with table
        commits, so there is no metadata-only commit like Delta's; the
        engine enforces from the pointer property immediately either
        way).

        Validate-then-bind is NOT a TOCTOU hole: the bind re-checks the
        pointer version UNDER the commit lock and re-validates if a
        write landed between the scan and the bind (the scan itself
        never runs inside the lock — it is a Spark job, and holding the
        flock through it would spin concurrent writers into their lock
        deadline). The remaining documented race is Delta's own: a
        writer already PAST its output projection when the constraint
        binds commits unchecked rows."""
        for _ in range(8):
            validated_v = self.current_version() if self.exists() else -1
            if validated_v >= 0:
                viol = (
                    self.read()
                    .filter(~F.coalesce(F.expr(expr).cast("boolean"), F.lit(True)))
                    .limit(1)
                    .count()
                )
                if viol:
                    raise ValueError(
                        f"cannot add CHECK constraint {name} ({expr}) to table "
                        f"{self.name}: existing rows violate it"
                    )
            fd = self._acquire_commit_lock()
            try:
                state = self._pointer_state()
                if state["version"] != validated_v:
                    continue  # a write landed mid-scan: re-validate at the new head
                cons = state.setdefault("props", {}).setdefault("constraints", {})
                have = cons.get(name)
                if have is not None and have != expr:
                    raise ConcurrentWriteError(
                        f"table {self.name}: CHECK constraint {name} already "
                        f"bound to ({have}); drop it first"
                    )
                cons[name] = expr
                self._write_pointer_locked(state)
                return
            finally:
                self._release_commit_lock(fd)
        raise ConcurrentWriteError(
            f"table {self.name}: could not bind CHECK constraint {name} — "
            "a concurrent writer landed between every validation scan and "
            "its bind (8 attempts); quiesce writers and retry"
        )

    def drop_constraint(self, name: str, if_exists: bool = False) -> None:
        """Delta ``ALTER TABLE DROP CONSTRAINT``."""
        fd = self._acquire_commit_lock()
        try:
            state = self._pointer_state()
            cons = state.get("props", {}).get("constraints", {})
            if name not in cons:
                if if_exists:
                    return
                raise KeyError(
                    f"table {self.name} has no CHECK constraint {name}"
                )
            del cons[name]
            self._write_pointer_locked(state)
        finally:
            self._release_commit_lock(fd)

    def _constraint_guard(
        self, df: DataFrame, partition_by: Sequence[str] | None
    ) -> DataFrame:
        """Weave the committed CHECK constraints into ``df``'s output
        projection: a violating row raises (with the row's JSON) before
        it can be written — zero extra passes, Delta's write-side
        enforcement. The guard wraps one atomic-typed column with a
        ``CASE WHEN violated THEN raise_error(...) ELSE value END`` that
        preserves the value and type for every compliant row; a frame
        with no atomic column falls back to an eager one-row violation
        probe (extra job, but such schemas are vanishingly rare)."""
        cons = self._pointer_state().get("props", {}).get("constraints") or {}
        if not cons:
            return df
        from pyspark.sql.types import (
            BooleanType, DateType, NumericType, StringType, TimestampNTZType,
            TimestampType,
        )

        def _violation(cexpr: str):
            return ~F.coalesce(F.expr(cexpr).cast("boolean"), F.lit(True))

        pset = set(partition_by or [])
        atomic = (
            StringType, NumericType, BooleanType, DateType, TimestampType,
            TimestampNTZType,
        )
        target = next(
            (
                f.name
                for f in df.schema.fields
                if f.name not in pset and isinstance(f.dataType, atomic)
            ),
            None,
        )
        if target is None:  # eager fallback: probe for one violation
            for cname, cexpr in sorted(cons.items()):
                if df.filter(_violation(cexpr)).limit(1).count():
                    raise ValueError(
                        f"CHECK constraint {cname} ({cexpr}) violated on "
                        f"write to table {self.name}"
                    )
            return df
        ttype = df.schema[target].dataType
        guard = F.col(target)
        row_json = F.to_json(F.struct(*[F.col(c) for c in df.columns]))
        for cname, cexpr in sorted(cons.items()):
            guard = F.when(
                _violation(cexpr),
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"CHECK constraint {cname} ({cexpr}) violated "
                            f"on write to table {self.name} by row: "
                        ),
                        row_json,
                    )
                ).cast(ttype),
            ).otherwise(guard)
        return df.withColumn(target, guard)

    def _copy_schema(self, src_v: int, dst_dir: Path) -> None:
        src = self._version_dir(src_v) / "_schema.json"
        if src.exists():
            shutil.copy2(src, dst_dir / "_schema.json")

    def restore(self, version: int) -> int:
        """Delta-RESTORE semantics: commit a NEW version whose content
        is snapshot ``version``. History only moves forward — the
        versions being rolled past stay readable for audit/time travel
        until vacuumed — and no data moves at all: the restore commit
        is a full manifest referencing the old snapshot's store files
        (a legacy source snapshot is linked into the store once).

        The restore commit is a snapshot barrier for ``appended_since``
        (op marker != append), so incremental consumers correctly fall
        back to a rebuild instead of silently missing the rollback."""
        self._require_complete(version)
        names, stats, upgraded = self._snapshot_members(version)
        src_m = self._manifest(version) or {}
        new_v = self._claim_next_version()
        manifest: dict = {
            "base": None, "depth": 0, "added": [], "removed": [],
            "stats": {}, "files": names, "stats_full": stats,
            "partition_columns": src_m.get("partition_columns", []),
        }
        # the target's deletion-vector state is part of its CONTENT —
        # restoring files without their tombstones would resurrect
        # small-deleted rows
        dv = {} if upgraded else self._resolve_dv(version)
        if dv:
            manifest["dv_full"] = dv
        if upgraded:
            manifest["upgrade"] = True
        self._write_manifest_file(new_v, manifest)
        self._copy_schema(version, self._version_dir(new_v))
        self._write_op_marker(new_v, "restore")
        try:
            self._commit(new_v)
        except ConcurrentWriteError:
            # loser self-cleanup (added is empty — the restore manifest
            # only references committed snapshots' files, so only the
            # claim dir itself goes)
            self._discard_claim(new_v)
            raise
        return new_v

    def clone_to(self, target: "ManagedTable") -> int:
        """Shallow clone (Delta SHALLOW CLONE): commit the current
        snapshot into ``target`` by hardlinking its store files — zero
        data copy, stats and schema carried over, and the clone's
        history starts fresh at its own v0+. Files are immutable, so
        shared inodes are safe. Target must be empty (a clone is a
        create, not a merge).

        Linked files are RENAMED to embed the TARGET's claimed version
        (``f{new_v}-{i}-{token}``, fresh token — collision-free like
        every store name): the source's names embed ITS possibly much
        higher versions, and ``_gc_store``'s in-flight guard (name-
        embedded version > pointer ⇒ spare) would otherwise retain
        such files long after the clone commit itself was vacuumed —
        a conservative but unbounded storage leak on clones of
        long-histories tables."""
        if target.exists():
            raise ValueError(
                f"clone target {target.name} already has committed versions"
            )
        # ONE pointer-state read supplies both the cloned version and
        # the carried props: reading them separately would let a
        # concurrent commit slip a NEWER prop (e.g. a drain-WAL digest)
        # onto a clone of OLDER data, silently skipping that batch's
        # replay into the clone.
        state = self._pointer_state()
        cur = state["version"]
        if cur < 0:
            raise FileNotFoundError(f"table {self.name} has no committed version")
        names, stats, _ = self._snapshot_members(cur)
        pcols = self.partition_columns()
        # Delta SHALLOW CLONE carries table properties: ALL committed
        # props copy over — partitioning and enable_cdf keep the
        # clone's write behavior identical, and semantic bindings
        # (auc_binning, stream identities) carrying over means a
        # mismatched drain against the cloned DATA refuses loudly
        # instead of silently co-mingling under a fresh first-binder.
        # Epoch watermarks (transaction state) intentionally do NOT
        # carry — the clone's history starts fresh.
        src_props = dict(state.get("props", {}))
        dv_map = self._resolve_dv(cur)
        dirty = [n for n in names if dv_map.get(n)]
        if dirty:
            # a DV'd file's tombstones tag the SOURCE basenames and live
            # in the SOURCE's _deletion_vectors/ — hardlinking would
            # resurrect the deleted rows in the clone. Materialize the
            # FOLDED content for just those files (bounded: DV'd files
            # are small-delete targets), hardlink the clean rest.
            clean = [n for n in names if not dv_map.get(n)]
            folded = self._read_members(dirty, self.table_schema(cur), dv_map)
            new_v = target._claim_next_version()
            target.store.mkdir(exist_ok=True)
            try:
                pcols_src = self.partition_columns()
                mat_names = target._materialize(new_v, folded, pcols_src)
                mat_stats = target._collect_stats_for(
                    mat_names, pcols_src, self.table_schema(cur)
                )
                link_names, link_stats = _relink_store_files(
                    self.store,
                    clean,
                    {n: stats[n] for n in clean if n in stats},
                    target.store,
                    new_v,
                )
            except Exception:
                target._discard_claim(new_v)
                raise
            new_names = link_names + mat_names
            new_stats = {**link_stats, **mat_stats}
            target._write_manifest_file(new_v, {
                "base": None, "depth": 0, "added": new_names, "removed": [],
                "stats": new_stats, "files": new_names, "stats_full": new_stats,
                "partition_columns": pcols,
            })
            self._copy_schema(cur, target._version_dir(new_v))
            target._write_op_marker(new_v, "clone")
            try:
                target._commit(new_v, set_props=src_props or None)
            except ConcurrentWriteError:
                target._discard_claim(new_v)
                raise
            return new_v
        new_v = target._claim_next_version()
        target.store.mkdir(exist_ok=True)
        new_names, new_stats = _relink_store_files(
            self.store, names, stats, target.store, new_v
        )
        target._write_manifest_file(new_v, {
            "base": None, "depth": 0, "added": new_names, "removed": [],
            "stats": new_stats, "files": new_names, "stats_full": new_stats,
            "partition_columns": pcols,
        })
        self._copy_schema(cur, target._version_dir(new_v))
        target._write_op_marker(new_v, "clone")
        try:
            target._commit(new_v, set_props=src_props or None)
        except ConcurrentWriteError:
            # loser self-cleanup: the relinked target-store files embed
            # a version above the target's pointer, so _gc_store's
            # in-flight guard would otherwise spare them indefinitely
            target._discard_claim(new_v)
            raise
        return new_v

    def cluster_columns(self) -> list[str]:
        """The table's liquid-clustering columns (Databricks ``CLUSTER
        BY``), or [] when unclustered. Unlike partitioning these are
        MUTABLE (``ALTER TABLE … CLUSTER BY``) and advisory: writes land
        unclustered, ``OPTIMIZE`` range-clusters on them — Databricks'
        own incremental-clustering contract."""
        raw = self.table_prop("cluster_columns")
        return json.loads(raw) if raw else []

    def set_cluster_columns(self, cols: Sequence[str] | None) -> None:
        """Bind (or clear, ``cols=None``) the liquid-clustering columns
        under the commit lock — Databricks ``ALTER TABLE t CLUSTER BY
        (…) | NONE``. Columns must exist in the committed schema; takes
        effect on the next OPTIMIZE (no data rewrite here, matching
        Databricks: re-clustering is OPTIMIZE's job)."""
        if cols:
            schema = self.table_schema()
            have = {f.name for f in schema.fields} if schema else set()
            missing = [c for c in cols if c not in have]
            if missing:
                raise ValueError(
                    f"CLUSTER BY on {self.name}: unknown column(s) "
                    f"{missing}"
                )
            if self.partition_columns():
                raise ValueError(
                    f"table {self.name}: CLUSTER BY and PARTITIONED BY "
                    "are mutually exclusive (Databricks rule)"
                )
        fd = self._acquire_commit_lock()
        try:
            state = self._pointer_state()
            props = state.setdefault("props", {})
            if cols:
                props["cluster_columns"] = json.dumps(list(cols))
            else:
                props.pop("cluster_columns", None)
            self._write_pointer_locked(state)
        finally:
            self._release_commit_lock(fd)

    def copy_into(
        self,
        source_dir: str | os.PathLike[str],
        pattern: str | None = None,
        file_format: str = "parquet",
    ) -> dict:
        """Databricks ``COPY INTO``: idempotent, file-level exactly-once
        batch load — each source file is loaded AT MOST ONCE into the
        table no matter how many times the statement re-runs (the
        retryable-ingest verb; ≙ the reference's ADF copy activity with
        the watermark replaced by per-file tracking).

        Loaded-file state lives in a ledger sidecar
        (``_copy_ledger/<gen>-<digest>.json``) referenced by the
        ``copy_into_ledger`` table property; the reference advances
        ATOMICALLY with the data commit, and the append rides the epoch
        guard (epoch = ledger generation), so a crash between any two
        steps — or two concurrent COPY INTO runs discovering the same
        files — commits the batch exactly once (the loser's append is
        skipped in-lock; files it saw that the winner didn't stay
        unseen and load on the next run). Ledger size is O(total files
        ever loaded) — the same state Databricks keeps for COPY INTO.

        New files append through the normal write path: schema enforced
        against the committed one (missing nullable columns null-fill,
        extras raise), column policies (identity/generated) apply, the
        transaction log records the commit. A nonexistent table is
        created from the files' merged schema. Returns
        ``{num_files_loaded, num_rows_loaded, version}`` (version None
        when nothing new)."""
        import fnmatch
        import hashlib

        if file_format.lower() != "parquet":
            raise ValueError(
                f"COPY INTO {self.name}: FILEFORMAT = "
                f"{file_format.upper()} is not supported (PARQUET only)"
            )
        src = Path(source_dir)
        files = sorted(
            str(p) for p in src.rglob("*.parquet")
            if not p.name.startswith(("_", "."))
        )
        if pattern is not None:
            files = [
                f for f in files
                if fnmatch.fnmatch(os.path.relpath(f, src), pattern)
            ]
        old_ref = self.table_prop("copy_into_ledger")
        ledger_dir = self.dir / "_copy_ledger"
        seen: set[str] = set()
        gen = 0
        if old_ref:
            seen = set(json.loads((ledger_dir / old_ref).read_text()))
            gen = int(old_ref.split("-", 1)[0])
        new = [f for f in files if f not in seen]
        if not new:
            return {
                "num_files_loaded": 0, "num_rows_loaded": 0, "version": None,
            }
        payload = json.dumps(sorted(seen | set(new)))
        ref = (
            f"{gen + 1}-"
            + hashlib.md5(payload.encode()).hexdigest()
            + ".json"
        )
        ledger_dir.mkdir(parents=True, exist_ok=True)
        (ledger_dir / ref).write_text(payload)
        df = self.spark.read.option("mergeSchema", "true").parquet(*new)
        v = self.append(
            df,
            epoch=gen + 1,
            epoch_key="copy_into",
            set_props={"copy_into_ledger": ref},
        )
        if v is None:  # concurrent run won the generation: nothing loaded
            (ledger_dir / ref).unlink(missing_ok=True)
            return {
                "num_files_loaded": 0, "num_rows_loaded": 0, "version": None,
            }
        m = self._manifest(v)
        rows = sum(
            (m["stats"].get(n) or {}).get("rows") or 0 for n in m["added"]
        )
        return {
            "num_files_loaded": len(new),
            "num_rows_loaded": rows,
            "version": v,
        }


class Catalog:
    """Tiny namespace of ManagedTables (≙ Unity Catalog schema binding,
    reference ``databricks.yml``/``spotify_dab.pipeline.yml`` catalog/schema)."""

    def __init__(self, spark: SparkSession, root: str | os.PathLike[str]):
        self.spark = spark
        self.root = Path(root)

    def table(self, name: str) -> ManagedTable:
        return ManagedTable(self.spark, self.root, name)

    def _existing_table(self, name: str) -> ManagedTable:
        """A handle to a table that must already exist — checked BEFORE
        construction, because ``ManagedTable.__init__`` mkdirs its
        directory: ad-hoc DML against a typo'd table (or a mistyped
        warehouse path) must fail loudly, not leave phantom dirs."""
        if not (self.root / name).is_dir():
            raise ValueError(
                f"no such table {name!r} in warehouse {self.root}"
            )
        return self.table(name)

    def register_views(self) -> None:
        """Expose every committed table as a temp view for spark.sql(),
        then every persisted VIEW definition (``_views.json``) on top.

        Non-directory entries in the root (editor backups, stray
        manifests) are skipped — constructing a ManagedTable on one
        would hit mkdir(FileExistsError) and abort every registration.
        A not-yet-created warehouse root registers nothing (the first
        INSERT INTO a fresh catalog must not crash on the listing).

        Views re-resolve against the CURRENT table snapshots on every
        registration (every ``sql()`` call re-registers), so a view
        always reflects the latest committed data. Views may reference
        other views — registration iterates to a fixpoint, so
        definition order never matters; a view whose dependency is
        gone simply stays unregistered (querying it then fails with
        Spark's own missing-relation error)."""
        if not self.root.is_dir():
            return
        for d in sorted(self.root.iterdir()):
            if not d.is_dir():
                continue
            t = ManagedTable(self.spark, self.root, d.name)
            if t.exists():
                t.read().createOrReplaceTempView(d.name)
        pending = dict(self._load_views())
        for _ in range(len(pending)):
            if not pending:
                break
            for name, text in list(pending.items()):
                try:
                    self.spark.sql(text).createOrReplaceTempView(name)
                    del pending[name]
                except Exception:
                    continue  # dependency not registered yet — next pass

    @property
    def _views_path(self) -> Path:
        return self.root / "_views.json"

    def _load_views(self) -> dict[str, str]:
        p = self._views_path
        return json.loads(p.read_text()) if p.exists() else {}

    def _save_views(self, views: dict[str, str]) -> None:
        self.root.mkdir(parents=True, exist_ok=True)
        tmp = self._views_path.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(views, indent=1, sort_keys=True))
        tmp.replace(self._views_path)  # atomic swap, like the watermark doc

    # statement shapes sql() routes to the DML verbs (Delta SQL DML on
    # managed tables — Spark's parser rejects DELETE/UPDATE/MERGE
    # against temp views, so the catalog dispatches them itself).
    # Verb-first: ANY statement starting with one of these verbs is
    # handled (or rejected with a precise error) here — never silently
    # passed to spark.sql to die with an obscure parser error.
    _DML_VERB_RE = re.compile(
        r"^\s*(DELETE|UPDATE|MERGE|INSERT|COPY)\b", re.IGNORECASE
    )
    _COPY_RE = re.compile(
        r"^\s*COPY\s+INTO\s+(\S+)\s+FROM\s+'([^']+)'\s+"
        r"FILEFORMAT\s*=\s*(\w+)(?:\s+PATTERN\s*=\s*'([^']+)')?\s*;?\s*$",
        re.IGNORECASE,
    )
    _INSERT_RE = re.compile(
        r"^\s*INSERT\s+(INTO|OVERWRITE)\s+(?:TABLE\s+)?"
        r"([A-Za-z_]\w*|\S+)\s*(.+?)\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    _BARE_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")
    _DELETE_RE = re.compile(
        r"^\s*DELETE\s+FROM\s+(\S+)\s*(.*?)\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    _UPDATE_RE = re.compile(
        r"^\s*UPDATE\s+(\S+)\s+SET\s+(.+?)\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    _MERGE_RE = re.compile(
        r"^\s*MERGE\s+INTO\s+(\S+)(?:\s+(?:AS\s+)?(?!USING\b)([A-Za-z_]\w*))?"
        r"\s+USING\s+(.+?)\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )

    @staticmethod
    def _toplevel_mask(text: str, parens: bool = True) -> list[bool]:
        """Per-character flag: True where the char sits OUTSIDE any
        string literal at parenthesis depth 0 (``parens=False`` skips
        the depth requirement — literal-awareness only, for rewrites
        that must also apply inside subqueries). Models Spark SQL's
        FULL literal syntax — single- OR double-quoted strings,
        backslash escapes (the parser default,
        escapedStringLiterals=false), and quote doubling — so routing
        splits (WHERE keywords, assignment commas) can never fire
        inside literal content like ``'use where needed'``, ``"a, b"``,
        or ``'it\\'s, fine'``."""
        n = len(text)
        mask = [False] * n
        depth = 0
        quote: str | None = None
        i = 0
        while i < n:
            ch = text[i]
            if quote is not None:
                if ch == "\\":
                    i += 2  # escaped char (incl. \' / \") stays literal
                    continue
                if ch == quote:
                    if i + 1 < n and text[i + 1] == quote:
                        i += 2  # '' / "" doubling
                        continue
                    quote = None
                i += 1
                continue
            if ch in "'\"":
                quote = ch
            elif ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
            else:
                mask[i] = depth == 0 or not parens
            i += 1
        return mask

    @classmethod
    def _split_on_where(cls, text: str) -> tuple[str, str] | None:
        """Split at the FIRST top-level WHERE keyword — outside string
        literals (single/double-quoted, escape-aware) and parentheses,
        so a SET value like ``'use where needed'`` or a scalar subquery
        never splits."""
        mask = cls._toplevel_mask(text)
        for m in re.finditer(r"(?i)\bwhere\b", text):
            if mask[m.start()]:
                return text[: m.start()].rstrip(), text[m.end():].lstrip()
        return None

    @classmethod
    def _split_assignments(cls, clause: str) -> dict:
        """Split ``a = expr, b = expr`` on TOP-LEVEL commas (commas
        inside parentheses or string literals — single/double-quoted,
        escape-aware — don't split)."""
        mask = cls._toplevel_mask(clause)
        parts: list[str] = []
        last = 0
        for i, ch in enumerate(clause):
            if ch == "," and mask[i]:
                parts.append(clause[last:i])
                last = i + 1
        parts.append(clause[last:])
        out = {}
        for p in parts:
            col, eq, expr = p.partition("=")
            if not eq or not col.strip() or not expr.strip():
                raise ValueError(f"unparseable SET assignment: {p.strip()!r}")
            out[col.strip()] = expr.strip()
        return out

    @classmethod
    def _keyword_splits(cls, text: str, word: str) -> list[tuple[int, int]]:
        """(start, end) spans of every TOP-LEVEL occurrence of keyword
        ``word`` — outside string literals and parentheses."""
        mask = cls._toplevel_mask(text)
        return [
            (m.start(), m.end())
            for m in re.finditer(rf"(?i)\b{word}\b", text)
            if mask[m.start()]
        ]

    def _dml_table(self, raw: str, verb: str) -> ManagedTable:
        """Resolve a DML statement's target table name, rejecting the
        shapes the router can't honor with a PRECISE error (qualified
        and backquoted names would otherwise fall through to spark.sql
        and die with an obscure parser error against temp views)."""
        if not self._BARE_IDENT_RE.match(raw):
            raise ValueError(
                f"{verb} on {raw!r}: qualified or backquoted table names "
                "are not supported by the catalog DML router — use the "
                "bare managed-table name (tables live in ONE warehouse "
                "root; there is no multi-schema namespace to qualify)"
            )
        return self._existing_table(raw)

    def _sql_merge(self, statement: str):
        """``MERGE INTO t [AS a] USING src [AS s] ON <equi-keys>
        WHEN MATCHED [AND <src cond>] THEN DELETE /
        WHEN MATCHED THEN UPDATE SET * /
        WHEN NOT MATCHED THEN INSERT *``
        — routed onto ``merge_keyed`` (stats/Bloom-pruned file
        rewrites, CDF, transaction log — identical to the Python
        verb). The supported subset is exactly the Databricks
        upsert/CDC idiom (reference DimUser.py:20-29 semantics);
        column-list SET/INSERT forms and conditions that need BOTH
        rows raise with the Python-API pointer instead of
        mis-executing."""
        m = self._MERGE_RE.match(statement)
        if m is None:
            raise ValueError(
                "unsupported MERGE shape; expected MERGE INTO <t> [AS a] "
                "USING <table | (subquery)> [AS s] ON <cond> WHEN ... "
                "(for anything fancier use ManagedTable.merge_keyed)"
            )
        target_raw, target_alias, rest = m.group(1), m.group(2), m.group(3)
        table = self._dml_table(target_raw, "MERGE INTO")
        on_spans = self._keyword_splits(rest, "ON")
        if not on_spans:
            raise ValueError("MERGE requires an ON <condition> clause")
        src_part = rest[: on_spans[0][0]].strip()
        tail = rest[on_spans[0][1]:]
        when_spans = self._keyword_splits(tail, "WHEN")
        if not when_spans:
            raise ValueError(
                "MERGE requires at least one WHEN MATCHED / WHEN NOT "
                "MATCHED clause"
            )
        on_cond = tail[: when_spans[0][0]].strip()
        clauses = [
            tail[e: when_spans[i + 1][0] if i + 1 < len(when_spans) else len(tail)]
            .strip()
            for i, (s, e) in enumerate(when_spans)
        ]
        # -- source: managed table, temp view, or (subquery) [AS alias]
        src_alias = None
        src_name = None
        if src_part.startswith("("):
            # the subquery body ends at the LAST close paren; anything
            # after is the alias
            close = src_part.rfind(")")
            inner = src_part[1:close]
            alias_part = src_part[close + 1:].strip()
            if alias_part:
                am = re.match(r"(?i)^(?:AS\s+)?([A-Za-z_]\w*)$", alias_part)
                if am is None:
                    raise ValueError(
                        f"unparseable MERGE source alias {alias_part!r}"
                    )
                src_alias = am.group(1)
            self.register_views()
            src = self.spark.sql(inner)
        else:
            sm = re.match(
                r"(?i)^(\S+)(?:\s+(?:AS\s+)?([A-Za-z_]\w*))?$", src_part
            )
            if sm is None:
                raise ValueError(f"unparseable MERGE source {src_part!r}")
            src_name, src_alias = sm.group(1), sm.group(2)
            if self._BARE_IDENT_RE.match(src_name) and (
                self.root / src_name
            ).is_dir():
                src = self.table(src_name).read()
            else:
                self.register_views()
                src = self.spark.table(src_name)
        # -- ON: conjunction of same-named equi-join keys (a bare
        # table/view name is its own implicit alias, SQL scoping rules)
        aliases = {
            a for a in (target_alias, src_alias, target_raw, src_name) if a
        }
        keys: list[str] = []
        lo = 0
        conjuncts = []
        for s, e in self._keyword_splits(on_cond, "AND"):
            conjuncts.append(on_cond[lo:s])
            lo = e
        conjuncts.append(on_cond[lo:])
        qid = r"(?:([A-Za-z_]\w*)\.)?([A-Za-z_]\w*)"
        for c in conjuncts:
            cm = re.match(rf"^\s*{qid}\s*=\s*{qid}\s*$", c)
            if cm is None:
                raise ValueError(
                    f"MERGE ON clause {c.strip()!r}: only a conjunction "
                    "of column equalities is routable (range/expression "
                    "joins: use ManagedTable.merge_keyed)"
                )
            q1, c1, q2, c2 = cm.groups()
            if c1 != c2:
                raise ValueError(
                    f"MERGE ON {c.strip()!r}: key columns must have the "
                    "SAME name on both sides (rename in the source "
                    "subquery)"
                )
            for q in (q1, q2):
                if q is not None and q not in aliases:
                    raise ValueError(
                        f"MERGE ON references unknown alias {q!r}"
                    )
            keys.append(c1)
        # -- WHEN clauses (the Databricks upsert/CDC subset)
        upd = ins = False
        del_cond: str | None = None
        has_del = False
        by_source_del = False
        for c in clauses:
            if re.match(r"(?is)^MATCHED\s+THEN\s+UPDATE\s+SET\s+\*$", c):
                upd = True
            elif re.match(
                r"(?is)^NOT\s+MATCHED\s+BY\s+SOURCE\s+THEN\s+DELETE$", c
            ):
                # full-sync idiom: target rows with no source match are
                # deleted — forces the merge onto the full-scope path
                # (every target key is a deletion candidate, so
                # batch-key file pruning would under-delete)
                by_source_del = True
            elif re.match(
                r"(?is)^NOT\s+MATCHED\s+(?:BY\s+TARGET\s+)?THEN\s+"
                r"INSERT\s+\*$",
                c,
            ):
                ins = True
            else:
                dm = re.match(
                    r"(?is)^MATCHED\s+(?:AND\s+(.+?)\s+)?THEN\s+DELETE$", c
                )
                if dm:
                    has_del = True
                    del_cond = dm.group(1)
                    continue
                raise ValueError(
                    f"unsupported MERGE clause 'WHEN {c}': the router "
                    "handles WHEN MATCHED THEN UPDATE SET *, WHEN MATCHED "
                    "[AND <source-row cond>] THEN DELETE, WHEN NOT MATCHED "
                    "[BY TARGET] THEN INSERT *, and WHEN NOT MATCHED BY "
                    "SOURCE THEN DELETE (column lists / conditional "
                    "BY-SOURCE forms: use ManagedTable.merge_keyed)"
                )
        if not (upd or ins or has_del or by_source_del):
            raise ValueError("MERGE needs at least one actionable clause")
        target_cols = None
        if table.exists():
            stored = table.table_schema()
            if stored is not None:
                target_cols = [f.name for f in stored.fields]
        # Delta raises only when multiple source rows match the same
        # TARGET row (DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW) —
        # duplicate source keys that match NO target row are legal in
        # Databricks SQL (they simply all insert). One bounded aggregate
        # over the SOURCE (the small side by construction) finds
        # duplicated keys; only on that rare dirty path does a
        # key-column-pruned semi-join against the target decide whether
        # any duplicate actually matches (r13 — previously valid
        # statements with insert-only duplicates were rejected).
        if table.exists():
            dup_keys = src.groupBy(*keys).count().filter("count > 1")
            if dup_keys.limit(1).count() and (
                table.read().select(*keys)
                .join(F.broadcast(dup_keys.select(*keys)), keys, "left_semi")
                .limit(1)
                .count()
            ):
                raise ValueError(
                    "MERGE source has multiple rows per key matching the "
                    "same target row — nondeterministic (Delta raises "
                    "DELTA_MULTIPLE_SOURCE_ROW_MATCHING_TARGET_ROW here "
                    "too); deduplicate the source, e.g. latest-per-key in "
                    "the USING subquery"
                )

        def merge_fn(cur: DataFrame, b: DataFrame) -> DataFrame:
            cols = target_cols or b.columns
            missing = [c for c in cols if c not in b.columns]
            if missing:
                raise ValueError(
                    f"MERGE ... SET */INSERT *: source lacks target "
                    f"column(s) {missing}"
                )
            # evaluate the delete condition with the source alias in
            # scope (it typically references it: s.op = 'D'), then the
            # alias is no longer needed; a bare source table name is
            # its own implicit alias
            eff_alias = src_alias or src_name
            ba = b.alias(eff_alias) if eff_alias else b
            is_del = (
                F.coalesce(F.expr(del_cond).cast("boolean"), F.lit(False))
                if del_cond is not None
                else F.lit(has_del)  # unconditional MATCHED-DELETE or none
            )
            ba = ba.withColumn("__m_del", is_del)
            cur_keys = F.broadcast(cur.select(*keys))
            # Delta clause semantics: MATCHED rows take the delete
            # branch when its condition holds, else UPDATE SET *;
            # NOT-MATCHED rows take INSERT * regardless of the
            # matched-only delete condition.
            matched = ba.join(cur_keys, keys, "left_semi")
            unmatched = ba.join(cur_keys, keys, "left_anti")
            drop_keys = cur.select(*keys).limit(0)
            if has_del:
                drop_keys = drop_keys.unionByName(
                    matched.filter(F.col("__m_del")).select(*keys)
                )
            upd_rows = (
                matched.filter(~F.col("__m_del")).select(*cols) if upd else None
            )
            if upd_rows is not None:
                drop_keys = drop_keys.unionByName(upd_rows.select(*keys))
            out = cur.join(
                F.broadcast(drop_keys.distinct()), keys, "left_anti"
            )
            if by_source_del:
                # NOT MATCHED BY SOURCE THEN DELETE: surviving target
                # rows must have a source match (source is the small
                # side — its distinct keys broadcast)
                out = out.join(
                    F.broadcast(b.select(*keys).distinct()),
                    keys, "left_semi",
                )
            if upd_rows is not None:
                out = out.unionByName(upd_rows)
            if ins:
                out = out.unionByName(unmatched.select(*cols))
            return out

        return table.merge_keyed(src, keys, merge_fn, full_scope=by_source_del)

    _VERSION_AS_OF_RE = re.compile(
        r"(?i)\b([A-Za-z_]\w*)\s+VERSION\s+AS\s+OF\s+(\d+)"
    )
    _TIMESTAMP_AS_OF_RE = re.compile(
        r"(?i)\b([A-Za-z_]\w*)\s+TIMESTAMP\s+AS\s+OF\s+('(?:[^'\\]|\\.|'')*')"
    )

    def _rewrite_time_travel(self, statement: str) -> str:
        """Rewrite ``<table> VERSION AS OF n`` / ``<table> TIMESTAMP AS
        OF '<ts>'`` references (Delta SQL time travel — Spark's parser
        rejects them on temp views) into views registered over
        ``read_delta_version`` / ``read_as_of`` snapshots. Applies at
        any paren depth (subqueries travel too) but never inside string
        literals."""
        out = statement
        for pat, read in (
            (self._VERSION_AS_OF_RE,
             lambda t, arg: t.read_delta_version(int(arg))),
            (self._TIMESTAMP_AS_OF_RE,
             lambda t, arg: t.read_as_of(arg[1:-1].replace("''", "'"))),
        ):
            while True:
                mask = self._toplevel_mask(out, parens=False)
                hit = next(
                    (m for m in pat.finditer(out)
                     if mask[m.start()] and (self.root / m.group(1)).is_dir()),
                    None,
                )
                if hit is None:
                    break
                name, arg = hit.group(1), hit.group(2)
                view = f"__tt_{name}_{abs(hash((name, arg))) % 10**8}"
                read(self._existing_table(name), arg).createOrReplaceTempView(view)
                out = out[: hit.start()] + view + out[hit.end():]
        return out

    _TABLE_CHANGES_RE = re.compile(
        r"table_changes\s*\(\s*'([^']+)'\s*,\s*"
        r"('(?:[^']|'')*'|[^,()]+?)\s*"
        r"(?:,\s*('(?:[^']|'')*'|[^,()]+?)\s*)?\)",
        re.IGNORECASE,
    )

    def _rewrite_table_changes(self, statement: str) -> str:
        """Rewrite ``table_changes('t', start [, end])`` table-valued
        references (Databricks' CDF SQL function — Spark's parser has
        no such TVF) into views registered over
        ``ManagedTable.table_changes``. Boundaries are version
        integers or quoted timestamps; applies at any paren depth but
        never inside string literals (same literal mask as time
        travel)."""

        def _arg(raw: str | None):
            if raw is None:
                return None
            raw = raw.strip()
            if raw.startswith("'"):
                return raw[1:-1].replace("''", "'")
            try:
                return int(raw)
            except ValueError:
                raise ValueError(
                    f"table_changes: boundary {raw!r} is neither a "
                    "version integer nor a quoted timestamp"
                ) from None

        out = statement
        while True:
            mask = self._toplevel_mask(out, parens=False)
            hit = next(
                (m for m in self._TABLE_CHANGES_RE.finditer(out)
                 if mask[m.start()] and (self.root / m.group(1)).is_dir()),
                None,
            )
            if hit is None:
                break
            name = hit.group(1)
            start, end = _arg(hit.group(2)), _arg(hit.group(3))
            view = f"__tc_{name}_{abs(hash((name, start, end))) % 10**8}"
            self._existing_table(name).table_changes(
                start, end
            ).createOrReplaceTempView(view)
            out = out[: hit.start()] + view + out[hit.end():]
        return out

    _DDL_VERB_RE = re.compile(r"^\s*(CREATE|ALTER|DROP)\b", re.IGNORECASE)
    _CREATE_VIEW_RE = re.compile(
        r"^\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+(\S+)\s+AS\s+(.+?)\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    _DROP_VIEW_RE = re.compile(
        r"^\s*DROP\s+VIEW\s+(?:(IF\s+EXISTS)\s+)?(\S+)\s*;?\s*$",
        re.IGNORECASE,
    )
    _CREATE_RE = re.compile(
        r"^\s*CREATE\s+(OR\s+REPLACE\s+)?TABLE\s+"
        r"(?:(IF\s+NOT\s+EXISTS)\s+)?([^\s(]+)\s*(.*?)\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    _ALTER_RE = re.compile(
        r"^\s*ALTER\s+TABLE\s+(\S+)\s+(.+?)\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    _DROP_RE = re.compile(
        r"^\s*DROP\s+TABLE\s+(?:(IF\s+EXISTS)\s+)?(\S+)\s*;?\s*$",
        re.IGNORECASE,
    )

    _IDENTITY_RE = re.compile(
        r"(?is)\bGENERATED\s+(ALWAYS|BY\s+DEFAULT)\s+AS\s+IDENTITY"
        r"\s*(?:\(([^)]*)\))?"
    )
    _GENERATED_EXPR_RE = re.compile(
        r"(?is)\bGENERATED\s+ALWAYS\s+AS\s*\("
    )

    @classmethod
    def _parse_generated_clauses(
        cls, cols_ddl: str
    ) -> tuple[str, dict[str, dict]]:
        """Extract Databricks ``GENERATED`` clauses from a CREATE TABLE
        column list (Spark's DDL parser rejects them) and return the
        stripped DDL plus per-column Delta schema metadata:

        - ``c BIGINT GENERATED ALWAYS|BY DEFAULT AS IDENTITY [(START
          WITH s | INCREMENT BY i …)]`` → ``delta.identity.start/step/
          allowExplicitInsert`` (Delta's own column-metadata keys);
        - ``c TYPE GENERATED ALWAYS AS (expr)`` →
          ``delta.generationExpression``;
        - ``c TYPE DEFAULT <value>`` → ``CURRENT_DEFAULT`` (Spark's own
          column-default metadata key; the value may be a literal, a
          quoted string, or a parenthesized expression). Defaults apply
          on SQL INSERT when the column is omitted via a column list —
          NOT on DataFrame appends, matching Delta's
          allowColumnDefaults scope.

        Splits on top-level commas only (DECIMAL(10,2) and expression
        commas stay intact, string literals are opaque)."""
        mask = cls._toplevel_mask(cols_ddl)
        segs: list[str] = []
        last = 0
        for i, ch in enumerate(cols_ddl):
            if ch == "," and mask[i]:
                segs.append(cols_ddl[last:i])
                last = i + 1
        segs.append(cols_ddl[last:])
        out_segs: list[str] = []
        meta: dict[str, dict] = {}
        for seg in segs:
            nm = re.match(r"\s*([A-Za-z_]\w*)", seg)
            col = nm.group(1) if nm else None
            # keyword probes must never fire inside string literals
            # (COMMENT 'generated by default', DEFAULT 'use default') —
            # the same literal mask the statement routers use
            smask = cls._toplevel_mask(seg, parens=False)

            def _lit_safe(m):
                return m is not None and smask[m.start()]

            im = cls._IDENTITY_RE.search(seg)
            if not _lit_safe(im):
                im = None
            if im and col:
                mode, opts = im.group(1).upper(), im.group(2) or ""
                start, step = 1, 1
                sm = re.search(r"(?i)START\s+WITH\s+(-?\d+)", opts)
                if sm:
                    start = int(sm.group(1))
                km = re.search(r"(?i)INCREMENT\s+BY\s+(-?\d+)", opts)
                if km:
                    step = int(km.group(1))
                if step == 0:
                    raise ValueError(
                        f"identity column {col}: INCREMENT BY 0 is invalid"
                    )
                leftover = re.sub(
                    r"(?i)START\s+WITH\s+-?\d+|INCREMENT\s+BY\s+-?\d+|,",
                    "", opts,
                ).strip()
                if leftover:
                    raise ValueError(
                        f"identity column {col}: unsupported IDENTITY "
                        f"option(s) {leftover!r} (START WITH n / "
                        "INCREMENT BY n)"
                    )
                meta[col] = {
                    "delta.identity.start": start,
                    "delta.identity.step": step,
                    "delta.identity.allowExplicitInsert": mode != "ALWAYS",
                }
                out_segs.append(seg[: im.start()] + seg[im.end():])
                continue
            gm = cls._GENERATED_EXPR_RE.search(seg)
            if not _lit_safe(gm):
                gm = None
            if gm and col:
                depth = 1
                j = gm.end()
                while j < len(seg) and depth:
                    if seg[j] == "(":
                        depth += 1
                    elif seg[j] == ")":
                        depth -= 1
                    j += 1
                if depth:
                    raise ValueError(
                        f"generated column {col}: unbalanced parentheses "
                        "in the generation expression"
                    )
                expr = seg[gm.end(): j - 1].strip()
                if not expr:
                    raise ValueError(
                        f"generated column {col}: empty generation "
                        "expression"
                    )
                meta[col] = {"delta.generationExpression": expr}
                out_segs.append(seg[: gm.start()] + seg[j:])
                continue
            dm = re.search(r"(?is)\bDEFAULT\s+", seg)
            if not _lit_safe(dm):
                dm = None
            if dm and col:
                rest = seg[dm.end():]
                if rest.startswith("("):  # parenthesized expression
                    depth, j = 0, 0
                    while j < len(rest):
                        if rest[j] == "(":
                            depth += 1
                        elif rest[j] == ")":
                            depth -= 1
                            if depth == 0:
                                j += 1
                                break
                        j += 1
                    if depth:
                        raise ValueError(
                            f"column {col}: unbalanced DEFAULT expression"
                        )
                    value = rest[:j]
                elif rest.startswith("'"):  # quoted string (with '' doubling)
                    vm2 = re.match(r"'(?:[^']|'')*'", rest)
                    if vm2 is None:
                        raise ValueError(
                            f"column {col}: unterminated DEFAULT string"
                        )
                    value = vm2.group(0)
                    j = vm2.end()
                else:  # bare literal token (number, NULL, true, …)
                    vm2 = re.match(r"[^\s,]+", rest)
                    if vm2 is None:
                        raise ValueError(f"column {col}: empty DEFAULT")
                    value = vm2.group(0)
                    j = vm2.end()
                meta[col] = {"CURRENT_DEFAULT": value}
                out_segs.append(seg[: dm.start()] + rest[j:])
                continue
            out_segs.append(seg)
        return ", ".join(s.strip() for s in out_segs), meta

    def _sql_ddl(self, statement: str):
        """Databricks-style DDL on managed tables (r12 verdict "What's
        missing" #3 — Spark's own parser cannot create ManagedTables):

        - ``CREATE [OR REPLACE] TABLE [IF NOT EXISTS] t (col type, …)
          [PARTITIONED BY (c, …)] [TBLPROPERTIES (…)]`` — empty table
          with the declared schema (CDF via the
          ``delta.enableChangeDataFeed`` property, Delta's own knob);
          columns may carry Databricks ``GENERATED ALWAYS|BY DEFAULT
          AS IDENTITY [(START WITH s INCREMENT BY i)]`` (BIGINT only)
          and ``GENERATED ALWAYS AS (expr)`` clauses — definitions
          land as Delta per-column schema metadata, ids are allocated
          map-side on every write with the high water mark riding the
          commit, and generation expressions are computed when omitted
          and CHECK-validated when provided;
        - ``CREATE [OR REPLACE] TABLE [IF NOT EXISTS] t AS <query>`` —
          CTAS (time-travel references in the query travel);
        - ``ALTER TABLE t ADD COLUMN[S] (c type, …)`` — additive
          nullable schema evolution (a zero-row evolving append: old
          files carry by reference, reads null-fill — Delta ADD COLUMN
          semantics);
        - ``ALTER TABLE t ADD CONSTRAINT n CHECK (expr)`` /
          ``DROP CONSTRAINT [IF EXISTS] n``;
        - ``DROP TABLE [IF EXISTS] t``.

        Unroutable DDL shapes raise precise errors (REPLACE COLUMNS,
        RENAME, type changes: not supported — additive evolution only,
        same as this engine's write paths).

        ``CREATE [OR REPLACE] VIEW v AS <query>`` / ``DROP VIEW [IF
        EXISTS] v`` persist plain-SELECT view definitions in the
        catalog (``_views.json``); views re-resolve against the current
        snapshots on every ``sql()`` call and may reference each other
        (fixpoint registration)."""
        vm = self._CREATE_VIEW_RE.match(statement)
        if vm:
            replace, name, body = bool(vm.group(1)), vm.group(2), vm.group(3)
            if not self._BARE_IDENT_RE.match(name):
                raise ValueError(
                    f"CREATE VIEW {name!r}: use a bare view name"
                )
            if (self.root / name).is_dir():
                raise ValueError(
                    f"CREATE VIEW {name}: a managed TABLE of that name "
                    "exists"
                )
            views = self._load_views()
            if name in views and not replace:
                raise ValueError(
                    f"view {name} already exists (use OR REPLACE)"
                )
            self.register_views()
            df = self.spark.sql(body)  # analyze NOW: bad SQL fails the DDL
            views[name] = body
            self._save_views(views)
            df.createOrReplaceTempView(name)
            return None
        vm = self._DROP_VIEW_RE.match(statement)
        if vm:
            if_exists, name = bool(vm.group(1)), vm.group(2)
            views = self._load_views()
            if name not in views:
                if if_exists:
                    return None
                raise ValueError(f"view {name} does not exist")
            del views[name]
            self._save_views(views)
            self.spark.catalog.dropTempView(name)
            return None
        m = self._CREATE_RE.match(statement)
        if m:
            replace = bool(m.group(1))
            if_not_exists = bool(m.group(2))
            name, tail = m.group(3), m.group(4).strip()
            if not self._BARE_IDENT_RE.match(name):
                raise ValueError(
                    f"CREATE TABLE {name!r}: qualified or backquoted "
                    "names are not supported — use the bare "
                    "managed-table name"
                )
            if name in self._load_views():
                raise ValueError(
                    f"CREATE TABLE {name}: a VIEW of that name exists "
                    "(DROP VIEW first)"
                )
            t = self.table(name)
            if t.exists() and not replace:
                if if_not_exists:
                    return None  # no-op, SQL semantics
                raise ValueError(f"table {name} already exists "
                                 "(use OR REPLACE or IF NOT EXISTS)")
            scm = re.match(r"(?is)^SHALLOW\s+CLONE\s+(\S+)\s*$", tail)
            if scm:  # CREATE [OR REPLACE] TABLE t SHALLOW CLONE src
                src_t = self._existing_table(scm.group(1))
                if t.exists():  # only reachable with OR REPLACE
                    shutil.rmtree(t.dir)
                    t = self.table(name)
                src_t.clone_to(t)
                return None
            am = re.match(r"(?is)^AS\s+(.+)$", tail)
            if am:  # CTAS
                body = self._rewrite_time_travel(am.group(1))
                self.register_views()
                if re.match(r"(?is)^\s*VALUES\b", body):
                    body = f"SELECT * FROM ({body})"
                return t.overwrite(self.spark.sql(body))
            if not tail.startswith("("):
                raise ValueError(
                    "unsupported CREATE TABLE shape; expected CREATE "
                    "[OR REPLACE] TABLE [IF NOT EXISTS] <t> (col type, …) "
                    "[PARTITIONED BY (…)] [TBLPROPERTIES (…)] or "
                    "CREATE TABLE <t> AS <query>"
                )
            depth = 0
            end = -1
            for i, ch in enumerate(tail):
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    depth -= 1
                    if depth == 0:
                        end = i
                        break
            if end < 0:
                raise ValueError("CREATE TABLE: unbalanced column list")
            cols_ddl = tail[1:end]
            rest = tail[end + 1:].strip()
            partition_by = None
            cluster_by = None
            enable_cdf = False
            pm = re.match(r"(?is)^PARTITIONED\s+BY\s*\(([^)]*)\)\s*(.*)$", rest)
            if pm:
                partition_by = [c.strip() for c in pm.group(1).split(",")]
                rest = pm.group(2).strip()
            cm = re.match(r"(?is)^CLUSTER\s+BY\s*\(([^)]*)\)\s*(.*)$", rest)
            if cm:
                if partition_by:
                    raise ValueError(
                        f"CREATE TABLE {name}: CLUSTER BY and PARTITIONED "
                        "BY are mutually exclusive (Databricks rule)"
                    )
                cluster_by = [c.strip() for c in cm.group(1).split(",")]
                rest = cm.group(2).strip()
            tm = re.match(r"(?is)^TBLPROPERTIES\s*\(([^)]*)\)\s*$", rest)
            if tm:
                for pair in tm.group(1).split(","):
                    km = re.match(
                        r"(?is)^\s*'([^']+)'\s*=\s*'([^']*)'\s*$", pair
                    )
                    if km is None:
                        raise ValueError(
                            f"unparseable TBLPROPERTIES entry {pair!r}"
                        )
                    k, val = km.group(1), km.group(2)
                    if k == "delta.enableChangeDataFeed":
                        enable_cdf = val.lower() == "true"
                    else:
                        raise ValueError(
                            f"unsupported table property {k!r} (the "
                            "router honors delta.enableChangeDataFeed)"
                        )
            elif rest:
                raise ValueError(
                    f"unsupported CREATE TABLE tail {rest!r}; expected "
                    "[PARTITIONED BY (…)] [TBLPROPERTIES (…)]"
                )
            # Databricks GENERATED clauses are extracted BEFORE parsing
            # (Spark's DDL parser rejects them): identity/generation
            # definitions become per-field Delta metadata on the
            # committed schema, enforced by every later write
            cols_ddl, col_meta = self._parse_generated_clauses(cols_ddl)
            # Spark's DDL parser is the schema authority (types,
            # NOT NULL, comments all parse exactly as spark.sql would)
            empty = self.spark.createDataFrame([], cols_ddl)
            hw_props: dict = {}
            gen_checks: list[tuple[str, str]] = []
            if col_meta:
                from pyspark.sql.types import LongType, StructField, StructType

                fields = []
                for f in empty.schema.fields:
                    md = col_meta.get(f.name)
                    if md is None:
                        fields.append(f)
                        continue
                    if "delta.identity.start" in md:
                        if not isinstance(f.dataType, LongType):
                            raise ValueError(
                                f"CREATE TABLE {name}: identity column "
                                f"{f.name} must be BIGINT, got "
                                f"{f.dataType.simpleString()}"
                            )
                        hw_props[f"identity_high_water_{f.name}"] = str(
                            md["delta.identity.start"]
                            - md["delta.identity.step"]
                        )
                    if "delta.generationExpression" in md:
                        gen_checks.append(
                            (f.name, md["delta.generationExpression"])
                        )
                    if "CURRENT_DEFAULT" in md:
                        # defaults must be constant-analyzable (Delta's
                        # allowColumnDefaults rule) — a bad expression
                        # fails the DDL, not the first INSERT
                        self.spark.sql(f"SELECT {md['CURRENT_DEFAULT']}")
                    fields.append(
                        StructField(f.name, f.dataType, f.nullable, md)
                    )
                empty = self.spark.createDataFrame([], StructType(fields))
            committed = t.overwrite(
                empty, partition_by=partition_by, enable_cdf=enable_cdf,
                set_props=hw_props or None,
            )
            if cluster_by:
                t.set_cluster_columns(cluster_by)
            for col, expr in gen_checks:
                # Delta validates explicit values against the generation
                # expression — bind it as a CHECK constraint so the
                # validation rides the write projection of every commit
                t.add_constraint(f"gen_{col}", f"{col} <=> ({expr})")
            return committed
        m = self._ALTER_RE.match(statement)
        if m:
            t = self._dml_table(m.group(1), "ALTER TABLE")
            action = m.group(2).strip()
            cm = re.match(
                r"(?is)^ADD\s+CONSTRAINT\s+([A-Za-z_]\w*)\s+CHECK\s*"
                r"\((.+)\)\s*$",
                action,
            )
            if cm:
                t.add_constraint(cm.group(1), cm.group(2).strip())
                return None
            dm = re.match(
                r"(?is)^DROP\s+CONSTRAINT\s+(?:(IF\s+EXISTS)\s+)?"
                r"([A-Za-z_]\w*)\s*$",
                action,
            )
            if dm:
                t.drop_constraint(dm.group(2), if_exists=bool(dm.group(1)))
                return None
            km = re.match(r"(?is)^CLUSTER\s+BY\s+NONE$", action)
            if km:
                t.set_cluster_columns(None)
                return None
            km = re.match(r"(?is)^CLUSTER\s+BY\s*\(([^)]*)\)$", action)
            if km:
                t.set_cluster_columns(
                    [c.strip() for c in km.group(1).split(",")]
                )
                return None
            am = re.match(
                r"(?is)^ADD\s+COLUMNS?\s+\(?\s*(.+?)\s*\)?\s*$", action
            )
            if am:
                from pyspark.sql.types import StructField, StructType

                new_fields = self.spark.createDataFrame(
                    [], am.group(1)
                ).schema.fields
                stored = t.table_schema()
                if stored is None:
                    raise ValueError(
                        f"ALTER TABLE {t.name}: table has no committed "
                        "schema to evolve"
                    )
                have = {f.name for f in stored.fields}
                dup = [f.name for f in new_fields if f.name in have]
                if dup:
                    raise ValueError(
                        f"ALTER TABLE {t.name} ADD COLUMN: column(s) "
                        f"{dup} already exist"
                    )
                evolved = StructType(
                    list(stored.fields)
                    + [StructField(f.name, f.dataType, True) for f in new_fields]
                )
                # zero-row evolving append: widens the canonical schema,
                # carries every file by reference (reads null-fill).
                # Column policies are skipped — the frame necessarily
                # carries the identity/generated columns (they are part
                # of the schema being widened), not explicit values
                t.append(
                    self.spark.createDataFrame([], evolved), evolve=True,
                    _apply_policies=False,
                )
                return None
            raise ValueError(
                f"unsupported ALTER TABLE action {action!r}; the router "
                "handles ADD COLUMN[S] (…), ADD CONSTRAINT n CHECK (…), "
                "DROP CONSTRAINT [IF EXISTS] n (additive evolution only "
                "— no RENAME / type changes / REPLACE COLUMNS)"
            )
        m = self._DROP_RE.match(statement)
        if m:
            if_exists, name = bool(m.group(1)), m.group(2)
            if not self._BARE_IDENT_RE.match(name):
                raise ValueError(
                    f"DROP TABLE {name!r}: use the bare managed-table name"
                )
            t = self.table(name)
            if not t.exists():
                if if_exists:
                    return None
                raise ValueError(f"table {name} does not exist")
            shutil.rmtree(t.dir)
            self.spark.catalog.dropTempView(name)
            return None
        verb = self._DDL_VERB_RE.match(statement).group(1).upper()
        raise ValueError(
            f"unsupported {verb} shape; the DDL router handles CREATE "
            "[OR REPLACE] TABLE [IF NOT EXISTS] t (cols)|AS query|"
            "SHALLOW CLONE src, CREATE [OR REPLACE] VIEW v AS query, "
            "ALTER TABLE t ADD COLUMN[S]/ADD CONSTRAINT/DROP CONSTRAINT/"
            "CLUSTER BY, DROP TABLE|VIEW [IF EXISTS] t"
        )

    _UTIL_VERB_RE = re.compile(
        r"^\s*(DESCRIBE|OPTIMIZE|VACUUM|RESTORE|ANALYZE)\b", re.IGNORECASE
    )
    _ANALYZE_RE = re.compile(
        r"^\s*ANALYZE\s+TABLE\s+(\S+)\s+COMPUTE\s+STATISTICS"
        r"(?:\s+FOR\s+(ALL\s+COLUMNS|COLUMNS\s+.+?))?\s*;?\s*$",
        re.IGNORECASE | re.DOTALL,
    )
    _DESCRIBE_RE = re.compile(
        r"^\s*DESCRIBE\s+(HISTORY|DETAIL)\s+(\S+)\s*;?\s*$", re.IGNORECASE
    )
    _OPTIMIZE_RE = re.compile(
        r"^\s*OPTIMIZE\s+(\S+)"
        r"(?:\s+ZORDER\s+BY\s*\(?\s*([A-Za-z_]\w*(?:\s*,\s*[A-Za-z_]\w*)*)\s*\)?)?"
        r"\s*;?\s*$",
        re.IGNORECASE,
    )
    _VACUUM_RE = re.compile(
        r"^\s*VACUUM\s+(\S+)(?:\s+RETAIN\s+(\d+)\s+VERSIONS)?\s*;?\s*$",
        re.IGNORECASE,
    )
    _RESTORE_RE = re.compile(
        r"^\s*RESTORE\s+(?:TABLE\s+)?(\S+)\s+TO\s+"
        r"(VERSION|TIMESTAMP)\s+AS\s+OF\s+(\d+|'(?:[^']|'')*')\s*;?\s*$",
        re.IGNORECASE,
    )

    def _sql_util(self, statement: str):
        """Databricks SQL utility verbs on managed tables (Spark's
        parser rejects them on temp views): DESCRIBE HISTORY/DETAIL,
        OPTIMIZE [ZORDER BY …], VACUUM [RETAIN n VERSIONS] (the engine
        retains by VERSION count, not hours — documented variant),
        RESTORE … TO VERSION/TIMESTAMP AS OF, and ANALYZE TABLE …
        COMPUTE STATISTICS [FOR COLUMNS … | FOR ALL COLUMNS] (bound as
        the ``analyze_stats`` property, returned as key/value rows).
        Unroutable shapes raise precise errors."""
        m = self._DESCRIBE_RE.match(statement)
        if m:
            kind, name = m.group(1).upper(), m.group(2)
            t = self._dml_table(name, f"DESCRIBE {kind}")
            if kind == "HISTORY":
                return t.history()
            d = t.detail()
            # key/value shape (like Spark's own DESCRIBE output): the
            # detail dict mixes types and may hold NULLs, which a
            # single-row inferred frame can't represent
            return self.spark.createDataFrame(
                [(k, None if v is None else str(v)) for k, v in d.items()],
                "info_name string, info_value string",
            )
        m = self._ANALYZE_RE.match(statement)
        if m:
            name, what = m.group(1), m.group(2)
            t = self._dml_table(name, "ANALYZE TABLE")
            cols: list[str] | None = None
            if what is not None:
                if re.match(r"(?is)^ALL\s+COLUMNS$", what.strip()):
                    from pyspark.sql.types import (
                        ArrayType, BinaryType, MapType, StructType,
                    )

                    schema = t.table_schema()
                    cols = [
                        f.name for f in (schema.fields if schema else [])
                        if not isinstance(
                            f.dataType,
                            (ArrayType, MapType, StructType, BinaryType),
                        )
                    ]
                else:
                    cols = [
                        c.strip()
                        for c in re.sub(
                            r"(?is)^COLUMNS\s+", "", what.strip()
                        ).split(",")
                    ]
            stats = t.analyze(cols)
            # key/value shape like DESCRIBE DETAIL (nested column stats
            # flatten to '<col>.<stat>' rows)
            rows: list[tuple[str, str | None]] = [
                (k, None if v is None else str(v))
                for k, v in stats.items() if k != "columns"
            ]
            for c, st in stats["columns"].items():
                rows += [
                    (f"{c}.{k}", None if v is None else str(v))
                    for k, v in st.items()
                ]
            return self.spark.createDataFrame(
                rows, "info_name string, info_value string"
            )
        m = self._OPTIMIZE_RE.match(statement)
        if m:
            name, zcols = m.group(1), m.group(2)
            t = self._dml_table(name, "OPTIMIZE")
            if zcols:
                if t.cluster_columns():
                    raise ValueError(
                        f"OPTIMIZE {name}: ZORDER BY is not allowed on a "
                        "CLUSTER BY table (Databricks rule) — OPTIMIZE "
                        "alone re-clusters on the bound columns"
                    )
                return t.compact(
                    zorder_by=[c.strip() for c in zcols.split(",")]
                )
            cc = t.cluster_columns()
            if cc:
                # liquid clustering: OPTIMIZE range-clusters the rewrite
                # on the bound columns (disjoint per-file ranges → sharp
                # stats-index skipping)
                return t.compact(cluster_by=cc)
            return t.compact_small()
        m = self._VACUUM_RE.match(statement)
        if m:
            name, keep = m.group(1), m.group(2)
            t = self._dml_table(name, "VACUUM")
            t.vacuum(keep=int(keep) if keep else 2)
            return None
        m = self._RESTORE_RE.match(statement)
        if m:
            name, kind, arg = m.group(1), m.group(2).upper(), m.group(3)
            t = self._dml_table(name, "RESTORE")
            if kind == "TIMESTAMP":
                return t.restore_as_of(arg[1:-1].replace("''", "'"))
            # VERSION AS OF n is a DELTA LOG version (what history()
            # shows) — resolve it through commitInfo like reads do
            dv = int(arg)
            try:
                for a in deltalog.read_actions(t.dir, dv):
                    ci = a.get("commitInfo")
                    if ci is not None and ci.get("mtVersion") is not None:
                        return t.restore(ci["mtVersion"])
            except FileNotFoundError:
                pass
            raise ValueError(
                f"RESTORE {name}: no readable delta commit {dv} (never "
                "committed, or expired by log retention)"
            )
        verb = self._UTIL_VERB_RE.match(statement).group(1).upper()
        if verb == "DESCRIBE":
            # plain DESCRIBE <view> etc. is valid Spark SQL — pass through
            self.register_views()
            return self.spark.sql(statement)
        raise ValueError(
            f"unsupported {verb} shape; expected "
            "OPTIMIZE <t> [ZORDER BY (a, b)] / VACUUM <t> [RETAIN n "
            "VERSIONS] / RESTORE [TABLE] <t> TO VERSION|TIMESTAMP AS OF … "
            "/ ANALYZE TABLE <t> COMPUTE STATISTICS [FOR COLUMNS a, b | "
            "FOR ALL COLUMNS]"
        )

    def sql(self, statement: str):
        """Ad-hoc SQL over the catalog (S10), extended with the Delta
        SQL surface Spark's parser rejects on temp views:

        - ``DELETE FROM t [WHERE …]`` / ``UPDATE t SET … [WHERE …]``
          route to ``delete_where``/``update_where`` (stats-pruned file
          rewrites, CDF, transaction log — identical to the Python
          verbs; no WHERE = the whole table, Delta semantics) and
          return the committed version (None when nothing matched).
        - ``MERGE INTO t USING s ON … WHEN MATCHED/NOT MATCHED …``
          routes to ``merge_keyed`` (see ``_sql_merge`` for the
          supported subset).
        - ``t VERSION AS OF n`` / ``t TIMESTAMP AS OF '…'`` references
          in queries are rewritten onto time-travel snapshots.
        - ``table_changes('t', start [, end])`` references are
          rewritten onto the CDF read (``ManagedTable.table_changes``:
          table columns + ``_change_type`` / ``_commit_version`` /
          ``_commit_timestamp``).
        - utility verbs: DESCRIBE HISTORY/DETAIL, OPTIMIZE [ZORDER BY]
          (liquid-clustered tables re-cluster on their bound columns),
          VACUUM [RETAIN n VERSIONS], RESTORE … TO … AS OF, ANALYZE
          TABLE … COMPUTE STATISTICS [FOR COLUMNS | FOR ALL COLUMNS]
          (``_sql_util``).
        - ``COPY INTO t FROM '<path>' FILEFORMAT = PARQUET [PATTERN =
          '<glob>']`` — file-level exactly-once batch ingest.
        - DDL: CREATE TABLE (schema with GENERATED/DEFAULT clauses,
          CTAS, SHALLOW CLONE; PARTITIONED BY / CLUSTER BY /
          TBLPROPERTIES tails), CREATE [OR REPLACE] VIEW, ALTER TABLE
          ADD COLUMN[S]/ADD CONSTRAINT/DROP CONSTRAINT/CLUSTER BY,
          DROP TABLE/VIEW (``_sql_ddl``) — all against ManagedTables.
        - INSERT takes an optional column list — omitted DEFAULT
          columns fill from their expressions, identity/generated
          columns auto-fill via the write policies.

        Any OTHER statement starting with a DML verb raises a precise
        error instead of falling through to spark.sql's parser.
        Everything else re-registers the views and runs through
        ``spark.sql`` unchanged, returning its DataFrame."""
        if self._UTIL_VERB_RE.match(statement):
            return self._sql_util(statement)
        if self._DDL_VERB_RE.match(statement):
            return self._sql_ddl(statement)
        verb = self._DML_VERB_RE.match(statement)
        if verb:
            word = verb.group(1).upper()
            if word == "DELETE":
                m = self._DELETE_RE.match(statement)
                if m is None:
                    raise ValueError(
                        "unsupported DELETE shape; expected DELETE FROM "
                        "<table> [WHERE <condition>]"
                    )
                table = self._dml_table(m.group(1), "DELETE FROM")
                rest = m.group(2).strip()
                if not rest:
                    return table.delete_where("true")
                wm = re.match(r"(?is)^WHERE\s+(.+)$", rest)
                if wm is None:
                    raise ValueError(
                        f"unsupported DELETE tail {rest!r}; expected "
                        "[WHERE <condition>]"
                    )
                return table.delete_where(wm.group(1))
            if word == "UPDATE":
                m = self._UPDATE_RE.match(statement)
                if m is None:
                    raise ValueError(
                        "unsupported UPDATE shape; expected UPDATE <table> "
                        "SET a = expr[, …] [WHERE <condition>]"
                    )
                table = self._dml_table(m.group(1), "UPDATE")
                parts = self._split_on_where(m.group(2))
                if parts is None:  # no WHERE: whole table (Delta semantics)
                    sets, cond = m.group(2), "true"
                else:
                    sets, cond = parts
                return table.update_where(cond, self._split_assignments(sets))
            if word == "INSERT":
                m = self._INSERT_RE.match(statement)
                if m is None:
                    raise ValueError(
                        "unsupported INSERT shape; expected INSERT "
                        "INTO|OVERWRITE [TABLE] <table> <SELECT …|VALUES …>"
                    )
                mode, name, body = m.group(1).upper(), m.group(2), m.group(3)
                # the target may not exist yet (INSERT creates it, like
                # a CTAS) — bare-name validation still applies
                if not self._BARE_IDENT_RE.match(name):
                    raise ValueError(
                        f"INSERT {mode} on {name!r}: qualified or "
                        "backquoted table names are not supported — use "
                        "the bare managed-table name"
                    )
                # optional column list: INSERT INTO t (a, b) <body> —
                # disambiguated from a parenthesized body ((SELECT …),
                # (VALUES …)) by peeking at the first keyword inside
                col_list = None
                body = body.strip()
                if body.startswith("("):
                    depth = 0
                    close = -1
                    for i, ch in enumerate(body):
                        if ch == "(":
                            depth += 1
                        elif ch == ")":
                            depth -= 1
                            if depth == 0:
                                close = i
                                break
                    if close < 0:
                        raise ValueError(
                            f"INSERT {mode} {name}: unbalanced parentheses"
                        )
                    inner = body[1:close]
                    if not re.match(
                        r"(?is)^\s*(SELECT|VALUES|WITH|FROM|TABLE)\b", inner
                    ):
                        col_list = [c.strip() for c in inner.split(",")]
                        if len(set(col_list)) != len(col_list):
                            raise ValueError(
                                f"INSERT {mode} {name}: duplicate "
                                "column(s) in the column list"
                            )
                        body = body[close + 1:].strip()
                body = self._rewrite_table_changes(
                    self._rewrite_time_travel(body)
                )
                self.register_views()
                if re.match(r"(?is)^\s*VALUES\b", body):
                    body = f"SELECT * FROM ({body})"
                rows = self.spark.sql(body)
                t = self.table(name)
                if t.exists():
                    # positional column resolution + store-assignment
                    # coercion, SQL INSERT semantics: the SELECT's
                    # columns map to the table's by ORDER and cast to
                    # the stored types (ANSI: an unsafe value fails the
                    # write loudly, like Spark's own INSERT)
                    stored = t.table_schema()
                    if stored is not None and col_list is not None:
                        by_name = {f.name: f for f in stored.fields}
                        unknown = [c for c in col_list if c not in by_name]
                        if unknown:
                            raise ValueError(
                                f"INSERT {mode} {name}: unknown "
                                f"column(s) {unknown}"
                            )
                        if len(rows.columns) != len(col_list):
                            raise ValueError(
                                f"INSERT {mode} {name}: query produces "
                                f"{len(rows.columns)} column(s), the "
                                f"column list names {len(col_list)}"
                            )
                        gen, ident = t.column_policies()
                        auto = {c for c in (*gen, *ident)}
                        rows = rows.toDF(*col_list)
                        sel = [
                            F.col(c).cast(by_name[c].dataType).alias(c)
                            for c in col_list
                        ]
                        # unlisted columns: DEFAULT fills (Delta
                        # allowColumnDefaults — SQL INSERT scope only);
                        # identity/generated stay absent for the write
                        # policies; the rest null-fill via _align
                        for f in stored.fields:
                            if f.name not in col_list and f.name not in auto:
                                d = (f.metadata or {}).get("CURRENT_DEFAULT")
                                if d is not None:
                                    sel.append(
                                        F.expr(d).cast(f.dataType)
                                        .alias(f.name)
                                    )
                        rows = rows.select(*sel)
                    elif stored is not None:
                        fields = list(stored.fields)
                        gen, ident = t.column_policies()
                        auto = {c for c in (*gen, *ident)}
                        if auto and len(rows.columns) == len(fields) - len(auto):
                            # Databricks lets INSERT omit generated /
                            # identity columns; positional mapping then
                            # targets the remaining columns and the
                            # write path fills the omitted ones
                            fields = [f for f in fields if f.name not in auto]
                        elif len(rows.columns) != len(fields):
                            raise ValueError(
                                f"INSERT {mode} {name}: query produces "
                                f"{len(rows.columns)} column(s), table has "
                                f"{len(fields)}"
                                + (
                                    f" ({len(fields) - len(auto)} after "
                                    f"omitting the generated/identity "
                                    f"column(s) {sorted(auto)})"
                                    if auto else ""
                                )
                            )
                        rows = rows.toDF(*[f.name for f in fields])
                        rows = rows.select(*[
                            F.col(f.name).cast(f.dataType).alias(f.name)
                            for f in fields
                        ])
                if mode == "OVERWRITE":
                    return t.overwrite(rows)
                return t.append(rows)
            if word == "COPY":
                m = self._COPY_RE.match(statement)
                if m is None:
                    raise ValueError(
                        "unsupported COPY shape; expected COPY INTO <t> "
                        "FROM '<path>' FILEFORMAT = PARQUET "
                        "[PATTERN = '<glob>']"
                    )
                name, path, fmt, pat = m.groups()
                if not self._BARE_IDENT_RE.match(name):
                    raise ValueError(
                        f"COPY INTO {name!r}: use the bare managed-table "
                        "name"
                    )
                res = self.table(name).copy_into(path, pat, fmt)
                return self.spark.createDataFrame(
                    [(res["num_files_loaded"], res["num_rows_loaded"])],
                    "num_files_loaded bigint, num_rows_loaded bigint",
                )
            return self._sql_merge(statement)
        statement = self._rewrite_table_changes(
            self._rewrite_time_travel(statement)
        )
        self.register_views()
        return self.spark.sql(statement)
