"""Structural validation of the native Delta transaction log that
ManagedTable emits alongside every commit (sources/deltalog.py).

The reference's storage contract is Delta (silver_Dimensions.py:55
``format("delta")``); delta-spark itself cannot be installed in this
offline environment, so these tests validate the public protocol
structurally: action schema, version contiguity, add/remove file
accounting (log replay == snapshot file set), schemaString round-trip,
dataChange semantics, epoch-skip, and the crash-heal path.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from end_to_end_azure_databricks_data_engineering_project_spark.sources import deltalog
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import ManagedTable


def _df(spark, start, n, extra_col=False):
    rows = [(start + i, f"u{(start + i) % 7}", float(start + i)) for i in range(n)]
    df = spark.createDataFrame(rows, "id long, user string, amount double")
    if extra_col:
        df = df.withColumn("flag", F.lit(1))
    return df


def _log_versions(table):
    d = deltalog.log_dir(table.dir)
    return sorted(int(p.stem) for p in d.glob("*.json"))


def _replay_live_set(table):
    """Replay the full log: the live file set after the last commit."""
    live: set[str] = set()
    for v in _log_versions(table):
        for a in deltalog.read_actions(table.dir, v):
            if "remove" in a:
                live.discard(a["remove"]["path"])
            if "add" in a:
                live.add(a["add"]["path"])
    return live


def _snapshot_paths(table):
    # log-relative paths of the current snapshot (store layout; legacy
    # versions would be vN-relative, but new commits always manifest)
    return {
        f"{f.parent.name}/{f.name}" for f in table.data_files()
    }


def test_first_commit_protocol_metadata_adds(spark, tmp_path):
    t = ManagedTable(spark, tmp_path / "wh", "orders")
    t.overwrite(_df(spark, 0, 50))
    assert _log_versions(t) == [0]
    actions = deltalog.read_actions(t.dir, 0)
    kinds = [next(iter(a)) for a in actions]
    assert kinds[0] == "protocol"
    assert kinds[1] == "metaData"
    assert kinds[-1] == "commitInfo"
    proto = actions[0]["protocol"]
    assert proto["minReaderVersion"] == 1 and proto["minWriterVersion"] == 2
    meta = actions[1]["metaData"]
    assert meta["format"] == {"provider": "parquet", "options": {}}
    assert meta["partitionColumns"] == []
    # schemaString is Spark StructType JSON — must parse and round-trip
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    assert set(schema.fieldNames()) == {"id", "user", "amount"}
    adds = deltalog.read_adds(t.dir, 0)
    assert {a["path"] for a in adds} == _snapshot_paths(t)
    for a in adds:
        assert a["size"] > 0 and a["dataChange"] is True
        assert a["partitionValues"] == {}
    ci = actions[-1]["commitInfo"]
    assert ci["operation"] == "WRITE"
    assert ci["mtVersion"] == t.current_version()


def test_append_accounting_and_readback(spark, tmp_path):
    t = ManagedTable(spark, tmp_path / "wh", "orders")
    t.overwrite(_df(spark, 0, 50))
    v0_adds = {a["path"] for a in deltalog.read_adds(t.dir, 0)}
    t.append(_df(spark, 50, 30))
    assert _log_versions(t) == [0, 1]
    actions = deltalog.read_actions(t.dir, 1)
    # TRUE incremental encoding: an append removes nothing and adds
    # ONLY its own files — commit size independent of table size
    assert not any("remove" in a for a in actions)
    v1_adds = {a["path"] for a in deltalog.read_adds(t.dir, 1)}
    assert v1_adds and not (v1_adds & v0_adds)
    assert v0_adds | v1_adds == _snapshot_paths(t)
    assert _replay_live_set(t) == _snapshot_paths(t)
    # non-evolving append must NOT re-emit metaData
    assert not any("metaData" in a for a in actions)
    # reading the live add paths back with a stock parquet reader
    # reproduces the table exactly
    paths = [str(t.dir / p) for p in sorted(_replay_live_set(t))]
    back = spark.read.parquet(*paths)
    assert back.count() == 80
    assert set(r["id"] for r in back.collect()) == set(range(80))


def test_delta_versions_contiguous_across_aborted_claims(spark, tmp_path):
    t = ManagedTable(spark, tmp_path / "wh", "orders")
    t.overwrite(_df(spark, 0, 10))
    # simulate a crashed writer: claimed dir that never commits
    orphan = t._claim_next_version()
    assert orphan == t.current_version() + 1
    t.append(_df(spark, 10, 10))  # MT version skips past the orphan
    assert _log_versions(t) == [0, 1]  # delta log has no gap
    mt_versions = [
        next(a["commitInfo"]["mtVersion"]
             for a in deltalog.read_actions(t.dir, d) if "commitInfo" in a)
        for d in (0, 1)
    ]
    assert mt_versions[1] > mt_versions[0] + 1  # the gap is in MT space
    assert _replay_live_set(t) == _snapshot_paths(t)


def test_epoch_skip_writes_no_delta_commit(spark, tmp_path):
    t = ManagedTable(spark, tmp_path / "wh", "orders")
    t.overwrite(_df(spark, 0, 10))
    assert t.append(_df(spark, 10, 5), epoch=7, epoch_key="sink") is not None
    assert t.append(_df(spark, 10, 5), epoch=7, epoch_key="sink") is None
    assert _log_versions(t) == [0, 1]


def test_schema_evolution_reemits_metadata(spark, tmp_path):
    t = ManagedTable(spark, tmp_path / "wh", "orders")
    t.overwrite(_df(spark, 0, 10))
    t.append(_df(spark, 10, 10, extra_col=True), evolve=True)
    actions = deltalog.read_actions(t.dir, 1)
    metas = [a["metaData"] for a in actions if "metaData" in a]
    assert len(metas) == 1
    schema = StructType.fromJson(json.loads(metas[0]["schemaString"]))
    assert "flag" in schema.fieldNames()
    # stable table id across commits (Delta requires it)
    id0 = next(a["metaData"]["id"]
               for a in deltalog.read_actions(t.dir, 0) if "metaData" in a)
    assert metas[0]["id"] == id0


def test_compact_and_restore_datachange(spark, tmp_path):
    t = ManagedTable(spark, tmp_path / "wh", "orders")
    t.overwrite(_df(spark, 0, 40))
    t.append(_df(spark, 40, 40))
    t.compact(target_partitions=1)
    ops = {}
    for d in _log_versions(t):
        for a in deltalog.read_actions(t.dir, d):
            if "commitInfo" in a:
                ops[d] = a["commitInfo"]["operation"]
    assert ops[2] == "OPTIMIZE"
    # compaction rearranges without changing content: dataChange=false
    compact_adds = deltalog.read_adds(t.dir, 2)
    assert all(a["dataChange"] is False for a in compact_adds)
    t.restore(t.current_version() - 1)
    d = max(_log_versions(t))
    ci = next(a["commitInfo"] for a in deltalog.read_actions(t.dir, d)
              if "commitInfo" in a)
    assert ci["operation"] == "RESTORE"
    # RESTORE changes the visible data — a CDF-style consumer filtering
    # on dataChange must NOT skip the rollback commit
    assert all(a["dataChange"] is True for a in deltalog.read_adds(t.dir, d))
    assert _replay_live_set(t) == _snapshot_paths(t)


def test_holey_log_restarts_at_zero(spark, tmp_path):
    # a log with missing EARLIER commits is unreadable no matter what
    # gets appended — heal must restart it as a fresh Delta table
    t = ManagedTable(spark, tmp_path / "wh", "orders")
    t.overwrite(_df(spark, 0, 20))
    t.append(_df(spark, 20, 20))
    t.append(_df(spark, 40, 20))
    id_before = next(a["metaData"]["id"]
                     for a in deltalog.read_actions(t.dir, 0) if "metaData" in a)
    deltalog.commit_path(t.dir, 1).unlink()  # hole in the middle
    t.append(_df(spark, 60, 20))  # next commit detects + restarts
    vs = _log_versions(t)
    assert vs == [0, 1], vs  # restart (0 = snapshot as-of heal) + this commit
    actions0 = deltalog.read_actions(t.dir, 0)
    assert any("protocol" in a for a in actions0)
    meta0 = next(a["metaData"] for a in actions0 if "metaData" in a)
    assert meta0["id"] != id_before  # a restarted log IS a new table
    assert _replay_live_set(t) == _snapshot_paths(t)


def test_whole_log_dir_lost_restarts_at_zero(spark, tmp_path):
    import shutil

    t = ManagedTable(spark, tmp_path / "wh", "orders")
    t.overwrite(_df(spark, 0, 20))
    t.append(_df(spark, 20, 20))
    shutil.rmtree(deltalog.log_dir(t.dir))
    t.heal_delta_log()
    assert _log_versions(t) == [0]
    actions = deltalog.read_actions(t.dir, 0)
    assert any("protocol" in a for a in actions)
    assert any("metaData" in a for a in actions)
    assert not any("remove" in a for a in actions)
    assert _replay_live_set(t) == _snapshot_paths(t)
    # and the table keeps committing normally afterwards
    t.append(_df(spark, 40, 20))
    assert _log_versions(t) == [0, 1]
    assert _replay_live_set(t) == _snapshot_paths(t)


def test_merge_keyed_logs_and_accounting_holds(spark, tmp_path):
    t = ManagedTable(spark, tmp_path / "wh", "orders")
    t.overwrite(_df(spark, 0, 60))

    def upsert(current, batch):
        merged = current.alias("c").join(batch.alias("b"), "id", "left_anti")
        return merged.unionByName(batch)

    t.merge_keyed(_df(spark, 30, 60), ["id"], upsert)
    d = max(_log_versions(t))
    ci = next(a["commitInfo"] for a in deltalog.read_actions(t.dir, d)
              if "commitInfo" in a)
    assert ci["operation"] == "MERGE"
    assert _replay_live_set(t) == _snapshot_paths(t)
    assert _log_versions(t) == list(range(d + 1))  # contiguous


def test_crash_heal_rewrites_missing_commit(spark, tmp_path):
    t = ManagedTable(spark, tmp_path / "wh", "orders")
    t.overwrite(_df(spark, 0, 20))
    t.append(_df(spark, 20, 20))
    # simulate the crash window: pointer moved, log write lost
    lost = deltalog.commit_path(t.dir, 1)
    before = lost.read_text()
    lost.unlink()
    t.heal_delta_log()
    assert lost.exists()
    assert _replay_live_set(t) == _snapshot_paths(t)
    healed = deltalog.read_actions(t.dir, 1)
    orig = [json.loads(l) for l in before.splitlines() if l.strip()]
    # same accounting (healed commit may add a redundant metaData)
    assert {a["add"]["path"] for a in healed if "add" in a} == {
        a["add"]["path"] for a in orig if "add" in a
    }
    assert {a["remove"]["path"] for a in healed if "remove" in a} == {
        a["remove"]["path"] for a in orig if "remove" in a
    }


def test_crash_heal_happens_on_next_commit(spark, tmp_path):
    t = ManagedTable(spark, tmp_path / "wh", "orders")
    t.overwrite(_df(spark, 0, 20))
    deltalog.commit_path(t.dir, 0).unlink()
    t.append(_df(spark, 20, 20))  # commit must heal 0 before writing 1
    assert _log_versions(t) == [0, 1]
    assert _replay_live_set(t) == _snapshot_paths(t)


def test_pre_existing_table_starts_log_at_enablement(spark, tmp_path):
    t = ManagedTable(spark, tmp_path / "wh", "orders")
    t.overwrite(_df(spark, 0, 10))
    t.append(_df(spark, 10, 10))
    # simulate a table created before delta-log emission existed
    import shutil

    shutil.rmtree(deltalog.log_dir(t.dir))
    state = t._pointer_state()
    state.pop("delta")
    fd = t._acquire_commit_lock()
    try:
        t._write_pointer_locked(state)
    finally:
        t._release_commit_lock(fd)
    t.append(_df(spark, 20, 10))
    # log restarts at 0 with the table as-of enablement: protocol,
    # metaData, and the FULL current snapshot as adds
    assert _log_versions(t) == [0]
    actions = deltalog.read_actions(t.dir, 0)
    assert any("protocol" in a for a in actions)
    assert any("metaData" in a for a in actions)
    assert _replay_live_set(t) == _snapshot_paths(t)


def test_vacuum_keeps_latest_commit_readable(spark, tmp_path):
    t = ManagedTable(spark, tmp_path / "wh", "orders")
    t.overwrite(_df(spark, 0, 10))
    for i in range(1, 5):
        t.append(_df(spark, 10 * i, 10))
    t.vacuum(keep=1)
    # latest delta commit references only the pointer version's files,
    # which vacuum always keeps — stock-reader view survives
    live = _replay_live_set(t)
    assert live == _snapshot_paths(t)
    for p in live:
        assert (t.dir / p).exists()


def test_medallion_pipeline_tables_emit_consistent_logs(spark, tmp_path):
    """Integration: the REAL medallion flows (silver drains + SCD merges
    + gold rebuilds through build_medallion_pipeline) produce tables
    whose _delta_log replays to exactly the current snapshot — the log
    emits through every production write path, not just direct table
    ops."""
    import datetime as dt

    from end_to_end_azure_databricks_data_engineering_project_spark.config import TABLE_BY_NAME
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.transforms import dedup_keep_latest
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.ingest import ingest_all
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.watermark import WatermarkStore
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import build_medallion_pipeline

    t0 = dt.datetime(2025, 1, 1)
    users = spark.createDataFrame(
        [(i, f"user {i}", "US", "Free", None, None, t0) for i in range(1, 8)],
        "user_id int, user_name string, country string, subscription_type string,"
        " start_date date, end_date date, updated_at timestamp",
    )
    cfgs = [TABLE_BY_NAME["dim_user"]]
    store = WatermarkStore(tmp_path / "state")
    ingest_all(spark, cfgs, {"dim_user": users}, str(tmp_path / "bronze"), store)
    pipe, catalog = build_medallion_pipeline(
        spark, cfgs, str(tmp_path / "bronze"), str(tmp_path / "warehouse"),
        str(tmp_path / "state"),
        {"dim_user": lambda df: dedup_keep_latest(df, ["user_id"], "updated_at")},
    )
    pipe.run_all()
    checked = 0
    for name in ("silver_dim_user", "gold_dim_user"):
        t = catalog.table(name)
        if not t.exists():
            continue
        versions = _log_versions(t)
        assert versions == list(range(len(versions))), (name, versions)
        actions0 = deltalog.read_actions(t.dir, 0)
        assert any("protocol" in a for a in actions0), name
        assert any("metaData" in a for a in actions0), name
        assert _replay_live_set(t) == _snapshot_paths(t), name
        checked += 1
    assert checked == 2


def test_checkpoint_reconstructs_snapshot_state(spark, tmp_path):
    import pyarrow.parquet as pq

    t = ManagedTable(spark, tmp_path / "wh", "orders")
    t.overwrite(_df(spark, 0, 30))
    t.append(_df(spark, 30, 30))
    t.append(_df(spark, 60, 30, extra_col=True), evolve=True)
    ckpt = t.write_delta_checkpoint()
    assert ckpt.exists()
    last = json.loads((deltalog.log_dir(t.dir) / "_last_checkpoint").read_text())
    assert last["version"] == 2
    tbl = pq.read_table(str(ckpt))
    rows = tbl.to_pylist()
    assert last["size"] == len(rows)
    protos = [r["protocol"] for r in rows if r["protocol"] is not None]
    metas = [r["metaData"] for r in rows if r["metaData"] is not None]
    adds = [r["add"] for r in rows if r["add"] is not None]
    assert len(protos) == 1 and protos[0]["minReaderVersion"] == 1
    assert len(metas) == 1
    # latest metaData wins: the evolved schema (with 'flag') is the one
    # checkpointed
    schema = StructType.fromJson(json.loads(metas[0]["schemaString"]))
    assert "flag" in schema.fieldNames()
    assert {a["path"] for a in adds} == _snapshot_paths(t)
    assert all(a["dataChange"] is False for a in adds)
    assert not any(r["remove"] is not None for r in rows)
    # checkpoint + later commits still replays correctly after more writes
    t.append(_df(spark, 90, 10))
    live = {a["path"] for a in adds}
    for d in range(last["version"] + 1, max(_log_versions(t)) + 1):
        for a in deltalog.read_actions(t.dir, d):
            if "remove" in a:
                live.discard(a["remove"]["path"])
            if "add" in a:
                live.add(a["add"]["path"])
    assert live == _snapshot_paths(t)


def test_checkpoint_requires_delta_log(spark, tmp_path):
    t = ManagedTable(spark, tmp_path / "wh", "orders")
    with pytest.raises(ValueError, match="no delta log"):
        t.write_delta_checkpoint()


def test_log_restart_clears_stale_checkpoint(spark, tmp_path):
    t = ManagedTable(spark, tmp_path / "wh", "orders")
    t.overwrite(_df(spark, 0, 20))
    t.append(_df(spark, 20, 20))
    t.write_delta_checkpoint()
    deltalog.commit_path(t.dir, 0).unlink()  # hole -> restart on heal
    t.heal_delta_log()
    # the stale checkpoint and _last_checkpoint must be gone — a reader
    # preferring them would reconstruct pre-restart state
    assert not list(deltalog.log_dir(t.dir).glob("*.checkpoint.parquet"))
    assert not (deltalog.log_dir(t.dir) / "_last_checkpoint").exists()
    assert _log_versions(t) == [0]
    assert _replay_live_set(t) == _snapshot_paths(t)


def test_concurrent_appends_keep_log_contiguous(spark, tmp_path):
    """Two writers racing on the same table: whatever interleaving the
    commit lock serializes, the delta log must come out contiguous and
    replay to the final snapshot (losers raise ConcurrentWriteError and
    retry — their aborted claims never enter the log)."""
    import threading

    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import ConcurrentWriteError

    t = ManagedTable(spark, tmp_path / "wh", "orders")
    t.overwrite(_df(spark, 0, 10))
    errors = []

    def writer(wid):
        from py4j.protocol import Py4JJavaError
        from pyspark.errors.exceptions.captured import CapturedException

        for i in range(3):
            for attempt in range(30):  # generous: pure contention flake
                try:
                    t.append(_df(spark, 1000 * wid + 10 * i, 5))
                    break
                except ConcurrentWriteError:
                    continue
                except (Py4JJavaError, CapturedException) as e:
                    # transient local-FS write failure (Hadoop
                    # RawLocalFileSystem shells out `chmod` per file;
                    # under hypervisor-steal freezes the fork can fail
                    # with TASK_WRITE_FAILED on the writer's OWN .crc).
                    # append discarded the claim — retrying is safe and
                    # is exactly what a production job would do. This
                    # was the historical "5 log files instead of 7"
                    # flake: the uncaught error killed the thread
                    # SILENTLY, so batches went missing with errors=[].
                    if "TASK_WRITE_FAILED" not in str(e):
                        errors.append(f"writer {wid} batch {i}: {e}")
                        return
                    continue
            else:
                errors.append(f"writer {wid} batch {i} never landed")

    threads = [threading.Thread(target=writer, args=(w,)) for w in (1, 2)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    vs = _log_versions(t)
    assert vs == list(range(len(vs))), vs
    # rich forensics — kept even though the historical flake is now
    # DIAGNOSED (r13: a transient TASK_WRITE_FAILED killed a writer
    # thread silently, so appends went missing with errors=[]; the
    # retry above absorbs it). If this fires again it is a NEW bug.
    forensic = {
        "log_versions": vs,
        "pointer_delta": t._pointer_state().get("delta"),
        "committed": t._pointer_state().get("committed"),
        "mt_version": t.current_version(),
        "rows": t.read().count(),
    }
    assert len(vs) == 7, forensic  # initial + 6 appends
    assert _replay_live_set(t) == _snapshot_paths(t)
    assert t.read().count() == 40


def test_history_and_detail(spark, tmp_path):
    t = ManagedTable(spark, tmp_path / "wh", "orders")
    t.overwrite(_df(spark, 0, 30))
    t.append(_df(spark, 30, 30))
    t.compact(target_partitions=1)
    hist = t.history().orderBy("version").collect()
    assert [r.operation for r in hist] == ["WRITE", "WRITE", "OPTIMIZE"]
    assert [r.version for r in hist] == [0, 1, 2]
    assert all(r.timestamp > 0 and r.num_files >= 1 for r in hist)
    # mt mapping is monotone and matches the pointer at the tip
    assert hist[-1].mt_version == t.current_version()

    d = t.detail()
    assert d["name"] == "orders" and d["mt_version"] == t.current_version()
    assert d["delta_version"] == 2 and d["num_files"] == 1
    assert d["num_rows"] == 60 and d["size_bytes"] > 0
    assert "id" in d["schema"]


def test_stray_json_does_not_mask_missing_commit(spark, tmp_path):
    """Hole detection counts VALIDATED commit filenames only: a stray
    non-commit .json dropped in _delta_log/ used to keep the bare file
    count equal while an earlier commit was actually missing, skipping
    the restart path — a stock reader then saw a log with holes. The
    same stray file also crashed history() on int(p.stem)."""
    t = ManagedTable(spark, tmp_path / "wh", "orders")
    t.overwrite(_df(spark, 0, 20))
    t.append(_df(spark, 20, 20))
    (deltalog.log_dir(t.dir) / "notes.json").write_text("{}")
    assert t.history().count() == 2  # stray file ignored, no crash
    deltalog.commit_path(t.dir, 0).unlink()  # real hole, count still 2
    t.append(_df(spark, 40, 20))  # must detect the hole and restart
    vs = [int(p.stem) for p in deltalog.commit_files(t.dir)]
    assert vs == [0, 1], vs  # restarted log + this commit
    actions0 = deltalog.read_actions(t.dir, 0)
    assert any("protocol" in a for a in actions0)
    assert _replay_live_set(t) == _snapshot_paths(t)


def test_last_checkpoint_never_regresses(spark, tmp_path):
    """Cadence checkpoints write OUTSIDE the commit lock, so a stalled
    writer can finish an OLD version's checkpoint after a newer one
    published — _last_checkpoint must keep pointing at the newest
    (vacuum keys log expiry off the newest checkpoint FILE and would
    otherwise strand readers on a deleted one), and the independent
    reader must survive even a dangling pointer."""
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.deltareader import read_delta
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    t = Catalog(spark, tmp_path / "wh").table("t")
    t.overwrite(spark.range(4).select(F.col("id").alias("k")))
    for i in range(12):
        t.append(spark.range(10 + i, 11 + i).select(F.col("id").alias("k")))
    lc = deltalog.log_dir(t.dir) / "_last_checkpoint"
    assert json.loads(lc.read_text())["version"] == 10
    # a stalled writer re-publishing an OLD checkpoint: pointer holds
    deltalog.write_checkpoint(t.dir, 5)
    assert json.loads(lc.read_text())["version"] == 10
    assert (deltalog.log_dir(t.dir) / f"{5:020d}.checkpoint.parquet").exists()
    # a NEWER one still advances it
    deltalog.write_checkpoint(t.dir, 12)
    assert json.loads(lc.read_text())["version"] == 12
    # dangling pointer (externally deleted file): reader falls back to
    # the newest checkpoint actually present
    (deltalog.log_dir(t.dir) / f"{12:020d}.checkpoint.parquet").unlink()
    assert read_delta(spark, t.dir).count() == t.read().count() == 16
