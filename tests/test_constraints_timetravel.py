"""CHECK constraints (Delta ALTER TABLE ADD CONSTRAINT) and timestamp
time travel (Delta TIMESTAMP AS OF) on ManagedTable.

Constraint enforcement is WRITE-SIDE and zero-pass: the guard rides the
output projection of every write path (append / overwrite / merge /
predicate DML), so a violating row raises before any file lands —
never a post-hoc scan. Validation at ADD time scans once, like Delta.
``read_as_of`` maps a wall-clock instant to the latest commit at or
before it via the transaction log's commitInfo timestamps with Delta's
monotonic adjustment, honoring the same retention floor as ``read_at``.
"""

from __future__ import annotations

import time

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import (
    Catalog,
    ConcurrentWriteError,
)


@pytest.fixture()
def table(spark, tmp_path):
    return Catalog(spark, tmp_path / "wh").table("t")


def _base(spark, table):
    table.overwrite(
        spark.createDataFrame([(1, 10.0), (2, 20.0)], "k int, bal double")
    )
    table.add_constraint("bal_pos", "bal >= 0")
    return table


# -- CHECK constraints ------------------------------------------------------


def test_violating_append_raises_and_leaves_table_unchanged(spark, table):
    _base(spark, table)
    v = table.current_version()
    with pytest.raises(Exception, match="bal_pos"):
        table.append(spark.createDataFrame([(3, -1.0)], "k int, bal double"))
    assert table.current_version() == v
    assert table.read().count() == 2


def test_compliant_writes_pass_and_null_passes(spark, table):
    _base(spark, table)
    table.append(spark.createDataFrame([(3, 5.0)], "k int, bal double"))
    # SQL CHECK three-valued logic: NULL satisfies the constraint
    table.append(spark.createDataFrame([(4, None)], "k int, bal double"))
    assert table.read().count() == 4


def test_constraint_enforced_on_merge_and_dml(spark, table):
    _base(spark, table)
    bad = spark.createDataFrame([(1, -5.0)], "k int, bal double")
    with pytest.raises(Exception, match="bal_pos"):
        table.merge_keyed(
            bad, ["k"],
            lambda cur, b: cur.join(b.select("k"), "k", "left_anti").unionByName(b),
        )
    with pytest.raises(Exception, match="bal_pos"):
        table.update_where("k = 1", {"bal": "-99.0"})
    assert table.read().filter("bal < 0").count() == 0


def test_add_constraint_validates_existing_rows(spark, table):
    _base(spark, table)
    with pytest.raises(ValueError, match="existing rows violate"):
        table.add_constraint("k_small", "k < 2")
    assert "k_small" not in table.constraints()


def test_add_conflicting_definition_raises_drop_then_rebind(spark, table):
    _base(spark, table)
    table.add_constraint("bal_pos", "bal >= 0")  # idempotent re-add: same expr
    with pytest.raises(ConcurrentWriteError, match="already"):
        table.add_constraint("bal_pos", "bal > 5")
    table.drop_constraint("bal_pos")
    with pytest.raises(KeyError):
        table.drop_constraint("bal_pos")
    table.drop_constraint("bal_pos", if_exists=True)
    table.append(spark.createDataFrame([(9, -1.0)], "k int, bal double"))
    assert table.read().filter("bal < 0").count() == 1


def test_constraint_persists_across_handles(spark, table, tmp_path):
    _base(spark, table)
    t2 = Catalog(spark, tmp_path / "wh").table("t")
    assert t2.constraints() == {"bal_pos": "bal >= 0"}
    with pytest.raises(Exception, match="bal_pos"):
        t2.append(spark.createDataFrame([(3, -1.0)], "k int, bal double"))


def test_constraint_on_partitioned_table(spark, table):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 6.0)], "k int, p string, bal double"
    )
    table.overwrite(df, partition_by=["p"])
    table.add_constraint("bal_pos", "bal >= 0")
    table.append(
        spark.createDataFrame([(3, "a", 7.0)], "k int, p string, bal double")
    )
    with pytest.raises(Exception, match="bal_pos"):
        table.append(
            spark.createDataFrame([(4, "c", -1.0)], "k int, p string, bal double")
        )
    assert table.read().count() == 3


def test_constraint_eager_fallback_for_non_atomic_schema(spark, table):
    """A frame with no atomic column can't host the inline guard — the
    eager one-row probe must still reject violations."""
    df = spark.createDataFrame([([1, 2],), ([3],)], "arr array<int>")
    table.overwrite(df)
    table.add_constraint("nonempty", "size(arr) > 0")
    table.append(spark.createDataFrame([([7],)], "arr array<int>"))
    with pytest.raises(Exception, match="nonempty"):
        table.append(spark.createDataFrame([([],)], "arr array<int>"))
    assert table.read().count() == 3


def test_multiple_constraints_all_enforced(spark, table):
    _base(spark, table)
    table.add_constraint("k_range", "k BETWEEN 0 AND 100")
    with pytest.raises(Exception, match="k_range"):
        table.append(spark.createDataFrame([(500, 1.0)], "k int, bal double"))
    with pytest.raises(Exception, match="bal_pos"):
        table.append(spark.createDataFrame([(50, -1.0)], "k int, bal double"))
    table.append(spark.createDataFrame([(50, 1.0)], "k int, bal double"))
    assert table.read().count() == 3


# -- TIMESTAMP AS OF --------------------------------------------------------


def test_read_as_of_maps_instants_to_versions(spark, table):
    table.overwrite(spark.createDataFrame([(1,)], "k int"))
    table.append(spark.createDataFrame([(2,)], "k int"))
    table.append(spark.createDataFrame([(3,)], "k int"))
    stamps = [ts for _, ts in sorted(
        (r.version, r.timestamp) for r in table.history().collect()
    )]
    # ADJUSTED stamps (same monotonic rule read_as_of applies) so the
    # mapping is exact even if two commits land in the same millisecond
    adj: list[int] = []
    for raw in stamps:
        adj.append(max(raw, adj[-1] + 1) if adj else raw)
    # exactly AT a commit's (adjusted) timestamp → that commit's snapshot
    assert table.read_as_of(adj[0]).count() == 1
    assert table.read_as_of(adj[1]).count() == 2
    # far future → head
    assert table.read_as_of(int(time.time() * 1000) + 10_000).count() == 3


def test_read_as_of_before_first_commit_raises(spark, table):
    table.overwrite(spark.createDataFrame([(1,)], "k int"))
    first_ts = table.history().agg(F.min("timestamp")).first()[0]
    with pytest.raises(ValueError, match="no commit at or before"):
        table.read_as_of(first_ts - 60_000)


def test_read_as_of_accepts_iso_and_datetime(spark, table):
    import datetime as dt

    table.overwrite(spark.createDataFrame([(1,)], "k int"))
    now = dt.datetime.now(dt.timezone.utc)
    assert table.read_as_of(now).count() == 1
    assert table.read_as_of(now.isoformat()).count() == 1


def test_read_as_of_honors_log_retention_floor(spark, table):
    """After vacuum expires pre-checkpoint log files, instants older
    than the earliest RETAINED commit raise instead of silently
    resolving to a wrong version."""
    table.delta_checkpoint_interval = 2
    table.overwrite(spark.createDataFrame([(0,)], "k int"))
    first_ts = table.history().agg(F.min("timestamp")).first()[0]
    for i in range(1, 7):
        table.append(spark.createDataFrame([(i,)], "k int"))
    table.vacuum(keep=1)
    from end_to_end_azure_databricks_data_engineering_project_spark.sources import deltalog

    floor_v = int(deltalog.commit_files(table.dir)[0].stem)
    if floor_v > 0:  # expiry actually happened
        with pytest.raises(ValueError, match="earliest retained"):
            table.read_as_of(first_ts - 1)
    # head is always reachable
    assert table.read_as_of(int(time.time() * 1000) + 10_000).count() == 7


def test_same_millisecond_commits_resolve_to_latest(spark, table):
    """Delta's monotonic adjustment: commits stamped in the same ms are
    ordered v, v+1ms, ... — an instant at that ms resolves to the LAST
    commit whose adjusted stamp fits."""
    table.overwrite(spark.createDataFrame([(0,)], "k int"))
    for i in range(1, 4):
        table.append(spark.createDataFrame([(i,)], "k int"))
    hist = sorted((r.timestamp, r.mt_version, r.version) for r in table.history().collect())
    last_ts = hist[-1][0]
    # an instant comfortably past every raw stamp (adjustment adds at
    # most len(hist) ms) must resolve to the head
    assert table.read_as_of(last_ts + len(hist) + 1).count() == 4


def test_restore_as_of_rolls_back_to_instant(spark, table):
    """RESTORE TO TIMESTAMP: forward-committed rollback to the snapshot
    live at the instant; the rolled-past history stays auditable."""
    table.overwrite(spark.createDataFrame([(1,)], "k int"))
    table.append(spark.createDataFrame([(2,)], "k int"))
    stamps = [ts for _, ts in sorted(
        (r.version, r.timestamp) for r in table.history().collect()
    )]
    adj: list[int] = []
    for raw in stamps:
        adj.append(max(raw, adj[-1] + 1) if adj else raw)
    table.append(spark.createDataFrame([(3,)], "k int"))
    v = table.restore_as_of(adj[1])  # instant of the 2-row snapshot
    assert v == table.current_version()
    assert sorted(r.k for r in table.read().collect()) == [1, 2]
    assert table._op(v) == "restore"


def test_constraints_surface_in_delta_metadata(spark, table):
    """Protocol fidelity: a stock Delta reader sees CHECK constraints as
    delta.constraints.* in metaData.configuration, re-emitted on the
    first data commit after every add/drop."""
    import json

    from end_to_end_azure_databricks_data_engineering_project_spark.sources import deltalog

    _base(spark, table)
    table.append(spark.createDataFrame([(3, 1.0)], "k int, bal double"))

    def latest_metadata():
        meta = None
        for p in deltalog.commit_files(table.dir):
            for line in p.read_text().splitlines():
                a = json.loads(line)
                if "metaData" in a:
                    meta = a["metaData"]
        return meta

    cfg = latest_metadata()["configuration"]
    assert cfg.get("delta.constraints.bal_pos") == "bal >= 0"
    table.drop_constraint("bal_pos")
    table.append(spark.createDataFrame([(4, 1.0)], "k int, bal double"))
    cfg = latest_metadata()["configuration"]
    assert "delta.constraints.bal_pos" not in cfg
    # no further config change: the next commit does NOT re-emit
    n_meta = sum(
        1 for p in deltalog.commit_files(table.dir)
        for line in p.read_text().splitlines() if '"metaData"' in line
    )
    table.append(spark.createDataFrame([(5, 1.0)], "k int, bal double"))
    n_meta_after = sum(
        1 for p in deltalog.commit_files(table.dir)
        for line in p.read_text().splitlines() if '"metaData"' in line
    )
    assert n_meta_after == n_meta


def test_constraint_bumps_writer_protocol(spark, table):
    """Review finding: a stock v2 writer must be FENCED once constraints
    exist — the commit after add_constraint carries a protocol action
    raising minWriterVersion to 3 (PROTOCOL.md CHECK-constraint
    requirement)."""
    import json

    from end_to_end_azure_databricks_data_engineering_project_spark.sources import deltalog

    table.overwrite(spark.createDataFrame([(1, 5.0)], "k int, bal double"))
    v0_actions = deltalog.read_actions(table.dir, 0)
    assert [a["protocol"]["minWriterVersion"]
            for a in v0_actions if "protocol" in a] == [2]
    table.add_constraint("bal_pos", "bal >= 0")
    table.append(spark.createDataFrame([(2, 1.0)], "k int, bal double"))
    protos = [
        a["protocol"]["minWriterVersion"]
        for p in deltalog.commit_files(table.dir)
        for line in p.read_text().splitlines()
        for a in [json.loads(line)] if "protocol" in a
    ]
    assert protos == [2, 3]
    # no repeated re-emission once upgraded
    table.append(spark.createDataFrame([(3, 1.0)], "k int, bal double"))
    protos2 = [
        a["protocol"]["minWriterVersion"]
        for p in deltalog.commit_files(table.dir)
        for line in p.read_text().splitlines()
        for a in [json.loads(line)] if "protocol" in a
    ]
    assert protos2 == [2, 3]


def test_add_constraint_revalidates_after_concurrent_write(
    spark, table, tmp_path, monkeypatch
):
    """The r11-advisor TOCTOU: a write landing between the validation
    scan and the pointer bind. The bind re-checks the version UNDER the
    commit lock and re-validates — a violating interleaved row must
    fail the add (old behavior: it bound anyway, leaving committed rows
    that violate the 'validated at bind' contract)."""
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import ManagedTable

    table.overwrite(spark.createDataFrame([(1, 10.0)], "k int, bal double"))
    racer = Catalog(spark, tmp_path / "wh").table("t")
    fired = {"n": 0}
    orig = ManagedTable.current_version

    def raced(self):
        v = orig(self)
        if self is table and fired["n"] == 0:
            fired["n"] += 1
            # a writer lands AFTER the validation snapshot was chosen
            racer.append(spark.createDataFrame([(2, -5.0)], "k int, bal double"))
        return v

    monkeypatch.setattr(ManagedTable, "current_version", raced)
    with pytest.raises(ValueError, match="existing rows violate"):
        table.add_constraint("bal_pos", "bal >= 0")
    assert fired["n"] == 1  # the retry re-validated at the new head
    assert table.constraints() == {}


def test_add_constraint_retry_binds_when_interleaved_rows_comply(
    spark, table, tmp_path, monkeypatch
):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import ManagedTable

    table.overwrite(spark.createDataFrame([(1, 10.0)], "k int, bal double"))
    racer = Catalog(spark, tmp_path / "wh").table("t")
    fired = {"n": 0}
    orig = ManagedTable.current_version

    def raced(self):
        v = orig(self)
        if self is table and fired["n"] == 0:
            fired["n"] += 1
            racer.append(spark.createDataFrame([(2, 5.0)], "k int, bal double"))
        return v

    monkeypatch.setattr(ManagedTable, "current_version", raced)
    table.add_constraint("bal_pos", "bal >= 0")
    assert table.constraints() == {"bal_pos": "bal >= 0"}
