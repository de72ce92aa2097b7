"""Round-13 ADVICE regression tests.

1. DV protocol gate: any commit whose snapshot carries deletion
   vectors must publish the table-features protocol (reader v3 /
   writer v7 + named feature) so non-supporting stock clients refuse
   the table instead of silently serving tombstoned rows.
2. WriteSerializable ConcurrentAppendException rule: a read-dependent
   loser (merge/DELETE/UPDATE) must NOT rebase over an interleaved
   merge/DML winner whose ADDED files may match its read predicate.
3. gold_flow expectation exemption for delete change rows.
4. numDeletedRows must not double-count rows a rewrite folded from
   prior deletion vectors.
5. _sql_merge duplicate-source-key guard scoped to keys matching a
   TARGET row (insert-only duplicates are legal).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.cdc import scd1_merge
from end_to_end_azure_databricks_data_engineering_project_spark.sources import deltalog, deltareader
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import (
    Catalog,
    ManagedTable,
    OptimisticConcurrencyError,
)


def _ids(spark, lo, hi, val="x"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(val).alias("val"), F.lit(1).alias("seq")
    )


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(spark, tmp_path / "wh")


def _latest_protocol(table):
    """The reconciled protocol of the public log (latest action wins)."""
    proto = None
    for p in deltalog.commit_files(table.dir):
        for a in deltalog.read_actions(table.dir, int(p.stem)):
            if "protocol" in a:
                proto = a["protocol"]
    return proto


# ---------------------------------------------------------------- 1. DV gate
def test_dv_commit_bumps_protocol_to_table_features(spark, catalog):
    t = catalog.table("t")
    t.overwrite(
        _ids(spark, 0, 1000).repartitionByRange(2, "k").sortWithinPartitions("k")
    )
    assert _latest_protocol(t)["minReaderVersion"] == 1  # clean table: legacy
    assert t.delete_where("k = 5") is not None
    m = t._manifest(t.current_version())
    assert m.get("dv_added"), "expected the small delete to take the DV path"
    proto = _latest_protocol(t)
    assert proto["minReaderVersion"] == 3
    assert proto["minWriterVersion"] == 7
    assert deltalog.DV_FEATURE in proto["readerFeatures"]
    assert deltalog.DV_FEATURE in proto["writerFeatures"]
    # the supporting reader accepts it — and still folds the tombstone
    got = {r.k for r in deltareader.read_delta(spark, t.dir).collect()}
    assert 5 not in got and len(got) == 999
    # later DV-free commits must not downgrade
    t.append(_ids(spark, 2000, 2001))
    proto2 = _latest_protocol(t)
    assert proto2["minReaderVersion"] == 3


def test_dv_protocol_survives_checkpoint_roundtrip(spark, catalog):
    t = catalog.table("t")
    t.overwrite(
        _ids(spark, 0, 1000).repartitionByRange(2, "k").sortWithinPartitions("k")
    )
    assert t.delete_where("k = 7") is not None
    dv = t._pointer_state()["delta"]["version"]
    deltalog.write_checkpoint(t.dir, dv)
    proto, _, adds = deltalog.read_checkpoint(t.dir, dv)
    assert proto["minReaderVersion"] == 3
    assert deltalog.DV_FEATURE in (proto["readerFeatures"] or [])
    assert any(a.get("dv") for a in adds.values())
    # reader seeded from the checkpoint still gates + folds correctly
    got = {r.k for r in deltareader.read_delta(spark, t.dir).collect()}
    assert 7 not in got and len(got) == 999


def test_reader_refuses_unknown_reader_feature(spark, catalog, tmp_path):
    t = catalog.table("t")
    t.overwrite(_ids(spark, 0, 10))
    dv = t._pointer_state()["delta"]["version"]
    # append a protocol action demanding a feature this reader lacks
    # (AFTER the original — reconciliation takes the latest action)
    actions = deltalog.read_actions(t.dir, dv)
    actions.append({"protocol": {
        "minReaderVersion": 3, "minWriterVersion": 7,
        "readerFeatures": ["someFutureFeature"],
        "writerFeatures": ["someFutureFeature"],
    }})
    deltalog.commit_path(t.dir, dv).write_text(
        "".join(__import__("json").dumps(a) + "\n" for a in actions)
    )
    with pytest.raises(ValueError, match="someFutureFeature"):
        deltareader.read_delta(spark, t.dir)


def test_log_restart_with_dvs_opens_with_feature_protocol(spark, catalog):
    t = catalog.table("t")
    t.overwrite(
        _ids(spark, 0, 1000).repartitionByRange(2, "k").sortWithinPartitions("k")
    )
    assert t.delete_where("k = 3") is not None
    # simulate a user-deleted log: heal restarts at commit 0 with the
    # CURRENT snapshot (which carries DVs) — commit 0 must open with
    # the feature protocol, not the legacy one
    for p in deltalog.commit_files(t.dir):
        if int(p.stem) == 0:
            p.unlink()
    with pytest.warns(RuntimeWarning, match="heal"):
        t.heal_delta_log()
    proto = _latest_protocol(t)
    assert proto["minReaderVersion"] == 3
    assert deltalog.DV_FEATURE in proto["readerFeatures"]
    got = {r.k for r in deltareader.read_delta(spark, t.dir).collect()}
    assert 3 not in got and len(got) == 999


# ------------------------------------------- 2. read-dependent rebase gate
def _inject_before_commit(monkeypatch, spark, table, action):
    orig = ManagedTable._commit
    state = {"armed": True}

    def spy(self, v, *a, **kw):
        if state["armed"] and self.name == table.name:
            state["armed"] = False
            action(ManagedTable(spark, table.dir.parent, table.name))
        return orig(self, v, *a, **kw)

    monkeypatch.setattr(ManagedTable, "_commit", spy)


def test_delete_conflicts_with_merge_inserting_matching_rows(
    spark, catalog, monkeypatch
):
    """The advisory's exact scenario: winner MERGE inserts k=5000 into a
    new file while loser DELETE WHERE k=5000 (which touched a different
    file region) commits — rebasing would silently under-delete; it
    must raise instead."""
    t = catalog.table("t")
    t.overwrite(
        _ids(spark, 0, 200).repartitionByRange(4, "k").sortWithinPartitions("k")
    )

    def merge_insert_210(t2):
        # k=210 matches no target row → pure insert into a NEW file:
        # the winner's read/remove set is empty, so the old (r12)
        # disjointness check alone would happily rebase the loser
        t2.merge_keyed(
            _ids(spark, 210, 211, "winner").withColumn("seq", F.lit(2)),
            ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"),
        )

    _inject_before_commit(monkeypatch, spark, t, merge_insert_210)
    with pytest.raises(OptimisticConcurrencyError, match="read predicate"):
        # matches rows 190..199 (so it commits something) and its bound
        # envelope [190, 220] covers the winner's inserted k=210 — a
        # rebase would leave k=210 alive though the DELETE committed
        # after the insert (silent under-delete)
        t.delete_where("k >= 190 AND k <= 220")
    got = {r.k: r.val for r in t.read().collect()}
    # winner's insert intact; loser's delete did NOT partially apply
    assert got[210] == "winner" and 190 in got and 199 in got


def test_delete_still_rebases_over_nonmatching_merge(
    spark, catalog, monkeypatch
):
    """Bounds prove the winner's adds can't match → the rebase lands."""
    t = catalog.table("t")
    t.overwrite(
        _ids(spark, 0, 200).repartitionByRange(4, "k").sortWithinPartitions("k")
    )
    _inject_before_commit(
        monkeypatch, spark, t,
        lambda t2: t2.merge_keyed(
            _ids(spark, 0, 1, "w").withColumn("seq", F.lit(2)),
            ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"),
        ),
    )
    assert t.delete_where("k = 199") is not None
    got = {r.k: r.val for r in t.read().collect()}
    assert got[0] == "w" and 199 not in got and len(got) == 199


def test_delete_still_rebases_over_blind_append_matching_predicate(
    spark, catalog, monkeypatch
):
    """WriteSerializable exemption: the loser serializes BEFORE an
    interleaved blind append — even one whose rows match its predicate
    (the appended rows survive, the serial order loser-then-append)."""
    t = catalog.table("t")
    t.overwrite(
        _ids(spark, 0, 200).repartitionByRange(4, "k").sortWithinPartitions("k")
    )
    _inject_before_commit(
        monkeypatch, spark, t,
        lambda t2: t2.append(_ids(spark, 150, 151, "appended")),
    )
    assert t.delete_where("k = 150") is not None
    got = {r.k: r.val for r in t.read().collect()}
    # the pre-existing k=150 row is deleted; the appended one survives
    assert got.get(150) == "appended"


def test_unbounded_dml_conflicts_with_any_merge_adds(
    spark, catalog, monkeypatch
):
    """A condition the bounds parser can't see (OR) leaves no read
    envelope — rebasing over a merge winner must conservatively raise."""
    t = catalog.table("t")
    t.overwrite(
        _ids(spark, 0, 200).repartitionByRange(4, "k").sortWithinPartitions("k")
    )
    _inject_before_commit(
        monkeypatch, spark, t,
        lambda t2: t2.merge_keyed(
            _ids(spark, 0, 1, "w").withColumn("seq", F.lit(2)),
            ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"),
        ),
    )
    with pytest.raises(OptimisticConcurrencyError, match="unbounded"):
        t.delete_where("k = 199 OR k = 198")


# -------------------------------------- 3. deletes bypass expectation gating
def test_gold_delete_propagates_even_when_old_values_fail_expectations(
    spark, tmp_path
):
    """A delete change row carries the deleted row's OLD column values;
    if those have since drifted out of the expectation envelope the
    removal must still apply — gating it would leave the gold SCD key
    open forever (and under 'erase' silently skip a GDPR request)."""
    import dataclasses
    import datetime as dt

    from end_to_end_azure_databricks_data_engineering_project_spark.config import TABLE_BY_NAME
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.cdc import END_AT
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.ingest import ingest_all
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.watermark import WatermarkStore
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import (
        build_medallion_pipeline,
    )

    t0 = dt.datetime(2025, 1, 1)
    cfg = dataclasses.replace(
        TABLE_BY_NAME["dim_user"],
        expectations={
            "valid_key": "user_id IS NOT NULL",
            "has_country": "country IS NOT NULL",
        },
    )
    users = spark.createDataFrame(
        [(i, f"user {i}", "US", "Free", None, None, t0) for i in range(1, 4)],
        "user_id int, user_name string, country string,"
        " subscription_type string, start_date date, end_date date,"
        " updated_at timestamp",
    )
    store = WatermarkStore(tmp_path / "state")
    ingest_all(spark, [cfg], {"dim_user": users}, str(tmp_path / "bronze"), store)
    pipe, catalog = build_medallion_pipeline(
        spark, [cfg], str(tmp_path / "bronze"), str(tmp_path / "warehouse"),
        str(tmp_path / "state"),
    )
    pipe.run_all()
    silver = catalog.table("silver_dim_user")
    gold = catalog.table("gold_dim_user")
    # drift user 2 out of the expectation envelope: the UPDATE change
    # row is (correctly) dropped by the gate — gold keeps the US row
    silver.update_where(
        "user_id = 2",
        {"country": "NULL", "updated_at": "timestamp'2025-06-01'"},
    )
    pipe.flows["gold_dim_user"].run()
    assert gold.read().filter(
        "user_id = 2 AND " + END_AT + " IS NULL"
    ).count() == 1
    # now the deletion: its change row carries country=NULL — before
    # the fix the gate swallowed it and the key never closed
    silver.delete_where("user_id = 2")
    pipe.flows["gold_dim_user"].run()
    assert gold.read().filter(
        "user_id = 2 AND " + END_AT + " IS NULL"
    ).count() == 0, "delete change row was swallowed by the expectation gate"


# ------------------------------------------------ 4. numDeletedRows folding
def test_num_deleted_rows_not_double_counted_after_dv_fold(spark, catalog):
    import json as _json

    t = catalog.table("t")
    t.overwrite(
        _ids(spark, 0, 1000).repartitionByRange(1, "k").sortWithinPartitions("k")
    )
    assert t.delete_where("k < 3") is not None        # DV: 3 tombstones
    v2 = t.delete_where("k >= 3 AND k < 500")         # big: rewrites the file
    assert v2 is not None
    m = t._manifest(v2)
    assert m["added"] and m["removed"], "expected a rewrite, not a DV"
    dv = t._pointer_state()["delta"]["version"]
    metrics = None
    for a in deltalog.read_actions(t.dir, dv):
        if "commitInfo" in a:
            metrics = a["commitInfo"]["operationMetrics"]
    # 497 rows deleted NOW; the 3 previously-tombstoned rows the
    # rewrite folded away were already reported by the DV commit
    assert int(metrics["numDeletedRows"]) == 497
    assert t.read().count() == 500


# ------------------------------------------------- 5. scoped MERGE dup guard
def test_sql_merge_allows_insert_only_duplicate_source_keys(spark, catalog):
    t = catalog.table("tgt")
    t.overwrite(_ids(spark, 0, 10))
    src = _ids(spark, 100, 102, "dup").unionByName(_ids(spark, 100, 101, "dup"))
    src.createOrReplaceTempView("dup_src")
    # duplicate key 100 matches NO target row: legal — all insert
    catalog.sql(
        "MERGE INTO tgt USING dup_src ON tgt.k = dup_src.k "
        "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
    )
    assert t.read().filter("k = 100").count() == 2
    assert t.read().count() == 13


def test_sql_merge_still_rejects_duplicates_matching_target(spark, catalog):
    t = catalog.table("tgt")
    t.overwrite(_ids(spark, 0, 10))
    src = _ids(spark, 5, 7, "dup").unionByName(_ids(spark, 5, 6, "dup"))
    src.createOrReplaceTempView("dup_src2")
    with pytest.raises(ValueError, match="multiple rows per key"):
        catalog.sql(
            "MERGE INTO tgt USING dup_src2 ON tgt.k = dup_src2.k "
            "WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *"
        )


# ------------------------------------- 6. bucketed drain leftover-robustness
def test_bucketed_drain_heals_stale_warehouse_leftover(spark, tmp_path):
    """r12 verdict #2: a killed run's orphaned
    ``spark-warehouse/<index>/`` directory (present on disk, absent
    from the metastore) must not wedge the next drain with
    LOCATION_ALREADY_EXISTS — the drain clears the orphan and runs."""
    from pathlib import Path
    from urllib.parse import urlparse

    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import (
        run_neardup_drain_bucketed,
    )

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .limit(50)
    )
    catalog = Catalog(spark, tmp_path / "warehouse")
    index = "neardup_index_stale_test"
    spark.sql(f"DROP TABLE IF EXISTS {index}")
    wh = Path(urlparse(spark.conf.get("spark.sql.warehouse.dir")).path)
    stale = wh / index
    stale.mkdir(parents=True, exist_ok=True)
    (stale / "part-orphan.parquet").write_bytes(b"not a real parquet")
    try:
        n_p, n_i = run_neardup_drain_bucketed(
            spark, catalog, docs, epoch=0, index_table=index,
            num_hashes=16, bands=8, shingle_n=3,
        )
        assert n_i > 0
        assert spark.table(index).count() == n_i
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {index}")
