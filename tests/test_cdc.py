"""SCD1/SCD2 apply-changes semantics — mirrors the reference's two-phase
fixture protocol (FIXTURES.md): initial load, then an incremental batch
with updates, new keys, in-batch duplicate keys, out-of-order sequences,
and no-op changes."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.cdc import (
    END_AT,
    START_AT,
    apply_changes,
    scd1_merge,
    scd2_apply,
)
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import ManagedTable

T0 = dt.datetime(2025, 1, 1, 0, 0, 0)
T1 = dt.datetime(2025, 2, 1, 0, 0, 0)
T2 = dt.datetime(2025, 3, 1, 0, 0, 0)


def _users(spark, rows):
    return spark.createDataFrame(
        rows, "user_id int, name string, plan string, updated_at timestamp"
    )


@pytest.fixture()
def initial(spark):
    return _users(
        spark,
        [
            (1, "ann", "Free", T0),
            (2, "bob", "Free", T0),
            (3, "cat", "Premium", T0),
        ],
    )


def test_scd2_initial_load_all_open(spark, initial, tmp_path):
    t = ManagedTable(spark, tmp_path, "dim_user")
    apply_changes(t, initial, keys=["user_id"], sequence_by="updated_at", scd_type=2)
    out = t.read()
    assert out.count() == 3
    assert out.filter(F.col(END_AT).isNotNull()).count() == 0
    assert out.filter(F.col(START_AT) == F.col("updated_at")).count() == 3


def test_scd2_update_closes_and_opens(spark, initial, tmp_path):
    t = ManagedTable(spark, tmp_path, "dim_user")
    apply_changes(t, initial, ["user_id"], "updated_at", 2)
    batch = _users(spark, [(1, "ann", "Premium", T1), (4, "dan", "Free", T1)])
    apply_changes(t, batch, ["user_id"], "updated_at", 2)
    out = t.read().orderBy("user_id", START_AT).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.user_id, []).append(r)
    # updated key: 2 versions, old closed at T1, new open
    assert len(by_key[1]) == 2
    old, new = by_key[1]
    assert old.plan == "Free" and old[END_AT] == T1
    assert new.plan == "Premium" and new[START_AT] == T1 and new[END_AT] is None
    # untouched keys: 1 open version
    assert len(by_key[2]) == 1 and by_key[2][0][END_AT] is None
    # new key: 1 open version
    assert len(by_key[4]) == 1 and by_key[4][0][END_AT] is None


def test_scd2_multiple_changes_in_one_batch_chain(spark, initial, tmp_path):
    t = ManagedTable(spark, tmp_path, "dim_user")
    apply_changes(t, initial, ["user_id"], "updated_at", 2)
    batch = _users(spark, [(1, "ann", "Family", T1), (1, "ann", "Premium", T2)])
    apply_changes(t, batch, ["user_id"], "updated_at", 2)
    rows = t.read().filter("user_id = 1").orderBy(START_AT).collect()
    assert [r.plan for r in rows] == ["Free", "Family", "Premium"]
    assert rows[0][END_AT] == T1 and rows[1][END_AT] == T2 and rows[2][END_AT] is None


def test_scd2_out_of_order_and_replay_ignored(spark, initial, tmp_path):
    t = ManagedTable(spark, tmp_path, "dim_user")
    apply_changes(t, initial, ["user_id"], "updated_at", 2)
    apply_changes(t, _users(spark, [(1, "ann", "Premium", T2)]), ["user_id"], "updated_at", 2)
    before = sorted(t.read().collect())
    # older-than-current change and an exact replay must both be no-ops
    stale = _users(spark, [(1, "ann", "Family", T1), (1, "ann", "Premium", T2)])
    apply_changes(t, stale, ["user_id"], "updated_at", 2)
    assert sorted(t.read().collect()) == before


def test_scd2_noop_change_suppressed(spark, initial, tmp_path):
    t = ManagedTable(spark, tmp_path, "dim_user")
    apply_changes(t, initial, ["user_id"], "updated_at", 2)
    noop = _users(spark, [(2, "bob", "Free", T1)])  # same attrs, newer seq
    apply_changes(t, noop, ["user_id"], "updated_at", 2)
    assert t.read().filter("user_id = 2").count() == 1


def test_scd1_last_write_wins(spark, tmp_path):
    t = ManagedTable(spark, tmp_path, "fact")
    first = _users(spark, [(1, "a", "x", T0), (2, "b", "x", T0)])
    apply_changes(t, first, ["user_id"], "updated_at", 1)
    batch = _users(
        spark,
        [(1, "a", "y", T2), (1, "a", "z", T1), (3, "c", "x", T1)],  # out of order in batch
    )
    apply_changes(t, batch, ["user_id"], "updated_at", 1)
    out = {r.user_id: r for r in t.read().collect()}
    assert len(out) == 3
    assert out[1].plan == "y" and out[1].updated_at == T2  # latest wins
    assert out[2].plan == "x"
    # stale arrival after the fact is ignored
    apply_changes(t, _users(spark, [(1, "a", "old", T0)]), ["user_id"], "updated_at", 1)
    assert {r.plan for r in t.read().filter("user_id = 1").collect()} == {"y"}


def test_scd1_merge_pure_transform(spark):
    cur = _users(spark, [(1, "a", "x", T0)])
    batch = _users(spark, [(1, "a", "y", T1), (2, "b", "x", T0)])
    out = {r.user_id: r for r in scd1_merge(cur, batch, ["user_id"], "updated_at").collect()}
    assert out[1].plan == "y" and len(out) == 2


def test_scd2_date_sequence_column(spark, tmp_path):
    """DimDate sequences by a DATE column (reference DimDate.py:18)."""
    df = spark.createDataFrame(
        [(20250101, dt.date(2025, 1, 1), "Wednesday")], "date_key int, date date, weekday string"
    )
    t = ManagedTable(spark, tmp_path, "dim_date")
    apply_changes(t, df, ["date_key"], "date", 2)
    row = t.read().first()
    assert row[START_AT] == dt.date(2025, 1, 1) and row[END_AT] is None


def test_scd2_delete_closes_without_reopen(spark, initial, tmp_path):
    t = ManagedTable(spark, tmp_path, "dim_user")
    apply_changes(t, initial, ["user_id"], "updated_at", 2)
    batch = _users(spark, [(1, "ann", "__DELETE__", T1)])
    apply_changes(t, batch, ["user_id"], "updated_at", 2,
                  delete_expr="plan = '__DELETE__'")
    rows = t.read().filter("user_id = 1").collect()
    assert len(rows) == 1
    assert rows[0].plan == "Free" and rows[0][END_AT] == T1  # closed, no open row
    # later change re-opens the key
    apply_changes(t, _users(spark, [(1, "ann", "Premium", T2)]), ["user_id"], "updated_at", 2)
    open_rows = t.read().filter(f"user_id = 1 AND {END_AT} IS NULL").collect()
    assert len(open_rows) == 1 and open_rows[0].plan == "Premium"


def test_scd2_track_history_except(spark, tmp_path):
    t = ManagedTable(spark, tmp_path, "d")
    first = _users(spark, [(1, "ann", "Free", T0)])
    apply_changes(t, first, ["user_id"], "updated_at", 2,
                  track_history_except=["name"])
    # change ONLY the untracked column → no new version
    apply_changes(t, _users(spark, [(1, "ANN!", "Free", T1)]), ["user_id"], "updated_at", 2,
                  track_history_except=["name"])
    assert t.read().count() == 1
    # change a tracked column → new version
    apply_changes(t, _users(spark, [(1, "ANN!", "Premium", T2)]), ["user_id"], "updated_at", 2,
                  track_history_except=["name"])
    assert t.read().count() == 2


def test_scd1_delete_removes_key(spark, tmp_path):
    t = ManagedTable(spark, tmp_path, "f")
    apply_changes(t, _users(spark, [(1, "a", "x", T0), (2, "b", "x", T0)]),
                  ["user_id"], "updated_at", 1)
    apply_changes(t, _users(spark, [(1, "a", "__DELETE__", T1)]),
                  ["user_id"], "updated_at", 1, delete_expr="plan = '__DELETE__'")
    assert {r.user_id for r in t.read().collect()} == {2}
    # stale delete (older than current) is ignored
    apply_changes(t, _users(spark, [(2, "b", "__DELETE__", T0 - dt.timedelta(days=1))]),
                  ["user_id"], "updated_at", 1, delete_expr="plan = '__DELETE__'")
    assert {r.user_id for r in t.read().collect()} == {2}


def test_scd2_stale_replay_after_delete_does_not_resurrect(spark):
    """r6 review: after a delete closes a key, a replayed/late row with
    an older sequence must be dropped as stale, not re-open the key."""
    import datetime as dt

    s1, s2 = dt.datetime(2025, 1, 1), dt.datetime(2025, 2, 1)
    t = scd2_apply(
        None,
        spark.createDataFrame([(1, "v1", s1, 0)], "k int, v string, ts timestamp, is_del int"),
        keys=["k"], seq="ts", delete_expr="is_del = 1",
    )
    t = spark.createDataFrame(t.collect(), t.schema)
    t = scd2_apply(
        t,
        spark.createDataFrame([(1, "v1", s2, 1)], "k int, v string, ts timestamp, is_del int"),
        keys=["k"], seq="ts", delete_expr="is_del = 1",
    )
    t = spark.createDataFrame(t.collect(), t.schema)
    # key 1 is closed at s2; replay batch 1 (seq s1 <= s2)
    out = scd2_apply(
        t,
        spark.createDataFrame([(1, "v1", s1, 0)], "k int, v string, ts timestamp, is_del int"),
        keys=["k"], seq="ts", delete_expr="is_del = 1",
    )
    rows = out.collect()
    assert all(r[END_AT] is not None for r in rows)  # key stays deleted
    # a GENUINELY newer change still re-opens
    s3 = dt.datetime(2025, 3, 1)
    out2 = scd2_apply(
        t,
        spark.createDataFrame([(1, "v2", s3, 0)], "k int, v string, ts timestamp, is_del int"),
        keys=["k"], seq="ts", delete_expr="is_del = 1",
    )
    open_rows = [r for r in out2.collect() if r[END_AT] is None]
    assert len(open_rows) == 1 and open_rows[0].v == "v2"


def test_scd2_batch_missing_target_column_fails_loudly(spark):
    """A batch omitting a target data column must raise (scd1_merge's
    behavior) — the old projection silently NULLed the column for every
    rewritten row."""
    import datetime as dt

    import pytest as _pytest

    s1 = dt.datetime(2025, 1, 1)
    t = scd2_apply(
        None,
        spark.createDataFrame(
            [(1, "a", "US", s1)], "k int, v string, country string, ts timestamp"
        ),
        keys=["k"], seq="ts",
    )
    t = spark.createDataFrame(t.collect(), t.schema)
    bad = spark.createDataFrame([(1, "b", dt.datetime(2025, 2, 1))], "k int, v string, ts timestamp")
    with _pytest.raises(ValueError, match="missing target column"):
        scd2_apply(t, bad, keys=["k"], seq="ts")


def test_scd2_erase_purges_history_and_respects_ordering(spark, initial, tmp_path):
    """delete_mode='erase' (GDPR, r12): a WINNING delete purges the
    key's whole history — but a STALE delete (older sequence than the
    open version, e.g. a change-feed duplicate-collapse artifact or a
    replayed old batch) must NOT purge a since-re-created key."""
    t = ManagedTable(spark, tmp_path, "dim_user")
    apply_changes(t, initial, ["user_id"], "updated_at", 2)
    # build history: ann Free(T0) -> Premium(T1)
    apply_changes(t, _users(spark, [(1, "ann", "Premium", T1)]),
                  ["user_id"], "updated_at", 2)
    assert t.read().filter("user_id = 1").count() == 2
    # winning delete at T2, erase mode: history gone, others untouched
    apply_changes(t, _users(spark, [(1, "ann", "__DELETE__", T2)]),
                  ["user_id"], "updated_at", 2,
                  delete_expr="plan = '__DELETE__'", delete_mode="erase")
    assert t.read().filter("user_id = 1").count() == 0
    assert t.read().filter(f"{END_AT} IS NULL").count() == 2
    # stale delete for bob (T0 == his open START_AT is a tie → wins and
    # erases; strictly-older T_old for cat after an update must NOT)
    apply_changes(t, _users(spark, [(3, "cat", "Gold", T2)]),
                  ["user_id"], "updated_at", 2)
    apply_changes(t, _users(spark, [(3, "cat", "__DELETE__", T0)]),
                  ["user_id"], "updated_at", 2,
                  delete_expr="plan = '__DELETE__'", delete_mode="erase")
    assert t.read().filter("user_id = 3").count() == 2  # stale: no purge
    # delete followed by re-insert in ONE batch: key re-created, no purge
    apply_changes(
        t,
        _users(spark, [(2, "bob", "__DELETE__", T1),
                       (2, "bob", "Premium", T2)]),
        ["user_id"], "updated_at", 2,
        delete_expr="plan = '__DELETE__'", delete_mode="erase",
    )
    rows = t.read().filter("user_id = 2").collect()
    assert any(r[END_AT] is None and r.plan == "Premium" for r in rows)


def test_scd1_erase_equals_close(spark, tmp_path):
    t = ManagedTable(spark, tmp_path, "fact")
    df = spark.createDataFrame([(1, 10, T0), (2, 20, T0)],
                               "k int, v int, updated_at timestamp")
    apply_changes(t, df, ["k"], "updated_at", 1)
    apply_changes(
        t,
        spark.createDataFrame([(1, 0, T1)], "k int, v int, updated_at timestamp"),
        ["k"], "updated_at", 1, delete_expr="v = 0", delete_mode="erase",
    )
    assert sorted(r.k for r in t.read().collect()) == [2]


def test_apply_changes_except_columns_never_stored(spark, tmp_path):
    """≙ DLT except_column_list: the CDC op flag drives delete_expr but
    must not appear in the stored schema — first load included."""
    t = ManagedTable(spark, tmp_path, "d")
    df = spark.createDataFrame(
        [(1, "ann", "Free", T0, "I"), (2, "bob", "Free", T0, "I")],
        "user_id int, name string, plan string, updated_at timestamp, op string",
    )
    apply_changes(t, df, ["user_id"], "updated_at", 2,
                  delete_expr="op = 'D'", except_columns=("op",))
    assert "op" not in t.read().columns
    batch = spark.createDataFrame(
        [(1, "ann", "Free", T1, "D")],
        "user_id int, name string, plan string, updated_at timestamp, op string",
    )
    apply_changes(t, batch, ["user_id"], "updated_at", 2,
                  delete_expr="op = 'D'", except_columns=("op",))
    assert "op" not in t.read().columns
    assert t.read().filter(f"user_id = 1 AND {END_AT} IS NULL").count() == 0
