"""Logical conflict resolution for concurrent appends (r11; verdict
r10 #4 — Delta write-serializable semantics): two blind appends don't
conflict — the loser REBASES its already-materialized files onto the
new head and re-commits — while merges still conflict whenever real
content changed underneath them.

Deterministic races: a spy on ``ManagedTable._commit`` injects an
interleaved commit through a SECOND table handle right before the
outer append's commit runs, forcing the optimistic-concurrency path
without timing luck. A real multi-threaded test closes the loop.
"""

from __future__ import annotations

import threading

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.cdc import scd1_merge
from end_to_end_azure_databricks_data_engineering_project_spark.sources import deltalog
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import (
    Catalog,
    ConcurrentWriteError,
    ManagedTable,
    OptimisticConcurrencyError,
)


def _ids(spark, lo, hi, val="x"):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"), F.lit(val).alias("val"), F.lit(1).alias("seq")
    )


@pytest.fixture()
def table(spark, tmp_path):
    t = Catalog(spark, tmp_path / "wh").table("t")
    t.overwrite(_ids(spark, 0, 10))
    return t


def _inject_before_commit(monkeypatch, spark, table, action):
    """Run ``action(second_handle)`` once, right before the next
    ``_commit`` on ``table`` executes — an interleaved commit the outer
    writer never saw."""
    orig = ManagedTable._commit
    state = {"armed": True}

    def spy(self, v, *a, **kw):
        if state["armed"] and self.name == table.name:
            state["armed"] = False
            action(ManagedTable(spark, table.dir.parent, table.name))
        return orig(self, v, *a, **kw)

    monkeypatch.setattr(ManagedTable, "_commit", spy)


def test_append_rebases_over_interleaved_append(spark, table, monkeypatch):
    _inject_before_commit(
        monkeypatch, spark, table, lambda t2: t2.append(_ids(spark, 100, 105, "other"))
    )
    committed = table.append(_ids(spark, 200, 203, "mine"))
    assert committed == table.current_version()
    got = {(r.k, r.val) for r in table.read().collect()}
    assert got == (
        {(i, "x") for i in range(10)}
        | {(i, "other") for i in range(100, 105)}
        | {(i, "mine") for i in range(200, 203)}
    )
    # delta log contiguous, one commit per committed version
    state = table._pointer_state()
    dv = state["delta"]["version"]
    assert [int(p.stem) for p in deltalog.commit_files(table.dir)] == list(range(dv + 1))
    assert len(state["committed"]) == 3
    # the dead claim left nothing behind: no orphan dir, no stray files
    committed_dirs = {table._version_dir(v).name for v in state["committed"]}
    assert {d.name for d in table.dir.glob("v*")} == committed_dirs
    live = {n for v in state["committed"] for n in (table._resolve(v) or [[]])[0]}
    assert {str(f.relative_to(table.store)) for f in table.store.rglob("*.parquet")} == set(
        table._resolve(table.current_version())[0]
    ) | set((table._resolve(state["committed"][1]) or [[]])[0])


def test_append_rebases_over_interleaved_compact(spark, table, monkeypatch):
    _inject_before_commit(
        monkeypatch, spark, table, lambda t2: t2.compact(target_partitions=1)
    )
    table.append(_ids(spark, 50, 53, "mine"))
    got = {(r.k, r.val) for r in table.read().collect()}
    assert got == {(i, "x") for i in range(10)} | {(i, "mine") for i in range(50, 53)}


def test_append_rebases_over_interleaved_merge(spark, table, monkeypatch):
    """r12 disjoint-commit resolution: a blind append has an EMPTY read
    set, so an interleaved merge is not a conflict — BOTH effects land
    (the r11 matrix raised here)."""
    def do_merge(t2):
        t2.merge_keyed(
            _ids(spark, 0, 1, "upd").withColumn("seq", F.lit(2)),
            ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"),
        )

    _inject_before_commit(monkeypatch, spark, table, do_merge)
    table.append(_ids(spark, 300, 303))
    got = {(r.k, r.val) for r in table.read().collect()}
    assert (0, "upd") in got                       # the merge's effect
    assert {(k, v) for k, v in got if k >= 300} == {
        (300, "x"), (301, "x"), (302, "x")         # and the append's
    }


def test_append_vs_interleaved_overwrite_still_conflicts(spark, table, monkeypatch):
    _inject_before_commit(
        monkeypatch, spark, table, lambda t2: t2.overwrite(_ids(spark, 0, 2, "re"))
    )
    with pytest.raises(OptimisticConcurrencyError):
        table.append(_ids(spark, 300, 303))
    assert table.read().count() == 2


def test_append_vs_schema_evolving_append_conflicts(spark, table, monkeypatch):
    def evolve(t2):
        t2.append(
            _ids(spark, 100, 101).withColumn("extra", F.lit("e")), evolve=True
        )

    _inject_before_commit(monkeypatch, spark, table, evolve)
    with pytest.raises(OptimisticConcurrencyError, match="schema changed"):
        table.append(_ids(spark, 300, 303))


def test_merge_rebases_over_interleaved_append(spark, table, monkeypatch):
    """r12: the merge's read set (its touched files) is disjoint from
    the append's NEW file, so both land — the merge serializes BEFORE
    the append (WriteSerializable: the appended rows are not folded,
    they simply remain). The r11 matrix raised here."""
    _inject_before_commit(
        monkeypatch, spark, table, lambda t2: t2.append(_ids(spark, 100, 103))
    )
    table.merge_keyed(
        _ids(spark, 0, 1, "upd").withColumn("seq", F.lit(2)),
        ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"),
    )
    got = {(r.k, r.val) for r in table.read().collect()}
    assert (0, "upd") in got                         # merge applied
    assert {k for k, _ in got if k >= 100} == {100, 101, 102}  # append kept
    assert table.read().count() == 13


def test_threaded_appends_all_commit(spark, tmp_path):
    t = Catalog(spark, tmp_path / "wh").table("t")
    t.overwrite(_ids(spark, 0, 5))
    barrier = threading.Barrier(4)
    errors: list[Exception] = []

    def worker(i):
        try:
            h = ManagedTable(spark, t.dir.parent, "t")
            df = _ids(spark, 1000 + i * 10, 1005 + i * 10, f"w{i}")
            barrier.wait()
            h.append(df)
        except Exception as exc:  # pragma: no cover - must not happen
            errors.append(exc)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(4)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errors, errors
    assert t.read().count() == 5 + 4 * 5
    state = t._pointer_state()
    assert len(state["committed"]) == 5
    dv = state["delta"]["version"]
    assert [int(p.stem) for p in deltalog.commit_files(t.dir)] == list(range(dv + 1))
    # independent protocol reader agrees
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.deltareader import read_delta

    assert read_delta(spark, t.dir).count() == 25


def test_gc_spares_subpointer_unmanifested_claim_files(spark, tmp_path):
    """The materialize window: a writer has moved its files into the
    store but not yet written its manifest, while interleaved commits
    pushed the pointer past its claim. _gc_store must treat files whose
    embedded version matches a manifest-LESS claim dir as in-flight —
    before r11's fix the embedded-version-vs-pointer guard alone would
    collect them mid-write."""
    t = Catalog(spark, tmp_path / "wh").table("t")
    t.overwrite(_ids(spark, 0, 5))
    claim = t._claim_next_version()
    df, schema = t._align(_ids(spark, 100, 103), False)
    names = t._materialize(claim, df, [])      # files now in the store...
    # ...but NO manifest yet; meanwhile others outrun the claim
    t.append(_ids(spark, 10, 12))
    t.append(_ids(spark, 12, 14))
    assert t.current_version() > claim
    # keep enough ledger for the later rebase to prove its interleave;
    # the GC pass runs regardless and, pre-fix, collected the claim's
    # staged files (embedded version 1 <= pointer, unreferenced)
    t.vacuum(keep=3)
    assert all((t.store / n).exists() for n in names), (
        "GC collected an in-flight writer's staged files"
    )
    # the writer finishes staging and rebase-commits successfully (the
    # path append itself takes on OptimisticConcurrencyError)
    stats = t._collect_stats_for(names, [], schema)
    m = t._build_child_manifest(0, names, [], stats)
    m["partition_columns"] = []
    t._write_manifest_file(claim, m)
    t._write_op_marker(claim, "append")
    t._write_schema(t._version_dir(claim), schema)
    nv, head = t._rebase_commit(claim, 0, schema)
    assert t._commit(nv, expected_version=head)
    assert sorted(r.k for r in t.read().collect()) == [
        0, 1, 2, 3, 4, 10, 11, 12, 13, 100, 101, 102
    ]


def test_losing_writers_discard_their_staging(spark, table, monkeypatch):
    """No-commit exits must not accrete orphan snapshots: an append
    whose rebase is refused (interleaved OVERWRITE — a snapshot
    replacement is never rebaseable) and a merge that loses to an
    INTERSECTING merge both clean up their claim dir and their own
    staged store files — only committed members remain."""
    _inject_before_commit(
        monkeypatch, spark, table,
        lambda t2: t2.overwrite(_ids(spark, 0, 10, "re")),
    )
    with pytest.raises(OptimisticConcurrencyError):
        table.append(_ids(spark, 300, 303))
    state = table._pointer_state()
    committed_dirs = {table._version_dir(v).name for v in state["committed"]}
    assert {d.name for d in table.dir.glob("v*")} == committed_dirs
    live = {
        n for v in state["committed"]
        for n in (table._resolve(v) or [[], {}])[0]
    } | {
        n for v in state["committed"]
        for n in (table._manifest(v) or {}).get("removed", ())
    }
    on_disk = {
        str(f.relative_to(table.store)) for f in table.store.rglob("*.parquet")
    }
    assert on_disk <= live, on_disk - live  # no stray staged files

    # merge losing to an interleaved OVERWRITE: same discipline
    monkeypatch.undo()
    _inject_before_commit(
        monkeypatch, spark, table,
        lambda t2: t2.overwrite(_ids(spark, 0, 10, "re2")),
    )
    with pytest.raises(ConcurrentWriteError):
        table.merge_keyed(
            _ids(spark, 1, 2, "upd2").withColumn("seq", F.lit(3)),
            ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"),
        )
    state = table._pointer_state()
    committed_dirs = {table._version_dir(v).name for v in state["committed"]}
    assert {d.name for d in table.dir.glob("v*")} == committed_dirs


def test_append_rebases_over_interleaved_delete(spark, table, monkeypatch):
    """r12: predicate DML on files the blind append never read is
    disjoint — both effects land."""
    _inject_before_commit(
        monkeypatch, spark, table, lambda t2: t2.delete_where("k = 0")
    )
    table.append(_ids(spark, 300, 303))
    got = {r.k for r in table.read().collect()}
    assert 0 not in got                          # the delete's effect
    assert {300, 301, 302} <= got                # and the append's


def test_append_rebases_over_interleaved_compact_small(spark, table, monkeypatch):
    """compact_small is content-identical (op marker 'compact'): a blind
    append must rebase across it like any OPTIMIZE, not conflict."""
    for i in range(3):  # a few small files to pack
        table.append(_ids(spark, 50 + i, 51 + i).coalesce(1))

    _inject_before_commit(
        monkeypatch, spark, table,
        lambda t2: t2.compact_small(max_file_bytes=1 << 20),
    )
    committed = table.append(_ids(spark, 300, 303, "mine"))
    assert committed is not None
    got = {r.k for r in table.read().collect()}
    assert {300, 301, 302} <= got and {50, 51, 52} <= got


def test_disjoint_merges_both_land(spark, tmp_path, monkeypatch):
    """Two merges touching DIFFERENT files both commit (the loser
    rebases); the reader sees both effects."""
    t = Catalog(spark, tmp_path / "wh").table("t")
    t.overwrite(
        _ids(spark, 0, 200).repartitionByRange(4, "k").sortWithinPartitions("k")
    )

    def merge_low(t2):
        t2.merge_keyed(
            _ids(spark, 0, 1, "low").withColumn("seq", F.lit(2)),
            ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"),
        )

    _inject_before_commit(monkeypatch, spark, t, merge_low)
    t.merge_keyed(  # touches the top file only — disjoint
        _ids(spark, 199, 200, "high").withColumn("seq", F.lit(2)),
        ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"),
    )
    got = {r.k: r.val for r in t.read().collect()}
    assert got[0] == "low" and got[199] == "high"
    assert len(got) == 200


def test_intersecting_merges_still_conflict(spark, tmp_path, monkeypatch):
    """Two merges touching the SAME file: the loser's staged output was
    derived from content the winner replaced — loud failure, winner's
    effect intact."""
    t = Catalog(spark, tmp_path / "wh").table("t")
    t.overwrite(
        _ids(spark, 0, 200).repartitionByRange(4, "k").sortWithinPartitions("k")
    )

    def merge_same_file(t2):
        t2.merge_keyed(
            _ids(spark, 1, 2, "winner").withColumn("seq", F.lit(2)),
            ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"),
        )

    _inject_before_commit(monkeypatch, spark, t, merge_same_file)
    with pytest.raises(OptimisticConcurrencyError, match="rewrote file"):
        t.merge_keyed(
            _ids(spark, 0, 1, "loser").withColumn("seq", F.lit(2)),
            ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"),
        )
    got = {r.k: r.val for r in t.read().collect()}
    assert got[1] == "winner" and got[0] == "x"


def test_disjoint_dml_both_land_and_overlapping_raises(
    spark, tmp_path, monkeypatch
):
    t = Catalog(spark, tmp_path / "wh").table("t")
    t.overwrite(
        _ids(spark, 0, 200).repartitionByRange(4, "k").sortWithinPartitions("k")
    )
    _inject_before_commit(
        monkeypatch, spark, t, lambda t2: t2.delete_where("k = 0")
    )
    assert t.delete_where("k = 199") is not None  # other end: disjoint
    got = {r.k for r in t.read().collect()}
    assert 0 not in got and 199 not in got and len(got) == 198

    monkeypatch.undo()
    _inject_before_commit(
        monkeypatch, spark, t,
        lambda t2: t2.update_where("k = 10", {"val": "'w'"}),
    )
    with pytest.raises(OptimisticConcurrencyError):
        # same low file as the interleaved update — must not land on a
        # snapshot whose file content it never read
        t.update_where("k = 11", {"val": "'l'"})
    got = {r.k: r.val for r in t.read().collect()}
    assert got[10] == "w" and got[11] == "x"


def test_maintenance_rebases_over_merge_it_did_not_touch(
    spark, tmp_path, monkeypatch
):
    """auto_maintenance_hook's race (verdict r11 #3): a compact_small
    packing SMALL files rebases over a merge that rewrote a DIFFERENT
    (big) file — maintenance lands instead of silently losing."""
    t = Catalog(spark, tmp_path / "wh").table("t")
    t.overwrite(
        _ids(spark, 0, 100_000)  # two ~400 KB files: ABOVE the pack bar
        .repartitionByRange(2, "k").sortWithinPartitions("k")
    )
    for i in range(3):  # small appended files to pack
        t.append(_ids(spark, 200_000 + i, 200_001 + i).coalesce(1))

    def merge_big(t2):
        t2.merge_keyed(
            _ids(spark, 0, 1, "m").withColumn("seq", F.lit(2)),
            ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"),
        )

    _inject_before_commit(monkeypatch, spark, t, merge_big)
    v = t.compact_small(max_file_bytes=16 << 10, min_small_files=2)
    assert v is not None  # rebased, landed
    got = t.read().filter("k in (0, 200000)").collect()
    vals = {r.k: r.val for r in got}
    assert vals[0] == "m" and vals[200_000] == "x"
    assert t.read().count() == 100_003
