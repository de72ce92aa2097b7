"""Predicate DML on ManagedTable: ``delete_where`` / ``update_where``.

Delta Lake's DML surface is MERGE + DELETE + UPDATE; ``merge_keyed``
covered the first, these verbs complete the triad (reference gold-layer
contract: `silver_Dimensions.py:55` format("delta") tables are mutated
by apply-changes deletes/updates, `DimUser.py:20-29`). Acceptance:

- rows matching the condition are removed/updated; NULL conditions
  match nothing (SQL three-valued logic);
- ONLY files containing a matching row are rewritten — untouched files
  carry by reference (same inode), discovery is stats/Bloom-pruned;
- CDF-enabled tables materialize exact ``delete`` /
  ``update_preimage``/``update_postimage`` change rows, and
  ``changes_since`` spans DML commits so downstream drains stay
  incremental;
- the Delta log records DELETE/UPDATE commits (remove+add,
  dataChange=true) that an independent protocol reader replays;
- concurrency/idempotence match merge (expected_version, epoch skip).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import (
    Catalog,
    ConcurrentWriteError,
    ManagedTable,
    OptimisticConcurrencyError,
)
from end_to_end_azure_databricks_data_engineering_project_spark.sources import deltareader


@pytest.fixture()
def table(spark, tmp_path):
    return Catalog(spark, tmp_path / "wh").table("t")


def _files(table, v=None):
    return {f.name: os.stat(f).st_ino for f in table.data_files(v)}


def _clustered(spark, table, n=800, files=8, cdf=False):
    base = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") % 7).alias("g"),
        F.lit("old").alias("val"),
    )
    table.overwrite(
        base.repartitionByRange(files, "k").sortWithinPartitions("k"),
        enable_cdf=cdf,
    )
    return table.current_version()


# -- semantics ------------------------------------------------------------


def test_delete_where_removes_matching_rows(spark, table):
    _clustered(spark, table)
    v = table.delete_where("k >= 100 AND k < 150")
    assert v == table.current_version()
    got = sorted(r.k for r in table.read().collect())
    assert got == [k for k in range(800) if not (100 <= k < 150)]
    assert table._op(v) == "delete"


def test_update_where_sets_matching_rows(spark, table):
    _clustered(spark, table)
    table.update_where("k % 2 = 0 AND k < 10", {"val": "concat(val, '!')"})
    got = {r.k: r.val for r in table.read().filter("k < 12").collect()}
    assert got == {
        k: ("old!" if k % 2 == 0 and k < 10 else "old") for k in range(12)
    }


def test_update_assignments_are_simultaneous(spark, table):
    """SET a=b, b=a must swap (both expressions read PRE-update values,
    one projection), not chain."""
    table.overwrite(spark.createDataFrame([(1, 10, 20)], "k int, a int, b int"))
    table.update_where("k = 1", {"a": "b", "b": "a"})
    r = table.read().first()
    assert (r.a, r.b) == (20, 10)


def test_null_condition_rows_are_not_matched(spark, table):
    table.overwrite(
        spark.createDataFrame([(1, None), (2, 5), (3, 20)], "k int, x int")
    )
    table.delete_where("x > 10")
    assert sorted(r.k for r in table.read().collect()) == [1, 2]
    table.update_where("x > 1", {"x": "x + 1"})
    got = {r.k: r.x for r in table.read().collect()}
    assert got == {1: None, 2: 6}  # NULL row untouched


def test_no_match_is_a_no_op_without_commit(spark, table):
    v0 = _clustered(spark, table)
    assert table.delete_where("k = -5") is None
    assert table.update_where("k = -5", {"val": "'x'"}) is None
    assert table.current_version() == v0


def test_update_casts_to_committed_type_and_overflows_loudly(spark, table):
    table.overwrite(spark.createDataFrame([(1, 5)], "k int, x int"))
    table.update_where("k = 1", {"x": "x + 1"})  # bigint expr → cast to int
    assert table.table_schema()["x"].dataType.simpleString() == "int"
    assert table.read().first().x == 6
    claims_before = {p.name for p in table.dir.glob("v*")}
    with pytest.raises(Exception):
        table.update_where("k = 1", {"x": "x + 10000000000"})
    # ANSI overflow fails the write AND cleans up its claim dir
    assert {p.name for p in table.dir.glob("v*")} == claims_before
    assert table.read().first().x == 6


def test_update_unknown_set_column_raises(spark, table):
    table.overwrite(spark.createDataFrame([(1, 5)], "k int, x int"))
    with pytest.raises(ValueError, match="unknown column"):
        table.update_where("k = 1", {"nope": "1"})


def test_delete_column_condition_objects_work(spark, table):
    _clustered(spark, table, n=50, files=2)
    table.delete_where(F.col("k") < 10)
    assert table.read().count() == 40


# -- physical shape: pruned discovery, reference-carried files ------------


def test_delete_rewrites_only_touched_files(spark, table):
    v0 = _clustered(spark, table)
    v0_files = _files(table, v0)
    assert len(v0_files) == 8
    v = table.delete_where("k >= 100 AND k < 150")  # one 100-row file
    m = table._manifest(v)
    assert len(m["removed"]) == 1
    carried = {n: i for n, i in _files(table).items() if n in v0_files}
    assert carried == {
        n: i for n, i in v0_files.items() if n not in set(m["removed"])
    }  # untouched files: same store path, same inode


def test_dml_bounds_prune_candidates_before_discovery(spark, table):
    """The derived [100, 150) bounds must intersect exactly one file of
    the range-clustered layout — discovery opens 1 of 8."""
    v0 = _clustered(spark, table)
    names, stats = table._resolve(v0)
    bounds = table._dml_bounds("k >= 100 AND k < 150")
    assert bounds == {"k": (100, 150)}
    cand = [n for n in names if table._stats_overlap(stats.get(n), bounds)]
    assert len(cand) <= 2  # boundary 150 may graze the next file
    assert any(stats[n]["cols"]["k"]["min"] <= 100 <= stats[n]["cols"]["k"]["max"] for n in cand)


def test_dml_bounds_bail_on_disjunctions(spark, table):
    assert table._dml_bounds("k = 1 OR k = 5") == {}
    assert table._dml_bounds("NOT (k = 1)") == {}
    assert table._dml_bounds("k in (1, 2)") == {}
    assert table._dml_bounds("upper(val) = 'X'") == {}
    # unparseable conjunct contributes nothing; parseable one still does
    assert table._dml_bounds("k >= 3 AND val like 'a%'") == {"k": (3, None)}


def test_explicit_prune_hint_intersects_derived(spark, table):
    """An OR condition derives nothing, but the caller's hint still
    prunes; results must be identical to the unpruned path."""
    v0 = _clustered(spark, table)
    v = table.delete_where("k = 3 OR k = 7", prune={"k": (3, 7)})
    m = table._manifest(v)
    # both keys live in file [0,100); a 2-row delete takes the
    # DELETION-VECTOR path (r12): the file is tombstoned, not rewritten
    assert not m["removed"] and not m["added"]
    assert len(m["dv_added"]) == 1
    (entries,) = m["dv_added"].values()
    assert entries[0][1] == 2  # tombstoned row count rides the manifest
    assert table.read().count() == 798


def test_stats_proving_no_candidates_is_a_noop(spark, table):
    v0 = _clustered(spark, table)
    assert table.delete_where("k = 99999") is None
    assert table.current_version() == v0


def test_update_moves_rows_across_partitions(spark, table):
    df = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20)], "k int, p string, x int"
    )
    table.overwrite(df, partition_by=["p"])
    table.update_where("k = 1", {"p": "'b'"})
    got = {(r.k, r.p) for r in table.read().collect()}
    assert got == {(1, "b"), (2, "b")}
    assert table.read_pruned({"p": ("b", "b")}).count() == 2
    assert table.read_pruned({"p": ("a", "a")}).count() == 0


# -- CDF + change feed ----------------------------------------------------


def test_delete_emits_exact_cdf_rows(spark, table):
    v0 = _clustered(spark, table, cdf=True)
    table.delete_where("k < 3")
    cf = table.changes_since(v0)
    got = sorted((r.k, r._change_type) for r in cf.collect())
    assert got == [(0, "delete"), (1, "delete"), (2, "delete")]


def test_update_emits_pre_post_pairs(spark, table):
    v0 = _clustered(spark, table, cdf=True)
    table.update_where("k = 5", {"val": "'new'"})
    cf = table.changes_since(v0, keys=["k"])
    got = sorted((r.k, r.val, r._change_type) for r in cf.collect())
    assert got == [(5, "new", "update_post"), (5, "old", "update_pre")]


def test_changes_since_spans_append_delete_update_chain(spark, table):
    v0 = _clustered(spark, table, n=10, files=1, cdf=True)
    table.append(
        spark.createDataFrame([(100, 1, "new")], "k long, g long, val string")
    )
    table.delete_where("k = 3")
    table.update_where("k = 4", {"val": "'upd'"})
    cf = table.changes_since(v0, keys=["k"])
    got = sorted((r.k, r._change_type) for r in cf.collect())
    assert got == [
        (3, "delete"), (4, "update_post"), (4, "update_pre"), (100, "insert")
    ]


def test_appended_since_breaks_on_dml(spark, table):
    """DELETE/UPDATE change existing rows — the append-only fast path
    must refuse (None → caller rebuilds), never silently skip them."""
    v0 = _clustered(spark, table, n=10, files=1)
    table.delete_where("k = 3")
    assert table.appended_since(v0) is None


def test_non_cdf_table_diffs_removed_vs_added(spark, table):
    """Without CDF materialization the change feed falls back to the
    touched-file diff — same rows, derived not stored."""
    v0 = _clustered(spark, table, n=10, files=1, cdf=False)
    table.update_where("k = 4", {"val": "'upd'"})
    cf = table.changes_since(v0, keys=["k"])
    got = sorted((r.k, r.val, r._change_type) for r in cf.collect())
    assert got == [(4, "old", "update_pre"), (4, "upd", "update_post")]


# -- Delta log + independent reader ---------------------------------------


def test_delta_log_records_dml_and_reader_replays(spark, table):
    _clustered(spark, table, cdf=True)
    table.delete_where("k >= 700")
    table.update_where("k = 0", {"val": "'zero'"})
    hist = {r.version: r.operation for r in table.history().collect()}
    assert "DELETE" in hist.values() and "UPDATE" in hist.values()
    got = {(r.k, r.val) for r in deltareader.read_delta(spark, table.dir).collect()}
    want = {(r.k, r.val) for r in table.read().collect()}
    assert got == want and len(want) == 700
    # remove+add actions present and dataChange stays true for DML
    import json

    from end_to_end_azure_databricks_data_engineering_project_spark.sources import deltalog

    commits = deltalog.commit_files(table.dir)
    dml_actions = [
        json.loads(line)
        for p in commits[-2:]
        for line in p.read_text().splitlines()
    ]
    removes = [a["remove"] for a in dml_actions if "remove" in a]
    adds = [a["add"] for a in dml_actions if "add" in a]
    assert removes and adds
    assert all(r["dataChange"] for r in removes)
    assert all(a["dataChange"] for a in adds)
    cdcs = [a["cdc"] for a in dml_actions if "cdc" in a]
    assert cdcs  # CDF-enabled DML ships cdc actions


def test_dml_survives_vacuum_and_time_travel(spark, table):
    v0 = _clustered(spark, table, n=20, files=2)
    v1 = table.delete_where("k < 5")
    assert sorted(r.k for r in table.read_at(v0).collect()) == list(range(20))
    table.vacuum(keep=1)
    assert table.read().count() == 15
    with pytest.raises(Exception):
        table.read_at(v0).collect()


# -- concurrency + idempotence --------------------------------------------


def test_dml_rebases_over_disjoint_interleave_and_conflicts_on_overlap(
    spark, table
):
    """r12 disjoint-commit resolution: a DELETE racing an append to a
    DIFFERENT file rebases and BOTH land; a DELETE racing a commit that
    rewrote ITS file still fails loudly and cleans its staging."""
    _clustered(spark, table, n=10, files=1)
    other = ManagedTable(spark, table.dir.parent, table.name)
    orig_claim = table._claim_next_version

    armed = {"on": True}

    def _claim_with_append():
        if armed["on"]:
            armed["on"] = False  # inject exactly once (rebases re-claim)
            other.append(
                spark.createDataFrame(
                    [(500, 0, "zz")], "k long, g long, val string"
                )
            )
        return orig_claim()

    table._claim_next_version = _claim_with_append
    try:
        assert table.delete_where("k = 3") is not None  # rebased, landed
    finally:
        table._claim_next_version = orig_claim
    assert table.read().filter("k = 500").count() == 1  # append kept
    assert table.read().filter("k = 3").count() == 0    # delete applied

    # overlap: an interleaved UPDATE rewriting the same file the DELETE
    # read is a real conflict
    claims_before = {p.name for p in table.dir.glob("v*")}

    armed2 = {"on": True}

    def _claim_with_update():
        if armed2["on"]:
            armed2["on"] = False
            other.update_where("k = 1", {"val": "'clash'"})
        return orig_claim()

    table._claim_next_version = _claim_with_update
    try:
        with pytest.raises(OptimisticConcurrencyError):
            table.delete_where("k = 2")
    finally:
        table._claim_next_version = orig_claim
    # loser cleaned its claim (only the winner's new version remains)
    left = {p.name for p in table.dir.glob("v*")} - claims_before
    assert len(left) == 1  # the interleaved update's commit
    assert table.read().filter("k = 1").first().val == "clash"
    assert table.read().filter("k = 2").count() == 1


def test_dml_epoch_replay_is_skipped(spark, table):
    _clustered(spark, table, n=10, files=1)
    v1 = table.delete_where("k = 3", epoch=7, epoch_key="job:delete")
    assert v1 is not None
    assert table.delete_where("k = 4", epoch=7, epoch_key="job:delete") is None
    assert table.read().filter("k = 4").count() == 1  # replay did nothing
    assert table.delete_where("k = 4", epoch=8, epoch_key="job:delete") is not None


def test_full_rewrite_fallback_when_everything_matches(spark, table):
    """A condition touching every file exceeds the manifest cap path or
    not — either way results are exact and the manifest stays coherent."""
    _clustered(spark, table, n=400, files=8)
    table.merge_manifest_max_files = 2  # force the cap
    v = table.update_where("k >= 0", {"val": "'all'"})
    m = table._manifest(v)
    assert sorted(m["removed"]) == m["removed"] and len(m["removed"]) == 8
    assert m["files"] == m["added"]  # full rewrite: snapshot = new files
    got = {r.val for r in table.read().collect()}
    assert got == {"all"} and table.read().count() == 400


# -- SQL DML routing through the catalog -----------------------------------


def test_catalog_sql_routes_delete_and_update(spark, table):
    _clustered(spark, table, n=20, files=2)
    cat = Catalog(spark, table.dir.parent)
    v = cat.sql("DELETE FROM t WHERE k < 5")
    assert v is not None and table.read().count() == 15
    cat.sql("UPDATE t SET val = concat(val, '!'), g = g + 100 WHERE k = 10")
    r = table.read().filter("k = 10").first()
    assert r.val == "old!" and r.g >= 100
    # plain SELECT still flows through spark.sql over fresh views
    out = cat.sql("SELECT count(*) AS n FROM t").first()
    assert out.n == 15


def test_catalog_sql_set_splitter_respects_nesting(spark, table):
    cat = Catalog(spark, table.dir.parent)
    got = cat._split_assignments(
        "a = concat('x,y', val), b = coalesce(g, 0), c = 'it''s, fine'"
    )
    assert got == {
        "a": "concat('x,y', val)",
        "b": "coalesce(g, 0)",
        "c": "'it''s, fine'",
    }
    with pytest.raises(ValueError, match="unparseable"):
        cat._split_assignments("a = 1, nonsense")


def test_dml_bounds_are_quote_aware(spark, table):
    """Review finding: AND inside a string literal must not split the
    conjunction — bounds derived from literal content are NOT implied
    by the condition and would prune the wrong files."""
    b = table._dml_bounds
    got = b("val = 'a AND k = 5 AND b'")
    assert got == {"val": ("a AND k = 5 AND b", "a AND k = 5 AND b")}
    assert "k" not in got
    # OR inside a literal no longer bails the whole parse
    assert b("note = 'use or abuse'") == {
        "note": ("use or abuse", "use or abuse")
    }
    # keywords as substrings of identifiers are not keywords
    assert b("android = 5 AND brand = 'x'") == {
        "android": (5, 5), "brand": ("x", "x")
    }
    assert b("val = 'unterminated") == {}


def test_delete_matching_literal_with_and_inside(spark, table):
    """End-to-end: the row whose value CONTAINS ' AND k = 5 ' must be
    found and deleted even though no file contains k = 5-adjacent
    bounds — the literal never leaks into pruning."""
    table.overwrite(spark.createDataFrame(
        [(100, "a AND k = 5 AND b"), (200, "plain")], "k int, val string"
    ))
    v = table.delete_where("val = 'a AND k = 5 AND b'")
    assert v is not None
    assert [r.k for r in table.read().collect()] == [200]


def test_failed_append_under_constraint_cleans_claim(spark, table):
    """Review finding: rejected batches must not accumulate
    vacuum-immune orphan claim dirs on the append/overwrite/merge
    paths (DML already cleaned its own)."""
    table.overwrite(spark.createDataFrame([(1, 5.0)], "k int, bal double"))
    table.add_constraint("bal_pos", "bal >= 0")
    claims = {p.name for p in table.dir.glob("v*")}
    for _ in range(3):  # a retrying pipeline
        with pytest.raises(Exception, match="bal_pos"):
            table.append(
                spark.createDataFrame([(2, -1.0)], "k int, bal double")
            )
    assert {p.name for p in table.dir.glob("v*")} == claims
    with pytest.raises(Exception, match="bal_pos"):
        table.merge_keyed(
            spark.createDataFrame([(1, -9.0)], "k int, bal double"), ["k"],
            lambda cur, b: cur.join(b.select("k"), "k", "left_anti").unionByName(b),
        )
    assert {p.name for p in table.dir.glob("v*")} == claims


def test_catalog_sql_where_inside_literal(spark, table):
    """Review finding: a SET value containing ' where ' must not split
    the statement early."""
    table.overwrite(spark.createDataFrame([(1, "x")], "k int, note string"))
    cat = Catalog(spark, table.dir.parent)
    cat.sql("UPDATE t SET note = 'use where needed' WHERE k = 1")
    assert table.read().first().note == "use where needed"
    # no WHERE = whole table (Delta UPDATE semantics)
    cat.sql("UPDATE t SET note = 'no cond'")
    assert table.read().first().note == "no cond"
    # backslash-escaped quote inside a literal must not derail the split
    cat.sql("UPDATE t SET note = 'it\\'s, a where' WHERE k = 1")
    assert table.read().first().note == "it's, a where"


def test_commit_info_carries_row_metrics(spark, table):
    """Delta operationMetrics parity: row counts derived from manifest
    stats alone (no extra pass) — numAddedRows on appends,
    numDeletedRows on deletes."""
    import json

    from end_to_end_azure_databricks_data_engineering_project_spark.sources import deltalog

    _clustered(spark, table, n=40, files=2)
    table.append(spark.createDataFrame(
        [(900, 0, "x"), (901, 0, "x")], "k long, g long, val string"
    ))
    table.delete_where("k >= 10 AND k < 15")

    def metrics(dv):
        for line in deltalog.commit_path(table.dir, dv).read_text().splitlines():
            a = json.loads(line)
            if "commitInfo" in a:
                return a["commitInfo"]["operationMetrics"]

    assert metrics(0)["numAddedRows"] == "40"
    m_append = metrics(1)
    assert m_append["numAddedRows"] == "2" and m_append["numRemovedRows"] == "0"
    m_del = metrics(2)
    # one 20-row file rewritten to 15 rows: 5 deleted
    assert m_del["numDeletedRows"] == "5"
    assert int(m_del["numRemovedRows"]) - int(m_del["numAddedRows"]) == 5


def test_dml_crash_before_commit_leaves_table_unchanged(spark, table, monkeypatch):
    """Crash drill: a writer dying AFTER staging (files + manifest + op
    marker written) but BEFORE the pointer commit must leave readers on
    the old snapshot; the orphan claim is reclaimable and a retry
    applies cleanly."""
    _clustered(spark, table, n=20, files=2)
    v0 = table.current_version()

    orig = ManagedTable._commit

    def boom(self, *a, **kw):
        raise OSError("simulated crash before pointer write")

    monkeypatch.setattr(ManagedTable, "_commit", boom)
    with pytest.raises(OSError):
        table.delete_where("k < 5")
    monkeypatch.setattr(ManagedTable, "_commit", orig)
    # reader sees the old snapshot through a fresh handle
    t2 = ManagedTable(spark, table.dir.parent, table.name)
    assert t2.current_version() == v0
    assert t2.read().count() == 20
    # the crashed claim is invisible to history readers and vacuumable
    t2.vacuum_uncommitted()
    # retry applies cleanly
    assert t2.delete_where("k < 5") is not None
    assert t2.read().count() == 15


def test_row_metrics_omitted_when_not_derivable(spark, table):
    """Review finding: the manifest describes the chain, not always the
    snapshot diff — overwrite must not claim numRemovedRows=0, restore
    must carry no row metrics, compact reports removed == added."""
    import json

    from end_to_end_azure_databricks_data_engineering_project_spark.sources import deltalog

    _clustered(spark, table, n=30, files=2)
    table.overwrite(spark.createDataFrame(
        [(1, 0, "z")], "k long, g long, val string"
    ))

    def metrics(dv):
        for line in deltalog.commit_path(table.dir, dv).read_text().splitlines():
            a = json.loads(line)
            if "commitInfo" in a:
                return a["commitInfo"]["operationMetrics"]

    m_over = metrics(1)
    assert m_over["numAddedRows"] == "1"
    assert "numRemovedRows" not in m_over  # replaced rows unknowable here
    table.restore(0)
    m_rest = metrics(2)
    assert "numAddedRows" not in m_rest and "numRemovedRows" not in m_rest
    table.compact(target_partitions=1)
    m_comp = metrics(3)
    assert m_comp["numAddedRows"] == m_comp["numRemovedRows"] == "30"


def test_catalog_sql_dml_on_missing_table_raises_without_side_effects(spark, tmp_path):
    """Review finding: DML against a typo'd table name must not create
    phantom table dirs."""
    cat = Catalog(spark, tmp_path / "wh")
    cat.table("t").overwrite(spark.createDataFrame([(1,)], "k int"))
    before = sorted(p.name for p in (tmp_path / "wh").iterdir())
    with pytest.raises(ValueError, match="no such table"):
        cat.sql("DELETE FROM uesrs WHERE k = 1")
    with pytest.raises(ValueError, match="no such table"):
        cat.sql("UPDATE tt SET k = 2 WHERE k = 1")
    assert sorted(p.name for p in (tmp_path / "wh").iterdir()) == before


def test_post_materialize_failure_discards_claim(spark, table, monkeypatch):
    """The r11-advisor leak: a failure in the bookkeeping AFTER the data
    write (stats collection, CDF materialization, manifest/schema
    writes) must discard the claim dir like a failed write does —
    vacuum deliberately spares non-empty uncommitted claims, so these
    would otherwise accumulate forever."""
    _clustered(spark, table, n=40, files=2, cdf=True)
    claims = {p.name for p in table.dir.glob("v*")}

    def boom(self, *a, **k):
        raise RuntimeError("cdc write exploded")

    monkeypatch.setattr(ManagedTable, "_materialize_cdc", boom)
    with pytest.raises(RuntimeError, match="cdc write exploded"):
        table.delete_where("k < 5")
    assert {p.name for p in table.dir.glob("v*")} == claims
    monkeypatch.undo()

    monkeypatch.setattr(ManagedTable, "_collect_stats_for", boom)
    for op in (
        lambda: table.append(spark.createDataFrame([(900, 0, "x")],
                                                   "k long, g long, val string")),
        lambda: table.compact_small(max_file_bytes=1 << 30),
        lambda: table.update_where("k = 1", {"val": "'y'"}),
    ):
        with pytest.raises(RuntimeError):
            op()
        assert {p.name for p in table.dir.glob("v*")} == claims


def test_dml_without_cdf_warns_once_per_table(spark, table, caplog):
    """First mutating DML on a non-CDF table emits a once-per-table
    advisory (downstream drains pay exceptAll diffs); the marker rides
    the same commit, so later DML stays silent. CDF tables never warn."""
    import logging

    _clustered(spark, table, n=40, files=2, cdf=False)
    with caplog.at_level(logging.WARNING):
        table.delete_where("k < 5")
    assert any("change data feed" in r.message for r in caplog.records)
    assert table.table_prop("dml_cdf_warned") == "true"
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        table.update_where("k = 10", {"val": "'x'"})
        table.merge_keyed(
            spark.createDataFrame([(10, 0, "y")], "k long, g long, val string"),
            ["k"],
            lambda cur, b: cur.join(b.select("k"), "k", "left_anti").unionByName(b),
        )
    assert not any("change data feed" in r.message for r in caplog.records)


def test_dml_on_cdf_table_never_warns(spark, table, caplog):
    import logging

    _clustered(spark, table, n=40, files=2, cdf=True)
    with caplog.at_level(logging.WARNING):
        table.delete_where("k < 5")
    assert not any("change data feed" in r.message for r in caplog.records)
    assert table.table_prop("dml_cdf_warned") is None
