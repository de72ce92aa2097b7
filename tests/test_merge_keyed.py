"""ManagedTable incremental commit machinery: file-pruned keyed merge,
epoch-idempotent appends, exclusive version claims.

Acceptance (round-1 verdict item 3, tightened by the round-9 verdict's
stable-file-identity refactor): an incremental batch touching k keys
must leave every untouched data file physically identical — now the
SAME store file carried by reference (same path, same inode), with
zero per-file syscalls — with reference CDC semantics unchanged
(tests/test_cdc*.py stay green on the same apply_changes).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.cdc import (
    apply_changes,
    scd1_merge,
)
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import (
    Catalog,
    ConcurrentWriteError,
    ManagedTable,
)


@pytest.fixture()
def table(spark, tmp_path):
    return Catalog(spark, tmp_path / "wh").table("t")


def _files(table, v=None):
    return {f.name: os.stat(f).st_ino for f in table.data_files(v)}


def test_merge_keyed_rewrites_only_touched_files(spark, table):
    base = spark.range(1000).select(
        F.col("id").alias("k"), F.lit("old").alias("val"), F.lit(1).alias("seq")
    )
    table.overwrite(base.repartition(8, "k"))
    v0 = table.current_version()
    v0_files = _files(table, v0)
    assert len(v0_files) == 8

    batch = spark.createDataFrame([(3, "new", 2)], "k long, val string, seq int")
    table.merge_keyed(
        batch, ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq")
    )
    v1_files = _files(table)
    # 7 of 8 files carried over BY REFERENCE — the same store file
    carried = {n: i for n, i in v1_files.items() if n in v0_files}
    assert len(carried) == 7
    assert all(v0_files[name] == ino for name, ino in carried.items())
    # and the commit's own metadata is O(changed files)
    m = table._manifest(table.current_version())
    assert len(m["removed"]) == 1 and m["removed"][0] in v0_files
    assert set(m["added"]) == set(v1_files) - set(v0_files)
    # semantics: merged row updated, everything else untouched
    got = {r.k: r.val for r in table.read().collect()}
    assert got[3] == "new"
    assert got[4] == "old"
    assert len(got) == 1000


def test_merge_keyed_all_new_keys_links_everything(spark, table):
    base = spark.range(100).select(
        F.col("id").alias("k"), F.lit("old").alias("val"), F.lit(1).alias("seq")
    )
    table.overwrite(base.repartition(4, "k"))
    v0_files = _files(table, table.current_version())
    batch = spark.createDataFrame([(5000, "ins", 2)], "k long, val string, seq int")
    table.merge_keyed(batch, ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"))
    v1_files = _files(table)
    assert set(v0_files) <= set(v1_files)  # nothing existing was touched
    assert table._manifest(table.current_version())["removed"] == []
    assert table.read().count() == 101


def test_merge_keyed_full_table_batch_falls_back_to_rewrite(spark, table):
    """A batch touching (almost) every key exceeds the touched-file
    fraction cap: merge_keyed must NOT collect a table-sized manifest —
    it rewrites the whole snapshot, links nothing, and stays correct."""
    base = spark.range(1000).select(
        F.col("id").alias("k"), F.lit("old").alias("val"), F.lit(1).alias("seq")
    )
    table.overwrite(base.repartition(8, "k"))
    batch = spark.range(1000).select(
        F.col("id").alias("k"), F.lit("new").alias("val"), F.lit(2).alias("seq")
    )
    table.merge_keyed(batch, ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"))
    # full rewrite: nothing carried — a fresh full manifest
    m = table._manifest(table.current_version())
    assert set(m["files"]) == set(m["added"])
    got = {r.k: r.val for r in table.read().collect()}
    assert len(got) == 1000 and set(got.values()) == {"new"}


def test_merge_keyed_fraction_boundary_still_prunes(spark, table):
    """Touching one of 8 files stays far below the default 0.8 cap —
    the pruned path (incremental manifest, carried references) must
    still engage."""
    base = spark.range(1000).select(
        F.col("id").alias("k"), F.lit("old").alias("val"), F.lit(1).alias("seq")
    )
    table.overwrite(base.repartition(8, "k"))
    v0_files = _files(table, table.current_version())
    batch = spark.createDataFrame([(7, "new", 2)], "k long, val string, seq int")
    table.merge_keyed(batch, ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq"))
    carried = set(v0_files) & set(_files(table))
    assert len(carried) == 7


def test_apply_changes_scd2_prunes_files(spark, table):
    base = spark.createDataFrame(
        [(k, f"v{k}", 1) for k in range(200)], ["k", "val", "seq"]
    )
    apply_changes(table, base.repartition(1), keys=["k"], sequence_by="seq", scd_type=2)
    # spread history over several files so pruning is observable
    table.overwrite(table.read().repartition(6, "k"))
    v_before = table.current_version()
    before = _files(table, v_before)

    upd = spark.createDataFrame([(7, "v7b", 2)], ["k", "val", "seq"])
    apply_changes(table, upd, keys=["k"], sequence_by="seq", scd_type=2)
    after = _files(table)
    carried = {n: i for n, i in after.items() if n in before}
    assert len(carried) == 5  # one of six files rewritten
    assert all(before[n] == ino for n, ino in carried.items())
    hist = table.read().filter("k = 7").orderBy("seq").collect()
    assert [r.val for r in hist] == ["v7", "v7b"]
    assert hist[0]["__END_AT"] == 2 and hist[1]["__END_AT"] is None
    # untouched key in full
    assert table.read().filter("k = 8").count() == 1


def test_append_epoch_idempotent(spark, table):
    df = spark.range(10).select(F.col("id").alias("k"))
    v1 = table.append(df, epoch=0, epoch_key="stream")
    v2 = table.append(df, epoch=0, epoch_key="stream")  # replayed batch
    assert v2 is None  # skip signal: nothing committed (see docstring)
    assert table.read().count() == 10
    v3 = table.append(df, epoch=1, epoch_key="stream")
    assert v3 == v1 + 1
    assert table.read().count() == 20
    assert table.applied_epoch("stream") == 1
    assert table.applied_epoch("other") is None


def test_commit_refuses_pointer_regression(spark, table):
    df = spark.range(5)
    table.overwrite(df)
    table.overwrite(df)
    with pytest.raises(ConcurrentWriteError):
        table._commit(table.current_version())  # stale writer, same or older v


def test_orphan_claim_never_blocks_and_vacuums(spark, table):
    df = spark.range(5).select(F.col("id").alias("k"))
    table.overwrite(df)
    orphan = table._claim_next_version()  # crashed writer leaves this
    # an uncommitted orphan above the pointer is vacuumable...
    table.vacuum_uncommitted()
    assert not table._version_dir(orphan).exists()
    # ...and even when present, never blocks the next writer
    orphan2 = table._claim_next_version()
    v = table.overwrite(df)
    assert v > orphan2
    assert table.read().count() == 5
    # a skipped-over orphan below the new pointer ages out via vacuum()
    table.vacuum(keep=1)
    assert not table._version_dir(orphan2).exists()
    assert table._version_dir(v).exists()


def test_merge_discovery_prunes_candidate_files(spark, table):
    """r10 verdict #1: on a key-clustered table, touched-file discovery
    must intersect the batch's key bounds with the manifest's per-file
    min/max stats and OPEN only the overlapping files — not read every
    file's key column. Merge results stay byte-identical."""
    base = spark.range(800).select(
        F.col("id").alias("k"), F.lit("old").alias("val"), F.lit(1).alias("seq")
    )
    table.overwrite(base.repartitionByRange(8, "k").sortWithinPartitions("k"))
    v0 = table.current_version()
    res = table._resolve(v0)
    batch = spark.createDataFrame(
        [(3, "new", 2), (7, "new", 2)], "k long, val string, seq int"
    )
    cand, _ = table._merge_candidate_files(res, batch, ["k"])
    # disjoint ranges: the batch's [3, 7] bounds hit exactly one file
    assert cand is not None and len(cand) == 1
    st = res[1][cand[0]]["cols"]["k"]
    assert st["min"] <= 3 and st["max"] >= 7
    v0_files = _files(table, v0)
    table.merge_keyed(
        batch, ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq")
    )
    got = {(r.k, r.val) for r in table.read().collect()}
    assert len(got) == 800 and (3, "new") in got and (7, "new") in got
    assert sum(1 for k, v in got if v == "old") == 798
    # 7 of 8 files carried by reference; the one candidate was rewritten
    m = table._manifest(table.current_version())
    assert m["removed"] == cand
    assert len(_files(table)) == 8 - 1 + len(m["added"])


def test_merge_discovery_disjoint_bounds_touch_nothing(spark, table):
    """Batch keys entirely outside every file's range: the stats prove
    zero candidates, discovery opens NO files, and the merge carries
    the whole prior snapshot by reference (removed = [])."""
    base = spark.range(100).select(
        F.col("id").alias("k"), F.lit("old").alias("val"), F.lit(1).alias("seq")
    )
    table.overwrite(base.repartitionByRange(4, "k").sortWithinPartitions("k"))
    v0_files = _files(table)
    res = table._resolve(table.current_version())
    batch = spark.createDataFrame([(1000, "new", 2)], "k long, val string, seq int")
    assert table._merge_candidate_files(res, batch, ["k"])[0] == []
    table.merge_keyed(
        batch, ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq")
    )
    m = table._manifest(table.current_version())
    assert m["removed"] == []
    carried = {n: i for n, i in _files(table).items() if n in v0_files}
    assert carried == v0_files  # every prior file carried by reference
    assert table.read().count() == 101


def test_merge_discovery_falls_back_when_ranges_overlap(spark, table):
    """Hash-partitioned layout: every file spans ~the full key range,
    so pruning has nothing to offer — _merge_candidate_files returns
    None and discovery scans the snapshot exactly as before."""
    base = spark.range(400).select(
        F.col("id").alias("k"), F.lit("old").alias("val"), F.lit(1).alias("seq")
    )
    table.overwrite(base.repartition(4, "k"))
    res = table._resolve(table.current_version())
    batch = spark.createDataFrame([(200, "new", 2)], "k long, val string, seq int")
    assert table._merge_candidate_files(res, batch, ["k"])[0] is None
    table.merge_keyed(
        batch, ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq")
    )
    got = {(r.k, r.val) for r in table.read().collect()}
    assert (200, "new") in got and len(got) == 400


def test_bloom_filters_prune_hash_clustered_layout(spark, table):
    """Per-file key blooms (r10 verdict #1, optional half): on a
    hash-partitioned table the min/max ranges overlap everything, but
    the bound bloom index still pins discovery to the files actually
    holding the batch's keys — and merge results stay identical."""
    table.bind_bloom_filters(["k"], bits=4096)
    base = spark.range(4000).select(
        F.col("id").alias("k"), F.lit("old").alias("val"), F.lit(1).alias("seq")
    )
    table.overwrite(base.repartition(8, "k"))
    res = table._resolve(table.current_version())
    # every file carries a bloom entry for k
    assert all("k" in res[1][n].get("blooms", {}) for n in res[0])
    batch = spark.createDataFrame([(77, "new", 2)], "k long, val string, seq int")
    cand, _ = table._merge_candidate_files(res, batch, ["k"])
    # ranges alone keep all 8; the bloom pins the true file (hash
    # routing puts k=77 in exactly one) — false positives may add a
    # couple more, never all
    assert cand is not None and 1 <= len(cand) < 8
    st = res[1]
    v0_files = _files(table)
    table.merge_keyed(
        batch, ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq")
    )
    got = {(r.k, r.val) for r in table.read().collect()}
    assert (77, "new") in got and len(got) == 4000
    m = table._manifest(table.current_version())
    assert len(m["removed"]) == 1 and m["removed"][0] in cand


def test_bloom_all_null_column_gets_empty_bloom(spark, table):
    """A file whose bloom column is all-NULL must store an EMPTY bloom
    (provably matches no key: NULL never equi-joins) — distinct from a
    pre-binding file, which has NO entry and always survives."""
    table.bind_bloom_filters(["name"], bits=256)
    df = spark.createDataFrame(
        [(1, None), (2, None)], "k long, name string"
    )
    table.overwrite(df.coalesce(1))
    res = table._resolve(table.current_version())
    b = res[1][res[0][0]]["blooms"]["name"]
    assert set(b["hex"]) == {"0"}  # all-zero bitmap
    batch = spark.createDataFrame([("zed", 9)], "name string, k long")
    assert table._merge_candidate_files(res, batch, ["name"])[0] == []


def test_bloom_binding_is_first_binder_wins(spark, table):
    table.bind_bloom_filters(["k"], bits=1024)
    table.bind_bloom_filters(["k"], bits=1024)  # idempotent re-bind ok
    with pytest.raises(ConcurrentWriteError):
        table.bind_bloom_filters(["k"], bits=2048)
    with pytest.raises(ConcurrentWriteError):
        table.bind_bloom_filters(["other"], bits=1024)
    with pytest.raises(ValueError):
        ManagedTable(spark, table.dir.parent, "t2").bind_bloom_filters(["k"], bits=100)


def test_bloom_pre_binding_files_stay_candidates(spark, table):
    """Files written BEFORE the binding have no bloom entry and must
    always survive the probe (conservative), while post-binding files
    prune."""
    base = spark.range(100).select(
        F.col("id").alias("k"), F.lit("old").alias("val"), F.lit(1).alias("seq")
    )
    table.overwrite(base.coalesce(1))  # pre-binding file
    table.bind_bloom_filters(["k"], bits=1024)
    table.append(
        spark.range(100, 200).select(
            F.col("id").alias("k"), F.lit("old").alias("val"), F.lit(1).alias("seq")
        ).coalesce(1)
    )
    res = table._resolve(table.current_version())
    pre, post = res[0][0], res[0][1]
    assert "blooms" not in res[1][pre] and "blooms" in res[1][post]
    # batch key lives in NEITHER range... k=50 is in pre's range; pick a
    # key in pre's range so ranges keep pre, and bloom drops post
    batch = spark.createDataFrame([(50, "new", 2)], "k long, val string, seq int")
    cand, _ = table._merge_candidate_files(res, batch, ["k"])
    assert cand == [pre]
    table.merge_keyed(
        batch, ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq")
    )
    got = {(r.k, r.val) for r in table.read().collect()}
    assert (50, "new") in got and len(got) == 200


def test_bloom_probe_width_compatible_batch_types(spark, table):
    """xxhash64 hashes BY TYPE: an int batch on a bigint key column
    (coerced losslessly everywhere else) must not hash to different
    bloom positions and false-negative-prune the truly touched file —
    that silently committed DUPLICATE keys before the r11 review fix.
    Lossless widenings cast up before probing; incompatible types skip
    the probe (conservative)."""
    from pyspark.sql.types import IntegerType, StructField, StructType, StringType

    table.bind_bloom_filters(["k"], bits=4096)
    base = spark.range(4000).select(
        F.col("id").alias("k"), F.lit("old").alias("val"), F.lit(1).alias("seq")
    )
    table.overwrite(base.repartition(8, "k"))  # k is BIGINT
    batch = spark.createDataFrame(
        [(5, "new", 2)],
        StructType([
            StructField("k", IntegerType()),  # INT batch key
            StructField("val", StringType()),
            StructField("seq", IntegerType()),
        ]),
    )
    res = table._resolve(table.current_version())
    cand, _ = table._merge_candidate_files(res, batch, ["k"])
    assert cand is not None and 1 <= len(cand) < 8  # widened probe prunes
    table.merge_keyed(
        batch, ["k"], lambda cur, b: scd1_merge(cur, b, ["k"], "seq")
    )
    rows = table.read().filter("k = 5").collect()
    assert [(r.k, r.val) for r in rows] == [(5, "new")]  # no duplicate key
    assert table.read().count() == 4000
    # incompatible batch type: probe skipped, candidates stay (never 0)
    sbatch = spark.createDataFrame([("5", "x", 3)], "k string, val string, seq int")
    assert table._merge_candidate_files(
        table._resolve(table.current_version()), sbatch, ["k"]
    )[0] is None  # string-vs-bigint: no range norm pruning either -> None


def test_merge_with_schema_evolution(spark, table):
    """Delta MERGE WITH SCHEMA EVOLUTION: evolve=True widens the
    committed schema with the merge output's new nullable columns;
    untouched carried files read the new column as NULL."""
    base = spark.range(40).select(
        F.col("id").alias("k"), F.lit("old").alias("val"), F.lit(1).alias("seq")
    )
    table.overwrite(base.repartitionByRange(4, "k").sortWithinPartitions("k"))
    batch = spark.createDataFrame(
        [(3, "new", 2, "extra")], "k long, val string, seq int, note string"
    )
    # without evolve: loud schema rejection
    with pytest.raises(Exception):
        table.merge_keyed(
            batch, ["k"],
            lambda cur, b: cur.withColumn("note", F.lit(None).cast("string"))
            .join(b.select("k"), "k", "left_anti").unionByName(b),
        )
    v = table.merge_keyed(
        batch, ["k"],
        lambda cur, b: cur.withColumn("note", F.lit(None).cast("string"))
        .join(b.select("k"), "k", "left_anti").unionByName(b),
        evolve=True,
    )
    assert v is not None
    got = {r.k: (r.val, r.note) for r in table.read().collect()}
    assert got[3] == ("new", "extra")
    # k=20 lives in an UNTOUCHED range partition — its file carried by
    # reference under the pre-evolution schema, the pinned read reports
    # the evolved column as NULL (k=0 shares the touched file with k=3,
    # so it would pass even via the rewrite path)
    assert got[20] == ("old", None)
    assert got[0] == ("old", None)
    assert len(got) == 40
    assert "note" in [f.name for f in table.table_schema().fields]


def test_merge_with_schema_evolution_on_cdf_table(spark, table):
    """evolve=True on a CDF-enabled table: the change-feed diff aligns
    the pre-merge rows to the evolved schema (new column NULL on the
    old side) instead of crashing, and the feed reports the evolution
    as updates."""
    base = spark.range(20).select(
        F.col("id").alias("k"), F.lit("old").alias("val"), F.lit(1).alias("seq")
    )
    table.overwrite(
        base.repartitionByRange(2, "k").sortWithinPartitions("k"),
        enable_cdf=True,
    )
    v0 = table.current_version()
    batch = spark.createDataFrame(
        [(3, "new", 2, "extra")], "k long, val string, seq int, note string"
    )
    v = table.merge_keyed(
        batch, ["k"],
        lambda cur, b: cur.withColumn("note", F.lit(None).cast("string"))
        .join(b.select("k"), "k", "left_anti").unionByName(b),
        evolve=True,
    )
    assert v is not None
    feed = table.changes_since(v0, keys=["k"])
    got = {(r.k, r._change_type): r.note for r in feed.collect()}
    assert got[(3, "update_post")] == "extra"
    assert got[(3, "update_pre")] is None
    # schema-rejection retries never accrete orphan claim dirs: probe a
    # STILL-undeclared column with evolve=False
    claims = {p.name for p in table.dir.glob("v*")}
    with pytest.raises(Exception):
        table.merge_keyed(
            batch.withColumn("note2", F.lit("x")), ["k"],
            lambda cur, b: cur.withColumn("note", F.lit(None).cast("string"))
            .withColumn("note2", F.lit(None).cast("string"))
            .join(b.select("k"), "k", "left_anti").unionByName(b),
        )
    assert {p.name for p in table.dir.glob("v*")} == claims
