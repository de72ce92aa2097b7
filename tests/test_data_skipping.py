"""File-level data skipping on ManagedTable: per-file min/max stats
recorded from parquet footers at commit time (the manifest's stats
map — the same information Delta keeps in its log), a pruned read
path, and cluster-by compaction that makes the skipping sharp.

Scale rationale: at 100 TB / millions of files, answering a range
predicate from a manifest instead of opening every file's footer is the
difference between a driver-side dict lookup and a full file listing
scan. Correctness is never at stake — files without usable stats are
always kept (pruning yields a superset).
"""

from __future__ import annotations

import datetime as dt
import json

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog


@pytest.fixture()
def table(spark, tmp_path):
    return Catalog(spark, tmp_path / "wh").table("t")


def _batch(spark, lo, hi, day):
    return spark.createDataFrame(
        [(i, f"k{i:04d}", float(i) / 2, dt.date(2024, 1, day)) for i in range(lo, hi)],
        "id long, name string, score double, d date",
    ).coalesce(1)


def test_append_collects_stats_and_prunes(spark, table):
    for b, day in [((0, 100), 1), ((100, 200), 2), ((200, 300), 3), ((300, 400), 4)]:
        table.append(_batch(spark, *b, day))

    stats = table.file_stats()
    assert stats is not None
    assert len(stats) == 4
    # carried files inherit entries through the manifest chain — each
    # append's OWN stats cover only the files it added (no footer
    # re-read, no O(table) stats rewrite per commit)
    m = table._manifest(table.current_version())
    assert set(m["stats"]) == set(m["added"]) and len(m["added"]) == 1

    # id range hitting one batch → exactly one file survives pruning
    pruned = table.pruned_files({"id": (150, 160)})
    assert len(pruned) == 1
    got = table.read_pruned({"id": (150, 160)})
    want = table.read().filter("id >= 150 and id <= 160")
    assert sorted(r.id for r in got.collect()) == sorted(r.id for r in want.collect())


def test_pruning_matches_full_scan_on_every_type(spark, table):
    for b, day in [((0, 100), 1), ((100, 200), 5), ((200, 300), 9)]:
        table.append(_batch(spark, *b, day))
    cases = [
        {"id": (None, 42)},
        {"id": (250, None)},
        {"name": ("k0100", "k0199")},
        {"score": (50.0, 75.0)},
        {"d": (dt.date(2024, 1, 4), dt.date(2024, 1, 6))},
        {"id": (90, 210), "d": (dt.date(2024, 1, 5), None)},
    ]
    full = table.read()
    for preds in cases:
        got = {tuple(r) for r in table.read_pruned(preds).collect()}
        f = full
        for c, (lo, hi) in preds.items():
            if lo is not None:
                f = f.filter(f[c] >= lo)
            if hi is not None:
                f = f.filter(f[c] <= hi)
        want = {tuple(r) for r in f.collect()}
        assert got == want, preds


def test_cluster_by_compaction_sharpens_skipping(spark, table):
    # interleaved ids across appends → every file overlaps every range
    rows = [(i, f"k{i:04d}", float(i), dt.date(2024, 1, 1)) for i in range(0, 400)]
    import random

    rng = random.Random(7)
    rng.shuffle(rows)
    for j in range(4):
        table.append(
            spark.createDataFrame(
                rows[j * 100 : (j + 1) * 100],
                "id long, name string, score double, d date",
            ).coalesce(1)
        )
    assert len(table.pruned_files({"id": (10, 20)})) == 4  # no skipping possible

    table.compact(target_partitions=4, cluster_by=["id"])
    pruned = table.pruned_files({"id": (10, 20)})
    assert len(pruned) == 1  # disjoint ranges → single file
    got = sorted(r.id for r in table.read_pruned({"id": (10, 20)}).collect())
    assert got == list(range(10, 21))


def test_merge_preserves_stats_for_untouched_files(spark, table):
    for b in [(0, 100), (100, 200)]:
        table.append(_batch(spark, *b, 1))
    batch = spark.createDataFrame(
        [(5, "k0005x", 99.0, dt.date(2024, 2, 1))],
        "id long, name string, score double, d date",
    )
    table.merge_keyed(
        batch,
        ["id"],
        lambda cur, b: cur.join(b.select("id"), "id", "left_anti").unionByName(b),
    )
    stats = table.file_stats()
    assert stats is not None
    # the untouched 100-199 file kept its (inherited) stats entry
    assert len(table.pruned_files({"id": (150, 160)})) == 1
    got = {r.id for r in table.read_pruned({"id": (0, 10)}).collect()}
    assert got == set(range(0, 11))
    assert table.read_pruned({"id": (5, 5)}).first().name == "k0005x"


def test_missing_stats_keeps_all_files(spark, table):
    import json as _json

    table.append(_batch(spark, 0, 100, 1))
    v = table.current_version()
    m = table._manifest(v)
    m["stats"] = {}
    m["stats_full"] = {}
    table._write_manifest_file(v, m)
    assert len(table.pruned_files({"id": (0, 1)})) == len(table.data_files(v))
    assert table.read_pruned({"id": (0, 1)}).count() == 2


def test_unsafe_column_types_never_prune_but_stay_correct(spark, table):
    df = spark.createDataFrame(
        [(i, bool(i % 2), bytes([i])) for i in range(50)],
        "id long, flag boolean, payload binary",
    ).coalesce(1)
    table.overwrite(df)
    stats = table.file_stats()
    (entry,) = stats.values()
    assert "id" in entry["cols"]
    assert "flag" not in entry["cols"] and "payload" not in entry["cols"]
    assert table.read_pruned({"id": (10, 12)}).count() == 3


def test_manifest_metadata_is_invisible_to_plain_reads(spark, table):
    table.append(_batch(spark, 0, 10, 1))
    assert table.read().count() == 10
    vdir = table._version_dir(table.current_version())
    assert json.loads((vdir / "_manifest.json").read_text())["stats"]
    # the version dir holds METADATA only; data lives in the store
    assert not list(vdir.glob("*.parquet"))


def test_zorder_compaction_prunes_both_dimensions(spark, tmp_path):
    """compact(zorder_by=[x, y]) = open OPTIMIZE ZORDER: every file
    covers a tight rectangle in BOTH dimensions, so read_pruned skips
    files on EITHER predicate — where cluster_by only prunes its
    leading column."""
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import ManagedTable

    df = spark.range(20_000).selectExpr(
        "id", "CAST(id % 100 AS BIGINT) AS x",
        "CAST((id * 37) % 100 AS BIGINT) AS y",
    ).repartition(32)
    t = ManagedTable(spark, tmp_path / "wh", "points")
    t.overwrite(df)

    t.compact(target_partitions=16, zorder_by=["x", "y"])
    n_files = len(t.data_files())
    pruned_x = len(t.pruned_files({"x": (0, 5)}))
    pruned_y = len(t.pruned_files({"y": (0, 5)}))
    # a 6% slice of either dimension must skip most files
    assert pruned_x <= n_files // 2, (pruned_x, n_files)
    assert pruned_y <= n_files // 2, (pruned_y, n_files)
    # content preserved exactly
    assert t.read().count() == 20_000
    assert t.read().agg({"id": "sum"}).collect()[0][0] == sum(range(20_000))
    # exact reads through the pruned path agree with a full filter
    got = t.read_pruned({"y": (0, 5)}).count()
    want = t.read().filter("y >= 0 AND y <= 5").count()
    assert got == want

    # contrast: single-column clustering cannot prune the OTHER dim
    t.compact(target_partitions=16, cluster_by=["x"])
    clustered_y = len(t.pruned_files({"y": (0, 5)}))
    assert clustered_y > pruned_y, (clustered_y, pruned_y)


def test_zorder_compaction_guards(spark, tmp_path):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import ManagedTable

    t = ManagedTable(spark, tmp_path / "wh", "points")
    t.overwrite(spark.range(10).selectExpr("id", "id AS x", "id AS y"))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="mutually exclusive"):
        t.compact(cluster_by=["x"], zorder_by=["x", "y"])
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.skew import zorder_key_n

    with _pytest.raises(ValueError, match="at least one"):
        zorder_key_n([])
    with _pytest.raises(ValueError, match="interleaved bits"):
        t.compact(zorder_by=["x", "y"], zorder_bits=32)  # 64 > 62
    with _pytest.raises(ValueError, match="interleaved bits"):
        t.compact(zorder_by=["x", "y"], zorder_bits=0)


def test_zorder_compaction_three_columns(spark, tmp_path):
    """compact(zorder_by=[x, y, w]) — n-way OPTIMIZE ZORDER: a narrow
    slice of ANY of the three dimensions skips files."""
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import ManagedTable

    df = spark.range(30_000).selectExpr(
        "id", "CAST(id % 64 AS BIGINT) AS x",
        "CAST((id * 37) % 64 AS BIGINT) AS y",
        "CAST((id * 101) % 64 AS BIGINT) AS w",
    ).repartition(32)
    t = ManagedTable(spark, tmp_path / "wh", "points3")
    t.overwrite(df)
    t.compact(target_partitions=16, zorder_by=["x", "y", "w"], zorder_bits=6)
    n_files = len(t.data_files())
    for col in ("x", "y", "w"):
        pruned = len(t.pruned_files({col: (0, 3)}))
        assert pruned <= n_files // 2, (col, pruned, n_files)
        got = t.read_pruned({col: (0, 3)}).count()
        want = t.read().filter(f"{col} >= 0 AND {col} <= 3").count()
        assert got == want, col
    # content preserved exactly
    assert t.read().count() == 30_000
    assert t.read().agg({"id": "sum"}).collect()[0][0] == sum(range(30_000))


def test_bloom_point_predicate_pruning(spark, tmp_path):
    """Equality predicates probe the bound per-file blooms (Delta's
    delta.bloomFilter read-side use): on a hash layout where min/max
    ranges keep every file, a point lookup opens ~1 file — and
    read_pruned results stay exact."""
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    t = Catalog(spark, tmp_path / "wh").table("t")
    t.bind_bloom_filters(["k"], bits=8192)
    df = spark.range(4000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    t.overwrite(df.repartition(8, "k"))  # hash layout: ranges useless
    all_files = t.data_files()
    assert len(all_files) == 8
    hit = t.pruned_files({"k": (777, 777)})
    assert 1 <= len(hit) < 8  # bloom pinned the file (maybe +FPs)
    got = t.read_pruned({"k": (777, 777)}).collect()
    assert [(r.k, r.v) for r in got] == [(777, 777 % 97)]
    # absent value: provably nowhere (bar false positives, usually 0)
    assert len(t.pruned_files({"k": (999999, 999999)})) <= 1
    assert t.read_pruned({"k": (999999, 999999)}).count() == 0
    # range predicates and bloom-less columns untouched by the probe
    assert len(t.pruned_files({"v": (5, 5)})) == 8
    assert t.read_pruned({"v": (5, 5)}).count() == df.filter("v = 5").count()
    # NULL-valued equality never probes (and returns nothing exact-side)
    assert len(t.pruned_files({"k": (None, None)})) == 8


def test_bloom_point_prune_refuses_cross_family_literals(spark, tmp_path):
    """A literal that merely CASTS to the column type can hash
    differently from stored values the exact filter's coercion would
    match ('0777' = 777 numerically) — cross-family probes are refused,
    so results through read_pruned stay exact."""
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    t = Catalog(spark, tmp_path / "wh").table("t")
    t.bind_bloom_filters(["k"], bits=4096)
    df = spark.createDataFrame(
        [("0777", 1), ("777", 2), ("99", 3)], "k string, v int"
    )
    t.overwrite(df.repartition(2, "k"))
    # int literal on a string column: probe must be skipped entirely
    assert len(t.pruned_files({"k": (777, 777)})) == len(t.data_files())
    got = {tuple(r) for r in t.read_pruned({"k": (777, 777)}).collect()}
    want = {tuple(r) for r in df.filter(F.col("k") == F.lit(777)).collect()}
    assert got == want and got  # coercion matches BOTH '0777' and '777'
    assert got == {("0777", 1), ("777", 2)}
    # same-family string literal still probes (and stays exact)
    assert {tuple(r) for r in t.read_pruned({"k": ("99", "99")}).collect()} == {
        ("99", 3)
    }
    # bool literal on an int column: refused (bool is an int subclass)
    t2 = Catalog(spark, tmp_path / "wh").table("t2")
    t2.bind_bloom_filters(["b"], bits=256)
    t2.overwrite(spark.createDataFrame([(1,), (0,)], "b int").coalesce(1))
    assert len(t2.pruned_files({"b": (True, True)})) == 1
