"""run_islands_drain: incremental gaps-and-islands coverage state
(split ≡ union incl. weights, replay no-op, cross-batch island fusion)."""
import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.intervals import (
    coverage_from_islands,
    interval_coverage,
    merge_intervals,
)
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog
from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import run_islands_drain


def _cat(spark, p):
    return Catalog(spark, str(p))


@pytest.fixture()
def intervals(spark):
    # 3 keys, bursty starts so islands both merge and stay apart
    return spark.range(300).select(
        (F.col("id") % 3).cast("string").alias("k"),
        ((F.col("id") * 97) % 1000).alias("s"),
        "id",
    ).withColumn("e", F.col("s") + 40)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_islands_drain_split_equals_union(spark, tmp_path, intervals):
    a = intervals.where(F.col("id") % 2 == 0)
    b = intervals.where(F.col("id") % 2 == 1)
    cat_split = _cat(spark, tmp_path / "s")
    n1 = run_islands_drain(cat_split, a, epoch=1, key_col="k",
                           start_col="s", end_col="e", order_col="id", interval_spec="s..s+40")
    n2 = run_islands_drain(cat_split, b, epoch=2, key_col="k",
                           start_col="s", end_col="e", order_col="id", interval_spec="s..s+40")
    assert n1 > 0 and n2 > 0
    # drained state row-identical to the one-shot batch islands, n_rows
    # (original-row weights) included
    want = _rows(merge_intervals(intervals, "k", "s", "e", "id"))
    assert _rows(cat_split.table("interval_islands").read()) == want
    # and the finished coverage matches the batch operator
    got = _rows(coverage_from_islands(cat_split.table("interval_islands").read(), "k"))
    assert got == _rows(interval_coverage(intervals, "k", "s", "e", "id"))


def test_islands_drain_replay_is_noop(spark, tmp_path, intervals):
    """Epoch guard LOAD-BEARING: island bounds are idempotent under
    re-merge but n_rows weights are not — a replay must change nothing."""
    cat = _cat(spark, tmp_path)
    n = run_islands_drain(cat, intervals, epoch=1, key_col="k",
                          start_col="s", end_col="e", order_col="id", interval_spec="s..s+40")
    before = _rows(cat.table("interval_islands").read())
    assert n == len(before) > 0
    assert run_islands_drain(cat, intervals, epoch=1, key_col="k",
                             start_col="s", end_col="e", order_col="id", interval_spec="s..s+40") == -1
    assert _rows(cat.table("interval_islands").read()) == before


def test_islands_drain_rejects_mismatched_spec(spark, tmp_path, intervals):
    """interval_spec binds commit-atomically: islands built under
    different padding/gap semantics must never re-merge."""
    cat = _cat(spark, tmp_path)
    run_islands_drain(cat, intervals, epoch=1, key_col="k",
                      start_col="s", end_col="e", order_col="id", interval_spec="s..s+40")
    with pytest.raises(ValueError, match="interval_spec='s..s\\+40'"):
        run_islands_drain(cat, intervals, epoch=2, key_col="k",
                          start_col="s", end_col="e", order_col="id", interval_spec="s..s+5")


def test_prune_islands_retention_sweep(spark, tmp_path):
    """Dropping islands ended before the cutoff keeps later drains
    exact for the retained window — pruned state + new batch yields the
    same NEW islands as unpruned state + new batch."""
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import prune_islands

    schema = "k string, s bigint, e bigint, id bigint"
    old = spark.createDataFrame([("a", 0, 10, 1), ("a", 50, 60, 2)], schema)
    new = spark.createDataFrame([("a", 55, 70, 3)], schema)  # fuses with [50,60]

    cat_p = _cat(spark, tmp_path / "pruned")
    run_islands_drain(cat_p, old, epoch=1, key_col="k",
                      start_col="s", end_col="e", order_col="id", interval_spec="raw")
    assert prune_islands(cat_p, cutoff=40) == 1  # [0,10] swept, [50,60] kept
    run_islands_drain(cat_p, new, epoch=2, key_col="k",
                      start_col="s", end_col="e", order_col="id", interval_spec="raw")

    cat_u = _cat(spark, tmp_path / "unpruned")
    run_islands_drain(cat_u, old, epoch=1, key_col="k",
                      start_col="s", end_col="e", order_col="id", interval_spec="raw")
    run_islands_drain(cat_u, new, epoch=2, key_col="k",
                      start_col="s", end_col="e", order_col="id", interval_spec="raw")

    recent = lambda c: _rows(  # noqa: E731
        c.table("interval_islands").read().filter("island_end >= 40")
    )
    assert recent(cat_p) == recent(cat_u) == [("a", 50, 70, 2)]
    # empty-table sweep is a no-op
    assert prune_islands(_cat(spark, tmp_path / "empty"), cutoff=0) == 0


def test_islands_fuse_across_batches(spark, tmp_path):
    """An interval arriving in a LATER batch that bridges two stored
    islands fuses them into one (the property a naive append-only
    islands table cannot give)."""
    cat = _cat(spark, tmp_path)
    schema = "k string, s bigint, e bigint, id bigint"
    b1 = spark.createDataFrame([("a", 0, 10, 1), ("a", 100, 110, 2)], schema)
    b2 = spark.createDataFrame([("a", 5, 105, 3)], schema)  # the bridge
    run_islands_drain(cat, b1, epoch=1, key_col="k",
                      start_col="s", end_col="e", order_col="id", interval_spec="s..s+40")
    assert cat.table("interval_islands").read().count() == 2
    n = run_islands_drain(cat, b2, epoch=2, key_col="k",
                          start_col="s", end_col="e", order_col="id", interval_spec="s..s+40")
    assert n == 1
    row = cat.table("interval_islands").read().collect()[0]
    assert (row.k, row.island_start, row.island_end, row.n_rows) == ("a", 0, 110, 3)
