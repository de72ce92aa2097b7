"""Incremental view maintenance over an UPDATING source: when the
source ManagedTable takes merge commits (SCD1 gold), IncrementalAgg
folds the signed change feed — inserts add, deletes retract — instead
of failing over to a full rebuild. MV stays bit-equal to a from-scratch
recompute of the current snapshot under any refresh slicing.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.cdc import scd1_merge
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog
from end_to_end_azure_databricks_data_engineering_project_spark.streaming.mv import (
    IncrementalAgg,
    Measure,
)


@pytest.fixture()
def catalog(spark, tmp_path):
    return Catalog(spark, tmp_path / "wh")


def _src(spark, catalog):
    t = catalog.table("gold_orders")
    base = spark.createDataFrame(
        [(k, ["US", "DE", "FR"][k % 3], float(k), 1) for k in range(60)],
        "k long, country string, amount double, seq int",
    )
    t.overwrite(base.repartition(4, "k"))
    return t


def _mv(catalog):
    return IncrementalAgg(
        catalog, "orders_by_country", "gold_orders", ["country"],
        [Measure("total", "amount", "sum"), Measure("n", "k", "count")],
    )


def _recompute(t):
    return {
        (r.country, float(r.total), r.n)
        for r in t.read()
        .groupBy("country")
        .agg(
            F.sum(F.col("amount").cast("decimal(28,2)")).alias("total"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    }


def _read_mv(mv):
    return {(r.country, float(r.total), r.n) for r in mv.read().collect()}


def test_merge_source_folds_change_feed(spark, catalog):
    t = _src(spark, catalog)
    mv = _mv(catalog)
    mv.refresh()
    assert _read_mv(mv) == _recompute(t)

    # merge: move 10 keys' amounts and flip one key's country
    batch = spark.createDataFrame(
        [(k, "JP", 1000.0 + k, 2) for k in range(0, 10)],
        "k long, country string, amount double, seq int",
    )
    t.merge_keyed(batch, ["k"], lambda c, b: scd1_merge(c, b, ["k"], "seq"))
    n = mv.refresh()
    assert n > 0
    assert _read_mv(mv) == _recompute(t)


def test_slicing_independence_with_merges(spark, catalog):
    t1 = _src(spark, catalog)
    mv1 = _mv(catalog)
    mv1.refresh()
    b1 = spark.createDataFrame([(3, "US", 500.0, 2)], "k long, country string, amount double, seq int")
    b2 = spark.createDataFrame([(4, "BR", 9.0, 2)], "k long, country string, amount double, seq int")
    # refresh after each merge
    t1.merge_keyed(b1, ["k"], lambda c, b: scd1_merge(c, b, ["k"], "seq"))
    mv1.refresh()
    t1.merge_keyed(b2, ["k"], lambda c, b: scd1_merge(c, b, ["k"], "seq"))
    mv1.refresh()
    per_step = _read_mv(mv1)
    assert per_step == _recompute(t1)


def test_group_emptied_by_updates_disappears(spark, catalog):
    t = _src(spark, catalog)
    mv = _mv(catalog)
    mv.refresh()
    assert any(c == "FR" for c, _, _ in _read_mv(mv))
    # move every FR row to US
    fr_keys = [r.k for r in t.read().filter("country = 'FR'").collect()]
    batch = spark.createDataFrame(
        [(k, "US", float(k), 2) for k in fr_keys],
        "k long, country string, amount double, seq int",
    )
    t.merge_keyed(batch, ["k"], lambda c, b: scd1_merge(c, b, ["k"], "seq"))
    mv.refresh()
    got = _read_mv(mv)
    assert not any(c == "FR" for c, _, _ in got)
    assert got == _recompute(t)


def test_non_invertible_measure_over_merge_raises(spark, catalog):
    t = _src(spark, catalog)
    mv = IncrementalAgg(
        catalog, "orders_minmax", "gold_orders", ["country"],
        [Measure("mx", "amount", "max")],
    )
    mv.refresh()
    batch = spark.createDataFrame([(3, "US", 1.0, 2)], "k long, country string, amount double, seq int")
    t.merge_keyed(batch, ["k"], lambda c, b: scd1_merge(c, b, ["k"], "seq"))
    with pytest.raises(RuntimeError, match="non-invertible|rebuild"):
        mv.refresh()


def test_append_only_path_unchanged(spark, catalog):
    t = _src(spark, catalog)
    mv = _mv(catalog)
    mv.refresh()
    t.append(spark.createDataFrame([(100, "US", 7.0, 1)], "k long, country string, amount double, seq int"))
    mv.refresh()
    assert _read_mv(mv) == _recompute(t)
