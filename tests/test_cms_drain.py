"""run_cms_drain: incremental count-min sketch (linear-sketch identity:
drained split ≡ one-shot union, replay no-op, geometry binding)."""
import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.sketches import (
    cms_build,
    cms_estimate,
)
from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog
from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import (
    cms_estimate_table,
    run_cms_drain,
)


def _cat(spark, p):
    return Catalog(spark, str(p))


@pytest.fixture()
def keyed(spark):
    # zipf-ish key stream: key k appears ~600/(k+1) times
    return spark.range(3000).select(
        (F.col("id") % 60).alias("k"), "id"
    ).filter(F.col("id") % (F.col("k") + 1) == 0)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_cms_drain_split_equals_union_and_direct_build(spark, tmp_path, keyed):
    a = keyed.where(F.col("id") % 2 == 0)
    b = keyed.where(F.col("id") % 2 == 1)
    cat = _cat(spark, tmp_path / "s")
    n1 = run_cms_drain(cat, a, epoch=1, key_col="k")
    n2 = run_cms_drain(cat, b, epoch=2, key_col="k")
    assert 0 < n1 <= 4 * 1024 and 0 < n2 <= 4 * 1024
    # linear sketch: drained state == one-shot build over the union
    want = _rows(cms_build(keyed, "k"))
    assert _rows(cat.table("cms_cells").read()) == want
    # estimates from the drained table upper-bound true counts
    keys = spark.range(5).select(F.col("id").alias("k"))
    est = {r.k: r.est_n for r in cms_estimate(
        cat.table("cms_cells").read(), keys, "k").collect()}
    true = {r.k: r.n for r in keyed.groupBy("k").agg(F.count("*").alias("n"))
            .filter("k < 5").collect()}
    for k, n in true.items():
        assert est[k] >= n  # one-sided error


def test_cms_estimate_table_uses_bound_geometry(spark, tmp_path, keyed):
    """The read-path twin of the drain's prop guard: a non-default
    drained geometry still estimates correctly because the helper reads
    (depth, width) from the table props — a caller guessing the default
    width would probe the wrong buckets and silently UNDERestimate,
    breaking the one-sided guarantee."""
    cat = _cat(spark, tmp_path)
    run_cms_drain(cat, keyed, epoch=1, key_col="k", depth=3, width=256)
    keys = spark.range(5).select(F.col("id").alias("k"))
    est = {r.k: r.est_n for r in cms_estimate_table(cat, keys, "k").collect()}
    true = {r.k: r.n for r in keyed.groupBy("k").agg(F.count("*").alias("n"))
            .filter("k < 5").collect()}
    for k, n in true.items():
        assert est[k] >= n
    # nothing drained yet → loud refusal, not a zero-filled estimate
    with pytest.raises(ValueError, match="no bound geometry"):
        cms_estimate_table(_cat(spark, tmp_path / "fresh"), keys, "k")


def test_cms_drain_replay_is_noop(spark, tmp_path, keyed):
    """Cell sums are not idempotent — the epoch guard must hold."""
    cat = _cat(spark, tmp_path)
    n = run_cms_drain(cat, keyed, epoch=1, key_col="k")
    before = _rows(cat.table("cms_cells").read())
    assert n == len(before) > 0
    assert run_cms_drain(cat, keyed, epoch=1, key_col="k") == -1
    assert _rows(cat.table("cms_cells").read()) == before


def test_cms_drain_rejects_mismatched_geometry(spark, tmp_path, keyed):
    cat = _cat(spark, tmp_path)
    run_cms_drain(cat, keyed, epoch=1, key_col="k", depth=4, width=1024)
    with pytest.raises(ValueError, match="cms_width=1024"):
        run_cms_drain(cat, keyed, epoch=2, key_col="k", depth=4, width=512)
