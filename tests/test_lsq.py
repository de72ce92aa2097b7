"""Level-sampling quantile sketch (KLL-style levels, deterministic):
exact mergeability, partitioning determinism, rank-error bounds, and
degenerate inputs. Companion to the fixed-bin `quantile_hist_merge`
entry — this is the adaptive-boundary refinement it names."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.sketches import (
    lsq_merge,
    lsq_quantiles,
    lsq_sketch,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def cents(spark):
    return (
        spark.read.parquet(f"{SF}/orders.parquet")
        .select(
            "o_orderkey",
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("bigint")
            .alias("cents"),
        )
        .cache()
    )


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_merge_is_row_identical_to_union_build(spark, cents):
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B), row for row — the
    property KLL's random compaction cannot promise and the reason this
    sketch uses deterministic hash levels."""
    union_built = lsq_sketch(cents, "cents", "o_orderkey", k=512)
    shards = [
        lsq_sketch(
            cents.where(F.col("o_orderkey") % 3 == i),
            "cents",
            "o_orderkey",
            k=512,
        )
        for i in range(3)
    ]
    assert _rows(lsq_merge(*shards)) == _rows(union_built)


def test_build_is_partitioning_independent(spark, cents):
    a = lsq_sketch(cents, "cents", "o_orderkey", k=512)
    b = lsq_sketch(cents.repartition(13), "cents", "o_orderkey", k=512)
    assert _rows(a) == _rows(b)


def test_rank_error_within_sampling_bound(spark, cents):
    """Each estimated percentile's TRUE rank must sit within eps*n of
    the target, eps = sqrt(ln(2/delta) / (2*retained)) (Hoeffding /
    DKW for a uniform sample), delta = 1e-2."""
    import math

    sk = lsq_sketch(cents, "cents", "o_orderkey", k=512)
    q = lsq_quantiles(sk, pcts=(50, 90, 99)).collect()[0]
    n = q.n_total
    eps = math.sqrt(math.log(2 / 1e-2) / (2 * q.retained))
    for p in (50, 90, 99):
        est = getattr(q, f"est_p{p}")
        true_rank = cents.where(F.col("cents") <= est).count()
        assert abs(true_rank / n - p / 100) <= eps, (p, true_rank / n, eps)


def test_small_input_is_exact(spark, cents):
    """n <= k: cap 0, every row retained, and each estimate equals the
    exact discrete percentile (min value whose cum count reaches p%)."""
    small = cents.orderBy("o_orderkey").limit(200).cache()
    sk = lsq_sketch(small, "cents", "o_orderkey", k=512)
    q = lsq_quantiles(sk, pcts=(50, 99)).collect()[0]
    assert q.cap == 0 and q.retained == 200 and q.n_total == 200
    vals = sorted(r.cents for r in small.collect())
    for p in (50, 99):
        import math

        exact = vals[math.ceil(p / 100 * 200) - 1]
        assert getattr(q, f"est_p{p}") == exact


def test_cap_adapts_to_scale(spark, cents):
    """The whole point vs fixed bins: cap grows with n so the retained
    count stays <= k at any scale."""
    full = lsq_sketch(cents, "cents", "o_orderkey", k=512)
    r = lsq_quantiles(full).collect()[0]
    assert 0 < r.cap and r.retained <= 512
    tenth = lsq_sketch(
        cents.where(F.col("o_orderkey") % 10 == 0), "cents", "o_orderkey", k=512
    )
    r10 = lsq_quantiles(tenth).collect()[0]
    assert r10.cap < r.cap  # smaller data → lower cap → finer sampling


def test_nulls_excluded_and_empty_input(spark, cents):
    withnull = cents.withColumn(
        "cents", F.when(F.col("o_orderkey") % 2 == 0, F.col("cents"))
    )
    sk = lsq_sketch(withnull, "cents", "o_orderkey", k=512)
    evens_only = lsq_sketch(
        cents.where(F.col("o_orderkey") % 2 == 0), "cents", "o_orderkey", k=512
    )
    assert _rows(sk) == _rows(evens_only)

    empty = lsq_sketch(cents.where(F.lit(False)), "cents", "o_orderkey", k=512)
    q = lsq_quantiles(empty).collect()[0]
    assert q.retained == 0 and q.est_p50 is None


# ----------------------------------------------- streaming LSQ drain --
def _cat(spark, tmp_path):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    return Catalog(spark, tmp_path / "warehouse")


def test_lsq_drain_split_equals_union(spark, tmp_path, cents):
    """Two drains over a split stream leave the EXACT sketch one drain
    over the union would — row-identical, same table contents (mirrors
    test_ann_drain's split ≡ union discipline)."""
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import run_lsq_drain

    a = cents.where(F.col("o_orderkey") % 2 == 0)
    b = cents.where(F.col("o_orderkey") % 2 == 1)
    cat_split = _cat(spark, tmp_path / "s")
    n1 = run_lsq_drain(cat_split, a, epoch=1, value_col="cents", id_col="o_orderkey")
    n2 = run_lsq_drain(cat_split, b, epoch=2, value_col="cents", id_col="o_orderkey")
    assert n1 > 0 and 0 < n2 <= 512  # bounded state after every drain
    cat_one = _cat(spark, tmp_path / "u")
    run_lsq_drain(cat_one, cents, epoch=1, value_col="cents", id_col="o_orderkey")
    assert _rows(cat_split.table("lsq_sketch_rows").read()) == _rows(
        cat_one.table("lsq_sketch_rows").read()
    )


def test_lsq_drain_replay_is_noop(spark, tmp_path, cents):
    """The epoch guard is LOAD-BEARING here (merge is not idempotent):
    a replayed batch must change nothing — n_total included."""
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import run_lsq_drain

    cat = _cat(spark, tmp_path)
    n = run_lsq_drain(cat, cents, epoch=1, value_col="cents", id_col="o_orderkey")
    before = _rows(cat.table("lsq_sketch_rows").read())
    assert n == len(before) > 0
    assert run_lsq_drain(
        cat, cents, epoch=1, value_col="cents", id_col="o_orderkey"
    ) == -1
    assert _rows(cat.table("lsq_sketch_rows").read()) == before


def test_lsq_drain_rejects_mismatched_params(spark, tmp_path, cents):
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import run_lsq_drain

    cat = _cat(spark, tmp_path)
    run_lsq_drain(cat, cents, epoch=1, value_col="cents", id_col="o_orderkey", k=512)
    with pytest.raises(ValueError, match="lsq_k=512"):
        run_lsq_drain(
            cat, cents, epoch=2, value_col="cents", id_col="o_orderkey", k=256
        )
    with pytest.raises(ValueError, match="lsq_salt"):
        run_lsq_drain(
            cat, cents, epoch=2, value_col="cents", id_col="o_orderkey",
            salt="other|",
        )


def test_lsq_drain_estimates_track_stream(spark, tmp_path, cents):
    """After three drains the table answers quantile queries over the
    WHOLE stream within the sampling bound, from <= k rows of state."""
    import math

    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import run_lsq_drain

    cat = _cat(spark, tmp_path)
    for e in range(3):
        run_lsq_drain(
            cat, cents.where(F.col("o_orderkey") % 3 == e),
            epoch=e + 1, value_col="cents", id_col="o_orderkey",
        )
    sk = cat.table("lsq_sketch_rows").read()
    q = lsq_quantiles(sk, pcts=(50, 90)).collect()[0]
    n = cents.count()
    assert q.n_total == n
    eps = math.sqrt(math.log(2 / 1e-2) / (2 * q.retained))
    for p in (50, 90):
        est = getattr(q, f"est_p{p}")
        true_rank = cents.where(F.col("cents") <= est).count()
        assert abs(true_rank / n - p / 100) <= eps


def test_merge_with_empty_is_identity(spark, cents):
    base = lsq_sketch(cents, "cents", "o_orderkey", k=512)
    empty = lsq_sketch(cents.where(F.lit(False)), "cents", "o_orderkey", k=512)
    merged = lsq_merge(base, empty)
    assert _rows(merged.select("value", "level", "cap", "k")) == _rows(
        base.select("value", "level", "cap", "k")
    )
    # n_total folds 0 from the empty side
    assert merged.select("n_total").distinct().collect()[0].n_total == 15000
