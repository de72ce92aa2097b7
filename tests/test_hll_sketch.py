"""HLL distinct-sketch units: merge==union (the mergeability law),
bounded register count, estimate accuracy, empty input."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _regs_dict(df):
    return {r["idx"]: r["reg"] for r in df.collect()}


def test_hll_registers_bounded_and_deterministic(spark):
    df = spark.range(10_000).select(F.col("id").alias("k"))
    regs = hll_registers(df, "k")
    rows = regs.collect()
    assert len(rows) <= 256
    assert all(1 <= r["reg"] <= 53 for r in rows)
    # rebuild → identical registers (pure function of the key set)
    assert _regs_dict(hll_registers(df, "k")) == _regs_dict(regs)


def test_hll_merge_equals_union_build(spark):
    df = spark.range(5_000).select(F.col("id").alias("k"))
    a = df.filter(F.col("k") % 3 == 0)
    b = df.filter(F.col("k") % 3 == 1)
    c = df.filter(F.col("k") % 3 == 2)
    merged = hll_merge(
        hll_registers(a, "k"), hll_registers(b, "k"), hll_registers(c, "k")
    )
    assert _regs_dict(merged) == _regs_dict(hll_registers(df, "k"))


def test_hll_merge_idempotent_on_overlap(spark):
    # shards that OVERLAP still merge to the union registers — max is
    # idempotent, so double-counted keys cannot inflate the sketch
    # (the property exact counters lack)
    df = spark.range(2_000).select(F.col("id").alias("k"))
    a = df.filter(F.col("k") < 1_500)
    b = df.filter(F.col("k") >= 500)
    merged = hll_merge(hll_registers(a, "k"), hll_registers(b, "k"))
    assert _regs_dict(merged) == _regs_dict(hll_registers(df, "k"))


def test_hll_estimate_within_error_band(spark):
    # m=256 → relative std error 1.04/sqrt(256) = 6.5%; allow 4 sigma
    for n in (500, 5_000, 20_000):
        df = spark.range(n).select(F.col("id").alias("k"))
        est = hll_estimate(hll_registers(df, "k")).collect()[0]["raw_estimate"]
        assert abs(est - n) / n < 0.26, (n, est)


def test_hll_empty_input(spark):
    df = spark.range(0).select(F.col("id").alias("k"))
    regs = hll_registers(df, "k")
    assert regs.count() == 0
    row = hll_estimate(regs).collect()[0]
    # raw estimate of the empty sketch is alpha*m (~184), NOT 0 — the
    # small-range correction that would fix it needs ln(); callers gate
    # on used_registers == 0 instead
    assert row["used_registers"] == 0
    assert row["raw_estimate"] > 0


@settings(max_examples=15, deadline=None)
@given(
    keys=st.lists(st.integers(min_value=0, max_value=10_000), max_size=60),
    pivot=st.integers(min_value=0, max_value=10_000),
)
@pytest.mark.slow
def test_hll_merge_equals_union_property(spark, keys, pivot):
    df = spark.createDataFrame([(k,) for k in keys] or [(0,)], ["k"])
    if not keys:
        df = df.limit(0)
    a = df.filter(F.col("k") < pivot)
    b = df.filter(F.col("k") >= pivot)
    merged = hll_merge(hll_registers(a, "k"), hll_registers(b, "k"))
    assert _regs_dict(merged) == _regs_dict(hll_registers(df, "k"))


# -------------------------------------------------- streaming HLL drain --
def _drain_setup(spark, tmp_path):
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog

    return Catalog(spark, tmp_path / "warehouse")


def _ids(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("user_id"))


def test_hll_drain_slicing_independent(spark, tmp_path):
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import run_hll_drain

    # two drains over a split stream == one drain over the union
    cat_a = _drain_setup(spark, tmp_path / "a")
    run_hll_drain(cat_a, _ids(spark, 0, 600), epoch=1)
    run_hll_drain(cat_a, _ids(spark, 400, 1_000), epoch=2)
    cat_b = _drain_setup(spark, tmp_path / "b")
    run_hll_drain(cat_b, _ids(spark, 0, 1_000), epoch=1)
    assert _regs_dict(cat_a.table("hll_registers").read()) == _regs_dict(
        cat_b.table("hll_registers").read()
    )


def test_hll_drain_replay_is_noop(spark, tmp_path):
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import run_hll_drain

    cat = _drain_setup(spark, tmp_path)
    n = run_hll_drain(cat, _ids(spark, 0, 500), epoch=1)
    before = _regs_dict(cat.table("hll_registers").read())
    assert n == len(before) > 0  # returns the register count
    assert run_hll_drain(cat, _ids(spark, 0, 500), epoch=1) == -1  # replay
    assert _regs_dict(cat.table("hll_registers").read()) == before


def test_hll_drain_rejects_mismatched_m(spark, tmp_path):
    import pytest as _pytest

    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import run_hll_drain

    cat = _drain_setup(spark, tmp_path)
    run_hll_drain(cat, _ids(spark, 0, 100), epoch=1, m=256)
    with _pytest.raises(ValueError, match="m=256"):
        run_hll_drain(cat, _ids(spark, 100, 200), epoch=2, m=64)


def test_hll_drain_m_binding_is_commit_atomic(spark, tmp_path):
    """m binds as a table property WITH the first successful commit:
    nothing is bound before one (a failed first drain leaves no
    binding), and after one the binding is enforced both early
    (friendly ValueError) and inside the locked commit itself."""
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import run_hll_drain

    cat = _drain_setup(spark, tmp_path)
    table = cat.table("hll_registers")
    assert table.table_prop("hll_m") is None  # nothing committed, no binding
    n = run_hll_drain(cat, _ids(spark, 0, 300), epoch=1, m=256)
    assert n > 0
    assert table.table_prop("hll_m") == 256
    import pytest as _pytest

    with _pytest.raises(ValueError, match="m=256"):
        run_hll_drain(cat, _ids(spark, 300, 400), epoch=2, m=64)
    # the commit-level guard holds even if the early check is bypassed
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import (
        ConcurrentWriteError,
    )

    with _pytest.raises(ConcurrentWriteError, match="hll_m"):
        table.overwrite(
            table.read(), expect_props={"hll_m": 64}, set_props={"hll_m": 64}
        )


def test_hll_small_m_register_width_and_accuracy(spark):
    # m=16 counts rho over a 56-bit window (not 256's 52): registers
    # stay in [1, 57] and the estimate is unbiased, not ~16x low
    df = spark.range(10_000).select(F.col("id").alias("k"))
    regs = hll_registers(df, "k", m=16)
    rows = regs.collect()
    assert len(rows) <= 16
    assert all(1 <= r["reg"] <= 57 for r in rows)
    est = hll_estimate(regs, m=16).collect()[0]["raw_estimate"]
    # m=16 -> rel std error 26%; allow 4 sigma — and a one-sided floor
    # that the old fixed-52-bit-window bug (~16x-low estimates, ~625)
    # cannot pass
    assert abs(est - 10_000) / 10_000 < 1.04, est
    assert est > 5_000, est


def test_hll_null_keys_excluded(spark):
    # NULLs are not distinct values (COUNT DISTINCT semantics) and must
    # not poison the estimate fold
    df = spark.createDataFrame([(1,), (2,), (None,), (None,)], "k int")
    regs = hll_registers(df, "k")
    assert regs.where(F.col("idx").isNull()).count() == 0
    row = hll_estimate(regs).collect()[0]
    assert row["raw_estimate"] is not None and row["used_registers"] <= 2


def test_hll_drain_estimate_tracks_stream(spark, tmp_path):
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import run_hll_drain

    cat = _drain_setup(spark, tmp_path)
    for e, (lo, hi) in enumerate([(0, 2_000), (1_000, 4_000), (3_500, 6_000)], 1):
        run_hll_drain(cat, _ids(spark, lo, hi), epoch=e)
    regs = cat.table("hll_registers").read()
    assert regs.count() <= 256  # bounded state regardless of stream length
    est = hll_estimate(regs).collect()[0]["raw_estimate"]
    assert abs(est - 6_000) / 6_000 < 0.26


def test_hll_by_group_matches_global_on_single_group(spark):
    """A grouped sketch over one group must equal the ungrouped one."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.sketches import (
        hll_estimate,
        hll_estimate_by,
        hll_registers,
        hll_registers_by,
    )
    import pyspark.sql.functions as F

    df = spark.range(0, 500).select(
        F.lit("g").alias("grp"), F.col("id").alias("k")
    )
    g = hll_estimate_by(hll_registers_by(df, "grp", "k"), "grp").collect()[0]
    u = hll_estimate(hll_registers(df, "k")).collect()[0]
    assert g.used_registers == u.used_registers
    assert g.raw_estimate == u.raw_estimate


def test_hll_by_group_isolates_groups(spark):
    """Each group's estimate tracks its own cardinality; a dominating
    sibling group must not bleed into a small one."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.sketches import (
        hll_estimate_by,
        hll_registers_by,
    )
    import pyspark.sql.functions as F

    # both cardinalities sit in the raw-estimate regime (n >~ m): the
    # engine's HLL deliberately omits the small-range linear-counting
    # correction (needs ln(), which is not cross-engine bit-stable).
    big = spark.range(0, 3000).select(F.lit("big").alias("grp"), F.col("id").alias("k"))
    small = spark.range(0, 400).select(F.lit("small").alias("grp"), F.col("id").alias("k"))
    est = {
        r.grp: r.raw_estimate
        for r in hll_estimate_by(
            hll_registers_by(big.unionByName(small), "grp", "k"), "grp"
        ).collect()
    }
    assert 0.6 * 400 <= est["small"] <= 1.6 * 400
    assert 0.7 * 3000 <= est["big"] <= 1.3 * 3000


def test_hll_small_m_alpha_constants(spark):
    """m=16/32/64 use the tabulated alpha_m, not the >=128 asymptote —
    estimates at n >> m stay within the published error envelope."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.sketches import (
        hll_estimate,
        hll_registers,
    )
    import pyspark.sql.functions as F

    df = spark.range(0, 4000).select(F.col("id").alias("k"))
    for m, rel in [(16, 0.26), (32, 0.18), (64, 0.13)]:
        est = hll_estimate(hll_registers(df, "k", m=m), m=m).collect()[0]
        # raw estimate (no corrections): allow 4 sigma of 1.04/sqrt(m)
        assert abs(est.raw_estimate - 4000) <= 4 * rel * 4000, (m, est.raw_estimate)


def test_hll_rejects_unsupported_m(spark):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.sketches import (
        hll_idx_rho,
    )
    import pyspark.sql.functions as F
    import pytest as _pytest

    for bad in (8, 512, 24):
        with _pytest.raises(AssertionError):
            hll_idx_rho(F.col("x"), m=bad)


def test_hll_estimate_table_uses_bound_m(spark, tmp_path):
    import pytest as _pytest

    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import (
        hll_estimate_table,
        run_hll_drain,
    )

    cat = Catalog(spark, str(tmp_path / "wh"))
    ids = spark.range(1000).select(F.col("id").alias("user_id"))
    run_hll_drain(cat, ids, epoch=1, key_col="user_id", m=64)
    est = hll_estimate_table(cat).collect()[0].raw_estimate
    assert 700 <= est <= 1300  # ~13% std error at m=64
    with _pytest.raises(ValueError, match="no bound m"):
        hll_estimate_table(Catalog(spark, str(tmp_path / "fresh")))
