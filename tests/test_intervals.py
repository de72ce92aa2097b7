"""merge_intervals / interval_coverage: gaps-and-islands semantics."""
from end_to_end_azure_databricks_data_engineering_project_spark.operators.intervals import (
    interval_coverage,
    merge_intervals,
)

SCHEMA = "k string, s bigint, e bigint, oid bigint"


def _islands(spark, rows):
    df = spark.createDataFrame(rows, SCHEMA)
    out = merge_intervals(df, "k", "s", "e", "oid").collect()
    return sorted((r.k, r.island_start, r.island_end, r.n_rows) for r in out)


def test_disjoint_intervals_stay_separate(spark):
    rows = [("a", 0, 10, 1), ("a", 20, 30, 2)]
    assert _islands(spark, rows) == [("a", 0, 10, 1), ("a", 20, 30, 1)]


def test_overlap_and_touching_merge(spark):
    # [0,10] overlaps [5,15]; [15,20] touches → all one island
    rows = [("a", 0, 10, 1), ("a", 5, 15, 2), ("a", 15, 20, 3)]
    assert _islands(spark, rows) == [("a", 0, 20, 3)]


def test_contained_interval_does_not_split(spark):
    # [0,100] contains [10,20]; [30,40] also inside — running max end
    # keeps the island open (the lag-only formulation gets this wrong)
    rows = [("a", 0, 100, 1), ("a", 10, 20, 2), ("a", 30, 40, 3), ("a", 150, 160, 4)]
    assert _islands(spark, rows) == [("a", 0, 100, 3), ("a", 150, 160, 1)]


def test_keys_are_independent(spark):
    rows = [("a", 0, 10, 1), ("b", 5, 15, 2)]
    assert _islands(spark, rows) == [("a", 0, 10, 1), ("b", 5, 15, 1)]


def test_coverage_aggregates(spark):
    rows = [
        ("a", 0, 10, 1), ("a", 5, 15, 2),   # island [0,15]
        ("a", 100, 110, 3),                  # island [100,110]
        ("b", 0, 1, 4),
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    out = {r.k: r for r in interval_coverage(df, "k", "s", "e", "oid").collect()}
    assert (out["a"].n_islands, out["a"].covered, out["a"].longest) == (2, 25, 15)
    assert (out["b"].n_islands, out["b"].covered, out["b"].longest) == (1, 1, 1)


def test_partitioning_invariant(spark):
    rows = [("k%d" % (i % 5), (i * 37) % 1000, (i * 37) % 1000 + 50, i) for i in range(300)]
    df = spark.createDataFrame(rows, SCHEMA)
    a = sorted(map(tuple, merge_intervals(df, "k", "s", "e", "oid").collect()))
    b = sorted(map(tuple, merge_intervals(df.repartition(13), "k", "s", "e", "oid").collect()))
    assert a == b


def test_tie_on_start_is_deterministic(spark):
    # two rows with identical start: order_col breaks the tie; the
    # second row (higher oid) sees the first's end in its running max
    rows = [("a", 0, 10, 2), ("a", 0, 5, 1), ("a", 11, 12, 3)]
    # row oid=1 [0,5] first, oid=2 [0,10] continues island; [11,12] is
    # beyond max end 10 → new island
    assert _islands(spark, rows) == [("a", 0, 10, 2), ("a", 11, 12, 1)]


# ------------------------------------------------- resample_ffill

def _rs(spark, rows):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.intervals import resample_ffill

    df = spark.createDataFrame(rows, "k string, sec long, v double, oid long")
    return resample_ffill(df, "k", "sec", "v", step=10, order_col="oid")


def test_resample_carries_last_value_forward(spark):
    out = _rs(spark, [("a", 5, 1.0, 1), ("a", 17, 2.0, 2), ("a", 38, 3.0, 3)])
    got = sorted((r.grid_sec, r.v) for r in out.collect())
    # grid aligned to multiples of 10 within [ceil(5/10)*10, floor(38/10)*10]
    assert got == [(10, 1.0), (20, 2.0), (30, 2.0)]


def test_resample_same_second_ties_break_by_order(spark):
    out = _rs(spark, [("a", 10, 1.0, 1), ("a", 10, 9.0, 2), ("a", 25, 5.0, 3)])
    got = dict((r.grid_sec, r.v) for r in out.collect())
    assert got[10] == 9.0  # the higher-order observation wins
    assert got[20] == 9.0


def test_resample_null_values_do_not_overwrite(spark):
    out = _rs(spark, [("a", 8, 4.0, 1), ("a", 19, None, 2), ("a", 30, 7.0, 3)])
    got = dict((r.grid_sec, r.v) for r in out.collect())
    # the NULL at 19 does not clobber 4.0; the 7.0 lands exactly ON
    # grid point 30 (observations sort before the marker at a second)
    assert got == {10: 4.0, 20: 4.0, 30: 7.0}


def test_resample_short_span_and_key_independence(spark):
    out = _rs(spark, [("a", 12, 1.0, 1), ("a", 13, 2.0, 2),  # span < step
                      ("b", 0, 5.0, 3), ("b", 20, 6.0, 4)])
    rows = sorted((r.k, r.grid_sec, r.v) for r in out.collect())
    # key a: ceil(12/10)*10=20 > floor(13/10)*10=10 -> no grid rows
    assert rows == [("b", 0, 5.0), ("b", 10, 5.0), ("b", 20, 6.0)]


# ------------------------------------------------- asof_join

def _aj(spark, lrows, rrows):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.intervals import asof_join

    l = spark.createDataFrame(lrows, "k string, sec long, lid long")
    r = spark.createDataFrame(rrows, "k string, sec long, rid long, v double")
    return asof_join(l, r, "k", "sec", "sec",
                     value_cols=["v", "rid"], order_col="rid")


def test_asof_picks_latest_at_or_before(spark):
    out = _aj(spark,
              [("a", 10, 1), ("a", 25, 2), ("a", 5, 3)],
              [("a", 10, 100, 1.0), ("a", 20, 101, 2.0), ("a", 30, 102, 3.0)])
    got = {r.lid: (r.v_asof, r.rid_asof) for r in out.collect()}
    assert got == {
        1: (1.0, 100),   # right AT the left second counts (<=)
        2: (2.0, 101),
        3: (None, None),  # nothing precedes
    }


def test_asof_same_second_right_ties_break_by_order(spark):
    out = _aj(spark, [("a", 10, 1)],
              [("a", 10, 100, 1.0), ("a", 10, 101, 9.0)])
    r = out.collect()[0]
    assert (r.v_asof, r.rid_asof) == (9.0, 101)


def test_asof_null_right_value_still_advances_state(spark):
    out = _aj(spark, [("a", 30, 1)],
              [("a", 10, 100, 4.0), ("a", 20, 101, None)])
    r = out.collect()[0]
    # the null-valued observation at 20 IS the latest state (unlike
    # resample_ffill's per-column fill, the as-of payload is the row)
    assert (r.v_asof, r.rid_asof) == (None, 101)


def test_asof_keys_are_independent_and_left_preserved(spark):
    out = _aj(spark,
              [("a", 10, 1), ("b", 10, 2)],
              [("a", 5, 100, 1.0)])
    got = {r.lid: r.rid_asof for r in out.collect()}
    assert got == {1: 100, 2: None}
    assert set(out.columns) == {"k", "sec", "lid", "v_asof", "rid_asof"}


def test_resample_and_asof_drop_null_seconds(spark):
    """Review-caught: Spark sorts NULLS FIRST ascending, so an
    unfiltered null-second row would become the 'earliest' state and
    forward-fill everything (and diverge from NULLS LAST engines)."""
    out = _rs(spark, [("a", None, 99.0, 1), ("a", 8, 4.0, 2), ("a", 21, 5.0, 3)])
    got = dict((r.grid_sec, r.v) for r in out.collect())
    assert got == {10: 4.0, 20: 4.0}  # 99.0 never surfaces
    out2 = _aj(spark, [("a", 10, 1), ("a", None, 2)],
               [("a", None, 100, 7.0), ("a", 30, 101, 8.0)])
    rows = {r.lid: r.v_asof for r in out2.collect()}
    assert rows == {1: None}  # null-sec right never baselines; null-sec left dropped


def test_asof_suffix_collision_refused(spark):
    import pytest as _pytest

    from end_to_end_azure_databricks_data_engineering_project_spark.operators.intervals import asof_join

    l = spark.createDataFrame([("a", 1, 2.0)], "k string, sec long, v_asof double")
    r = spark.createDataFrame([("a", 1, 3.0)], "k string, sec long, v double")
    with _pytest.raises(ValueError, match="collide"):
        asof_join(l, r, "k", "sec", "sec", value_cols=["v"])
