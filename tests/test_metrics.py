"""binned_auc: exact Mann-Whitney AUC over integer score bins."""
import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import binned_auc


def _auc_reference(pairs):
    """O(n^2) literal definition: P(score_pos > score_neg) + 0.5 * ties."""
    pos = [s for s, p in pairs if p]
    neg = [s for s, p in pairs if not p]
    num = 0.0
    for sp in pos:
        for sn in neg:
            if sp > sn:
                num += 1.0
            elif sp == sn:
                num += 0.5
    return num / (len(pos) * len(neg))


def _run(spark, pairs):
    df = spark.createDataFrame(pairs, "score bigint, positive boolean")
    row = binned_auc(df, "score", "positive").collect()[0]
    return row


def test_perfect_separation(spark):
    pairs = [(10, True), (11, True), (1, False), (2, False)]
    row = _run(spark, pairs)
    assert (row.n_pos, row.n_neg, row.auc) == (2, 2, 1.0)


def test_inverted_separation(spark):
    pairs = [(1, True), (2, True), (10, False), (11, False)]
    assert _run(spark, pairs).auc == 0.0


def test_ties_get_half_credit(spark):
    # every score identical: AUC must be exactly 0.5
    pairs = [(5, True)] * 3 + [(5, False)] * 7
    row = _run(spark, pairs)
    assert row.auc == 0.5
    assert row.u2 == 2 * row.n_pos * row.n_neg // 2  # 2U = n_pos*n_neg


def test_matches_quadratic_definition(spark):
    # mixed ties and order, incl. negative bins
    pairs = [
        (-3, False), (-3, True), (0, False), (0, False), (0, True),
        (2, True), (2, False), (5, True), (7, False), (7, True), (9, True),
    ]
    row = _run(spark, pairs)
    assert row.auc == pytest.approx(_auc_reference(pairs), abs=0)
    assert row.n_pos == 6 and row.n_neg == 5


def test_null_scores_and_labels_excluded(spark):
    # NULL bin or NULL label rows are excluded (cross-engine NULL
    # ordering differs; a missing prediction can't be ranked)
    rows = [(10, True), (1, False), (None, False), (None, True), (5, None)]
    df = spark.createDataFrame(rows, "score bigint, positive boolean")
    row = binned_auc(df, "score", "positive").collect()[0]
    assert (row.n_pos, row.n_neg, row.auc) == (1, 1, 1.0)


def test_one_class_input_yields_null_auc(spark):
    # AUC undefined with a single class: NULL, not a throw (ANSI Spark
    # double division by zero raises) and not inf/nan (DuckDB would)
    df = spark.createDataFrame([(1, True), (2, True)], "score bigint, positive boolean")
    row = binned_auc(df, "score", "positive").collect()[0]
    assert (row.n_pos, row.n_neg, row.auc) == (2, 0, None)


def test_u2_survives_int64_scale(spark):
    # decimal(38,0) accumulation: force a u2 beyond what int64-squared
    # products would produce by weighting bins via many rows is too slow
    # here; instead verify the dtype contract that makes 100 TB safe
    df = spark.createDataFrame([(1, True), (0, False)], "score bigint, positive boolean")
    out = binned_auc(df, "score", "positive")
    assert dict(out.dtypes)["u2"] == "decimal(38,0)"


def test_partitioning_invariant(spark):
    pairs = [(i % 13 - 6, (i * 7) % 3 == 0) for i in range(200)]
    df = spark.createDataFrame(pairs, "score bigint, positive boolean")
    a = binned_auc(df, "score", "positive").collect()[0]
    b = binned_auc(df.repartition(17), "score", "positive").collect()[0]
    assert a == b


def test_column_expressions_accepted(spark):
    df = spark.createDataFrame(
        [(0.123, 7), (0.001, 2), (0.9, 8), (0.4, 1)], "s double, label int"
    )
    row = binned_auc(
        df, F.floor(F.col("s") * 1000), F.col("label") >= 5
    ).collect()[0]
    # pos scores {123, 900}, neg {1, 400}: 3 of 4 pairs ordered → 0.75
    assert row.n_pos == 2 and row.n_neg == 2 and row.auc == 0.75


# -- pr_curve_from_bins / average_precision_from_bins ----------------------


def _bins(spark, rows):
    return spark.createDataFrame(rows, "bin long, pos long, neg long")


def _ap_reference(bins_rows):
    """Step-wise AP over bins in descending-bin order (the sklearn
    definition on quantized scores), plain Python floats."""
    rows = sorted(bins_rows, reverse=True)
    n_pos = sum(p for _, p, _ in rows)
    tp = fp = 0
    num = 0.0
    for _, p, n in rows:
        tp += p
        fp += n
        num += p * tp / (tp + fp)
    return num / n_pos if n_pos else None


def test_pr_curve_hand_computed(spark):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import pr_curve_from_bins

    # bins (desc): 9 -> (2 pos, 0 neg), 5 -> (1, 1), 1 -> (0, 2)
    out = {
        r.bin: (r.tp, r.fp, r.precision, r.recall)
        for r in pr_curve_from_bins(
            _bins(spark, [(9, 2, 0), (5, 1, 1), (1, 0, 2)])
        ).collect()
    }
    assert out[9] == (2, 0, 1.0, 2 / 3)
    assert out[5] == (3, 1, 0.75, 1.0)
    assert out[1] == (3, 3, 0.5, 1.0)


def test_average_precision_matches_reference(spark):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import (
        average_precision_from_bins,
    )

    rows = [(9, 2, 0), (5, 1, 1), (3, 4, 7), (1, 0, 2), (-2, 1, 5)]
    got = average_precision_from_bins(_bins(spark, rows)).collect()[0]
    assert got.n_pos == 8 and got.n_neg == 15
    assert got.ap == pytest.approx(_ap_reference(rows), abs=0)


def test_average_precision_merge_invariant(spark):
    # AP finished from merged per-batch bins == AP from one-shot bins:
    # the monoid property that makes the metric stream-maintainable
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import (
        average_precision_from_bins,
        merge_bin_counts,
    )

    a = _bins(spark, [(9, 1, 0), (5, 1, 0), (3, 2, 3)])
    b = _bins(spark, [(9, 1, 0), (5, 0, 1), (3, 2, 4), (1, 0, 2)])
    whole = _bins(spark, [(9, 2, 0), (5, 1, 1), (3, 4, 7), (1, 0, 2)])
    m = average_precision_from_bins(merge_bin_counts(a, b)).collect()[0]
    w = average_precision_from_bins(whole).collect()[0]
    assert (m.n_pos, m.n_neg, m.ap) == (w.n_pos, w.n_neg, w.ap)


def test_pr_ap_one_class_guard(spark):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import (
        average_precision_from_bins,
        pr_curve_from_bins,
    )

    all_neg = _bins(spark, [(5, 0, 3), (2, 0, 1)])
    assert average_precision_from_bins(all_neg).collect()[0].ap is None
    curve = pr_curve_from_bins(all_neg).collect()
    assert all(r.recall is None for r in curve)
    assert all(r.precision == 0.0 for r in curve)


def test_pr_curve_partitioning_invariant(spark):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import (
        average_precision_from_bins,
    )

    rows = [(b, (b * 7) % 3, (b * 5) % 4) for b in range(40)]
    one = average_precision_from_bins(_bins(spark, rows).coalesce(1)).collect()[0]
    many = average_precision_from_bins(_bins(spark, rows).repartition(8)).collect()[0]
    assert (one.n_pos, one.n_neg, one.ap) == (many.n_pos, many.n_neg, many.ap)


def test_threshold_metrics_hand_computed(spark):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import (
        threshold_metrics_from_bins,
    )

    # bins desc: 9 -> (2 pos, 0 neg), 5 -> (1, 1), 1 -> (0, 2); n_pos=3 n_neg=3
    out = {
        r.bin: r
        for r in threshold_metrics_from_bins(
            _bins(spark, [(9, 2, 0), (5, 1, 1), (1, 0, 2)])
        ).collect()
    }
    r9 = out[9]
    assert (r9.tp, r9.fp, r9.fn, r9.tn) == (2, 0, 1, 3)
    assert r9.accuracy == 5 / 6 and r9.precision_ == 1.0 and r9.recall_ == 2 / 3
    assert r9.f1 == 4 / 5  # 2*2/(2*2+0+1)
    r1 = out[1]
    assert (r1.tp, r1.fp, r1.fn, r1.tn) == (3, 3, 0, 0)
    assert r1.accuracy == 0.5 and r1.f1 == 2 * 3 / (2 * 3 + 3 + 0)


def test_threshold_metrics_one_class_guards(spark):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import (
        threshold_metrics_from_bins,
    )

    rows = threshold_metrics_from_bins(_bins(spark, [(5, 0, 3), (2, 0, 1)])).collect()
    for r in rows:
        assert r.recall_ is None and r.f1 is None  # no actual positives
        assert r.precision_ == 0.0  # predicted positives exist, all wrong


def test_grouped_auc_matches_per_slice_global(spark):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import (
        binned_auc,
        grouped_auc_from_bins,
        grouped_per_bin_counts,
    )

    rows = [
        ("a", (i * 7) % 13, (i * 3) % 2 == 0) for i in range(60)
    ] + [
        ("b", (i * 5) % 9, (i * 7) % 3 == 0) for i in range(40)
    ] + [
        ("c", i % 4, True) for i in range(10)  # one-class segment
    ]
    df = spark.createDataFrame(rows, "seg string, score long, positive boolean")
    got = {
        r.seg: (r.n_pos, r.n_neg, r.auc)
        for r in grouped_auc_from_bins(
            grouped_per_bin_counts(df, ["seg"], "score", "positive"), ["seg"]
        ).collect()
    }
    for seg in ("a", "b", "c"):
        want = binned_auc(
            df.filter(F.col("seg") == seg), "score", "positive"
        ).collect()[0]
        assert got[seg] == (want.n_pos, want.n_neg, want.auc), seg
    assert got["c"][2] is None  # one-class guard per segment


def test_grouped_auc_segment_isolation(spark):
    # a segment's rows must never leak into another's cumulative sums:
    # permuting OTHER segments' data leaves each segment's AUC unchanged
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import (
        grouped_auc_from_bins,
        grouped_per_bin_counts,
    )

    base = [("x", i % 11, i % 2 == 0) for i in range(50)]
    noise1 = [("y", 5, True)] * 30
    noise2 = [("y", i % 3, i % 5 == 0) for i in range(80)]
    schema = "seg string, score long, positive boolean"

    def auc_x(rows):
        df = spark.createDataFrame(rows, schema)
        out = grouped_auc_from_bins(
            grouped_per_bin_counts(df, ["seg"], "score", "positive"), ["seg"]
        )
        return out.filter("seg = 'x'").collect()[0].auc

    assert auc_x(base + noise1) == auc_x(base + noise2)


# ------------------------------------------------- brier_from_bins

def test_brier_hand_computed(spark):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import binned_brier

    # p-hat in {0.0, 0.5, 1.0} via scale=2: brier = mean((p-y)^2)
    rows = [
        (0, True),   # (0/2 - 1)^2 = 1
        (1, True),   # (1/2 - 1)^2 = 0.25
        (1, False),  # (1/2 - 0)^2 = 0.25
        (2, True),   # (2/2 - 1)^2 = 0
        (2, False),  # (2/2 - 0)^2 = 1
    ]
    df = spark.createDataFrame(rows, "sbin long, pos boolean")
    r = binned_brier(df, "sbin", "pos", scale=2).collect()[0]
    assert (r.n, int(r.brier_num)) == (5, 10)  # scale^2 * sum = 4*2.5
    assert r.brier == 10 / (4 * 5)


def test_brier_rides_the_same_drain_state_as_auc(spark, tmp_path):
    """One streaming accumulator funds BOTH metrics: drain batches into
    auc_bins, finish with auc_from_bins AND brier_from_bins, and both
    must equal their one-shot batch computation."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import (
        auc_from_bins,
        binned_auc,
        binned_brier,
        brier_from_bins,
    )
    from end_to_end_azure_databricks_data_engineering_project_spark.sources.tables import Catalog
    from end_to_end_azure_databricks_data_engineering_project_spark.streaming.flows import run_auc_drain

    rows = [(i % 997, i % 3 == 0) for i in range(4000)]
    full = spark.createDataFrame(rows, "sbin long, pos boolean")
    cat = Catalog(spark, tmp_path / "wh")
    for e in range(4):
        batch = spark.createDataFrame(rows[e::4], "sbin long, pos boolean")
        run_auc_drain(cat, batch, epoch=e, score_bin_col="sbin",
                      positive_col="pos", binning="identity")
    state = cat.table("auc_bins").read()
    assert auc_from_bins(state).collect() == binned_auc(full, "sbin", "pos").collect()
    got = brier_from_bins(state).collect()[0]
    want = binned_brier(full, "sbin", "pos").collect()[0]
    assert (got.n, got.brier_num, got.brier) == (want.n, want.brier_num, want.brier)


def test_brier_empty_and_null_exclusion(spark):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import binned_brier

    empty = spark.createDataFrame([], "sbin long, pos boolean")
    r = binned_brier(empty, "sbin", "pos").collect()[0]
    assert (r.n, r.brier) == (0, None)
    withnulls = spark.createDataFrame(
        [(None, True), (500, None), (1000, True)], "sbin long, pos boolean"
    )
    r = binned_brier(withnulls, "sbin", "pos").collect()[0]
    assert (r.n, r.brier) == (1, 0.0)  # only the (1000, True) row counts
