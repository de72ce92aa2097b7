"""Round-9 operators: sorted-neighborhood blocking, retrieval eval,
Cohen's kappa, integrity report, divergent tokens."""
import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
    sorted_neighborhood_candidates,
)
from end_to_end_azure_databricks_data_engineering_project_spark.operators.expectations import (
    fk_orphans,
    integrity_report,
    null_violations,
    pk_duplicates,
)
from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import (
    cohens_kappa,
    retrieval_eval,
)
from end_to_end_azure_databricks_data_engineering_project_spark.operators.text import (
    divergent_tokens,
)


# ------------------------------------------------------------------ SNM

def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, blk string, key string")


def test_snm_pairs_hand_example(spark):
    # sorted order within block A: (k1,1) (k2,2) (k3,3); window=3 pairs
    # each with next 2: (1,2) (1,3) (2,3)
    df = _docs(spark, [(1, "A", "k1"), (2, "A", "k2"), (3, "A", "k3")])
    out = sorted_neighborhood_candidates(
        df, "doc_id", F.col("key"), block_col="blk", window=3
    )
    got = sorted((r.id_a, r.id_b) for r in out.collect())
    assert got == [(1, 2), (1, 3), (2, 3)]


def test_snm_pairs_never_cross_blocks(spark):
    df = _docs(spark, [(1, "A", "k"), (2, "B", "k"), (3, "A", "k2")])
    out = sorted_neighborhood_candidates(
        df, "doc_id", F.col("key"), block_col="blk", window=2
    )
    got = sorted((r.blk, r.id_a, r.id_b) for r in out.collect())
    assert got == [("A", 1, 3)]  # doc 2 is alone in block B -> no pair


def test_snm_tie_breaks_by_id(spark):
    # equal keys: sorted order is id order -> (1,2) (2,3) for window=2
    df = _docs(spark, [(3, "A", "k"), (1, "A", "k"), (2, "A", "k")])
    out = sorted_neighborhood_candidates(
        df, "doc_id", F.col("key"), block_col="blk", window=2
    )
    assert sorted((r.id_a, r.id_b) for r in out.collect()) == [(1, 2), (2, 3)]


def test_snm_linear_candidate_bound_and_partition_invariance(spark):
    rows = [(i, "A" if i % 2 else "B", f"key{i % 7:02d}") for i in range(60)]
    df = _docs(spark, rows)
    out = sorted_neighborhood_candidates(
        df, "doc_id", F.col("key"), block_col="blk", window=4
    )
    got = sorted(map(tuple, out.collect()))
    assert len(got) <= (4 - 1) * 60  # linear bound, never n^2
    re = sorted_neighborhood_candidates(
        df.repartition(13), "doc_id", F.col("key"), block_col="blk", window=4
    )
    assert sorted(map(tuple, re.collect())) == got


def test_snm_rejects_degenerate_window(spark):
    df = _docs(spark, [(1, "A", "k")])
    with pytest.raises(ValueError, match="window"):
        sorted_neighborhood_candidates(df, "doc_id", F.col("key"), window=1)


# ------------------------------------------------- retrieval_eval

def _ranked(spark, rows):
    return spark.createDataFrame(rows, "query_id long, neighbor_id long, rank long")


def _rel(spark, rows):
    return spark.createDataFrame(rows, "query_id long, item_id long")


def test_retrieval_eval_hand_computed(spark):
    # q1: relevant item first (rank 1 of 2 hits), q2: relevant at rank 3,
    # q3: nothing relevant retrieved
    ranked = _ranked(spark, [
        (1, 10, 1), (1, 11, 2), (1, 12, 3),
        (2, 20, 1), (2, 21, 2), (2, 22, 3),
        (3, 30, 1), (3, 31, 2), (3, 32, 3),
    ])
    rel = _rel(spark, [(1, 10), (1, 12), (2, 22), (3, 99)])
    r = retrieval_eval(ranked, rel, k=3).collect()[0]
    scale = 6  # lcm(1..3)
    assert (r.n_queries, r.hits_at_k, r.mrr_scale) == (3, 3, scale)
    # rr: q1 -> 1 (6/1), q2 -> 1/3 (6/3=2), q3 -> 0  => mrr_num = 8
    assert r.mrr_num == 8
    assert r.mrr == 8 / (3 * scale)
    assert r.precision_at_k == 3 / 9


def test_retrieval_eval_ignores_ranks_beyond_k(spark):
    ranked = _ranked(spark, [(1, 10, 1), (1, 11, 5)])
    rel = _rel(spark, [(1, 11)])
    r = retrieval_eval(ranked, rel, k=3).collect()[0]
    assert (r.hits_at_k, r.mrr_num) == (0, 0)


def test_retrieval_eval_duplicate_relevance_rows_collapse(spark):
    ranked = _ranked(spark, [(1, 10, 1)])
    rel = _rel(spark, [(1, 10), (1, 10)])
    r = retrieval_eval(ranked, rel, k=2).collect()[0]
    assert (r.hits_at_k, r.mrr_num, r.mrr_scale) == (1, 2, 2)


def test_retrieval_eval_query_universe_fixes_denominator(spark):
    """A query the retriever returned NOTHING for (or only rows past k)
    drops out of the default denominator, inflating precision@k/MRR —
    query_universe re-enters it with contribution 0, and ranked queries
    outside the universe are excluded."""
    ranked = _ranked(spark, [(1, 10, 1), (9, 90, 1)])  # q2 absent, q9 foreign
    rel = _rel(spark, [(1, 10), (2, 20), (9, 90)])
    uni = _rel(spark, [(1, 0), (2, 0)]).select("query_id")
    base = retrieval_eval(ranked, rel, k=2).collect()[0]
    assert base.n_queries == 2  # q2 silently missing, q9 counted
    r = retrieval_eval(ranked, rel, k=2, query_universe=uni).collect()[0]
    assert (r.n_queries, r.hits_at_k, r.mrr_num, r.mrr_scale) == (2, 1, 2, 2)
    assert r.precision_at_k == 1 / 4
    assert r.mrr == 2 / (2 * 2)


# --------------------------------------------------- cohens_kappa

def test_kappa_textbook_example(spark):
    # classic 2x2: raters agree yes=20, no=15; disagree 10 (a=yes) + 5
    rows = (
        [("y", "y")] * 20 + [("n", "n")] * 15 + [("y", "n")] * 10 + [("n", "y")] * 5
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = cohens_kappa(df, "a", "b").collect()[0]
    n, agree = 50, 35
    pe_num = 30 * 25 + 20 * 25  # na_y*nb_y + na_n*nb_n
    assert (r.n, r.agree) == (n, agree)
    assert int(r.pe_num) == pe_num
    assert float(r.kappa) == (n * agree - pe_num) / (n * n - pe_num)


def test_kappa_perfect_agreement_is_one(spark):
    df = spark.createDataFrame([("x", "x")] * 4 + [("y", "y")] * 6, "a string, b string")
    assert float(cohens_kappa(df, "a", "b").collect()[0].kappa) == 1.0


def test_kappa_null_labels_excluded_and_degenerate_null(spark):
    df = spark.createDataFrame(
        [("x", "x"), ("x", None), (None, "x")], "a string, b string"
    )
    r = cohens_kappa(df, "a", "b").collect()[0]
    assert r.n == 1
    # single constant cell: kappa_den = 1*1 - 1*1 = 0 -> NULL kappa
    assert r.kappa is None


def test_kappa_partition_invariance(spark):
    rows = [(str(i % 3), str((i * 7) % 3)) for i in range(90)]
    df = spark.createDataFrame(rows, "a string, b string")
    one = cohens_kappa(df, "a", "b").collect()[0]
    many = cohens_kappa(df.repartition(17), "a", "b").collect()[0]
    assert tuple(one) == tuple(many)


# ----------------------------------------------- integrity report

def test_integrity_report_counts_violations(spark):
    child = spark.createDataFrame(
        [(1, 100), (2, 100), (3, 999), (4, None)], "id long, fk long"
    )
    parent = spark.createDataFrame([(100,), (200,)], "pk long")
    dup = spark.createDataFrame([(1,), (1,), (2,), (None,)], "k long")
    rep = integrity_report([
        ("dup_pk", pk_duplicates(dup, "k")),
        ("orphans", fk_orphans(child, "fk", parent, "pk")),
        ("nulls", null_violations(child, "fk")),
    ])
    got = {r.check_name: r.violations for r in rep.collect()}
    # one duplicated key group (k=1); NULL key not counted as dup;
    # one orphan (fk=999, NULL fk skipped); one NULL fk
    assert got == {"dup_pk": 1, "orphans": 1, "nulls": 1}


def test_integrity_report_requires_checks(spark):
    with pytest.raises(ValueError, match="no checks"):
        integrity_report([])


# --------------------------------------------- divergent_tokens

def test_divergent_tokens_flags_slice_exclusive_token(spark):
    df = spark.createDataFrame(
        [(1, "en", "alpha beta beta"), (2, "de", "alpha gamma gamma gamma")],
        "doc_id long, lang string, text string",
    )
    out = divergent_tokens(df, in_a=F.col("lang") == "en", top_k=3).collect()
    by_tok = {r.token: r for r in out}
    # 'alpha' appears once on each side of a 3v4 split -> least divergent
    assert out[0].token in {"beta", "gamma"}
    assert by_tok["beta"].c_a == 2 and by_tok["beta"].c_b == 0
    assert by_tok["gamma"].c_a == 0 and by_tok["gamma"].c_b == 3
    assert [r.rank for r in out] == [1, 2, 3]


def test_divergent_tokens_null_slice_rows_excluded(spark):
    df = spark.createDataFrame(
        [(1, "en", "tok tok"), (2, None, "tok noise")],
        "doc_id long, lang string, text string",
    )
    out = divergent_tokens(
        df, in_a=F.when(F.col("lang").isNotNull(), F.col("lang") == "en"), top_k=10
    ).collect()
    toks = {r.token for r in out}
    assert "noise" not in toks and toks == {"tok"}


def test_retrieval_eval_k_bound_guard(spark):
    # lcm(1..41) > 2^53: the exact-integer rank scaling breaks silently
    # past k=40, so the operator must refuse loudly
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.metrics import retrieval_eval

    ranked = spark.createDataFrame(
        [(1, 10, 1)], "query_id long, neighbor_id long, rank long"
    )
    rel = spark.createDataFrame([(1, 10)], "query_id long, item_id long")
    with pytest.raises(ValueError, match=r"k must be in \[1, 40\]"):
        retrieval_eval(ranked, rel, k=41)
    with pytest.raises(ValueError, match=r"k must be in \[1, 40\]"):
        retrieval_eval(ranked, rel, k=0)
    # k=40 (the boundary) still works and stays exact
    got = retrieval_eval(ranked, rel, k=40).collect()[0]
    assert got.hits_at_k == 1 and got.mrr == 1.0
