"""BM25 ranking: hand-computed scores (log mode), ratio-mode ordering,
input validation, partitioning independence."""

from __future__ import annotations

import math

import pytest

from end_to_end_azure_databricks_data_engineering_project_spark.operators.ranking import bm25_topk


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "cat dog cat"),
            (2, "dog dog dog dog"),
            (3, "cat bird"),
            (4, "fish fish fish"),
            (5, "   "),
        ],
        "doc_id long, text string",
    )


def _bm25_ref(tf, df, n_docs, dl, avgdl, k1=1.2, b=0.75, log_idf=True):
    idf = (n_docs - df + 0.5) / (df + 0.5) + 1.0
    if log_idf:
        idf = math.log(idf)
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * (dl / avgdl)))


def test_bm25_log_mode_hand_computed(spark, docs):
    """Non-blank corpus: 4 docs, 12 tokens, avgdl 3. Query {cat}:
    df=2; doc1 tf=2 dl=3, doc3 tf=1 dl=2."""
    out = {r.doc_id: r for r in bm25_topk(docs, ["cat"], idf="log").collect()}
    assert set(out) == {1, 3}
    avgdl = 12 / 4
    exp1 = _bm25_ref(2, 2, 4, 3, avgdl)
    exp3 = _bm25_ref(1, 2, 4, 2, avgdl)
    assert out[1].bm25 == pytest.approx(exp1, rel=1e-12)
    assert out[3].bm25 == pytest.approx(exp3, rel=1e-12)
    assert out[1].sel_rank == 1 and out[3].sel_rank == 2


def test_bm25_multi_term_sums_and_ranks(spark, docs):
    out = {r.doc_id: r for r in bm25_topk(docs, ["cat", "dog"], idf="log").collect()}
    assert set(out) == {1, 2, 3}
    assert out[1].n_hit_terms == 2
    avgdl = 12 / 4
    exp1 = _bm25_ref(2, 2, 4, 3, avgdl) + _bm25_ref(1, 2, 4, 3, avgdl)
    assert out[1].bm25 == pytest.approx(exp1, rel=1e-12)
    # doc1 hits both terms; rarer-term doc4 absent (no query term)
    assert out[1].sel_rank == 1
    assert 4 not in out and 5 not in out


def test_bm25_ratio_mode_monotone_single_term(spark, docs):
    """For a single term, ratio-idf is a positive constant times the
    same tf-norm — the ranking must match log mode exactly."""
    log_r = [r.doc_id for r in bm25_topk(docs, ["cat"], idf="log").collect()]
    ratio_r = [r.doc_id for r in bm25_topk(docs, ["cat"], idf="ratio").collect()]
    assert log_r == ratio_r


def test_bm25_rejects_bad_inputs(spark, docs):
    with pytest.raises(ValueError, match="idf"):
        bm25_topk(docs, ["cat"], idf="sqrt")
    with pytest.raises(ValueError, match="non-empty"):
        bm25_topk(docs, [])


def test_bm25_partitioning_independent(spark):
    real = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    terms = ["vector", "merge", "spark", "window"]
    base = sorted(map(tuple, bm25_topk(real, terms).collect()))
    again = sorted(map(tuple, bm25_topk(real.repartition(11), terms).collect()))
    assert base == again


def test_bm25_query_terms_case_folded(spark, docs):
    """r6 advisor: mixed-case query terms must match the lowercased
    token stream, not silently score zero."""
    lo = {r.doc_id: r.bm25 for r in bm25_topk(docs, ["cat"]).collect()}
    hi = {r.doc_id: r.bm25 for r in bm25_topk(docs, ["CaT"]).collect()}
    assert lo and lo == hi
