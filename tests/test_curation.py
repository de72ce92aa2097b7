"""Corpus-curation operators: sequence packing, per-group quotas,
global token budgets (distributed prefix sum), bigram LM scoring.
Every operator must be deterministic under repartitioning — selection/
ordering keys off portable md5 hashes, never physical layout."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.curation import (
    bigram_lm_score,
    quota_per_group,
    sequence_packing,
    token_budget_head,
)
from end_to_end_azure_databricks_data_engineering_project_spark.operators.text import token_count

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_sequence_packing_conserves_docs_and_tokens(spark, docs):
    packs = sequence_packing(docs, budget=64, n_shards=4).collect()
    total_tok = docs.select(F.sum(token_count(F.col("text")))).first()[0]
    assert sum(p.n_docs for p in packs) == docs.count()
    assert sum(p.pack_tokens for p in packs) == total_tok
    assert all(p.pack_id >= 0 for p in packs)
    # pack ids may have gaps (a doc longer than the budget spans whole
    # budget windows no later doc starts in), but every shard starts at
    # pack 0
    shards = {p.shard for p in packs}
    assert {p.shard for p in packs if p.pack_id == 0} == shards
    # with an effectively unlimited budget everything packs into pack 0
    huge = sequence_packing(docs, budget=10**9, n_shards=4).collect()
    assert {(p.shard, p.pack_id) for p in huge} == {(s, 0) for s in shards}


def test_sequence_packing_partitioning_independent(spark, docs):
    base = {(r.shard, r.pack_id, r.n_docs, r.pack_tokens)
            for r in sequence_packing(docs, budget=64, n_shards=4).collect()}
    for n in (1, 7):
        again = {(r.shard, r.pack_id, r.n_docs, r.pack_tokens)
                 for r in sequence_packing(docs.repartition(n), budget=64, n_shards=4).collect()}
        assert again == base, n


def test_quota_per_group_caps_every_group(spark, docs):
    quota = 2
    rows = quota_per_group(docs, "lang", quota=quota).collect()
    sizes = {r.lang: r["count"] for r in docs.groupBy("lang").count().collect()}
    picked: dict[str, int] = {}
    for r in rows:
        picked[r.lang] = picked.get(r.lang, 0) + 1
        assert 1 <= r.pick_rank <= quota
    for lang, n in sizes.items():
        assert picked.get(lang, 0) == min(quota, n)
    # deterministic under repartitioning
    again = {(r.doc_id, r.lang) for r in
             quota_per_group(docs.repartition(5), "lang", quota=quota).collect()}
    assert again == {(r.doc_id, r.lang) for r in rows}


def test_token_budget_head_matches_global_window(spark, docs):
    """The two-phase (shard-local cumsum + broadcast offsets) prefix sum
    must equal the single global window it replaces."""
    budget = 600
    got = {(r.doc_id, r.cum_tokens)
           for r in token_budget_head(docs, budget=budget, n_shards=4).collect()}
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("budget|"), F.col("doc_id").cast("string"))), 1, 15),
        16, 10,
    ).cast("bigint")
    from pyspark.sql import Window

    ref = (
        docs.select(
            "doc_id", (h % 4).cast("int").alias("shard"), h.alias("h"),
            token_count(F.col("text")).cast("bigint").alias("tok"),
        )
        .withColumn(
            "cum",
            F.sum("tok").over(
                Window.orderBy("shard", "h", "doc_id")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .filter(F.col("cum") <= budget)
    )
    expect = {(r.doc_id, r.cum) for r in ref.collect()}
    assert got == expect
    assert got  # budget actually selects something
    assert max(c for _, c in got) <= budget


def test_bigram_lm_score_hand_computed(spark):
    """Tiny corpus scored by hand: c('a b')=3, c('b a')=1, c1(a)=3,
    c1(b)=1, V=2 → p(a b)=4/5, p(b a)=2/3."""
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b")], "doc_id long, text string"
    )
    got = {r.doc_id: (r.n_bigrams, r.lm_score)
           for r in bigram_lm_score(docs).collect()}
    p_ab = 4.0 / 5.0
    p_ba = 2.0 / 3.0
    assert got[1] == (3, (((0.0 + p_ab) + p_ba) + p_ab) / 3)
    assert got[2] == (1, (0.0 + p_ab) / 1)


def test_duplicated_span_dedup_strips_planted_span(spark):
    """A 5-token span planted in two documents is stripped from both;
    unique text and sub-window docs survive untouched."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
        duplicated_span_dedup,
    )

    span = "alpha beta gamma delta epsilon"
    docs = spark.createDataFrame(
        [
            (1, f"unique one two {span} tail1 tail2 tail3 tail4"),
            (2, f"{span} other words here entirely"),
            (3, "completely fresh text with no repeats at all"),
            (4, "tiny doc"),  # shorter than the window
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in duplicated_span_dedup(docs, window=5).collect()}
    assert got[1].n_dup_tokens == 5
    assert got[2].n_dup_tokens == 5
    assert "alpha" not in got[1].clean_text and "epsilon" not in got[2].clean_text
    assert got[1].clean_text == "unique one two tail1 tail2 tail3 tail4"
    assert got[2].clean_text == "other words here entirely"
    assert got[3].n_dup_tokens == 0 and got[3].clean_text.startswith("completely")
    assert got[4].n_dup_tokens == 0 and got[4].clean_text == "tiny doc"


def test_duplicated_span_dedup_overlapping_spans_merge(spark):
    """Two overlapping duplicated windows cover their union, not 2x."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
        duplicated_span_dedup,
    )

    # 6-token run duplicated -> two overlapping 5-windows in each doc
    run = "a b c d e f"
    docs = spark.createDataFrame(
        [(1, f"x {run} y"), (2, f"p q {run} r")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in duplicated_span_dedup(docs, window=5).collect()}
    assert got[1].n_dup_tokens == 6 and got[1].clean_text == "x y"
    assert got[2].n_dup_tokens == 6 and got[2].clean_text == "p q r"


def test_rule_filter_report_counts_and_kept(spark):
    """Rule counters are independent (a doc can fail several) and kept
    counts docs failing none."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.text import (
        rule_filter_report,
    )

    df = spark.createDataFrame(
        [(1, 5, "x"), (2, 50, "x"), (3, 5, "y"), (4, 50, "y")],
        "id long, n long, tag string",
    )
    got = {r.rule: r.n_docs for r in rule_filter_report(
        df, {"small": F.col("n") < 10, "tag_y": F.col("tag") == "y"}
    ).collect()}
    assert got == {"small": 2, "tag_y": 2, "kept": 1}


def test_bigram_lm_score_drops_short_docs(spark):
    docs = spark.createDataFrame(
        [(1, "solo"), (2, "  "), (3, "two tokens")], "doc_id long, text string"
    )
    got = {r.doc_id for r in bigram_lm_score(docs).collect()}
    assert got == {3}


def test_rule_filter_report_rejects_bad_names(spark):
    import pytest as _pytest
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.text import (
        rule_filter_report,
    )

    df = spark.createDataFrame([(1,)], "id long")
    with _pytest.raises(ValueError):
        rule_filter_report(df, {})
    with _pytest.raises(ValueError):
        rule_filter_report(df, {"kept": F.col("id") > 0})
    with _pytest.raises(ValueError):
        rule_filter_report(df, {"has-url": F.col("id") > 0})


def test_dsir_select_prefers_target_like_docs(spark):
    """Docs made of target-only vocabulary must outscore docs made of
    off-target vocabulary; mixed docs land between."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.curation import (
        dsir_select,
    )

    rows = []
    for i in range(10):
        rows.append((i, "alpha beta gamma alpha beta", "en"))  # target
    for i in range(10, 20):
        rows.append((i, "zeta eta theta zeta eta", "de"))  # off-target
    rows.append((20, "alpha beta gamma alpha beta", "de"))  # target-like text
    rows.append((21, "zeta eta theta zeta eta", "de"))
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = dsir_select(docs, target_expr="lang = 'en'", top_n=22)
    scores = {r.doc_id: r.dsir_score for r in out.collect()}
    # doc 20 uses exclusively target vocabulary -> scores like the en docs
    assert scores[20] == scores[0]
    assert scores[20] > scores[21]
    ranks = {r.doc_id: r.sel_rank for r in out.collect()}
    assert ranks[21] > ranks[20]


def test_dsir_select_partitioning_independent(spark):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.curation import (
        dsir_select,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    base = sorted(map(tuple, dsir_select(docs, top_n=20).collect()))
    again = sorted(map(tuple, dsir_select(docs.repartition(13), top_n=20).collect()))
    assert base == again


def test_group_quantile_threshold_exact_p25(spark):
    """Hand-checkable: group A values 1..8 -> p25 = value at rank
    ceil(0.25*8)=2 -> threshold 2, keeps 2..8; group B values 10,20
    -> rank ceil(0.5)=1 -> threshold 10, keeps both."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.curation import (
        group_quantile_threshold,
    )

    rows = [("A", i, float(i)) for i in range(1, 9)]
    rows += [("B", 100, 10.0), ("B", 101, 20.0)]
    df = spark.createDataFrame(rows, "g string, id long, v double")
    out = group_quantile_threshold(df, "g", "v", "id", q=0.25)
    got = {(r.g, r.id): r.threshold for r in out.collect()}
    assert {k for k in got if k[0] == "A"} == {("A", i) for i in range(2, 9)}
    assert all(t == 2.0 for (g, _), t in got.items() if g == "A")
    assert {k for k in got if k[0] == "B"} == {("B", 100), ("B", 101)}
    assert all(t == 10.0 for (g, _), t in got.items() if g == "B")


def test_group_quantile_threshold_tie_break_deterministic(spark):
    """All-equal values: threshold equals the common value and every
    row survives, regardless of partitioning."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.curation import (
        group_quantile_threshold,
    )

    df = spark.createDataFrame(
        [("g", i, 7.0) for i in range(10)], "g string, id long, v double"
    )
    for d in (df, df.repartition(5)):
        out = group_quantile_threshold(d, "g", "v", "id", q=0.25)
        assert out.count() == 10
        assert {r.threshold for r in out.collect()} == {7.0}


def test_temperature_mixture_upweights_small_domains(spark):
    """At T=2 a 4x-larger domain gets only 2x the quota (sqrt), so the
    small domain's sampling RATE is higher; totals track the target."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.curation import (
        temperature_mixture_sample,
    )

    rows = [(i, "big") for i in range(400)] + [(1000 + i, "small") for i in range(100)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_mixture_sample(docs, "source", target_total=90)
    got = {r.source: 0 for r in out.collect()}
    for r in out.collect():
        got[r.source] += 1
    # weights: sqrt(400)=20, sqrt(100)=10 -> big 2/3, small 1/3
    assert got["big"] == 60 and got["small"] == 30
    assert got["small"] / 100 > got["big"] / 400  # higher RATE for small
    # determinism under repartition
    again = temperature_mixture_sample(docs.repartition(7), "source", target_total=90)
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, again.collect()))


def test_pack_segments_slices_and_conservation(spark):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.curation import pack_segments

    # shard "x": 3+4+5 = 12 tokens, budget 5 -> packs [0..5),[5..10),[10..12)
    rows = [
        ("x", 1, "a b c"),            # start 0, [0,3) in pack 0
        ("x", 2, "d e f g"),          # start 3, [3,5) p0 + [5,7) p1
        ("x", 3, "h i j k l"),        # start 7, [7,10) p1 + [10,12) p2
        ("y", 9, "z z z z z z"),      # own shard: 6 tokens -> p0 + p1
        ("y", 10, "",),               # blank: excluded entirely
        ("y", 11, None),              # null: excluded entirely
    ]
    docs = spark.createDataFrame(rows, "lang string, doc_id long, text string")
    out = pack_segments(docs, budget=5, shard_col="lang").collect()
    got = sorted((r.shard, r.seq_id, r.doc_id, r.off_from, r.off_to) for r in out)
    assert got == [
        ("x", 0, 1, 0, 3),
        ("x", 0, 2, 0, 2),
        ("x", 1, 2, 2, 4),
        ("x", 1, 3, 0, 3),
        ("x", 2, 3, 3, 5),
        ("y", 0, 9, 0, 5),
        ("y", 1, 9, 5, 6),
    ]
    # conservation: every doc's segments tile its tokens exactly, and
    # every pack except a shard's last holds exactly `budget` tokens
    per_doc = {}
    per_pack = {}
    for s_, q, d, a, b in got:
        per_doc[d] = per_doc.get(d, 0) + (b - a)
        per_pack[(s_, q)] = per_pack.get((s_, q), 0) + (b - a)
    assert per_doc == {1: 3, 2: 4, 3: 5, 9: 6}
    assert per_pack == {("x", 0): 5, ("x", 1): 5, ("x", 2): 2,
                        ("y", 0): 5, ("y", 1): 1}


def test_pack_segments_whitespace_only_docs_excluded(spark):
    """Review-caught: split-based counting sees 2 phantom boundary
    tokens on a whitespace-only doc ("\\n" -> ["", ""]), shifting every
    later doc's prefix sum — \\S+ extraction counts 0 and excludes it."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.curation import pack_segments

    rows = [
        ("x", 1, "a b"),
        ("x", 2, "\n"),       # whitespace-only: must not shift doc 3
        ("x", 3, " \t "),     # ditto
        ("x", 4, "c d e"),
    ]
    docs = spark.createDataFrame(rows, "lang string, doc_id long, text string")
    out = sorted(
        (r.doc_id, r.seq_id, r.off_from, r.off_to)
        for r in pack_segments(docs, budget=5, shard_col="lang").collect()
    )
    assert out == [(1, 0, 0, 2), (4, 0, 0, 3)]  # 2+3 = exactly pack 0
    import pytest as _pytest

    with _pytest.raises(ValueError, match="budget"):
        pack_segments(docs, budget=0)
