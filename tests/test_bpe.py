"""bpe_learn_merges: hand-computed merges, greedy-scan edge, ranking."""
import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.bpe import (
    bpe_encode,
    bpe_encode_ids,
    bpe_learn_merges,
    bpe_word_counts,
)


def _docs(spark, texts):
    return spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "doc_id int, text string")


def test_hand_computed_merges(spark):
    # classic BPE toy: "low" x5, "lower" x2, "newest" x6, "widest" x3
    corpus = ["low "] * 5 + ["lower "] * 2 + ["newest "] * 6 + ["widest "] * 3
    docs = _docs(spark, [" ".join(corpus)])
    out = {r.merge_rank: (r.lhs, r.rhs, r.pair_count) for r in
           bpe_learn_merges(docs, n_merges=3).collect()}
    # pair counts round 1: es=9, st=9, lo=7, we=8(newest6+lower2)... argmax
    # ties es/st at 9 -> lexicographic: ('e','s') wins
    assert out[1] == ("e", "s", 9)
    # round 2: 'es' 't' now adjacent 9 times -> ('es','t')
    assert out[2] == ("es", "t", 9)
    # round 3: after 'est' forms, "newest" is (n,e,w,est) so (w,e)
    # survives only in "lower" (2); (l,o) = low 5 + lower 2 = 7 wins
    assert out[3] == ("l", "o", 7)


def test_word_counts_are_padded_symbol_strings(spark):
    docs = _docs(spark, ["low low high"])
    rows = {r.sym: r.wfreq for r in bpe_word_counts(docs).collect()}
    assert rows == {" l o w ": 2, " h i g h ": 1}


def test_greedy_single_scan_within_round(spark):
    # "aaaa": round-1 pairs (a,a) x3 -> merge -> ' aa a a ' (single
    # scan, the remaining pair merges NEXT round: (aa,a) vs (a,a)...)
    docs = _docs(spark, ["aaaa"])
    out = {r.merge_rank: (r.lhs, r.rhs, r.pair_count) for r in
           bpe_learn_merges(docs, n_merges=2).collect()}
    assert out[1] == ("a", "a", 3)
    # after round 1: symbols (aa, a, a): pairs (aa,a)=1, (a,a)=1 ->
    # lexicographic tiebreak: ('a','a') < ('aa','a')
    assert out[2] == ("a", "a", 1)


def test_single_char_words_produce_no_pairs(spark):
    docs = _docs(spark, ["a b a b ab"])
    out = bpe_learn_merges(docs, n_merges=1).collect()
    # only "ab" has a pair
    assert [(r.lhs, r.rhs, r.pair_count) for r in out] == [("a", "b", 1)]


def test_partitioning_invariant(spark):
    texts = ["the cat sat on the mat", "the bat ate the rat", "a cat and a rat"] * 7
    docs = _docs(spark, texts)
    a = sorted(map(tuple, bpe_learn_merges(docs, n_merges=3).collect()))
    b = sorted(map(tuple, bpe_learn_merges(docs.repartition(13), n_merges=3).collect()))
    assert a == b


def test_exhausted_pairs_stop_early_without_emptying_vocab(spark):
    # "ab" fully merges in round 1; rounds 2-3 have NO adjacent pairs.
    # The loop must stop (fewer rows), not crossJoin vocab to empty.
    docs = _docs(spark, ["ab ab"])
    out = bpe_learn_merges(docs, n_merges=3).collect()
    assert [(r.merge_rank, r.lhs, r.rhs, r.pair_count) for r in out] == [
        (1, "a", "b", 2)
    ]


def test_all_single_symbol_corpus_returns_empty_with_schema(spark):
    docs = _docs(spark, ["a b c a"])
    out = bpe_learn_merges(docs, n_merges=2)
    assert out.collect() == []
    assert [f.name for f in out.schema.fields] == [
        "merge_rank", "lhs", "rhs", "pair_count",
    ]


# -- bpe_encode / bpe_encode_ids ------------------------------------------


def test_encode_hand_computed(spark):
    corpus = ["low "] * 5 + ["lower "] * 2 + ["newest "] * 6 + ["widest "] * 3
    docs = _docs(spark, [" ".join(corpus)])
    rules = bpe_learn_merges(docs, n_merges=3)  # es, est, lo (see above)
    enc = bpe_encode(_docs(spark, ["newest low"]), rules)
    toks = [
        r.token
        for r in enc.orderBy("widx", "tpos").collect()
    ]
    assert toks == ["n", "e", "w", "est", "lo", "w"]
    # token_id = lexicographic rank within THIS corpus slice's vocab
    vocab = sorted(set(toks))
    ids = {r.token: r.token_id for r in enc.collect()}
    assert ids == {t: vocab.index(t) + 1 for t in vocab}


def test_encode_roundtrip_decodes_to_words(spark):
    docs = _docs(spark, ["the fast key order", "order keys fast fast", "low lower lowest"])
    rules = bpe_learn_merges(docs, n_merges=4)
    enc = bpe_encode(docs, rules)
    rejoined = enc.groupBy("doc_id", "widx").agg(
        F.concat_ws(
            "",
            F.transform(
                F.sort_array(F.collect_list(F.struct("tpos", "token"))),
                lambda s: s["token"],
            ),
        ).alias("rw")
    )
    words = (
        docs.select(
            "doc_id", F.posexplode(F.split(F.lower(F.trim("text")), r"\s+")).alias("_wi", "w")
        )
        .filter(F.col("w") != "")
        .select("doc_id", (F.col("_wi") + 1).alias("widx"), "w")
    )
    assert rejoined.join(words, ["doc_id", "widx"]).filter(
        F.col("rw") != F.col("w")
    ).count() == 0


def test_encode_conserves_characters(spark):
    # sum of token lengths per word == word length (merges rearrange,
    # never create or destroy characters)
    docs = _docs(spark, ["aaaa aab abab", "baba aaaa bb"])
    rules = bpe_learn_merges(docs, n_merges=3)
    enc = bpe_encode(docs, rules)
    per_word = enc.groupBy("doc_id", "widx").agg(
        F.sum(F.length("token")).alias("chars")
    )
    words = (
        docs.select(
            "doc_id", F.posexplode(F.split(F.lower(F.trim("text")), r"\s+")).alias("_wi", "w")
        )
        .filter(F.col("w") != "")
        .select("doc_id", (F.col("_wi") + 1).alias("widx"), F.length("w").alias("wlen"))
    )
    assert per_word.join(words, ["doc_id", "widx"]).filter(
        F.col("chars") != F.col("wlen")
    ).count() == 0


def test_encode_zero_rules_is_character_tokenizer(spark):
    docs = _docs(spark, ["ab ba"])
    empty = spark.createDataFrame(
        [], "merge_rank int, lhs string, rhs string, pair_count bigint"
    )
    toks = [
        (r.widx, r.tpos, r.token, r.token_id)
        for r in bpe_encode(docs, empty).orderBy("widx", "tpos").collect()
    ]
    assert toks == [(1, 1, "a", 1), (1, 2, "b", 2), (2, 1, "b", 2), (2, 2, "a", 1)]


@pytest.mark.slow
def test_encode_chunked_projection_matches_single_chain(spark, monkeypatch):
    # force the stacked-select path (chunk=2) and compare against the
    # default chain — identical output proves the split is semantics-free
    import end_to_end_azure_databricks_data_engineering_project_spark.operators.bpe as bpe_mod

    docs = _docs(spark, ["low lower newest widest", "newest newest low"])
    rules = bpe_learn_merges(docs, n_merges=5)
    base = sorted(
        tuple(r) for r in bpe_encode(docs, rules).collect()
    )
    monkeypatch.setattr(bpe_mod, "_APPLY_CHUNK", 2)
    chunked = sorted(tuple(r) for r in bpe_encode(docs, rules).collect())
    assert chunked == base


def test_encode_ids_assembles_document_order(spark):
    docs = _docs(spark, ["ab aa", "ba"])
    empty = spark.createDataFrame(
        [], "merge_rank int, lhs string, rhs string, pair_count bigint"
    )
    ids = {r.doc_id: r.token_ids for r in bpe_encode_ids(docs, empty).collect()}
    # vocab over slice: a=1, b=2
    assert ids[0] == [1, 2, 1, 1]
    assert ids[1] == [2, 1]


def test_encode_lazy_vocab_ranking_matches_distributed(spark):
    """distributed_vocab_ranking=False (the lazy small-vocab opt-out,
    r10 advisor note on bpe_encode's eagerness) must assign the exact
    same token ids — both rank the lexicographically ordered vocab."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.bpe import bpe_encode

    docs = _docs(spark, ["low lower lowest low", "new newer newest"])
    rules = bpe_learn_merges(docs, n_merges=3)
    a = sorted(map(tuple, bpe_encode(docs, rules).collect()))
    b = sorted(map(tuple, bpe_encode(
        docs, rules, distributed_vocab_ranking=False
    ).collect()))
    assert a == b and a


@pytest.mark.slow
def test_encode_pandas_path_matches_native(spark, monkeypatch):
    """The large-rule-set Arrow path (mapInPandas replay past
    _NATIVE_APPLY_MAX — the native chain StackOverflows near 1k rules
    under codegen fusion) must be byte-identical to the native replace
    chain: pandas' non-regex str.replace and Spark's F.replace both
    scan the SOURCE left-to-right (greedy single scan)."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators import bpe as bpe_mod
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.bpe import bpe_encode

    docs = _docs(spark, ["low lower lowest low low", "aaaa abab newer"])
    real = bpe_learn_merges(docs, n_merges=6)
    # pad with never-matching synthetic rules to cross the threshold
    pad = spark.createDataFrame(
        [(100 + i, f"q{i}", f"z{i}", 1) for i in range(30)],
        "merge_rank int, lhs string, rhs string, pair_count bigint",
    )
    rules = real.unionByName(pad)
    monkeypatch.setattr(bpe_mod, "_NATIVE_APPLY_MAX", 10_000)
    native = sorted(map(tuple, bpe_encode(docs, rules).collect()))
    monkeypatch.setattr(bpe_mod, "_NATIVE_APPLY_MAX", 8)
    arrow = sorted(map(tuple, bpe_encode(docs, rules).collect()))
    assert native == arrow and native
    # overlapping-occurrence semantics preserved across paths: 'aaaa'
    # tokens must match whatever the learn's greedy scan produced
    assert any(t[3] not in ("a",) for t in native)  # merges really applied
