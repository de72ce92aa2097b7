"""LLM-data operators: text metrics, dedup family, similarity search,
multimodal plumbing — on the driver's documents/embeddings tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
    exact_dedup,
    minhash_near_dup_pairs,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_dup_pairs,
)
from end_to_end_azure_databricks_data_engineering_project_spark.operators.multimodal import (
    FEATURE_DIM,
    extract_features,
    resize_images,
    sample_frames,
    synthetic_media,
)
from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import (
    brute_force_topk,
    near_dup_by_cosine,
    srp_ann_topk,
)
from end_to_end_azure_databricks_data_engineering_project_spark.operators.text import (
    detect_language,
    quality_score,
    token_count,
    with_text_metrics,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_text_metrics(spark):
    df = spark.createDataFrame(
        [(1, "the quick brown fox and the lazy dog"), (2, ""), (3, "!!! ??? ...")],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in with_text_metrics(df).collect()}
    assert rows[1].n_tokens == 8
    assert rows[1].lang_pred == "en"
    assert rows[2].n_tokens == 0 and rows[2].quality < 1.0
    assert rows[3].punct_ratio > 0.5


def test_detect_language_on_fixture_sentences(spark):
    """The synthetic corpus's `lang` labels don't reflect its (English
    word-soup) content, so lang-id is exercised on real sentences."""
    df = spark.createDataFrame(
        [
            ("en", "the cat and the dog is a friend of the house"),
            ("es", "el perro y la casa de los amigos que viven"),
            ("fr", "le chien et la maison des amis une belle vie"),
            ("de", "der hund und die katze das ist ein haus nicht"),
            ("zh", "我 有 的 是 在 一个 房子"),
        ],
        "lang string, text string",
    )
    assert df.filter(detect_language(F.col("text")) == F.col("lang")).count() == 5


def test_exact_dedup_removes_clones(spark):
    df = spark.createDataFrame(
        [(1, "same  text"), (2, "same text"), (3, "other")], "doc_id int, text string"
    )
    out = exact_dedup(df)
    assert {r.doc_id for r in out.collect()} == {1, 3}  # min-id survivor


def test_minhash_finds_planted_near_dups(spark, docs):
    base = docs.limit(50)
    clones = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail")).alias("text"),
    )
    corpus = base.select("doc_id", "text").unionByName(clones)
    pairs = minhash_near_dup_pairs(corpus).filter("est_jaccard >= 0.5")
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(i, i + 100000) for i in [r.doc_id for r in base.collect()]}
    assert len(found & planted) >= 40  # high recall on near-identical docs


def test_ngram_jaccard_exact_values(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d e f g")], "doc_id int, text string"
    )
    out = ngram_jaccard_pairs(df, shingle_n=3).collect()
    assert len(out) == 1
    r = out[0]
    # shingles(1) = {abc,bcd,cde,def} ⊂ shingles(2) += {efg}: J = 4/5
    assert abs(r.jaccard - 0.8) < 1e-9


def test_simhash_hamming_near_dups(spark, docs):
    base = docs.limit(30).select("doc_id", "text")
    clones = base.select(
        (F.col("doc_id") + 100000).alias("doc_id"), F.col("text")
    )  # identical text → hamming 0
    pairs = simhash_near_dup_pairs(base.unionByName(clones), max_hamming=0)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(r.doc_id, r.doc_id + 100000) for r in base.collect()}
    assert planted <= found


def test_simhash_is_deterministic(spark):
    df = spark.createDataFrame([(1, "hello world foo bar")], "doc_id int, text string")
    a = df.select(simhash64(F.col("text")).alias("h")).first().h
    b = df.select(simhash64(F.col("text")).alias("h")).first().h
    assert a == b and a > 0


def test_brute_force_topk_self_retrieval(spark, emb):
    """Nearest neighbor of a vector's exact clone must be that vector."""
    q = emb.limit(5).select((F.col("vec_id") + 10000).alias("vec_id"), "embedding")
    out = brute_force_topk(emb, q, k=1)
    rows = {r.query_id: r for r in out.collect()}
    assert len(rows) == 5
    for qid, r in rows.items():
        assert r.neighbor_id == qid - 10000
        assert abs(r.cos_sim - 1.0) < 1e-9


def test_srp_ann_recall_vs_exact(spark, emb):
    q = emb.limit(20)
    exact = brute_force_topk(emb, q, k=5)
    approx = srp_ann_topk(emb, q, k=5, dim=64)
    e = {(r.query_id, r.neighbor_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall > 0.5  # approximate, but far above chance (5/500)


def test_near_dup_by_cosine_finds_clones(spark, emb):
    base = emb.limit(20)
    clones = base.select((F.col("vec_id") + 10000).alias("vec_id"), "embedding", "label")
    pairs = near_dup_by_cosine(base.unionByName(clones), threshold=0.999)
    found = {(r.id_a, r.id_b) for r in pairs.collect()}
    planted = {(r.vec_id, r.vec_id + 10000) for r in base.collect()}
    assert len(found & planted) >= 15  # ANN recall, near-perfect on clones


def test_near_dup_by_cosine_uncapped_cluster(spark, emb):
    """A 60-clone cluster has C(60,2)=1770 qualifying pairs — far past
    the old k=50 top-k cap. The bucket pair-join must keep them ALL
    (identical vectors share every bucket → zero LSH misses)."""
    one = emb.limit(1).select("embedding")
    cluster = (
        spark.range(60)
        .withColumnRenamed("id", "vec_id")
        .crossJoin(F.broadcast(one))
    )
    others = emb.filter("vec_id >= 100").limit(40).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "embedding"
    )
    pairs = near_dup_by_cosine(cluster.unionByName(others), threshold=0.999)
    in_cluster = pairs.filter("id_a < 60 AND id_b < 60")
    assert in_cluster.count() == 60 * 59 // 2


def test_multimodal_feature_extraction(spark):
    media = synthetic_media(spark, 30)
    feats = extract_features(media)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r.feature) == FEATURE_DIM for r in rows)
    assert all(r.n_bytes > 0 for r in rows)
    # deterministic: same payload → same features
    again = {r.media_id: r.feature for r in extract_features(media).collect()}
    assert all(again[r.media_id] == r.feature for r in rows)


def test_multimodal_resize_and_frames(spark):
    media = synthetic_media(spark, 12)
    resized = resize_images(media, 32, 32)
    imgs = resized.filter("media_type = 'image'").collect()
    assert all(r.width == 32 and r.height == 32 for r in imgs)
    frames = sample_frames(media, every_ms=1000)
    vids = frames.filter("media_type = 'video'")
    # one frame per second of duration
    per = vids.groupBy("media_id").count().collect()
    durs = {r.media_id: r.duration_ms for r in media.filter("media_type='video'").collect()}
    assert all(r["count"] == durs[r.media_id] // 1000 for r in per)


def test_quality_score_separates_junk(spark, docs):
    junk = spark.createDataFrame([(9001, "!!! ,,, ;;; :::")], "doc_id long, text string")
    scored = with_text_metrics(docs.select("doc_id", "text").unionByName(junk))
    good_avg = scored.filter("doc_id < 9000").agg(F.avg("quality")).first()[0]
    junk_q = scored.filter("doc_id = 9001").first().quality
    assert junk_q < good_avg


def test_token_count_matches_manual(spark, docs):
    sample = docs.limit(20).select("doc_id", "text", token_count(F.col("text")).alias("n"))
    for r in sample.collect():
        assert r.n == len(r.text.split())


def test_hard_negatives_excludes_same_label_and_ranks(spark):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import (
        hard_negatives,
    )

    # anchor 0 (label 0) at e1; same-label 1 is CLOSEST but must be
    # excluded; different-label 2 (near e1) must outrank far vector 3.
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0], 0),
        (1, [0.99, 0.14, 0.0, 0.0], 0),   # same label: excluded
        (2, [0.9, 0.43, 0.0, 0.0], 1),    # different label, close
        (3, [0.0, 0.0, 1.0, 0.0], 1),     # different label, orthogonal
        (4, [0.0, 0.0, 0.0, 1.0], 2),     # different label, orthogonal
    ]
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    out = hard_negatives(df, df.filter("vec_id = 0"), k=3)
    got = [(r.neighbor_id, r.rank) for r in sorted(out.collect(), key=lambda r: r.rank)]
    assert [n for n, _ in got] == [2, 3, 4]
    assert all(r.neighbor_label != r.anchor_label for r in out.collect())


def test_srp_wrong_dim_fails_loudly(spark):
    """The silent-global-bucket trap: wrong dim= must raise, not turn
    the bucketed ANN join into a full cross join."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import (
        srp_ann_topk,
    )

    emb = spark.createDataFrame(
        [(i, [float(i)] * 384) for i in range(6)],
        "vec_id long, embedding array<float>",
    )
    with pytest.raises(Exception, match="SRP hyperplanes are 64-dim"):
        srp_ann_topk(emb, emb.filter("vec_id < 2"), k=2, dim=64).collect()


def test_brute_force_separate_query_id_space_keeps_id_equal_neighbor(spark):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import (
        brute_force_topk,
    )

    corpus = spark.createDataFrame(
        [(42, [1.0, 0.0]), (43, [0.0, 1.0])], "vec_id long, embedding array<float>"
    )
    queries = spark.createDataFrame(
        [(42, [1.0, 0.0])], "qid long, embedding array<float>"
    )
    out = brute_force_topk(corpus, queries, k=1, query_id_col="qid")
    rows = out.collect()
    # query 42's true top-1 IS corpus row 42 (identical vector) — the
    # id collision must not exclude it in a separate id space
    assert rows[0].neighbor_id == 42 and rows[0].rank == 1


def test_minhash_skips_blank_and_null_text(spark):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
        minhash_components,
        minhash_near_dup_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "real document with several tokens here"),
         (2, ""), (3, "   "), (4, None),
         (5, "real document with several tokens here")],
        "doc_id long, text string",
    )
    sigs = minhash_components(docs, num_hashes=4)
    assert {r.doc_id for r in sigs.collect()} == {1, 5}  # blanks: no row
    pairs = minhash_near_dup_pairs(docs)
    got = {(r.id_a, r.id_b) for r in pairs.collect()}
    assert got == {(1, 5)}  # blank/NULL docs never pair with anything


def test_shingles_short_doc_survives_ansi(spark):
    """Docs shorter than the shingle width must yield their truncated
    gram, not throw INVALID_ARRAY_INDEX under ANSI mode."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
        shingles_from_tokens,
        tokens,
    )

    df = spark.createDataFrame([(1, "two tokens")], "id long, text string")
    out = df.select(
        shingles_from_tokens(tokens(F.col("text")), 3).alias("sh")
    ).collect()
    assert out[0].sh == ["two tokens"]


def test_connected_components_string_ids(spark):
    """String doc ids must flow through CC (lexicographic min), not be
    NULLed by a blind bigint cast that silently drops every edge."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
        connected_components,
    )

    pairs = spark.createDataFrame(
        [("doc_b", "doc_a"), ("doc_b", "doc_c"), ("doc_x", "doc_y")],
        "id_a string, id_b string",
    )
    comp = {r.node: r.component for r in connected_components(pairs, "id_a", "id_b").collect()}
    assert comp == {
        "doc_a": "doc_a", "doc_b": "doc_a", "doc_c": "doc_a",
        "doc_x": "doc_x", "doc_y": "doc_x",
    }


def test_simhash_blocking_completeness_guard(spark):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import (
        simhash_near_dup_pairs,
    )

    docs = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError, match="blocks >= max_hamming"):
        simhash_near_dup_pairs(docs, max_hamming=4, prefix_bits=16)


def test_srp_broadcast_banding_matches_literal_buckets(spark, emb):
    """The r13 broadcast-relation banding (_with_tables/_bucket_from)
    must produce byte-identical (id, table_idx, bucket) rows to the
    literal-plane ``srp_bucket`` form it replaced — the frozen SRP
    bucket stream is part of the oracle contract."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import (
        _seeded_hyperplanes,
        _srp_banded,
        srp_bucket,
    )

    sub = emb.limit(50)
    tables = [_seeded_hyperplanes(64, 4, seed=f"srp{t}") for t in range(3)]
    got = sorted(
        (r.vid, r.table_idx, r.bucket)
        for r in _srp_banded(sub, tables, "vec_id", "embedding", "vid").collect()
    )
    want = sorted(
        (r.vec_id, t, r.bucket)
        for t in range(3)
        for r in sub.select(
            "vec_id", srp_bucket(F.col("embedding"), tables[t]).alias("bucket")
        ).collect()
    )
    assert got == want


def test_arrow_cosine_matches_hof(spark, emb):
    """arrow_cosine_scores must be BIT-identical to the HOF fold cosine
    (same float64 accumulation order) — the similarity oracles replay
    the fold, so any drift here is a correctness break, not a perf bug."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import (
        arrow_cosine_scores,
        dot,
        norm,
    )

    rows = emb.limit(60).select(
        "vec_id", "embedding", norm(F.col("embedding")).alias("nrm")
    )
    a, b = rows.alias("a"), rows.alias("b")
    pairs = a.join(b, F.col("a.vec_id") < F.col("b.vec_id")).select(
        F.col("a.vec_id").alias("id_a"),
        F.col("b.vec_id").alias("id_b"),
        F.col("a.embedding").alias("va"),
        F.col("a.nrm").alias("na"),
        F.col("b.embedding").alias("vb"),
        F.col("b.nrm").alias("nb"),
    )
    hof = {
        (r.id_a, r.id_b): r.cos_sim
        for r in pairs.withColumn(
            "cos_sim",
            dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")),
        ).select("id_a", "id_b", "cos_sim").collect()
    }
    arrow = {
        (r.id_a, r.id_b): r.cos_sim
        for r in arrow_cosine_scores(pairs).collect()
    }
    assert arrow == hof  # exact equality — bit-identical doubles
