"""Product quantization: deterministic per-subspace codebooks,
shuffle-free encoding, ADC top-k recall vs exact brute force."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.pq import (
    pq_adc_topk,
    pq_encode,
    pq_fit,
)
from end_to_end_azure_databricks_data_engineering_project_spark.operators.similarity import (
    brute_force_topk,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def codebooks(spark, emb):
    return pq_fit(emb, m=4, k_sub=8, n_iter=2, dim=64)


def test_fit_deterministic_and_geometry(spark, emb, codebooks):
    assert codebooks == pq_fit(emb, m=4, k_sub=8, n_iter=2, dim=64)
    assert len(codebooks) == 4
    assert all(len(cb) == 8 for cb in codebooks)
    assert all(len(c) == 16 for cb in codebooks for c in cb)
    with pytest.raises(ValueError, match="not divisible"):
        pq_fit(emb, m=5, k_sub=8, n_iter=1, dim=64)


def test_encode_partitioning_independent(spark, emb, codebooks):
    base = {
        r.vec_id: list(r.codes)
        for r in pq_encode(emb, codebooks).select("vec_id", "codes").collect()
    }
    assert len(base) == emb.count()
    assert all(0 <= c < 8 for codes in base.values() for c in codes)
    again = {
        r.vec_id: list(r.codes)
        for r in pq_encode(emb.repartition(7), codebooks)
        .select("vec_id", "codes")
        .collect()
    }
    assert base == again


def test_encode_plan_is_shuffle_free(spark, emb, codebooks):
    """Encoding must stay at scan stage: broadcast codebook join + pure
    expressions, no Exchange anywhere in the physical plan."""
    enc = pq_encode(emb, codebooks).select("vec_id", "codes")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    plan = enc._jdf.queryExecution().explainString(mode)
    # BroadcastExchange (the one-row codebook) is fine; any SHUFFLE
    # exchange (hash/range/round-robin/single-partition) is not.
    import re

    assert not re.search(
        r"Exchange (hash|range|RoundRobin|Single)", plan
    ), plan
    assert "BroadcastNestedLoopJoin" in plan  # one-row codebook attach


def test_adc_topk_recall_vs_exact(spark, emb, codebooks):
    """ADC approximates squared-L2 distance, so recall is measured
    against the EXACT L2 top-5 (brute_force_topk ranks by cosine — a
    different metric when norms vary). m=4 subspaces of 8 codes is a
    coarse 12-bit sketch; it must still clearly beat chance."""
    queries = emb.filter("vec_id < 20").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    sq_l2 = F.aggregate(
        F.zip_with(
            F.col("qv"),
            F.col("embedding"),
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("d2").asc(), F.col("vec_id").asc()
    )
    exact = (
        emb.crossJoin(F.broadcast(queries))
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("d2", sq_l2)
        .withColumn("rank", F.row_number().over(w))
        .filter("rank <= 5")
    )
    cb = pq_fit(emb, m=8, k_sub=16, n_iter=3, dim=64)
    approx = pq_adc_topk(
        pq_encode(emb, cb),
        emb.filter("vec_id < 20"),
        cb,
        k=5,
    )
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in approx.collect()}
    n_corpus = emb.count()
    recall = len(e & a) / len(e)
    chance = 5 / (n_corpus - 1)
    # 32-bit codes on 500 near-random 64-dim vectors: measured ~0.22
    # (~22x chance). Floor set at 0.12 / 10x chance to stay robust to
    # testdata regeneration while still catching a broken ADC.
    assert recall > max(0.12, 10 * chance), (recall, chance)


def test_adc_self_match_excluded_and_ranked(spark, emb, codebooks):
    queries = emb.filter("vec_id < 3")
    out = pq_adc_topk(pq_encode(emb, codebooks), queries, codebooks, k=4)
    rows = out.collect()
    assert all(r.query_id != r.neighbor_id for r in rows)
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        dists = [r.adc_dist for r in rs]
        assert dists == sorted(dists)


def test_empty_cluster_keeps_previous_centroid(spark):
    """Two identical far-apart points with k_sub=4: clusters beyond the
    distinct points stay at their seed positions instead of NaN-ing."""
    rows = [(i, [float(i % 2) * 100.0] * 8) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<float>")
    cb = pq_fit(df, m=2, k_sub=4, n_iter=2, dim=8)
    flat = [x for sub in cb for c in sub for x in c]
    assert all(x == x for x in flat)  # no NaN
    enc = pq_encode(df, cb, dim=8)
    codes = {r.vec_id: list(r.codes) for r in enc.collect()}
    # the two value-groups map to two distinct code words per subspace
    assert codes[0] != codes[1]
    assert codes[0] == codes[2] and codes[1] == codes[3]


def test_ivfpq_end_to_end_recall_and_candidate_pruning(spark, emb):
    """IVF-PQ: candidates must come only from probed coarse lists; with
    all lists probed, the residual-PQ ranking must clearly beat chance
    against exact L2."""
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.ivf import (
        ivf_assign,
        kmeans_fit,
    )
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.pq import (
        ivfpq_encode,
        ivfpq_topk,
    )

    cents = kmeans_fit(emb, k=4, n_iter=2)
    encoded, cbs = ivfpq_encode(emb, cents, m=8, k_sub=16, n_iter=2, dim=64)
    queries = emb.filter("vec_id < 20")

    # candidate pruning: with n_probe=1 every neighbor shares the
    # query's nearest coarse cluster
    out1 = ivfpq_topk(encoded, queries, cents, cbs, k=5, n_probe=1)
    clusters = {
        r.vec_id: r.cluster
        for r in ivf_assign(emb, cents).select("vec_id", "cluster").collect()
    }
    probe1 = {}
    for r in out1.collect():
        probe1.setdefault(r.query_id, set()).add(clusters[r.neighbor_id])
    assert all(len(s) == 1 for s in probe1.values())

    # recall with every list probed (pure PQ-on-residual ranking)
    out = ivfpq_topk(encoded, queries, cents, cbs, k=5, n_probe=4)
    sq_l2 = F.aggregate(
        F.zip_with(
            F.col("qv"),
            F.col("embedding"),
            lambda a, b: (a.cast("double") - b.cast("double"))
            * (a.cast("double") - b.cast("double")),
        ),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )
    from pyspark.sql import Window

    qside = queries.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("d2").asc(), F.col("vec_id").asc())
    exact = (
        emb.crossJoin(F.broadcast(qside))
        .filter(F.col("query_id") != F.col("vec_id"))
        .withColumn("d2", sq_l2)
        .withColumn("rank", F.row_number().over(w))
        .filter("rank <= 5")
    )
    e = {(r.query_id, r.vec_id) for r in exact.collect()}
    a = {(r.query_id, r.neighbor_id) for r in out.collect()}
    recall = len(e & a) / len(e)
    assert recall > 0.12, recall


def test_ivfpq_deterministic(spark, emb):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.ivf import (
        kmeans_fit,
    )
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.pq import (
        ivfpq_encode,
        ivfpq_topk,
    )

    cents = kmeans_fit(emb, k=4, n_iter=2)
    enc1, cb1 = ivfpq_encode(emb, cents, m=2, k_sub=4, n_iter=2, dim=64)
    enc2, cb2 = ivfpq_encode(emb.repartition(9), cents, m=2, k_sub=4, n_iter=2, dim=64)
    assert cb1 == cb2
    q = emb.filter("vec_id < 5")
    r1 = sorted(map(tuple, ivfpq_topk(enc1, q, cents, cb1).collect()))
    r2 = sorted(map(tuple, ivfpq_topk(enc2, q, cents, cb2).collect()))
    assert r1 == r2


def test_pack_unpack_roundtrip_and_validation(spark, emb, codebooks):
    from end_to_end_azure_databricks_data_engineering_project_spark.operators.pq import (
        pq_pack_codes,
        pq_unpack_codes,
    )

    enc = pq_encode(emb, codebooks).select("vec_id", "codes")
    packed = enc.select(
        "vec_id", "codes", pq_pack_codes(F.col("codes"), 4, 8).alias("p")
    )
    back = packed.select(
        "vec_id", "codes", pq_unpack_codes(F.col("p"), 4, 8).alias("u"), "p"
    )
    rows = back.collect()
    assert all(list(r.codes) == list(r.u) for r in rows)
    # packing is injective over observed code words
    by_packed = {}
    for r in rows:
        by_packed.setdefault(r.p, set()).add(tuple(r.codes))
    assert all(len(v) == 1 for v in by_packed.values())
    import pytest as _pytest

    with _pytest.raises(ValueError, match="power of two"):
        pq_pack_codes(F.col("codes"), 4, 6)
    with _pytest.raises(ValueError, match="62"):
        pq_pack_codes(F.col("codes"), 8, 256)


def test_pack_unpack_property(spark):
    """Property: pack∘unpack is the identity for every valid (m, k_sub,
    codes) combination — checked via pure-python replication of the
    column expressions over one Spark round trip."""
    from hypothesis import HealthCheck, given, settings, strategies as st

    from end_to_end_azure_databricks_data_engineering_project_spark.operators.pq import (
        pq_pack_codes,
        pq_unpack_codes,
    )

    @settings(max_examples=20, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.data())
    def run(data):
        k_sub = data.draw(st.sampled_from([2, 4, 8, 16, 64, 256]))
        bits = k_sub.bit_length() - 1
        m = data.draw(st.integers(min_value=1, max_value=min(8, 62 // bits)))
        codes = data.draw(
            st.lists(st.integers(0, k_sub - 1), min_size=m, max_size=m)
        )
        df = spark.createDataFrame([(codes,)], "codes: array<int>")
        out = df.select(
            pq_unpack_codes(pq_pack_codes(F.col("codes"), m, k_sub), m, k_sub).alias("u")
        ).collect()[0]
        assert list(out.u) == codes

    run()


def test_group_quantile_threshold_matches_model(spark):
    """Property: survivors == {rows with value >= sorted(values)[ceil(q*n)-1]}
    per group, for random value multisets (ties included)."""
    from hypothesis import HealthCheck, given, settings, strategies as st
    import math

    from end_to_end_azure_databricks_data_engineering_project_spark.operators.curation import (
        group_quantile_threshold,
    )

    @settings(max_examples=10, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(st.data())
    def run(data):
        q = data.draw(st.sampled_from([0.25, 0.5, 0.125]))
        groups = {}
        rows = []
        next_id = 0
        for g in ("a", "b"):
            vals = data.draw(
                st.lists(st.integers(-5, 5), min_size=1, max_size=12)
            )
            groups[g] = []
            for v in vals:
                rows.append((g, next_id, float(v)))
                groups[g].append((next_id, float(v)))
                next_id += 1
        df = spark.createDataFrame(rows, "g string, id long, v double")
        out = group_quantile_threshold(df, "g", "v", "id", q=q)
        got = {(r.g, r.id) for r in out.collect()}
        expect = set()
        for g, members in groups.items():
            ordered = sorted(members, key=lambda t: (t[1], t[0]))
            thr = ordered[math.ceil(q * len(ordered)) - 1][1]
            expect |= {(g, i) for i, v in members if v >= thr}
        assert got == expect

    run()


def test_fit_fraction_deterministic_and_validated(spark, emb):
    """fit_fraction draws by portable md5, so the sampled codebooks are
    identical under any partitioning (df.sample would not be)."""
    cb1 = pq_fit(emb, m=4, k_sub=8, n_iter=1, dim=64, fit_fraction=0.5)
    cb2 = pq_fit(emb.repartition(13), m=4, k_sub=8, n_iter=1, dim=64, fit_fraction=0.5)
    assert cb1 == cb2
    assert cb1 != pq_fit(emb, m=4, k_sub=8, n_iter=1, dim=64)  # subset differs
    with pytest.raises(ValueError, match="fit_fraction"):
        pq_fit(emb, m=4, k_sub=8, n_iter=1, dim=64, fit_fraction=0.0)
    with pytest.raises(ValueError, match="fit_fraction"):
        pq_fit(emb, m=4, k_sub=8, n_iter=1, dim=64, fit_fraction=1.5)


def test_fit_raises_on_fewer_rows_than_k_sub(spark, emb):
    """r6 advisor: a silent short codebook would freeze into the ANN
    index and reject every later drain with a cross-model error."""
    with pytest.raises(ValueError, match="k_sub=8"):
        pq_fit(emb.limit(3), m=4, k_sub=8, n_iter=1, dim=64)
