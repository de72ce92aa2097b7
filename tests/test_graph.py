"""PageRank over pair relations: hand-computed fixed point, symmetry,
and partitioning independence of the ordered contribution fold."""

from __future__ import annotations

from end_to_end_azure_databricks_data_engineering_project_spark.operators.graph import pagerank, symmetrize


def _replica(edges_sym, damping, n_iter):
    """Pure-python replica with the operator's exact IEEE op order:
    per-target contributions folded in ascending source order."""
    nodes = sorted({u for u, _ in edges_sym})
    deg = {u: sum(1 for a, _ in edges_sym if a == u) for u in nodes}
    n = len(nodes)
    r = {u: 1.0 / n for u in nodes}
    tp = 1.0 - damping
    for _ in range(n_iter):
        new = {}
        for v in nodes:
            srcs = sorted(u for u, d in edges_sym if d == v)
            s = 0.0
            for u in srcs:
                s = s + r[u] / deg[u]
            new[v] = tp / n + damping * s
        r = new
    return r


def test_pagerank_matches_hand_replica(spark):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3)], "id_a long, id_b long"
    )
    edges = symmetrize(pairs)
    got = {r.node: r.rank for r in pagerank(edges, damping=0.85, n_iter=4).collect()}
    sym = [(1, 2), (2, 1), (2, 3), (3, 2)]
    expect = _replica(sym, 0.85, 4)
    assert got == expect  # exact doubles, not approx
    assert got[1] == got[3]  # path-graph symmetry
    assert got[2] > got[1]  # the hub outranks the leaves


def test_pagerank_partitioning_independent(spark):
    import random

    random.seed(7)
    raw = {(random.randrange(40), random.randrange(40)) for _ in range(120)}
    rows = [(a, b) for a, b in raw if a < b]
    pairs = spark.createDataFrame(rows, "id_a long, id_b long")
    base = {r.node: r.rank
            for r in pagerank(symmetrize(pairs), n_iter=3).collect()}
    again = {r.node: r.rank
             for r in pagerank(symmetrize(pairs.repartition(13)), n_iter=3).collect()}
    assert base == again
    assert abs(sum(base.values()) - 1.0) < 1e-9  # ranks ~sum to 1
