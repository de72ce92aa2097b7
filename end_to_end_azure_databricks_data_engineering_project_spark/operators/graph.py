"""Graph algorithms over pair relations (near-dup graphs, similarity
graphs): PageRank. Connected components live in operators/dedup.py
(large-star/small-star); this module holds the rank-style iterative
algorithms.

Determinism contract (same as the rest of the engine): every float
reduction is an ordered sequential fold (per-target contributions
folded in neighbor-id order), constants are plain IEEE doubles emitted
with repr() into the SQL oracle — a fixed iteration count therefore
produces bit-identical ranks on Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def symmetrize(pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b") -> DataFrame:
    """Undirected pair list → symmetric distinct edge list (src, dst)."""
    fwd = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    rev = pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst"))
    return fwd.union(rev).distinct()


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 5,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Fixed-iteration PageRank over a SYMMETRIC distinct edge list.
    Returns (node, rank) for every node with at least one edge.

    r_{i+1}(v) = (1-d)/N + d · Σ_{u→v} r_i(u)/deg(u), with the Σ folded
    in ascending-u order (array_sort + sequential fold) so the double
    arithmetic is partition-independent and replayable by the oracle.

    Scale shape per iteration: one equi-join of the (src, dst, deg)
    edge relation against the rank relation on src, one hash
    aggregation on dst (collect_list bounded by max degree), one left
    join back to the node set; `localCheckpoint` truncates lineage so
    n_iter stays O(1) plan depth — same pattern as the connected-
    components loop. Driver holds nothing but the loop counter."""
    nodes = edges.select(F.col(src).alias("node")).distinct()
    deg = (
        edges.groupBy(src).agg(F.count(F.lit(1)).alias("deg"))
        .withColumnRenamed(src, "_dnode")
    )
    # Materialize the (src, dst, deg) relation and the node base ONCE:
    # without this every eager iteration job re-runs the caller's whole
    # edge lineage (for the near-dup graph that is the LSH pair join)
    # several times over — localCheckpoint pins both to their computed
    # rows, so iterations touch only rank-sized data.
    e = (
        edges.join(deg, F.col(src) == F.col("_dnode"))
        .select(src, dst, "deg")
        .localCheckpoint()
    )
    n_row = nodes.agg(F.count(F.lit(1)).alias("n"))
    base = nodes.crossJoin(F.broadcast(n_row)).localCheckpoint()
    ranks = base.select("node", (F.lit(1.0) / F.col("n")).alias("r"))
    teleport = 1.0 - damping  # python-side IEEE subtract; oracle emits repr()
    for _ in range(n_iter):
        contrib = e.join(ranks, F.col(src) == F.col("node")).select(
            F.col(dst).alias("_to"),
            F.col(src).alias("_from"),
            (F.col("r") / F.col("deg")).alias("_c"),
        )
        ordered_sum = F.aggregate(
            F.array_sort(F.collect_list(F.struct(F.col("_from"), F.col("_c")))),
            F.lit(0.0),
            lambda acc, s: acc + s["_c"],
        )
        summed = contrib.groupBy("_to").agg(ordered_sum.alias("_s"))
        ranks = (
            base.join(summed, F.col("node") == F.col("_to"), "left")
            .select(
                "node",
                (
                    F.lit(teleport) / F.col("n")
                    + F.lit(damping) * F.coalesce(F.col("_s"), F.lit(0.0))
                ).alias("r"),
            )
            .localCheckpoint()
        )
    return ranks.select("node", F.col("r").alias("rank"))


def triangle_count(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b"
) -> DataFrame:
    """Global triangle count over an undirected pair list — one row
    ``(n_triangles BIGINT)``. Triangle density over the near-dup graph
    is the standard "is my duplicate graph clustered or chained?"
    diagnostic before committing to a transitive-closure dedup policy.

    Degree-oriented algorithm (Suri & Vassilvitskii, "Counting
    Triangles and the Curse of the Last Reducer", WWW'11): orient every
    edge from the lower-ranked endpoint under the total order
    (degree, id); each triangle x≺y≺z is then counted exactly once as
    the wedge (x→y, x→z) closed by the oriented edge y→z. Wedge
    fan-out is bounded by max OUT-degree ≈ √m instead of max raw degree
    — a celebrity node with 10⁶ neighbors produces no 10¹²-wedge
    explosion because its edges all point INTO it. Scale shape: two
    hash joins (wedge build on src, closure probe on (t1, t2)) and one
    count — no driver-side graph state.
    """
    # Integral ids cast to bigint (unifies int/long); any other type
    # (string/UUID doc ids — supported by pagerank and the dedup stack)
    # flows through as-is: a blind cast would NULL them and silently
    # report 0 triangles (legacy mode) or throw (ANSI).
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    integral = isinstance(
        pairs.schema[id_a].dataType,
        (ByteType, ShortType, IntegerType, LongType),
    )

    def _id(c):
        return c.cast("bigint") if integral else c

    e = (
        pairs.select(
            _id(F.least(F.col(id_a), F.col(id_b))).alias("u"),
            _id(F.greatest(F.col(id_a), F.col(id_b))).alias("v"),
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    both = e.join(
        deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_u")), "u"
    ).join(deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_v")), "v")
    u_first = (F.col("deg_u") < F.col("deg_v")) | (
        (F.col("deg_u") == F.col("deg_v")) & (F.col("u") < F.col("v"))
    )
    oriented = both.select(
        F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("s"),
        F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("t"),
        F.when(u_first, F.col("deg_v")).otherwise(F.col("deg_u")).alias("deg_t"),
    )
    e1, e2 = oriented.alias("e1"), oriented.alias("e2")
    t1_first = (F.col("e1.deg_t") < F.col("e2.deg_t")) | (
        (F.col("e1.deg_t") == F.col("e2.deg_t")) & (F.col("e1.t") < F.col("e2.t"))
    )
    wedges = e1.join(e2, F.col("e1.s") == F.col("e2.s")).filter(t1_first).select(
        F.col("e1.t").alias("t1"), F.col("e2.t").alias("t2")
    )
    closed = wedges.join(
        oriented.select(F.col("s").alias("t1"), F.col("t").alias("t2")),
        ["t1", "t2"],
        "left_semi",
    )
    return closed.agg(F.count(F.lit(1)).alias("n_triangles"))
