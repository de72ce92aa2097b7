"""Full-text relevance ranking over the documents table — BM25.

The classic probabilistic ranking function (Robertson & Spärck Jones /
Okapi BM25): for a bag-of-words query Q and document d,

    score(d, Q) = Σ_{t ∈ Q} idf(t) · tf(t,d)·(k1+1)
                              / (tf(t,d) + k1·(1 − b + b·|d|/avgdl))

Two idf modes:
 - ``idf="log"`` — the standard ln((N − df + 0.5)/(df + 0.5) + 1).
   Use this in production; NOT oracle-hash-checkable because ln()'s
   low bits differ across engines (the repo-wide rule — see
   bigram_lm_score).
 - ``idf="ratio"`` — the same quantity WITHOUT the ln: every value is
   plain IEEE arithmetic on exact integer counts, bit-identical in any
   engine. Monotone in the log form per term (ln is increasing), so
   single-term rankings agree exactly; multi-term rankings overweight
   rare terms vs true BM25. The oracle-checked catalog entry uses this
   mode; tests pin the log mode's ranking on a hand-computed corpus.

Scale shape: one explode of matching terms only (the ``isin`` filter
drops non-query tokens BEFORE the explode output ever shuffles), a
(doc, term) tf aggregation, a |Q|-row df/idf relation and a 1-row
(N, avgdl) relation — both broadcast back onto the tf stream — then a
per-doc ordered fold (bounded by |Q| terms). Final selection is
TakeOrderedAndProject (orderBy+limit), no global window."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 20,
    idf: str = "ratio",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Top-``top_n`` documents by BM25 against a bag-of-words query.

    Returns (doc_id, n_hit_terms, bm25, sel_rank); documents matching
    no query term are absent. Ties rank by doc_id."""
    if idf not in ("log", "ratio"):
        raise ValueError(f"idf must be 'log' or 'ratio', got {idf!r}")
    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    # the token stream below is lowercased; fold the query to match so a
    # mixed-case term matches instead of silently scoring zero (r6 advisor)
    query_terms = [t.lower() for t in query_terms]
    ws = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    base = docs.filter(F.trim(F.col(text_col)) != "").select(
        F.col(id_col).alias("_id"), ws.alias("_ws")
    )
    # corpus stats: one row (N, avgdl) — integer counts, one division
    stats = base.agg(
        F.count(F.lit(1)).alias("_n_docs"),
        F.sum(F.size("_ws")).alias("_n_toks"),
    )
    dl = base.select("_id", F.size("_ws").cast("bigint").alias("_dl"))
    tf = (
        base.select("_id", F.explode("_ws").alias("w"))
        .filter(F.col("w").isin(query_terms))
        .groupBy("_id", "w")
        .agg(F.count(F.lit(1)).alias("_tf"))
    )
    df_rel = tf.groupBy("w").agg(F.count(F.lit(1)).alias("_df"))
    ratio_idf = (
        F.col("_n_docs").cast("double") - F.col("_df") + F.lit(0.5)
    ) / (F.col("_df").cast("double") + F.lit(0.5)) + F.lit(1.0)
    idf_expr = F.log(ratio_idf) if idf == "log" else ratio_idf
    avgdl = F.col("_n_toks").cast("double") / F.col("_n_docs").cast("double")
    tfnorm = (F.col("_tf").cast("double") * F.lit(k1 + 1.0)) / (
        F.col("_tf").cast("double")
        + F.lit(k1)
        * (F.lit(1.0) - F.lit(b) + F.lit(b) * (F.col("_dl").cast("double") / F.col("_avgdl")))
    )
    sc = (
        tf.join(F.broadcast(df_rel), "w")
        .join(dl, "_id")
        .crossJoin(F.broadcast(stats))
        .withColumn("_avgdl", avgdl)
        .withColumn("_s", idf_expr * tfnorm)
    )
    # per-doc sum folded in term order — |Q|-bounded, deterministic
    ordered_sum = F.aggregate(
        F.array_sort(F.collect_list(F.struct(F.col("w"), F.col("_s")))),
        F.lit(0.0),
        lambda acc, s: acc + s["_s"],
    )
    scored = sc.groupBy("_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_hit_terms"),
        ordered_sum.alias("bm25"),
    )
    top = scored.orderBy(F.col("bm25").desc(), F.col("_id").asc()).limit(top_n)
    w = Window.orderBy(F.col("bm25").desc(), F.col("_id").asc())
    return (
        top.withColumn("sel_rank", F.row_number().over(w).cast("int"))
        .withColumnRenamed("_id", id_col)
        .select(id_col, "n_hit_terms", "bm25", "sel_rank")
    )
