"""BPE tokenizer induction: learn merge rules from a corpus.

Byte-pair encoding (Sennrich et al., ACL 2016) is THE tokenizer-training
primitive of LLM data pipelines — and its scale shape is a gift: the
corpus is scanned ONCE to build word frequencies, and every merge round
then operates on the Heaps-law-sized vocabulary relation, never the
token stream. At 100 TB the word-count aggregation is the only big job
(map-side combinable, one shuffle on the word key); the n merge rounds
are vocabulary-sized chained DataFrame ops in a single Spark job (best
pairs ride 1-row broadcast relations, the same no-driver-state pattern
as ``ivf.kmeans_fit``).

Words are represented as space-joined symbol strings padded with one
leading/trailing space (`` l o w ``); a merge of pair (a, b) is
``replace(sym, " a b ", " ab ")``. The padding pins matches to symbol
boundaries (without it, symbol ``xa`` followed by ``b`` would match
pattern ``a b``). Within a round the merge is a GREEDY SINGLE SCAN:
``replace`` consumes left-to-right and continues after each
replacement, so ``a a a a`` merges to ``aa a a`` in one round (the
remaining pair merges next round) — canonical BPE merges both in one
pass; the single-scan variant is deterministic, identical in Spark and
DuckDB (verified), and converges to the same merges when pair counts
are distinct. Ties break (count DESC, left ASC, right ASC).

Reference parity: the reference pipeline has no tokenizer stage — this
module is part of the mandated LLM-pipeline extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from end_to_end_azure_databricks_data_engineering_project_spark.operators.dedup import tokens

__all__ = ["bpe_word_counts", "bpe_learn_merges"]


def bpe_word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """The one corpus-sized job: distinct words with frequencies,
    each as a padded space-joined character-symbol string. Returns
    ``(sym, wfreq)`` — vocabulary-sized."""
    words = (
        docs.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("wfreq"))
    )
    chars = F.transform(
        F.sequence(F.lit(1), F.length("w")),
        lambda i: F.col("w").substr(i, F.lit(1)),
    )
    sym = F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" "))
    return words.select(sym.alias("sym"), "wfreq")


def _pair_counts(vocab: DataFrame) -> DataFrame:
    """Adjacent-symbol pair counts over the vocabulary, weighted by
    word frequency. Counts ALL adjacent positions (overlapping), the
    canonical BPE ranking statistic.

    The symbol split materializes in a projection BELOW the explode
    (Generate is a projection barrier), so each word splits ONCE — an
    inline split inside the per-position expressions would re-tokenize
    every word once per position (the duplicated_span_dedup lesson;
    see dedup.shingles_from_tokens' contract)."""
    arr_df = vocab.select(
        F.split(F.trim(F.col("sym")), " ").alias("arr"), "wfreq"
    ).filter(F.size("arr") >= 2)
    pos = arr_df.select(
        "arr",
        "wfreq",
        F.explode(F.sequence(F.lit(1), F.size("arr") - 1)).alias("i"),
    )
    return (
        pos.select(
            F.element_at("arr", F.col("i")).alias("a"),
            F.element_at("arr", F.col("i") + 1).alias("b"),
            "wfreq",
        )
        .groupBy("a", "b")
        .agg(F.sum("wfreq").alias("cnt"))
    )


def bpe_learn_merges(
    docs: DataFrame, text_col: str = "text", n_merges: int = 4
) -> DataFrame:
    """Learn ``n_merges`` BPE merge rules. Returns one row per rule:
    ``(merge_rank, lhs, rhs, pair_count)`` — the pair merged at that
    round and its (pre-merge) weighted count.

    Return contract caveats:

    - FEWER than ``n_merges`` rows when the vocabulary runs out of
      adjacent pairs first (tiny corpus, all words fully merged) —
      the loop stops at the first pair-less round rather than
      cross-joining the vocabulary against an empty best relation
      (which would silently empty the vocab for all later rounds).
      Zero rows (an all-single-symbol corpus) returns an empty frame
      with the same schema.
    - The same ``(lhs, rhs)`` pair CAN appear at multiple ranks: the
      greedy single-scan in-round merge leaves overlapping
      occurrences (``a a a a`` → ``aa a a``) for later rounds, so a
      pair can win again. External appliers keyed by pair (the usual
      rank-dict encoder) collapse such duplicates and will NOT
      reproduce this tokenizer — replay the rules rank-by-rank, or
      dedupe to first rank if an approximation is acceptable.

    Each round: count adjacent pairs over the current vocabulary →
    take the (count DESC, lhs ASC, rhs ASC) argmax as a 1-row broadcast
    relation → rewrite every word with ``replace`` (boundary-padded,
    greedy single scan — see module docstring). Each round's vocabulary
    is cached: both the next round's pair count AND its rewrite
    reference it, so uncached chaining would double the plan subtree
    per round (2^n growth — the kmeans_fit lesson, ivf.py). The ONLY
    driver-side state is the final n_merges-row collect (model-sized,
    like kmeans centroids), returned re-parallelized so every cache can
    be released before returning."""
    if n_merges < 1:
        raise ValueError(f"bpe_learn_merges: n_merges must be >= 1, got {n_merges}")
    vocab = bpe_word_counts(docs, text_col).cache()
    caches = [vocab]
    out: DataFrame | None = None
    try:
        for r in range(1, n_merges + 1):
            best = (
                _pair_counts(vocab)
                .orderBy(F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc())
                .limit(1)
                .cache()
            )
            caches.append(best)
            if best.count() == 0:
                # No adjacent pairs left anywhere in the vocabulary:
                # every word is a single symbol. Cross-joining against
                # the empty best relation would EMPTY the whole vocab
                # and silently produce no further rules — stop instead
                # (see return contract: fewer than n_merges rows).
                break
            row = best.select(
                F.lit(r).alias("merge_rank"),
                F.col("a").alias("lhs"),
                F.col("b").alias("rhs"),
                F.col("cnt").cast("bigint").alias("pair_count"),
            )
            out = row if out is None else out.unionByName(row)
            vocab = (
                vocab.crossJoin(F.broadcast(best.select("a", "b")))
                .select(
                    F.replace(
                        "sym",
                        F.concat(
                            F.lit(" "), F.col("a"), F.lit(" "), F.col("b"), F.lit(" ")
                        ),
                        F.concat(F.lit(" "), F.col("a"), F.col("b"), F.lit(" ")),
                    ).alias("sym"),
                    "wfreq",
                )
                .cache()
            )
            caches.append(vocab)
        if out is None:  # zero merges learnable (all-single-symbol corpus)
            return docs.sparkSession.createDataFrame(
                [], "merge_rank int, lhs string, rhs string, pair_count bigint"
            )
        rows = out.collect()  # ≤ n_merges rows — model-sized, like centroids
    finally:
        for c in caches:
            c.unpersist()
    return docs.sparkSession.createDataFrame(rows, out.schema)
