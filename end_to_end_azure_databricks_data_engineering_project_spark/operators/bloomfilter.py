"""Broadcast Bloom-filter prefilter for semi/anti-join shapes.

The 100 TB problem this solves: benchmark decontamination (and any
"does this corpus row appear in a small reference set?" check) is a
semi-join between a huge exploded corpus side (one row per n-gram
shingle, trillions at scale) and a small reference side (benchmark
shingles, ~10⁵-10⁷). A plain equi-join shuffles the entire corpus side
on the shingle key even though >99.9% of corpus shingles match nothing.

Shape here instead:
 1. Build a Bloom bitmap over the SMALL side's keys (one Spark job;
    the driver collects two 64-bit hashes per distinct key — bounded by
    the reference-set size, which is the precondition for broadcasting
    anyway; ``max_items`` enforces it loudly).
 2. Broadcast the bitmap as a 1-row DataFrame (array<bigint> words —
    NOT a per-expression literal array, so codegen size stays constant
    in the filter and the plan does not grow with m; same fix as the
    IVF centroid relation, see ivf.py).
 3. Filter the corpus side map-side at the scan stage: k double-hashed
    bit probes per key (Kirsch-Mitzenmacher: pos_i = h1 + i*h2 mod m).
    No shuffle for the ~everything that misses.
 4. Exact-confirm the tiny survivor set with a real equi-join. Bloom
    filters have NO false negatives, so prefilter+confirm is
    bit-identical to the plain exact join — which is exactly what the
    DuckDB oracle for ``bloom_decontaminate`` checks.

Hashing runs ONLY in Spark (xxhash64), so no cross-language hash
portability is needed: the driver just ORs collected positions into
words; the probe side recomputes the same xxhash64 expressions.

Reference parity: the reference's lookup-gate shape (ADF Lookup +
If-Condition over a small control set) scaled to corpus-vs-reference
membership; SURVEY.md §2 extension: training-data curation.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_H1 = "bloom-h1|"
_H2 = "bloom-h2|"


def _hashes(col: Column) -> tuple[Column, Column]:
    """Two independent 64-bit hashes of a string key, as used by both
    the build (collected) and probe (expression) sides. h2 is masked to
    31 bits so ``h1m + i*h2m`` never overflows int64 for any sane k/m."""
    h1 = F.xxhash64(F.concat(F.lit(_H1), col))
    h2 = F.pmod(F.xxhash64(F.concat(F.lit(_H2), col)), F.lit(1 << 31))
    return h1, h2


@dataclass(frozen=True)
class BloomFilter:
    """Driver-held Bloom bitmap: ``words`` is m/64 signed int64 words."""

    words: tuple[int, ...]
    m: int  # number of bits (multiple of 64)
    k: int  # number of probes per key


def _to_signed64(w: int) -> int:
    return w - (1 << 64) if w >= (1 << 63) else w


def bloom_build(
    small: DataFrame,
    col: str,
    *,
    bits_per_item: int = 16,
    n_hashes: int = 4,
    max_items: int = 5_000_000,
) -> BloomFilter:
    """Build a Bloom filter over the distinct values of ``small[col]``.

    Driver state: 2 int64 per distinct key (the collected hash pairs)
    plus the bitmap — both bounded by the small side. Raises if the
    small side exceeds ``max_items`` (at that point it is not a
    broadcast-side set and a plain shuffle join is the right plan),
    mirroring ``tables.merge_keyed``'s bounded-manifest rule.

    bits_per_item=16 with k=4 gives ~0.24% false-positive rate — false
    positives only cost confirm-join work, never correctness.
    """
    h1, h2 = _hashes(F.col("_k"))
    rows = (
        small.select(F.col(col).cast("string").alias("_k"))
        .where(F.col("_k").isNotNull())
        .distinct()
        .select(h1.alias("h1"), h2.alias("h2"))
        .limit(max_items + 1)
        .collect()
    )
    if len(rows) > max_items:
        raise ValueError(
            f"bloom_build: small side exceeds max_items={max_items}; "
            "a Bloom prefilter no longer pays — use a plain equi-join."
        )
    n = max(len(rows), 1)
    m = 64
    while m < n * bits_per_item:
        m *= 2
    words = [0] * (m // 64)
    for r in rows:
        h1v, h2v = r.h1 % m, r.h2
        for i in range(n_hashes):
            pos = (h1v + i * h2v) % m
            words[pos // 64] |= 1 << (pos % 64)
    return BloomFilter(tuple(_to_signed64(w) for w in words), m, n_hashes)


def bloom_relation(spark, bloom: BloomFilter) -> DataFrame:
    """The bitmap as a broadcastable 1-row relation (``_bloom_words``).

    Keeping the words in a relation (joined once, broadcast) instead of
    a literal array keeps the filter expression O(k) regardless of m —
    a literal would re-embed m/64 constants into every codegen'd stage.
    """
    return spark.createDataFrame(
        [(list(bloom.words),)], "_bloom_words: array<bigint>"
    )


def bloom_member(col: Column, bloom: BloomFilter, words_col: Column) -> Column:
    """True iff ``col`` may be in the set (no false negatives)."""
    h1, h2 = _hashes(col.cast("string"))
    h1m = F.pmod(h1, F.lit(bloom.m))
    cond = F.lit(True)
    for i in range(bloom.k):
        pos = F.pmod(h1m + F.lit(i) * h2, F.lit(bloom.m))
        word = F.element_at(words_col, (pos / F.lit(64)).cast("int") + F.lit(1))
        cond = cond & (F.getbit(word, pos % F.lit(64)) == F.lit(1))
    return cond


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    bits_per_item: int = 16,
    n_hashes: int = 4,
) -> DataFrame:
    """Exact semi-join big⋉small on ``on``, Bloom-prefiltered.

    Identical rows to ``big.join(small, on, "left_semi")`` (the Bloom
    pass cannot drop a true match; the confirm join removes false
    positives), but the big side is reduced map-side at the scan before
    anything shuffles or broadcasts.
    """
    bloom = bloom_build(small, on, bits_per_item=bits_per_item, n_hashes=n_hashes)
    rel = bloom_relation(big.sparkSession, bloom)
    survivors = big.join(F.broadcast(rel)).where(
        bloom_member(F.col(on), bloom, F.col("_bloom_words"))
    ).drop("_bloom_words")
    return survivors.join(
        F.broadcast(small.select(on).distinct()), on, "left_semi"
    )
